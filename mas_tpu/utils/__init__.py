from .config import (
    VQModelConfig,
    CodebookConfig,
    TransformerConfig,
    SegLossConfig,
    VQGANLossConfig,
    OptimizerConfig,
    TrainConfig,
    MeshConfig,
    ConfigError,
)
