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
    vq_seg_config,
    vq_img_config,
)
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .logging import Logger, Visualizer, make_grid, save_image
from .torch_import import (convert_transformer_state, convert_vqbase_state,
                           load_torch_checkpoint)
from .torch_export import (export_transformer_state, export_vqbase_state,
                           save_torch_checkpoint)
