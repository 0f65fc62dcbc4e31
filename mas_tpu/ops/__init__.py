from .norms import group_norm, group_norm_swish, swish, layer_norm
from .vq import vq_argmin, vq_quantize
from .kmeans import kmeans
from .attention import (flash_attention, prefix_causal_attention,
                        prefix_causal_attention_jnp)
from .decode_attention import decode_attention, transpose_cache
