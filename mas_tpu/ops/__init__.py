from .norms import group_norm, group_norm_swish, swish, layer_norm
from .vq import vq_argmin, vq_quantize
from .kmeans import kmeans
