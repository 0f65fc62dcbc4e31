from .vqvae import VQModel, Encoder, Decoder
from .codebook import CodebookState, codebook_init_state, quantize_train, quantize_eval
from .transformer import MakeAScene
from .sampler import sample_images, sample_tokens
