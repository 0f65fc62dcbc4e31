from .state import VQTrainState, create_vq_train_state
from .steps import make_seg_train_step
