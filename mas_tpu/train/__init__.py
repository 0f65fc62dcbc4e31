from .state import (TransformerTrainState, VQTrainState,
                    create_vq_train_state, make_adam)
from .steps import (make_img_train_step, make_seg_eval_step,
                    make_seg_train_step, make_transformer_train_step)
from .loop import (run_pretrain_image, run_pretrain_segmentation,
                   run_show, run_train_transformer, tokenize_batches)
