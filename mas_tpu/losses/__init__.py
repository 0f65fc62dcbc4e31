from .seg import bce_loss_with_quant, weighted_bce_with_logits
from .discriminator import (PatchDiscriminator, adopt_weight,
                            generator_loss, hinge_d_loss, vanilla_d_loss)
from .lpips import LPIPS, VGG16Features, load_lpips_params_from_torch
from .lpips_object import box_weight_map, lpips_with_object, scale_gradient
from .face_loss import (FaceNet, face_loss, gather_faces,
                        load_face_params_from_torch)
from .vqgan import (PerceptualFns, discriminator_step_loss,
                    generator_step_loss, nll_loss_fn)
