from .seg import bce_loss_with_quant, weighted_bce_with_logits
