from .ctc import custom_ctc_loss
