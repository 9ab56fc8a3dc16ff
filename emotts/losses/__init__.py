from emotts.losses.fs2 import fs2_loss, ssim_loss
from emotts.losses.rank import rank_loss

__all__ = ["fs2_loss", "ssim_loss", "rank_loss"]
