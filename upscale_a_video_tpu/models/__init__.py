from .unet_video import UNetVideoModel
from .vae import AutoencoderKLVideo

__all__ = ["UNetVideoModel", "AutoencoderKLVideo"]
