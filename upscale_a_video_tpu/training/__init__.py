from .train_unet import make_train_step, diffusion_loss, temporal_param_mask

__all__ = ["make_train_step", "diffusion_loss", "temporal_param_mask"]
