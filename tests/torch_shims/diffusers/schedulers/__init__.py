"""diffusers.schedulers shim: DDPMScheduler with 0.16.0 ``add_noise``
numerics — the only method the reference pipeline calls on its
``low_res_scheduler`` (pipeline_upscale_a_video.py:548)."""

import math

import torch

from ..configuration_utils import ConfigMixin, register_to_config
from .scheduling_utils import KarrasDiffusionSchedulers, SchedulerMixin  # noqa: F401


class DDPMScheduler(SchedulerMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas=None,
        variance_type: str = "fixed_small",
        clip_sample: bool = True,
        prediction_type: str = "epsilon",
        **kwargs,
    ):
        if trained_betas is not None:
            betas = torch.tensor(trained_betas, dtype=torch.float32)
        elif beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        elif beta_schedule == "scaled_linear":
            betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                   num_train_timesteps,
                                   dtype=torch.float32) ** 2
        elif beta_schedule == "squaredcos_cap_v2":
            def alpha_bar(t):
                return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

            betas = torch.tensor(
                [min(1 - alpha_bar((i + 1) / num_train_timesteps)
                     / alpha_bar(i / num_train_timesteps), 0.999)
                 for i in range(num_train_timesteps)], dtype=torch.float32)
        else:
            raise NotImplementedError(beta_schedule)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.init_noise_sigma = 1.0

    def add_noise(self, original_samples, noise, timesteps):
        # diffusers 0.16 DDPMScheduler.add_noise: broadcast sqrt terms over
        # trailing dims
        acp = self.alphas_cumprod.to(device=original_samples.device,
                                     dtype=original_samples.dtype)
        timesteps = timesteps.to(original_samples.device)
        sqrt_acp = acp[timesteps] ** 0.5
        sqrt_1m = (1 - acp[timesteps]) ** 0.5
        while len(sqrt_acp.shape) < len(original_samples.shape):
            sqrt_acp = sqrt_acp.unsqueeze(-1)
            sqrt_1m = sqrt_1m.unsqueeze(-1)
        return sqrt_acp * original_samples + sqrt_1m * noise
