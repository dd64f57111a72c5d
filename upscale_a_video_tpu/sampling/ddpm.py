"""Minimal TPU-native DDPM scheduler.

The reference uses a stock diffusers ``DDPMScheduler`` purely as the
``low_res_scheduler``: its only job in the VSR path is ``add_noise`` on the LR
conditioning frames (ref pipeline_upscale_a_video.py:546-548). We provide
``add_noise`` plus a full ancestral ``step`` for completeness/training.

Defaults follow the stable-diffusion-x4-upscaler ``low_res_scheduler`` bundle
(scaled_linear betas, 1000 train steps).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import make_betas


@dataclasses.dataclass(frozen=True)
class DDPMSchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "scaled_linear"
    trained_betas: Optional[tuple] = None
    variance_type: str = "fixed_small"
    clip_sample: bool = True
    prediction_type: str = "epsilon"
    clip_sample_range: float = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "DDPMSchedulerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if kwargs.get("trained_betas") is not None:
            kwargs["trained_betas"] = tuple(kwargs["trained_betas"])
        return cls(**kwargs)


class DDPMScheduler:
    def __init__(self, config: DDPMSchedulerConfig = DDPMSchedulerConfig()):
        self.config = config
        self.betas = make_betas(
            config.beta_schedule,
            config.num_train_timesteps,
            config.beta_start,
            config.beta_end,
            config.trained_betas,
        )
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0, dtype=np.float64).astype(np.float32)
        self.init_noise_sigma = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "DDPMScheduler":
        return cls(DDPMSchedulerConfig.from_dict(d))

    def add_noise(self, original_samples: jax.Array, noise: jax.Array, timesteps) -> jax.Array:
        """q(x_t | x_0): identical math to DDIMScheduler.add_noise."""
        acp = jnp.asarray(self.alphas_cumprod, dtype=original_samples.dtype)
        t = jnp.asarray(timesteps).reshape(-1)
        sqrt_ap = acp[t] ** 0.5
        sqrt_omap = (1.0 - acp[t]) ** 0.5
        extra_dims = (1,) * (original_samples.ndim - 1)
        sqrt_ap = sqrt_ap.reshape(t.shape[0], *extra_dims)
        sqrt_omap = sqrt_omap.reshape(t.shape[0], *extra_dims)
        return sqrt_ap * original_samples + sqrt_omap * noise

    def step(
        self,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """One ancestral DDPM step x_t → x_{t-1} (full-chain stepping).

        Returns ``(prev_sample, pred_original_sample)``.
        """
        cfg = self.config
        t = jnp.asarray(timestep)
        acp = jnp.asarray(self.alphas_cumprod)
        alpha_prod_t = acp[t]
        alpha_prod_t_prev = jnp.where(t > 0, acp[jnp.clip(t - 1, 0, None)], jnp.float32(1.0))
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1.0 - current_alpha_t

        if cfg.prediction_type == "epsilon":
            x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
        elif cfg.prediction_type == "sample":
            x0 = model_output
        elif cfg.prediction_type == "v_prediction":
            x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
        else:
            raise ValueError(f"unknown prediction_type {cfg.prediction_type}")

        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        # Posterior mean coefficients (DDPM eq. 7).
        pred_original_coeff = (alpha_prod_t_prev**0.5 * current_beta_t) / beta_prod_t
        current_sample_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        prev_mean = pred_original_coeff * x0 + current_sample_coeff * sample

        variance = jnp.clip(beta_prod_t_prev / beta_prod_t * current_beta_t, 1e-20, None)
        if cfg.variance_type == "fixed_large":
            variance = current_beta_t

        if key is not None:
            noise = jax.random.normal(key, sample.shape, sample.dtype)
            prev_sample = prev_mean + jnp.where(t > 0, variance**0.5, 0.0) * noise
        else:
            prev_sample = prev_mean
        return prev_sample, x0

    def __len__(self) -> int:
        return self.config.num_train_timesteps
