"""TPU-native DDIM scheduler with the split ``step_v0`` / ``step_vt`` API.

Functional rebuild of the reference `DDIMScheduler`
(`/root/reference/models_video/scheduling_ddim.py:79-569`). The VSR-specific
surface is the *split step*: ``step_v0`` returns only the clipped predicted
x̂0 so the pipeline can run flow-guided latent propagation on it, and
``step_vt`` completes the DDIM update from the (possibly modified) x̂0
(ref scheduling_ddim.py:383-520, used by pipeline_upscale_a_video.py:649-659).

Design differences from the torch original (deliberate, TPU-first):

- Pure functions over a frozen config + precomputed numpy tables. All methods
  accept the timestep as a traced scalar/array and *gather* from the
  alphas_cumprod table, so the entire denoise loop can live inside one
  ``jax.lax.fori_loop``/``scan`` under ``jit`` — no per-step host round trips.
- No in-place state: ``timesteps(num_inference_steps)`` returns a static numpy
  grid the caller closes over (it is shape-static for XLA).
- Noise comes from explicit ``jax.random`` keys (threefry), never hidden
  generator state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import make_betas


@dataclasses.dataclass(frozen=True)
class DDIMSchedulerConfig:
    """Mirror of the reference config (scheduling_ddim.py:130-146).

    ``from_json`` accepts the reference's scheduler_config.json unchanged.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    clip_sample: bool = True
    set_alpha_to_one: bool = True
    steps_offset: int = 0
    prediction_type: str = "epsilon"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    clip_sample_range: float = 1.0
    sample_max_value: float = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "DDIMSchedulerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if kwargs.get("trained_betas") is not None:
            kwargs["trained_betas"] = tuple(kwargs["trained_betas"])
        return cls(**kwargs)


class DDIMScheduler:
    """Stateless DDIM sampler. All ``step*`` methods are jit-safe pure functions."""

    def __init__(self, config: DDIMSchedulerConfig = DDIMSchedulerConfig()):
        self.config = config
        betas = make_betas(
            config.beta_schedule,
            config.num_train_timesteps,
            config.beta_start,
            config.beta_end,
            config.trained_betas,
        )
        self.betas = betas
        self.alphas = 1.0 - betas
        # fp64 cumprod then cast: matches torch's fp32 cumprod closely and keeps
        # the tail (alpha_bar ~ 1e-5) accurate.
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0, dtype=np.float64).astype(np.float32)
        self.final_alpha_cumprod = np.float32(1.0) if config.set_alpha_to_one else self.alphas_cumprod[0]
        self.init_noise_sigma = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "DDIMScheduler":
        return cls(DDIMSchedulerConfig.from_dict(d))

    # ------------------------------------------------------------------ grids

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Static descending integer timestep grid (ref scheduling_ddim.py:237-259)."""
        if num_inference_steps > self.config.num_train_timesteps:
            raise ValueError(
                f"num_inference_steps ({num_inference_steps}) > num_train_timesteps"
                f" ({self.config.num_train_timesteps})"
            )
        step_ratio = self.config.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int64)
        return ts + self.config.steps_offset

    # -------------------------------------------------------------- internals

    def _alpha_prod(self, t):
        """Gather alpha_bar[t] for a traced integer timestep (any shape)."""
        table = jnp.asarray(self.alphas_cumprod)
        return table[jnp.asarray(t)]

    def _alpha_prod_prev(self, prev_t):
        """alpha_bar[prev_t], or final_alpha_cumprod where prev_t < 0."""
        table = jnp.asarray(self.alphas_cumprod)
        prev_t = jnp.asarray(prev_t)
        safe = table[jnp.clip(prev_t, 0, None)]
        return jnp.where(prev_t >= 0, safe, jnp.asarray(self.final_alpha_cumprod))

    def _prev_timestep(self, t, num_inference_steps: int):
        return jnp.asarray(t) - self.config.num_train_timesteps // num_inference_steps

    @staticmethod
    def _bcast(coeff, like):
        """Left-align a scalar or per-batch coefficient against `like`'s shape."""
        coeff = jnp.asarray(coeff)
        if coeff.ndim == 0:
            return coeff
        return coeff.reshape(coeff.shape[0], *(1,) * (like.ndim - 1))

    def _variance(self, alpha_prod_t, alpha_prod_t_prev):
        """sigma_t^2 of DDIM eq. (16) (ref scheduling_ddim.py:192-200)."""
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)

    def _pred_x0_eps(self, model_output, sample, alpha_prod_t):
        """(x̂0, ε̂) from the model output under the configured prediction type
        (ref scheduling_ddim.py:325-338)."""
        alpha_prod_t = self._bcast(alpha_prod_t, sample)
        beta_prod_t = 1.0 - alpha_prod_t
        pt = self.config.prediction_type
        if pt == "epsilon":
            x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
            eps = model_output
        elif pt == "sample":
            x0 = model_output
            eps = (sample - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5
        elif pt == "v_prediction":
            x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            eps = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        else:
            raise ValueError(f"prediction_type must be epsilon|sample|v_prediction, got {pt}")
        return x0, eps

    def _threshold_sample(self, sample):
        """Imagen dynamic thresholding (ref scheduling_ddim.py:202-235).

        Operates per-batch-item over all remaining axes.
        """
        cfg = self.config
        dtype = sample.dtype
        b = sample.shape[0]
        flat = sample.astype(jnp.float32).reshape(b, -1)
        s = jnp.quantile(jnp.abs(flat), cfg.dynamic_thresholding_ratio, axis=1)
        s = jnp.clip(s, 1.0, cfg.sample_max_value)[:, None]
        flat = jnp.clip(flat, -s, s) / s
        return flat.reshape(sample.shape).astype(dtype)

    def _clip_or_threshold(self, x0):
        if self.config.thresholding:
            return self._threshold_sample(x0)
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            return jnp.clip(x0, -r, r)
        return x0

    # ------------------------------------------------------------------ steps

    def step(
        self,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        num_inference_steps: int,
        eta: float = 0.0,
        use_clipped_model_output: bool = False,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Classic fused DDIM x_t → x_{t-1} (ref scheduling_ddim.py:261-381).

        Returns ``(prev_sample, pred_original_sample)``.
        """
        prev_t = self._prev_timestep(timestep, num_inference_steps)
        alpha_prod_t = self._bcast(self._alpha_prod(timestep), sample)
        alpha_prod_t_prev = self._bcast(self._alpha_prod_prev(prev_t), sample)
        beta_prod_t = 1.0 - alpha_prod_t

        x0, eps = self._pred_x0_eps(model_output, sample, alpha_prod_t)
        x0 = self._clip_or_threshold(x0)

        variance = self._variance(alpha_prod_t, alpha_prod_t_prev)
        std_dev_t = eta * variance**0.5

        if use_clipped_model_output:
            eps = (sample - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5

        direction = (1.0 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * eps
        prev_sample = alpha_prod_t_prev**0.5 * x0 + direction

        if eta > 0:
            if variance_noise is None:
                if key is None:
                    raise ValueError("eta > 0 requires a PRNG `key` or explicit `variance_noise`")
                variance_noise = jax.random.normal(key, model_output.shape, model_output.dtype)
            prev_sample = prev_sample + std_dev_t * variance_noise

        return prev_sample, x0

    def step_v0(
        self,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
    ) -> jax.Array:
        """First half of the split step: clipped x̂0 only
        (ref scheduling_ddim.py:383-433). The pipeline runs latent propagation
        on this before calling :meth:`step_vt`."""
        alpha_prod_t = self._alpha_prod(timestep)
        x0, _ = self._pred_x0_eps(model_output, sample, alpha_prod_t)
        return self._clip_or_threshold(x0)

    def step_vt(
        self,
        v0: jax.Array,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        num_inference_steps: int,
        eta: float = 0.0,
        use_clipped_model_output: bool = False,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Second half of the split step: finish the DDIM update from an
        externally-supplied x̂0 (ref scheduling_ddim.py:436-520).

        Note the reference's exact quirk: under ``prediction_type='epsilon'``
        ε̂ is taken from ``model_output`` directly (not re-derived from ``v0``),
        while the clip is applied *again* to v0 — we reproduce that faithfully.
        """
        prev_t = self._prev_timestep(timestep, num_inference_steps)
        alpha_prod_t = self._bcast(self._alpha_prod(timestep), sample)
        alpha_prod_t_prev = self._bcast(self._alpha_prod_prev(prev_t), sample)
        beta_prod_t = 1.0 - alpha_prod_t

        x0 = v0
        pt = self.config.prediction_type
        if pt == "epsilon":
            eps = model_output
        elif pt == "sample":
            eps = (sample - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5
        elif pt == "v_prediction":
            eps = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        else:
            raise ValueError(f"unknown prediction_type {pt}")

        x0 = self._clip_or_threshold(x0)

        variance = self._variance(alpha_prod_t, alpha_prod_t_prev)
        std_dev_t = eta * variance**0.5

        if use_clipped_model_output:
            eps = (sample - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5

        direction = (1.0 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * eps
        prev_sample = alpha_prod_t_prev**0.5 * x0 + direction

        if eta > 0:
            if variance_noise is None:
                if key is None:
                    raise ValueError("eta > 0 requires a PRNG `key` or explicit `variance_noise`")
                variance_noise = jax.random.normal(key, model_output.shape, model_output.dtype)
            prev_sample = prev_sample + std_dev_t * variance_noise

        return prev_sample

    # ------------------------------------------------------------ train utils

    def add_noise(self, original_samples: jax.Array, noise: jax.Array, timesteps) -> jax.Array:
        """q(x_t | x_0) forward noising (ref scheduling_ddim.py:523-545).

        ``timesteps`` may be a scalar or a per-batch vector; broadcast happens
        over the trailing axes.
        """
        acp = jnp.asarray(self.alphas_cumprod, dtype=original_samples.dtype)
        t = jnp.asarray(timesteps).reshape(-1)
        sqrt_ap = acp[t] ** 0.5
        sqrt_omap = (1.0 - acp[t]) ** 0.5
        extra_dims = (1,) * (original_samples.ndim - 1)
        sqrt_ap = sqrt_ap.reshape(t.shape[0], *extra_dims)
        sqrt_omap = sqrt_omap.reshape(t.shape[0], *extra_dims)
        return sqrt_ap * original_samples + sqrt_omap * noise

    def get_velocity(self, sample: jax.Array, noise: jax.Array, timesteps) -> jax.Array:
        """v-prediction target (ref scheduling_ddim.py:547-566)."""
        acp = jnp.asarray(self.alphas_cumprod, dtype=sample.dtype)
        t = jnp.asarray(timesteps).reshape(-1)
        sqrt_ap = acp[t] ** 0.5
        sqrt_omap = (1.0 - acp[t]) ** 0.5
        extra_dims = (1,) * (sample.ndim - 1)
        sqrt_ap = sqrt_ap.reshape(t.shape[0], *extra_dims)
        sqrt_omap = sqrt_omap.reshape(t.shape[0], *extra_dims)
        return sqrt_ap * noise - sqrt_omap * sample

    def scale_model_input(self, sample: jax.Array, timestep=None) -> jax.Array:
        """No-op for DDIM (ref scheduling_ddim.py:178-190)."""
        return sample

    def __len__(self) -> int:
        return self.config.num_train_timesteps
