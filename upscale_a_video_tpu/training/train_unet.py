"""UNet training step (temporal-adapter finetuning).

The reference releases no UAV training loop; its training idioms survive as
``from_pretrained_2d`` — inflate SD ×4-upscaler 2D weights, keep ``temporal``
keys fresh, freeze everything else (ref unet_video.py:577-601) — plus gradient
checkpointing plumbing. This module provides the TPU-native equivalent: a
denoising-MSE train step over video latents with an optax masked optimizer
that updates only temporal parameters, jit/pjit-able over a (data, model)
mesh (parallel/mesh.py supplies the shardings).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.unet_video import UNetVideoModel
from ..sampling import DDIMScheduler, DDPMScheduler

TEMPORAL_KEYS = ("temp_block", "temp_blocks", "attn_temporal", "norm_temporal",
                 "resblock_temporal", "resblocks_3d")


def temporal_param_mask(params) -> Any:
    """True for parameters that belong to temporal modules — the trainable set
    under the reference's freezing scheme (unet_video.py:597-600)."""

    def walk(tree, in_temporal):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_temporal or any(t in k for t in TEMPORAL_KEYS))
                for k, v in tree.items()
            }
        return in_temporal

    return walk(params, False)


def diffusion_loss(
    unet: UNetVideoModel,
    params,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    scheduler: DDIMScheduler,
    low_res_scheduler: DDPMScheduler,
    max_noise_level: int = 350,
) -> jax.Array:
    """ε-prediction MSE for the ×4-upscaler objective.

    batch: ``latents`` (B,T,h,w,4) clean VAE latents, ``low_res`` (B,T,h,w,3)
    LR frames in [-1,1], ``text_embeds`` (B,S,C).
    """
    latents = batch["latents"]
    low_res = batch["low_res"]
    b = latents.shape[0]
    k_t, k_eps, k_lvl, k_lr = jax.random.split(key, 4)

    t = jax.random.randint(k_t, (b,), 0, scheduler.config.num_train_timesteps)
    eps = jax.random.normal(k_eps, latents.shape, latents.dtype)
    noisy = scheduler.add_noise(latents, eps, t)

    # noise the LR conditioning at a random level, as at inference (SD x4 style)
    lvl = jax.random.randint(k_lvl, (b,), 0, max_noise_level)
    lr_noise = jax.random.normal(k_lr, low_res.shape, low_res.dtype)
    low_res_noised = low_res_scheduler.add_noise(low_res, lr_noise, lvl)

    pred = unet.apply(params, noisy, t, low_res_noised, batch["text_embeds"], lvl)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - eps.astype(jnp.float32)))


def make_train_step(
    unet: UNetVideoModel,
    scheduler: DDIMScheduler,
    low_res_scheduler: DDPMScheduler,
    optimizer: Optional[optax.GradientTransformation] = None,
    freeze_non_temporal: bool = True,
    donate: bool = True,
) -> Callable:
    """Build a jitted ``train_step(params, opt_state, batch, key) ->
    (params, opt_state, loss)``.

    With ``freeze_non_temporal`` the optimizer is masked to temporal params
    only (the reference finetuning regime). The returned function carries no
    Python state — safe to pjit over any mesh.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=1e-2)

    def opt_with_mask(params):
        if not freeze_non_temporal:
            return optimizer
        labels = jax.tree.map(
            lambda f: "train" if f else "freeze", temporal_param_mask(params))
        return optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels)

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(unet, p, batch, key, scheduler, low_res_scheduler)
        )(params)
        updates, opt_state = opt_with_mask(params).update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    donate_args = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args)


def init_optimizer(
    params,
    optimizer: Optional[optax.GradientTransformation] = None,
    freeze_non_temporal: bool = True,
):
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=1e-2)
    if freeze_non_temporal:
        labels = jax.tree.map(
            lambda f: "train" if f else "freeze", temporal_param_mask(params))
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels)
    return optimizer.init(params)
