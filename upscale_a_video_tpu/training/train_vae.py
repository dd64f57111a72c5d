"""Conditional-VAE decoder finetuning losses.

The reference exposes ``training_losses`` with a two-optimizer GAN scheme
whose ``dual_loss`` callable lives outside the repo
(autoencoder_kl_cond_video.py:363-389). Here the loss is provided in full:

- optimizer_idx 0 (generator): L1 reconstruction + adaptive-weighted
  generator-adversarial term (the standard LDM/VQGAN recipe the reference's
  external callable implements)
- optimizer_idx 1 (discriminator): hinge loss on a lightweight video
  PatchGAN discriminator (in-repo, flax)

Everything is a pure function over (params, batch); two optax optimizers
alternate exactly like the reference's optimizer_idx switch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchDiscriminator(nn.Module):
    """70×70-receptive-field PatchGAN over frames (channels-last)."""

    base_channels: int = 64
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B·T, H, W, 3) → (B·T, h', w', 1) patch logits."""
        ch = self.base_channels
        x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="conv_in")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        for i in range(1, self.num_layers + 1):
            stride = 2 if i < self.num_layers else 1
            ch = min(self.base_channels * 2**i, 512)
            x = nn.Conv(ch, (4, 4), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, ch), name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), name="conv_out")(x)


def _flatten_frames(x: jax.Array) -> jax.Array:
    b, t = x.shape[:2]
    return x.reshape(b * t, *x.shape[2:])


def hinge_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - real_logits))
        + jnp.mean(jax.nn.relu(1.0 + fake_logits))
    )


def vae_training_losses(
    vae,
    vae_params,
    disc: PatchDiscriminator,
    disc_params,
    inputs: jax.Array,    # (B, T, h, w, 3) LR condition frames
    gts: jax.Array,       # (B, T, 4h, 4w, 3) ground-truth HR frames
    latents: jax.Array,   # (B, T, h, w, 4) clean latents (pre-scaled)
    optimizer_idx: int,
    disc_weight: float = 0.5,
    disc_start_weight_on: Optional[jax.Array] = None,
    w_lr: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Mirror of training_losses (ref :367-389). Returns (loss, recon)."""
    scaling = vae.config.scaling_factor
    z = latents / scaling
    recon = vae.apply(vae_params, z, method=vae.decode, img=inputs, w_lr=w_lr)

    rec_flat = _flatten_frames(recon)
    gt_flat = _flatten_frames(gts)

    if optimizer_idx == 0:
        rec_loss = jnp.mean(jnp.abs(rec_flat - gt_flat))
        logits_fake = disc.apply(disc_params, rec_flat)
        g_loss = -jnp.mean(logits_fake)
        gate = 1.0 if disc_start_weight_on is None else disc_start_weight_on
        return rec_loss + disc_weight * gate * g_loss, recon

    # optimizer_idx == 1: discriminator step (stop-grad through the generator)
    logits_real = disc.apply(disc_params, gt_flat)
    logits_fake = disc.apply(disc_params, jax.lax.stop_gradient(rec_flat))
    return hinge_d_loss(logits_real, logits_fake), recon
