"""The temporal video UNet (ref `/root/reference/models_video/unet_video.py:103-574`).

TPU-first rebuild: channels-last (B, T, H, W, C), one flax module whose full
forward jit-compiles into a single XLA program. Key semantic points carried
over from the reference:

- input = concat(noisy latent 4ch, noised LR frames 3ch) → 7ch (unet_video.py:440)
- class embedding = noise-level embedding added to the timestep embedding
  (unet_video.py:179-185,480-491)
- a TemporalModule3D after every down/mid/up block (unet_video.py:499-564)
- upsample-size forcing for inputs not divisible by 8 (unet_video.py:433-443)
  is handled statically: shapes are known at trace time, so the forced sizes
  are compile-time constants per input geometry.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import UNetVideoConfig
from ..nn.blocks import InflatedConv, TimestepEmbedding
from ..nn.temporal import TemporalModule3D
from ..nn.unet_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)
from ..ops.embeddings import get_timestep_embedding


class UNetVideoModel(nn.Module):
    config: UNetVideoConfig
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    # rematerialize each down/mid/up block on the backward pass — the TPU
    # equivalent of the reference's gradient checkpointing plumbing
    # (unet_video.py:400-402, unet_blocks.py:359-375): trades recompute FLOPs
    # for activation HBM during temporal-adapter training.
    use_remat: bool = False

    def _maybe_remat(self, block_cls, static_argnums=()):
        if not self.use_remat:
            return block_cls
        return nn.remat(block_cls, static_argnums=static_argnums)

    def make_pab_collect_cache(self, skip=(), kinds=None):
        """Empty cache structure for PAB: calling with this collects the
        attention deltas of every transformer block (see nn/attention.py
        BasicTransformerBlock._cached). Levels named in ``skip`` (e.g.
        "down_0", "up_3", "mid") are left out of the cache entirely — their
        blocks recompute attention every step, which bounds the HBM the cache
        adds to the denoise-scan carry (the finest level dominates).

        ``kinds`` (subset of {"spatial","cross","temporal"}) restricts which
        attention kinds are cached: a per-block marker dict lists only the
        cacheable entries (an empty-tuple leafless marker per key), the rest
        recompute every step. E.g. kinds=("cross",) caches only the text
        cross-attentions — the longest PAB reuse range — at a fraction of
        the full cache's HBM, which lets ALL levels cache on one chip."""
        cfg = self.config

        def block_marker(only_cross: bool):
            if kinds is None:
                return {}  # {} = collect every kind (original behavior)
            marker = {}
            if ("cross" if only_cross else "spatial") in kinds:
                marker["attn1"] = ()
            if "cross" in kinds:
                marker["attn2"] = ()
            if "temporal" in kinds:
                marker["attn_temporal"] = ()
            return marker

        skip = set(skip)
        cache = {}
        for i, bt in enumerate(cfg.down_block_types):
            if bt == "CrossAttnDownBlock3D" and f"down_{i}" not in skip:
                cache[f"down_{i}"] = tuple(
                    (block_marker(cfg.only_cross_attention[i]),)
                    for _ in range(cfg.layers_per_block))
        if "mid" not in skip:
            cache["mid"] = ((block_marker(False),),)
        only_cross_up = list(reversed(cfg.only_cross_attention))
        for i, bt in enumerate(cfg.up_block_types):
            if bt == "CrossAttnUpBlock3D" and f"up_{i}" not in skip:
                cache[f"up_{i}"] = tuple(
                    (block_marker(only_cross_up[i]),)
                    for _ in range(cfg.layers_per_block + 1))
        return cache

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,            # (B, T, H, W, 4) noisy latents
        timestep,                      # scalar or (B,)
        low_res: jax.Array,            # (B, T, H, W, 3) noised LR frames
        encoder_hidden_states: jax.Array,  # (B, S_txt, C_txt)
        class_labels,                  # noise level, scalar or (B,)
        attn_cache=None,               # PAB cache pytree (make_pab_collect_cache)
        use_flags=None,                # {"cross","spatial","temporal"}: traced bools
        cfg_dup: bool = False,         # CFG shared-prefix (see below)
    ):
        """``cfg_dup``: classifier-free guidance runs the UNet on a batch
        where each latent row appears twice — once against the uncond and
        once against the cond text (ref pipeline_upscale_a_video.py:614).
        Until the first cross-attention, the two rows compute *identical*
        values (level-0 blocks and temporal modules never see the text), so
        with ``cfg_dup=True`` the caller passes ``sample``/``low_res`` at
        batch n and ``encoder_hidden_states`` at batch 2n ordered
        ``[uncond×n, cond×n]``; the shared prefix runs at batch n and is
        duplicated (concat-of-halves) right before the first text-consuming
        block. Output batch is 2n in the same half order. Exact — tested
        equal to the duplicated-batch call."""
        cfg = self.config
        dt = self.dtype
        want_cache = attn_cache is not None
        new_cache = {}

        sample = jnp.concatenate([sample, low_res], axis=-1)
        b = sample.shape[0]
        if cfg_dup:
            assert encoder_hidden_states.shape[0] == 2 * b, (
                "cfg_dup expects ctx batch 2n for sample batch n")
        tiled = not cfg_dup
        _dup = lambda x: jnp.concatenate([x, x], axis=0)

        # time + noise-level embedding
        timesteps = jnp.broadcast_to(jnp.asarray(timestep).reshape(-1), (b,))
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        if dt is not None:
            t_emb = t_emb.astype(dt)
        time_embed_dim = cfg.block_out_channels[0] * 4
        emb = TimestepEmbedding(time_embed_dim, dtype=dt, param_dtype=self.param_dtype,
                                name="time_embedding")(t_emb)

        if cfg.num_class_embeds is not None:
            labels = jnp.broadcast_to(jnp.asarray(class_labels).reshape(-1), (b,))
            class_emb = nn.Embed(
                cfg.num_class_embeds, time_embed_dim, dtype=dt,
                param_dtype=self.param_dtype, name="class_embedding",
            )(labels.astype(jnp.int32))
            emb = emb + class_emb

        ctx = encoder_hidden_states if dt is None else encoder_hidden_states.astype(dt)
        if dt is not None:
            sample = sample.astype(dt)

        # conv_in
        sample = InflatedConv(
            cfg.block_out_channels[0], (3, 3), dtype=dt, param_dtype=self.param_dtype,
            name="conv_in",
        )(sample)

        n_blocks = len(cfg.down_block_types)
        temb_ch = time_embed_dim

        # down
        down_block_res_samples = (sample,)
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == n_blocks - 1
            if block_type == "CrossAttnDownBlock3D" and not tiled:
                # first text-consuming block: replicate the shared prefix
                sample = _dup(sample)
                emb = _dup(emb)
                down_block_res_samples = tuple(
                    _dup(r) for r in down_block_res_samples)
                tiled = True
            if block_type == "CrossAttnDownBlock3D":
                block = self._maybe_remat(CrossAttnDownBlock3D)(
                    in_channels=input_channel, out_channels=output_channel,
                    temb_channels=temb_ch, num_layers=cfg.layers_per_block,
                    resnet_eps=cfg.norm_eps, resnet_act_fn=cfg.act_fn,
                    resnet_groups=cfg.norm_num_groups,
                    attn_num_head_channels=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    downsample_padding=cfg.downsample_padding,
                    add_downsample=not is_final,
                    use_linear_projection=cfg.use_linear_projection,
                    only_cross_attention=cfg.only_cross_attention[i],
                    dtype=dt, param_dtype=self.param_dtype, name=f"down_blocks_{i}",
                )
                if want_cache and f"down_{i}" in attn_cache:
                    sample, res_samples, new_cache[f"down_{i}"] = block(
                        sample, emb, ctx, attn_cache[f"down_{i}"], use_flags)
                else:
                    sample, res_samples = block(sample, emb, ctx)
            elif block_type == "DownBlock3D":
                sample, res_samples = self._maybe_remat(DownBlock3D)(
                    in_channels=input_channel, out_channels=output_channel,
                    temb_channels=temb_ch, num_layers=cfg.layers_per_block,
                    resnet_eps=cfg.norm_eps, resnet_act_fn=cfg.act_fn,
                    resnet_groups=cfg.norm_num_groups,
                    downsample_padding=cfg.downsample_padding,
                    add_downsample=not is_final,
                    dtype=dt, param_dtype=self.param_dtype, name=f"down_blocks_{i}",
                )(sample, emb)
            else:
                raise ValueError(f"unknown down block {block_type}")
            down_block_res_samples += res_samples

            if i in cfg.down_temporal_idx:
                sample = self._maybe_remat(TemporalModule3D)(
                    in_channels=output_channel, temb_channels=temb_ch,
                    groups=min(32, cfg.norm_num_groups),
                    dtype=dt, param_dtype=self.param_dtype, name=f"down_temp_blocks_{i}",
                )(sample, emb)

        # mid
        if not tiled:  # config with no cross-attn down blocks
            sample = _dup(sample)
            emb = _dup(emb)
            down_block_res_samples = tuple(_dup(r) for r in down_block_res_samples)
            tiled = True
        mid_block = self._maybe_remat(UNetMidBlock3DCrossAttn)(
            in_channels=cfg.block_out_channels[-1], temb_channels=temb_ch,
            resnet_eps=cfg.norm_eps, resnet_act_fn=cfg.act_fn,
            resnet_groups=cfg.norm_num_groups,
            attn_num_head_channels=cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            dtype=dt, param_dtype=self.param_dtype, name="mid_block",
        )
        if want_cache and "mid" in attn_cache:
            sample, new_cache["mid"] = mid_block(sample, emb, ctx,
                                                 attn_cache["mid"], use_flags)
        else:
            sample = mid_block(sample, emb, ctx)
        if cfg.mid_temporal:
            sample = self._maybe_remat(TemporalModule3D)(
                in_channels=cfg.block_out_channels[-1], temb_channels=temb_ch,
                groups=min(32, cfg.norm_num_groups),
                dtype=dt, param_dtype=self.param_dtype, name="mid_temp_block",
            )(sample, emb)

        # up
        reversed_boc = list(reversed(cfg.block_out_channels))
        only_cross = list(reversed(cfg.only_cross_attention))
        output_channel = reversed_boc[0]
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == n_blocks - 1
            prev_output_channel = output_channel
            output_channel = reversed_boc[i]
            input_channel = reversed_boc[min(i + 1, n_blocks - 1)]
            num_layers = cfg.layers_per_block + 1

            res_samples = down_block_res_samples[-num_layers:]
            down_block_res_samples = down_block_res_samples[:-num_layers]

            # Forced upsample size when spatial dims aren't /8-divisible: the
            # next skip connection's (H, W) (static at trace time;
            # ref unet_video.py:541-542).
            upsample_size = None
            if not is_final and down_block_res_samples:
                upsample_size = down_block_res_samples[-1].shape[2:4]

            if block_type == "CrossAttnUpBlock3D":
                block = self._maybe_remat(CrossAttnUpBlock3D, static_argnums=(5,))(
                    in_channels=input_channel, out_channels=output_channel,
                    prev_output_channel=prev_output_channel, temb_channels=temb_ch,
                    num_layers=num_layers, resnet_eps=cfg.norm_eps,
                    resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
                    attn_num_head_channels=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_upsample=not is_final,
                    use_linear_projection=cfg.use_linear_projection,
                    only_cross_attention=only_cross[i],
                    dtype=dt, param_dtype=self.param_dtype, name=f"up_blocks_{i}",
                )
                if want_cache and f"up_{i}" in attn_cache:
                    sample, new_cache[f"up_{i}"] = block(
                        sample, res_samples, emb, ctx, upsample_size,
                        attn_cache[f"up_{i}"], use_flags)
                else:
                    sample = block(sample, res_samples, emb, ctx, upsample_size)
            elif block_type == "UpBlock3D":
                sample = self._maybe_remat(UpBlock3D, static_argnums=(4,))(
                    in_channels=input_channel, out_channels=output_channel,
                    prev_output_channel=prev_output_channel, temb_channels=temb_ch,
                    num_layers=num_layers, resnet_eps=cfg.norm_eps,
                    resnet_act_fn=cfg.act_fn, resnet_groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    dtype=dt, param_dtype=self.param_dtype, name=f"up_blocks_{i}",
                )(sample, res_samples, emb, upsample_size)
            else:
                raise ValueError(f"unknown up block {block_type}")

            if i in cfg.up_temporal_idx:
                sample = self._maybe_remat(TemporalModule3D)(
                    in_channels=output_channel, temb_channels=temb_ch,
                    groups=min(32, cfg.norm_num_groups),
                    dtype=dt, param_dtype=self.param_dtype, name=f"up_temp_blocks_{i}",
                )(sample, emb)

        # out head
        sample = nn.GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=dt,
            param_dtype=self.param_dtype, name="conv_norm_out",
        )(sample)
        sample = jax.nn.silu(sample)
        sample = InflatedConv(
            cfg.out_channels, (3, 3), dtype=dt, param_dtype=self.param_dtype, name="conv_out"
        )(sample)
        if want_cache:
            return sample, new_cache
        return sample
