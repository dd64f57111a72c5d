"""Core NN building blocks, channels-last ``(B, T, H, W, C)``.

Semantics mirror the reference primitives in
`/root/reference/models_video/resnet.py`, redesigned for TPU/XLA:

- The reference's ``InflatedConv3d`` (resnet.py:94-101) reshapes
  ``b c t h w -> (b t) c h w`` around an NCHW Conv2d. Here video tensors are
  already channels-last, so :class:`InflatedConv` is a single 2-D convolution
  with T folded into the batch — XLA maps it straight onto the MXU with no
  layout transposes.
- True temporal 3-D convs (kernels ``(k,1,1)`` / ``(3,3,3)``,
  resnet.py:332,348,461) become NDHWC ``lax.conv_general_dilated`` calls.
- GroupNorm over ``(C/g, T, H, W)`` per sample (torch 5-D GroupNorm semantics)
  is flax ``GroupNorm`` on the channels-last tensor.

Parameter naming follows the reference state-dict structure (conv1, norm1,
time_emb_proj, ...) so checkpoint conversion is a mechanical name map +
OIHW→HWIO transpose.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

default_kernel_init = nn.initializers.lecun_normal()


def _merge_bt(x: jax.Array) -> Tuple[jax.Array, int]:
    b, t = x.shape[0], x.shape[1]
    return x.reshape(b * t, *x.shape[2:]), t


def _split_bt(x: jax.Array, t: int) -> jax.Array:
    return x.reshape(x.shape[0] // t, t, *x.shape[1:])


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "mish":
        return mish
    if name == "gelu":
        return jax.nn.gelu
    raise ValueError(f"unknown activation {name!r}")


class FusedGroupNorm(nn.Module):
    """Drop-in for ``nn.GroupNorm`` (identical scale/bias params) that
    dispatches to the fused Pallas GroupNorm(+act) kernel on TPU
    (ops/fused_groupnorm.py). Off-TPU it computes the same math in plain XLA.

    NOT used in _ResnetCore: measured SLOWER end-to-end there (XLA fuses the
    GN+SiLU into neighboring ops better than a standalone 2-pass kernel).
    Kept for memory-constrained call sites where the fp32 score/stat
    intermediates matter more than fusion."""

    num_groups: int
    epsilon: float = 1e-6
    act: Optional[str] = None  # "silu" folds the activation into the kernel
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.fused_groupnorm import fused_group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          self.param_dtype)
        return fused_group_norm(x, scale, bias, self.num_groups,
                                eps=self.epsilon, act=self.act)


class LeanGroupNorm(nn.Module):
    """``nn.GroupNorm`` twin (same "scale"/"bias" params, same f32 stats
    math) that never materializes an f32 copy of the activation.

    flax's GroupNorm upcasts x to f32 once and feeds that tensor to the two
    stat reduces AND the normalize — at 320² the upcast is a 0.8 GB HBM
    write + reread (op trace: standalone `convert` ops at every
    Transformer3D entry norm). Here the two reduces carry their own
    f32 accumulation (XLA fuses the convert into the reduce) and the
    normalize is a single bf16→bf16 elementwise pass with per-(sample,
    channel) f32 a/b folded in, which XLA fuses into the consumer matmul.

    Stats are per sample over ALL non-channel axes (torch GroupNorm
    semantics, same as the flax module it replaces)."""

    num_groups: int
    epsilon: float = 1e-6
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        gs = c // g
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          self.param_dtype)
        n = x.shape[0]
        xg = x.reshape(n, -1, g, gs)
        # Two one-pass reduces with f32 accumulation; mean/var algebra
        # matches flax _compute_stats (var = E[x²] − E[x]²).
        mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)          # (n, g)
        m2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
        var = m2 - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + self.epsilon)                     # (n, g)
        s32 = scale.astype(jnp.float32).reshape(g, gs)
        b32 = bias.astype(jnp.float32).reshape(g, gs)
        a = (rstd[:, :, None] * s32[None]).reshape(n, 1, c)          # (n,1,c)
        off = (b32[None] - mean[:, :, None] * rstd[:, :, None] * s32[None]
               ).reshape(n, 1, c)
        flat = x.reshape(n, -1, c)
        y = flat.astype(jnp.float32) * a + off
        return y.astype(self.dtype or x.dtype).reshape(x.shape)


class InflatedConv(nn.Module):
    """Per-frame 2-D convolution on (B, T, H, W, C) video tensors.

    Equivalent to the reference InflatedConv3d (resnet.py:94-101).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5, f"expected (B,T,H,W,C), got {x.shape}"
        flat, t = _merge_bt(x)
        out = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(flat)
        return _split_bt(out, t)


class _Conv3DParams(nn.Module):
    """Param-only twin of nn.Conv (same kernel/bias names under the same
    scope) so TemporalConv can route to the Pallas temporal-conv kernel
    without changing the checkpoint structure."""

    features: int
    kernel_size: Tuple[int, int, int]
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, in_features: int):
        shape = (*self.kernel_size, in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, shape, self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        return kernel, bias


class TemporalConv(nn.Module):
    """True 3-D convolution over (T, H, W) on channels-last video tensors.

    Used for the reference's nn.Conv3d with kernels (k,1,1)/(3,3,3)
    (resnet.py:332,348,461).
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 1, 1)
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5
        # NB: routing (k,1,1) kernels through the Pallas shifted-block conv
        # (ops/temporal_conv.py) is 1.6× faster STANDALONE (5.96 vs 9.73 ms
        # at L0) but was MEASURED SLOWER end-to-end (0.250 → 0.226 fps):
        # the opaque pallas_call boundary defeats XLA's fusion of the
        # surrounding GN/SiLU/residual elementwise work into the conv.
        # Keep nn.Conv here; the kernel remains available for standalone use.
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size)
        return nn.Conv(
            self.features,
            self.kernel_size,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class _SubpixUpConv(nn.Module):
    """3×3 SAME conv over a nearest-×2-upsampled input, computed WITHOUT
    materializing the ×4-size intermediate (same "conv/kernel"+"conv/bias"
    params as ``InflatedConv``'s inner ``nn.Conv``, so checkpoints are
    unchanged).

    Nearest ×2 duplicates each source pixel into a 2×2 block, so every
    output pixel's 3×3 window only touches 2×2 DISTINCT sources; taps that
    alias onto the same source fold into one coefficient (exact weight
    algebra). Per output parity (pr, pc):

        rows:  even → [K0, K1+K2] over sources (m-1, m)
               odd  → [K0+K1, K2] over sources (m, m+1)
        (cols identical), giving four 2×2 kernels run as ONE 2×2 conv with
        4·C_out channels on the SMALL input, then a parity interleave.

    vs conv-on-upsampled: 16·H·W·Ci·Co MACs instead of 36·H·W·Ci·Co
    (2.25× fewer — the duplicated-pixel multiplies vanish) and the
    (2H, 2W) input buffer is never written. Used for the hot ×2 path in
    both the UNet and VAE-decoder upsamplers; kill switch
    ``UAV_NO_SUBPIX_UP`` restores the naive route for A/B."""

    features: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, naive: bool = False) -> jax.Array:
        assert x.ndim == 5
        b, t, h, w, c = x.shape
        kernel, bias = _Conv3DParams(
            features=self.features, kernel_size=(3, 3), use_bias=True,
            kernel_init=nn.initializers.lecun_normal(),
            bias_init=nn.initializers.zeros_init(),
            param_dtype=self.param_dtype, name="conv",
        )(c)
        dt = self.dtype or x.dtype
        flat = x.reshape(b * t, h, w, c).astype(dt)
        if naive or os.environ.get("UAV_NO_SUBPIX_UP"):
            up = jnp.broadcast_to(flat[:, :, None, :, None, :],
                                  (b * t, h, 2, w, 2, c)
                                  ).reshape(b * t, 2 * h, 2 * w, c)
            y = jax.lax.conv_general_dilated(
                up, kernel.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bias.astype(dt)
            return y.reshape(b, t, 2 * h, 2 * w, self.features)
        # Emit the fold as ONE transposed conv (lhs_dilation=2, 4×4 kernel)
        # writing the interleaved output directly — no (H+1, W+1, 4·Co)
        # intermediate and no stack/transpose round-trips. The earlier
        # 2×2-conv + parity-interleave emission of the same algebra held ~3
        # live copies of that intermediate; at the fp32 decoder's 640²→1280²
        # stage that was ~15 GiB transient on a 15.75 GiB chip (the
        # BENCH_r03 RESOURCE_EXHAUSTED) — and it was slower, too
        # (scripts/ab_subpix.py: 49.9 ms vs 90.5 folded vs 80.0 naive fp32
        # at that stage; 41.9 vs 71.2 vs 83.0 bf16 at the UNet's 160²→320²).
        #
        # Cross-correlation with lhs_dilation=2, pad (2, 2), per dimension:
        #   out[i] = Σ_a d[i+a-2]·W4[a]  with  d[2j] = in[j]
        #   i=2m   → a∈{0,2}: W4[0]=K0,    W4[2]=K1+K2   (sources m-1, m)
        #   i=2m+1 → a∈{1,3}: W4[1]=K0+K1, W4[3]=K2      (sources m, m+1)
        k = kernel  # (3, 3, Ci, Co), param dtype (fp32) — fold exactly

        def taps(kd):
            return [kd[0], kd[0] + kd[1], kd[1] + kd[2], kd[2]]

        k4 = jnp.stack([jnp.stack(taps(r), 0) for r in taps(k)], 0)
        z = jax.lax.conv_general_dilated(
            flat, k4.astype(dt), (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (BT, 2H, 2W, Co)
        z = z + bias.astype(dt)
        return z.reshape(b, t, 2 * h, 2 * w, self.features)


class Upsample3D(nn.Module):
    """Nearest ×2 spatial upsample + 3×3 conv (ref resnet.py:104-158).

    ``output_size`` (H, W) overrides the ×2 factor, matching the reference's
    upsample-size forcing for non-/8-divisible inputs (unet_video.py:433-443).
    bf16 is fine on TPU — the reference's fp32 cast (resnet.py:132-135) was a
    CUDA kernel limitation we drop. The exact-×2 + conv path runs as a
    folded subpixel conv (see ``_SubpixUpConv``)."""

    channels: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, output_size: Optional[Tuple[int, int]] = None) -> jax.Array:
        b, t, h, w, c = x.shape
        if output_size is None:
            nh, nw = h * 2, w * 2
        else:
            nh, nw = output_size
        if (nh, nw) == (2 * h, 2 * w) and self.use_conv:
            # fused ×2-upsample+conv; identical "conv/conv" param scope
            return _SubpixUpConv(
                features=self.channels, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv")(x)
        # nearest-neighbor: exact match to F.interpolate(mode="nearest")
        if (nh, nw) == (2 * h, 2 * w):
            # broadcast+reshape (out[2i]=out[2i+1]=in[i] ≡ floor(j/2) index):
            # pure layout ops — the integer-gather form lowers to serial
            # per-row while loops on TPU (~14 ms/step measured at 320²)
            x = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                                 (b, t, h, 2, w, 2, c)).reshape(b, t, nh, nw, c)
        else:
            rows = np.asarray((np.arange(nh) * h // nh), np.int32)
            cols = np.asarray((np.arange(nw) * w // nw), np.int32)
            x = x[:, :, rows][:, :, :, cols]
        if self.use_conv:
            x = InflatedConv(
                self.channels, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype, name="conv"
            )(x)
        return x


class Downsample3D(nn.Module):
    """Stride-2 3×3 conv downsample (ref resnet.py:161-197).

    ``padding=1`` → symmetric SAME-like pad; ``padding=0`` → asymmetric
    (0,1,0,1) pad, as used by the VAE encoder (downsample_padding=0).
    """

    channels: int
    use_conv: bool = True
    padding: int = 1
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            if self.padding == 0:
                pad = ((0, 1), (0, 1))
            else:
                pad = ((self.padding, self.padding), (self.padding, self.padding))
            return InflatedConv(
                self.channels,
                (3, 3),
                strides=(2, 2),
                padding=pad,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        # avg-pool path (unused in released configs)
        flat, t = _merge_bt(x)
        out = nn.avg_pool(flat, (2, 2), strides=(2, 2))
        return _split_bt(out, t)


class TimestepEmbedding(nn.Module):
    """2-layer MLP on the sinusoidal timestep features (diffusers TimestepEmbedding,
    ref unet_video.py:176)."""

    time_embed_dim: int
    act: str = "silu"
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1"
        )(sample)
        sample = get_activation(self.act)(sample)
        sample = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2"
        )(sample)
        return sample


class _GNParams(nn.Module):
    """Param-only twin of nn.GroupNorm (same scale/bias names under the same
    scope) so the fused-resblock path keeps the checkpoint tree unchanged."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        return scale, bias


class _TemporalConvParams(nn.Module):
    """Param-only twin of TemporalConv (kernel/bias under <name>/conv)."""

    features: int
    kernel_size: Tuple[int, int, int]
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        return _Conv3DParams(
            features=self.features, kernel_size=self.kernel_size,
            use_bias=True, kernel_init=default_kernel_init,
            bias_init=nn.initializers.zeros_init(),
            param_dtype=self.param_dtype, name="conv",
        )(in_features)


class _DenseParams(nn.Module):
    """Param-only twin of nn.Dense."""

    features: int
    param_dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        return kernel, bias


class _ResnetCore(nn.Module):
    """Shared GN-act-conv ×2 + temb + shortcut skeleton of the three resblock
    variants (ref resnet.py:200-294,297-393,396-499). The conv constructor is
    parameterized so ResnetBlock3D uses inflated 2-D convs while
    ResnetBlock3DCNN uses temporal 3-D convs.

    On TPU the temporal variant (in==out channels, default temb norm) routes
    to the fused Pallas resblock (ops/fused_temporal_resblock.py) — same math
    and the same parameter tree, ~3× fewer HBM passes and dense-GEMM MXU
    utilization on the (k,1,1) convs."""

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: Optional[int] = 512
    groups: int = 32
    groups_out: Optional[int] = None
    eps: float = 1e-6
    non_linearity: str = "swish"
    time_embedding_norm: str = "default"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    conv_kind: str = "inflated"  # "inflated" | "temporal"
    temporal_kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def _conv(self, features: int, name: str, first: bool):
        if self.conv_kind == "inflated":
            return InflatedConv(
                features, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )
        # 3DCNN variant: conv1 uses the configured kernel, conv2 is (3,1,1)
        kernel = self.temporal_kernel if first else (3, 1, 1)
        return TemporalConv(
            features, kernel, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

    def _shortcut(self, features: int, name: str):
        if self.conv_kind == "inflated":
            return InflatedConv(
                features, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )
        return TemporalConv(
            features, (1, 1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

    def _use_fused(self, x: jax.Array, temb) -> bool:
        from ..ops.fused_temporal_resblock import fused_resblock_fits

        out_ch = self.out_channels or self.in_channels
        groups_out = self.groups_out or self.groups
        use_sc = (self.in_channels != out_ch if self.use_in_shortcut is None
                  else self.use_in_shortcut)
        import os

        return (
            self.conv_kind == "temporal"
            and out_ch == self.in_channels
            and not use_sc
            and self.time_embedding_norm == "default"
            and self.output_scale_factor == 1.0
            and self.non_linearity in ("swish", "silu")
            and (jax.devices()[0].platform == "tpu"
                 or os.environ.get("UAV_FORCE_FUSED_RESBLOCK"))
            and fused_resblock_fits(x.shape, self.groups, groups_out)
            and not os.environ.get("UAV_NO_FUSED_RESBLOCK")
        )

    def _fused_call(self, x: jax.Array, temb) -> jax.Array:
        """Fused Pallas path: identical math + identical param tree."""
        from ..ops.fused_temporal_resblock import fused_temporal_resblock

        c = self.in_channels
        groups_out = self.groups_out or self.groups
        n1_scale, n1_bias = _GNParams(c, self.param_dtype, name="norm1")()
        w1, b1 = _TemporalConvParams(c, self.temporal_kernel,
                                     self.param_dtype, name="conv1")(c)
        temb_proj = None
        if temb is not None and self.temb_channels is not None:
            tk, tb = _DenseParams(c, self.param_dtype,
                                  name="time_emb_proj")(temb.shape[-1])
            act = get_activation(self.non_linearity)
            temb_proj = act(temb.astype(jnp.float32)) @ tk + tb
        n2_scale, n2_bias = _GNParams(c, self.param_dtype, name="norm2")()
        w2, b2 = _TemporalConvParams(c, (3, 1, 1),
                                     self.param_dtype, name="conv2")(c)
        return fused_temporal_resblock(
            x, n1_scale, n1_bias, w1, b1, temb_proj, n2_scale, n2_bias,
            w2, b2, groups=self.groups, groups2=groups_out, eps=self.eps,
            dtype=self.dtype or x.dtype,
        )

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        if self._use_fused(x, temb):
            return self._fused_call(x, temb)

        out_ch = self.out_channels or self.in_channels
        groups_out = self.groups_out or self.groups
        act = get_activation(self.non_linearity)

        # NB: routing these through the Pallas FusedGroupNorm was MEASURED
        # SLOWER end-to-end on v5e (0.250 → 0.185 fps at 256): XLA fuses the
        # normalize+SiLU into neighboring ops, which beats a standalone
        # 2-pass kernel. Keep flax GroupNorm here.
        h = nn.GroupNorm(
            num_groups=self.groups, epsilon=self.eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm1",
        )(x)
        h = act(h)
        h = self._conv(out_ch, "conv1", first=True)(h)

        temb_proj = None
        if temb is not None and self.temb_channels is not None:
            proj_out = out_ch * 2 if self.time_embedding_norm == "scale_shift" else out_ch
            temb_proj = nn.Dense(
                proj_out, dtype=self.dtype, param_dtype=self.param_dtype, name="time_emb_proj"
            )(act(temb))
            temb_proj = temb_proj[:, None, None, None, :]  # (B,1,1,1,C)

        if temb_proj is not None and self.time_embedding_norm == "default":
            h = h + temb_proj

        h = nn.GroupNorm(
            num_groups=groups_out, epsilon=self.eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm2",
        )(h)

        if temb_proj is not None and self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(temb_proj, 2, axis=-1)
            h = h * (1 + scale) + shift

        h = act(h)
        h = self._conv(out_ch, "conv2", first=False)(h)

        use_sc = (
            self.in_channels != out_ch if self.use_in_shortcut is None else self.use_in_shortcut
        )
        if use_sc:
            x = self._shortcut(out_ch, "conv_shortcut")(x)

        return (x + h) / self.output_scale_factor


class ResnetBlock3D(_ResnetCore):
    """Spatial resblock with inflated 2-D convs (ref resnet.py:200-294)."""

    conv_kind: str = "inflated"


class ResnetBlock3DCNN(_ResnetCore):
    """Temporal resblock with true 3-D convs, kernel (k,1,1)
    (ref resnet.py:297-393)."""

    conv_kind: str = "temporal"


class ResnetBlock3DPlus(nn.Module):
    """ResnetBlock3D + zero-initialized 3×3×3 Conv3d residual branch
    (ref resnet.py:396-499). Used by the video VAE decoder blocks."""

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: Optional[int] = 512
    groups: int = 32
    groups_out: Optional[int] = None
    eps: float = 1e-6
    non_linearity: str = "swish"
    time_embedding_norm: str = "default"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        out_ch = self.out_channels or self.in_channels
        groups_out = self.groups_out or self.groups
        act = get_activation(self.non_linearity)

        out = _ResnetCore(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            temb_channels=self.temb_channels,
            groups=self.groups,
            groups_out=self.groups_out,
            eps=self.eps,
            non_linearity=self.non_linearity,
            time_embedding_norm=self.time_embedding_norm,
            output_scale_factor=self.output_scale_factor,
            use_in_shortcut=self.use_in_shortcut,
            conv_kind="inflated",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="base",
        )(x, temb)

        h3 = nn.GroupNorm(
            num_groups=groups_out, epsilon=self.eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm_3d",
        )(out)
        h3 = act(h3)
        h3 = TemporalConv(
            out_ch,
            (3, 3, 3),
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_3d",
        )(h3)
        return (out + h3) / self.output_scale_factor


class FuseSFTBlock(nn.Module):
    """SFT (scale/shift) fusion of the LR-condition features into decoder
    features (ref resnet.py:63-79): two shared resblocks on concat(enc, dec),
    then learned scale & shift applied to dec with weight ``w``."""

    enc_channels: int
    dec_channels: int
    groups: int = 32
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_feat: jax.Array, dec_feat: jax.Array, w: float = 1.0) -> jax.Array:
        h = jnp.concatenate([enc_feat, dec_feat], axis=-1)
        h = ResnetBlock3D(
            in_channels=self.enc_channels + self.dec_channels,
            out_channels=self.dec_channels,
            temb_channels=None,
            groups=self.groups,
            groups_out=self.groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="shared_0",
        )(h)
        h = ResnetBlock3D(
            in_channels=self.dec_channels,
            out_channels=self.dec_channels,
            temb_channels=None,
            groups=self.groups,
            groups_out=self.groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="shared_1",
        )(h)
        scale = InflatedConv(
            self.dec_channels, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype, name="scale"
        )(h)
        shift = InflatedConv(
            self.dec_channels, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype, name="shift"
        )(h)
        return dec_feat + w * (dec_feat * scale + shift)


def zero_init_conv_kwargs():
    return dict(kernel_init=nn.initializers.zeros_init(), bias_init=nn.initializers.zeros_init())
