"""RAFT optical flow in JAX (ref `/root/reference/models_video/RAFT/`).

The released VSR path uses the full-size RAFT ("raft-things", small=False):
feature/context encoders (extractor.py:118), all-pairs 4-level correlation
pyramid (corr.py:12-60), and 20 iterations of a SepConvGRU update block
(update.py:114) with convex ×8 flow upsampling (raft.py:73-84). RAFT runs
frozen in fp32 (raft_bi.py:25,41-42).

TPU design notes:
- channels-last NHWC; the GRU refinement is a ``lax.scan`` (sequential by
  nature, stays on-chip; 20 iterations compile to one loop).
- The correlation volume is a plain batched matmul (MXU); the pyramid lookup
  is the gather-based ``grid_sample`` op (ops/warp.py) over (B·H·W) tiny
  windows — bandwidth-bound, no custom kernel needed (SURVEY §2.11 N6).
- BatchNorm appears only frozen (cnet); it is folded into a
  ``FrozenBatchNorm`` affine whose statistics convert from the torch
  running_mean/var buffers.
- ``resize_flow``: the reference's resize_flow_pytorch (raft_bi.py:11-16)
  contains a latent indexing bug (`flow[:, :, 0]` scales spatial row 0, not
  the x-channel) that is dormant because inputs are pre-padded to /8; we
  implement the intended semantics (x scaled by W/W', y by H/H').
"""

from __future__ import annotations

import dataclasses
from math import ceil
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_2d
from ..ops.warp import grid_sample


# ----------------------------------------------------------------- norms


class FrozenBatchNorm(nn.Module):
    """Inference-time BatchNorm: y = (x - mean)/sqrt(var+eps)·scale + bias,
    with all four tensors as parameters (converted from torch buffers)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        mean = self.param("mean", nn.initializers.zeros_init(), (self.features,))
        var = self.param("var", nn.initializers.ones_init(), (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def instance_norm(x, eps: float = 1e-5):
    """torch InstanceNorm2d(affine=False): per-sample per-channel over (H, W)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Norm(nn.Module):
    kind: str  # "instance" | "batch" | "none" | "group"
    features: int

    @nn.compact
    def __call__(self, x):
        if self.kind == "batch":
            return FrozenBatchNorm(self.features, name="bn")(x)
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "group":
            return nn.GroupNorm(num_groups=self.features // 8, name="gn")(x)
        return x


# ------------------------------------------------------------- extractor


class ResidualBlock(nn.Module):
    """ref extractor.py:6-56."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(f, (k, k), strides=(s, s), padding="SAME" if s == 1 else ((1, 1), (1, 1)), name=name)
        y = conv(self.planes, 3, self.stride, "conv1")(x)
        y = _Norm(self.norm_fn, self.planes, name="norm1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding="SAME", name="conv2")(y)
        y = _Norm(self.norm_fn, self.planes, name="norm2")(y)
        y = jax.nn.relu(y)

        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        name="downsample_0")(x)
            x = _Norm(self.norm_fn, self.planes, name="norm3")(x)
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """ref extractor.py:118-192. 3ch → output_dim at 1/8 resolution."""

    output_dim: int = 256
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        # conv1: k=7 s=2 p=3 → torch pads (3,3); flax needs explicit to match
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), name="conv1")(x)
        x = _Norm(self.norm_fn, 64, name="norm1")(x)
        x = jax.nn.relu(x)

        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], start=1):
            x = ResidualBlock(dim, self.norm_fn, stride, name=f"layer{i}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(x)

        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class BottleneckBlock(nn.Module):
    """ref extractor.py:60-116 (small encoder's residual unit)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        p4 = self.planes // 4
        y = nn.Conv(p4, (1, 1), name="conv1")(x)
        y = _Norm(self.norm_fn, p4, name="norm1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(p4, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), name="conv2")(y)
        y = _Norm(self.norm_fn, p4, name="norm2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (1, 1), name="conv3")(y)
        y = _Norm(self.norm_fn, self.planes, name="norm3")(y)
        y = jax.nn.relu(y)
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        name="downsample_0")(x)
            x = _Norm(self.norm_fn, self.planes, name="norm4")(x)
        return jax.nn.relu(x + y)


class SmallEncoder(nn.Module):
    """ref extractor.py:195-267: 32/64/96 bottleneck stages."""

    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    name="conv1")(x)
        x = _Norm(self.norm_fn, 32, name="norm1")(x)
        x = jax.nn.relu(x)
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)], start=1):
            x = BottleneckBlock(dim, self.norm_fn, stride, name=f"layer{i}_0")(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


# ------------------------------------------------------------ update block


class FlowHead(nn.Module):
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", name="conv1")(x)
        return nn.Conv(2, (3, 3), padding="SAME", name="conv2")(jax.nn.relu(x))


class SepConvGRU(nn.Module):
    """ref update.py:33-60: horizontal then vertical 1-D conv GRU."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        def gru(h, x, ks, pad, suffix):
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(nn.Conv(self.hidden_dim, ks, padding=pad,
                                       name=f"convz{suffix}")(hx))
            r = jax.nn.sigmoid(nn.Conv(self.hidden_dim, ks, padding=pad,
                                       name=f"convr{suffix}")(hx))
            q = jnp.tanh(nn.Conv(self.hidden_dim, ks, padding=pad, name=f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            return (1 - z) * h + z * q

        h = gru(h, x, (1, 5), ((0, 0), (2, 2)), "1")
        h = gru(h, x, (5, 1), ((2, 2), (0, 0)), "2")
        return h


class BasicMotionEncoder(nn.Module):
    """ref update.py:79-97."""

    corr_levels: int = 4
    corr_radius: int = 4

    @nn.compact
    def __call__(self, flow, corr):
        cor = jax.nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        cor = jax.nn.relu(nn.Conv(192, (3, 3), padding="SAME", name="convc2")(cor))
        flo = jax.nn.relu(nn.Conv(128, (7, 7), padding="SAME", name="convf1")(flow))
        flo = jax.nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="convf2")(flo))
        # named conv_ to dodge the converter's conv-wrapper drop rule
        out = jax.nn.relu(nn.Conv(126, (3, 3), padding="SAME", name="conv_")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """ref update.py:114-136."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, inp)
        delta_flow = FlowHead(256, name="flow_head")(net)
        mask = nn.Conv(256, (3, 3), padding="SAME", name="mask_0")(net)
        mask = nn.Conv(64 * 9, (1, 1), name="mask_2")(jax.nn.relu(mask))
        return net, 0.25 * mask, delta_flow


class ConvGRU(nn.Module):
    """ref update.py:16-31 (small update block's GRU)."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding="SAME",
                                   name="convz")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding="SAME",
                                   name="convr")(hx))
        q = jnp.tanh(nn.Conv(self.hidden_dim, (3, 3), padding="SAME", name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    """ref update.py:62-77 (corr_levels=4, radius=3 → 196 corr planes)."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = jax.nn.relu(nn.Conv(96, (1, 1), name="convc1")(corr))
        flo = jax.nn.relu(nn.Conv(64, (7, 7), padding="SAME", name="convf1")(flow))
        flo = jax.nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="convf2")(flo))
        out = jax.nn.relu(nn.Conv(80, (3, 3), padding="SAME", name="conv_")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class SmallUpdateBlock(nn.Module):
    """ref update.py:99-112: no convex-upsample mask (bilinear ×8 instead)."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, name="gru")(net, inp)
        delta_flow = FlowHead(128, name="flow_head")(net)
        return net, None, delta_flow


# ------------------------------------------------------------- correlation


def build_corr_pyramid(fmap1, fmap2, num_levels: int = 4):
    """All-pairs correlation pyramid (ref corr.py:12-27,52-60).

    fmap: (B, H, W, C). Returns list of (B·H·W, h_i, w_i, 1)."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bic,bjc->bij", f1, f2,
                      preferred_element_type=jnp.float32) / np.sqrt(c)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords, radius: int = 4):
    """Sample (2r+1)² windows at each pyramid level (ref corr.py:29-50).

    coords: (B, H, W, 2) pixel coords at level 0. Returns (B, H, W, L·(2r+1)²)."""
    b, h, w, _ = coords.shape
    r = radius
    # NB: the reference stacks meshgrid(dy, dx) and adds it to (x, y) coords
    # unflipped (corr.py:37-43) — the row-varying offset lands on x. The
    # window is symmetric so coverage is identical, but the *channel order*
    # of the 81 samples follows this convention and the trained motion-encoder
    # weights depend on it; we replicate it exactly.
    lin = jnp.linspace(-r, r, 2 * r + 1)
    d0, d1 = jnp.meshgrid(lin, lin, indexing="ij")
    delta = jnp.stack([d0, d1], axis=-1)  # [...,0] added to x, [...,1] to y

    out = []
    for i, corr in enumerate(pyramid):
        hi, wi = corr.shape[1:3]
        centroid = coords.reshape(b * h * w, 1, 1, 2) / (2**i)
        coords_lvl = centroid + delta[None]
        # normalize to [-1,1], align_corners=True (ref utils.py:57-65)
        gx = 2 * coords_lvl[..., 0] / max(wi - 1, 1) - 1
        gy = 2 * coords_lvl[..., 1] / max(hi - 1, 1) - 1
        grid = jnp.stack([gx, gy], axis=-1)
        sampled = grid_sample(corr, grid, mode="bilinear", align_corners=True)
        out.append(sampled.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


# ------------------------------------------------------------------ model


class RAFT(nn.Module):
    """RAFT (ref raft.py:24-56). Default = full size ("raft-things":
    hdim=cdim=128, radius 4, convex upsampling); ``small=True`` builds the
    bottleneck variant (hdim 96, cdim 64, radius 3, bilinear ×8 upsampling)."""

    small: bool = False
    hidden_dim: Optional[int] = None
    context_dim: Optional[int] = None
    corr_levels: int = 4
    corr_radius: Optional[int] = None

    @property
    def _hdim(self):
        return self.hidden_dim or (96 if self.small else 128)

    @property
    def _cdim(self):
        return self.context_dim or (64 if self.small else 128)

    @property
    def _radius(self):
        return self.corr_radius or (3 if self.small else 4)

    def setup(self):
        if self.small:
            self.fnet = SmallEncoder(output_dim=128, norm_fn="instance")
            self.cnet = SmallEncoder(output_dim=self._hdim + self._cdim,
                                     norm_fn="none")
            self.update_block = SmallUpdateBlock(self._hdim)
        else:
            self.fnet = BasicEncoder(output_dim=256, norm_fn="instance")
            self.cnet = BasicEncoder(output_dim=self._hdim + self._cdim,
                                     norm_fn="batch")
            self.update_block = BasicUpdateBlock(self._hdim)

    def upsample_flow(self, flow, mask):
        """Convex ×8 upsampling (ref raft.py:73-84). flow (B,h,w,2), mask (B,h,w,576)."""
        b, h, w, _ = flow.shape
        mask = mask.reshape(b, h, w, 9, 8, 8)
        mask = jax.nn.softmax(mask, axis=3)

        # 3×3 neighborhoods of 8*flow (zero padded), matching F.unfold(k=3, p=1):
        # patch ordering row-major (dy, dx) ∈ {-1,0,1}²
        fp = jnp.pad(8 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.stack(
            [fp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w] for dy in (-1, 0, 1)
             for dx in (-1, 0, 1)],
            axis=3,
        )  # (B, h, w, 9, 2)
        up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, patches)
        # (B, h, w, 8, 8, 2) → (B, 8h, 8w, 2)
        return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)

    def __call__(self, image1, image2, iters: int = 20):
        """image1/2: (B, H, W, 3) in [-1, 1], H,W divisible by 8.
        Returns flow at full res (B, H, W, 2)."""
        fmap1 = self.fnet(image1).astype(jnp.float32)
        fmap2 = self.fnet(image2).astype(jnp.float32)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = self.cnet(image1)
        net, inp = jnp.split(cnet, [self._hdim], axis=-1)
        net = jnp.tanh(net)
        inp = jax.nn.relu(inp)

        b, h8, w8, _ = fmap1.shape
        xx = jnp.arange(w8, dtype=jnp.float32)
        yy = jnp.arange(h8, dtype=jnp.float32)
        coords0 = jnp.stack(jnp.meshgrid(xx, yy, indexing="xy"), axis=-1)[None]
        coords0 = jnp.broadcast_to(coords0, (b, h8, w8, 2))
        coords1 = coords0

        def step(update_block, carry, _):
            net, coords1 = carry
            corr = lookup_corr(pyramid, coords1, self._radius)
            flow = coords1 - coords0
            net, up_mask, delta = update_block(net, inp, corr, flow)
            if up_mask is None:  # small variant: no convex mask
                up_mask = jnp.zeros((1,), jnp.float32)
            return (net, coords1 + delta), up_mask

        # lifted scan: params broadcast across the 20 iterations
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, length=iters)
        (net, coords1), up_masks = scan(self.update_block, (net, coords1), None)
        flow = coords1 - coords0
        if self.small:
            # upflow8: bilinear ×8 with magnitudes ×8 (ref utils/utils.py:80-82,
            # align_corners=True)
            h8, w8 = flow.shape[1:3]
            return 8.0 * resize_2d(flow, (8 * h8, 8 * w8), "bilinear",
                                   align_corners=True)
        return self.upsample_flow(flow, up_masks[-1])


# ----------------------------------------------------------- bi wrapper


@dataclasses.dataclass
class RaftRunner:
    model: RAFT
    params: Optional[dict]
    iters: int = 20

    def _flow_fn(self):
        # params as a jit ARGUMENT (a closure would embed them as HLO consts)
        jfn = jax.jit(
            lambda params, i1, i2: self.model.apply(params, i1, i2, self.iters)
        )
        params = self.params
        return lambda i1, i2: jfn(params, i1, i2)


def load_raft(model_path: Optional[str], iters: int = 20) -> RaftRunner:
    """Build RAFT; convert raft-things.pth when available, else random init."""
    model = RAFT()
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = model.init(key, dummy, dummy, 1)
    if model_path:
        from ..utils.convert import convert_state_dict, load_torch_state

        sd = load_torch_state(model_path)
        # strip the DataParallel "module." prefix (ref raft_bi.py:27-29)
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        params = {"params": convert_state_dict(
            params["params"], sd, renames=RAFT_RENAMES)[0]}
    return RaftRunner(model=model, params=params, iters=iters)


# torch keys: fnet.layer1.0.conv1..., update_block.mask.0/2, norms are bare
# (norm1.weight → FrozenBatchNorm under "bn")
RAFT_RENAMES = {
    # FrozenBatchNorm params → torch BN buffers (leaf renames happen first:
    # scale already became weight by the generic rule)
    ".bn.mean": ".running_mean", ".bn.var": ".running_var",
    ".bn.weight": ".weight", ".bn.bias": ".bias",
    "conv_.weight": "conv.weight", "conv_.bias": "conv.bias",
}


def resize_flow(flow: jax.Array, newh: int, neww: int) -> jax.Array:
    """Bilinear flow resize with magnitude rescaling (intended semantics of
    raft_bi.py:11-16; see module docstring on the reference's dormant bug)."""
    oldh, oldw = flow.shape[-3:-1]
    flow = resize_2d(flow, (newh, neww), "bilinear")
    scale = jnp.asarray([neww / oldw, newh / oldh], dtype=flow.dtype)
    return flow * scale


def compute_flow_pair(runner: RaftRunner, frames: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """frames: (B, T, H, W, 3) in [-1,1] → (fwd, bwd) flows (B, T-1, H, W, 2)
    (ref raft_bi.py:47-68)."""
    b, t, h, w, _ = frames.shape
    h8 = int(ceil(h / 8) * 8)
    w8 = int(ceil(w / 8) * 8)
    frames8 = resize_2d(frames, (h8, w8), "bilinear") if (h8, w8) != (h, w) else frames

    f1 = frames8[:, :-1].reshape(b * (t - 1), h8, w8, 3)
    f2 = frames8[:, 1:].reshape(b * (t - 1), h8, w8, 3)
    flow_fn = runner._flow_fn()
    fwd = flow_fn(f1, f2)
    bwd = flow_fn(f2, f1)
    if (h8, w8) != (h, w):
        fwd = resize_flow(fwd, h, w)
        bwd = resize_flow(bwd, h, w)
    return (fwd.reshape(b, t - 1, h, w, 2), bwd.reshape(b, t - 1, h, w, 2))


def compute_bidirectional_flows(
    runner: RaftRunner, frames: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Clip-sliced bidirectional flow (ref raft_bi.py:71-104): clip length by
    width (≤640→12, ≤720→8, ≤1280→4, else 2), 1-frame overlap for continuity."""
    w = frames.shape[3]
    if w <= 640:
        clip = 12
    elif w <= 720:
        clip = 8
    elif w <= 1280:
        clip = 4
    else:
        clip = 2

    t = frames.shape[1]
    if t <= clip:
        return compute_flow_pair(runner, frames)

    fs, bs = [], []
    for f in range(0, t, clip):
        end_f = min(t, f + clip)
        start = f if f == 0 else f - 1
        ff, bb = compute_flow_pair(runner, frames[:, start:end_f])
        fs.append(ff)
        bs.append(bb)
    return jnp.concatenate(fs, axis=1), jnp.concatenate(bs, axis=1)
