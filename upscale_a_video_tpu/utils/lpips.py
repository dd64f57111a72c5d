"""LPIPS perceptual distance with in-repo AlexNet / VGG16 backbones.

The paper's quality gate is PSNR/SSIM/**LPIPS** on YouHQ40 (BASELINE.md); the
reference repo computes none of these in-tree. This module provides the full
LPIPS stack in flax/jnp:

- ``AlexNetFeatures`` / ``VGG16Features``: the torchvision feature trunks
  (channels-last, jnp), tapped at the five LPIPS layers.
- ``LPIPS``: Zhang et al.'s metric — input scaling layer, unit-normalized
  features, learned non-negative 1×1 "lin" weights, spatial mean, tap sum.
- ``convert_lpips_state``: strict converter from the ``lpips`` package's
  torch state dict (net.slice*.N.weight + lin*.model.1.weight) — the weights
  are an external asset; the architecture + converter are tested against a
  torch reimplementation with random weights (tests/test_lpips.py).

Inputs are (B, H, W, 3) RGB in [-1, 1] (LPIPS convention), channels-last.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips ScalingLayer constants (Zhang et al., lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _max_pool(x: jax.Array, window: int = 3, stride: int = 2) -> jax.Array:
    """torch MaxPool2d(kernel, stride, ceil_mode=False) == VALID floor."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID")


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.padding, self.padding)] * 2,
                       name="conv")(x)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features tapped at relu1..relu5
    (channels 64, 192, 384, 256, 256)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        x = nn.relu(_Conv(64, 11, 4, 2, name="conv1")(x))
        taps.append(x)
        x = _max_pool(x)
        x = nn.relu(_Conv(192, 5, 1, 2, name="conv2")(x))
        taps.append(x)
        x = _max_pool(x)
        x = nn.relu(_Conv(384, 3, 1, 1, name="conv3")(x))
        taps.append(x)
        x = nn.relu(_Conv(256, 3, 1, 1, name="conv4")(x))
        taps.append(x)
        x = nn.relu(_Conv(256, 3, 1, 1, name="conv5")(x))
        taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16.features tapped at relu1_2/2_2/3_3/4_3/5_3
    (channels 64, 128, 256, 512, 512)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        idx = 1
        for ch, reps in cfg:
            for _ in range(reps):
                x = nn.relu(_Conv(ch, 3, 1, 1, name=f"conv{idx}")(x))
                idx += 1
            taps.append(x)
            x = _max_pool(x, 2, 2)
        return taps


_CHANNELS = {"alex": (64, 192, 384, 256, 256),
             "vgg": (64, 128, 256, 512, 512)}


class LPIPS(nn.Module):
    """LPIPS(a, b) per batch element. net: 'alex' (paper default) or 'vgg'."""

    net: str = "alex"

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        trunk = (AlexNetFeatures(name="backbone") if self.net == "alex"
                 else VGG16Features(name="backbone"))
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def feats(x):
            x = (x.astype(jnp.float32) - shift) / scale
            return trunk(x)

        fa, fb = feats(a), feats(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(
                jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(
                jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(na - nb)
            w = self.param(f"lin{i}", nn.initializers.ones_init(),
                           (_CHANNELS[self.net][i],), jnp.float32)
            # lpips lin layer: 1x1 conv with non-negative weights, no bias
            d = jnp.sum(diff * w, axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


# ------------------------------------------------------------- conversion

_ALEX_SLICES = {  # lpips pkg: net.sliceK.IDX.weight → our convK
    "conv1": "slice1.0", "conv2": "slice2.3", "conv3": "slice3.6",
    "conv4": "slice4.8", "conv5": "slice5.10",
}
_VGG_SLICES = {  # vgg16.features indices per conv
    "conv1": "slice1.0", "conv2": "slice1.2",
    "conv3": "slice2.5", "conv4": "slice2.7",
    "conv5": "slice3.10", "conv6": "slice3.12", "conv7": "slice3.14",
    "conv8": "slice4.17", "conv9": "slice4.19", "conv10": "slice4.21",
    "conv11": "slice5.24", "conv12": "slice5.26", "conv13": "slice5.28",
}


def convert_lpips_state(torch_state: Dict[str, np.ndarray],
                        net: str = "alex") -> dict:
    """lpips-package state dict → LPIPS flax params (strict).

    Expected torch keys: ``net.sliceK.I.{weight,bias}`` (backbone convs,
    OIHW) and ``linN.model.1.weight`` (1×1 lin convs, (1, C, 1, 1)).
    torchvision ``features.I.*`` keys are also accepted for the backbone.
    """
    slices = _ALEX_SLICES if net == "alex" else _VGG_SLICES
    # allow torchvision naming by translating features.I → sliceK.I
    tv_index = {v.split(".")[1]: v for v in slices.values()}
    state = dict(torch_state)
    for key in list(state):
        if key.startswith("features."):
            idx = key.split(".")[1]
            if idx in tv_index:
                state[f"net.{tv_index[idx]}.{key.split('.')[-1]}"] = state[key]

    params: dict = {"backbone": {}}
    for name, sl in slices.items():
        w = state.get(f"net.{sl}.weight")
        b = state.get(f"net.{sl}.bias")
        if w is None or b is None:
            raise KeyError(f"missing backbone conv weights net.{sl}.*")
        params["backbone"][name] = {"conv": {
            "kernel": jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(b)),
        }}
    for i in range(5):
        w = state.get(f"lin{i}.model.1.weight")
        if w is None:
            w = state.get(f"lins.{i}.model.1.weight")
        if w is None:
            raise KeyError(f"missing lin{i}.model.1.weight")
        params[f"lin{i}"] = jnp.asarray(np.asarray(w).reshape(-1))
    return {"params": params}


def load_lpips(path: str, net: str = "alex"):
    """(module, params) from a torch ``lpips`` checkpoint on disk."""
    from .convert import load_torch_state

    model = LPIPS(net=net)
    return model, convert_lpips_state(load_torch_state(path), net=net)
