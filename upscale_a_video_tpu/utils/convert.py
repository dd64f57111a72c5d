"""Checkpoint conversion: reference torch state dicts → flax param trees.

The released weight bundle (README.md:80-101:
``upscale_a_video/{unet,vae,text_encoder,...}`` with ``.bin`` torch state
dicts) is converted by *walking our flax parameter tree* and deriving the
matching torch key for every leaf — so any missing/mismatched tensor is
reported explicitly instead of silently skipped.

Mapping rules (flax path → torch key):
- ``resnets_0`` → ``resnets.0`` (trailing integer suffix becomes an index)
- a ``base`` segment (ResnetBlock3DPlus's inner core) is dropped
- a ``conv`` wrapper segment (InflatedConv/TemporalConv/InflatedConvZero inner
  nn.Conv) is dropped
- leaf names: ``kernel``→``weight`` (transposed OIHW→HWIO / OIDHW→DHWIO /
  (O,I)→(I,O)), ``scale``→``weight`` (norms), ``embedding``→``weight``,
  ``bias``→``bias``
- model-specific renames (e.g. CLIP ``mlp_fc1``→``mlp.fc1``, temporal
  attention's rel-pos table) via per-model tables.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_INDEX_RE = re.compile(r"^(.*)_(\d+)$")

# Flax module names whose integer suffix is part of the *name*, not an index.
_NO_INDEX_SPLIT = {
    "linear_1", "linear_2", "norm1", "norm2", "norm3", "conv1", "conv2",
    "mlp_fc1", "mlp_fc2", "norm_3d", "conv_3d",
}

# segments that exist only in the flax tree and must be dropped
_DROP_SEGMENTS = {"base", "params"}


def _segment_to_torch(seg: str) -> str:
    if seg in _NO_INDEX_SPLIT:
        return seg
    m = _INDEX_RE.match(seg)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    return seg


def flax_path_to_torch_key(path: Tuple[str, ...], renames: Optional[Dict[str, str]] = None) -> str:
    """Derive the torch state-dict key for a flax param path."""
    segs = []
    path = list(path)
    leaf = path[-1]
    body = path[:-1]

    # drop conv-wrapper: [..., X, "conv", leaf] where X is the real conv name
    if len(body) >= 1 and body[-1] == "conv":
        body = body[:-1]

    for seg in body:
        if seg in _DROP_SEGMENTS:
            continue
        segs.append(_segment_to_torch(seg))

    if leaf == "kernel":
        leaf_t = "weight"
    elif leaf == "scale":
        leaf_t = "weight"
    elif leaf == "embedding":
        leaf_t = "weight"
    elif leaf == "relative_attention_bias":
        # TemporalAttention param → torch Embedding under time_rel_pos_bias
        segs.append("time_rel_pos_bias.relative_attention_bias")
        leaf_t = "weight"
    elif leaf == "position_embedding":
        segs.append("position_embedding")
        leaf_t = "weight"
    else:
        leaf_t = leaf

    key = ".".join(segs + [leaf_t]) if segs else leaf_t
    if renames:
        for old, new in renames.items():
            key = key.replace(old, new)
    return key


def torch_tensor_to_flax(value: np.ndarray, leaf: str) -> np.ndarray:
    """Transpose a torch tensor into the flax layout for the given leaf kind."""
    v = np.asarray(value)
    if leaf == "kernel":
        if v.ndim == 4:       # Conv2d OIHW → HWIO
            return v.transpose(2, 3, 1, 0)
        if v.ndim == 5:       # Conv3d OIDHW → DHWIO
            return v.transpose(2, 3, 4, 1, 0)
        if v.ndim == 2:       # Linear (O,I) → (I,O)
            return v.transpose(1, 0)
    return v


def flax_tensor_to_torch(value: np.ndarray, leaf: str) -> np.ndarray:
    """Inverse of :func:`torch_tensor_to_flax` (used by tests / export)."""
    v = np.asarray(value)
    if leaf == "kernel":
        if v.ndim == 4:
            return v.transpose(3, 2, 0, 1)
        if v.ndim == 5:
            return v.transpose(4, 3, 0, 1, 2)
        if v.ndim == 2:
            return v.transpose(1, 0)
    return v


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def convert_state_dict(
    template_params,
    torch_state: Dict[str, np.ndarray],
    renames: Optional[Dict[str, str]] = None,
    prefix: str = "",
    dtype=jnp.float32,
    strict: bool = True,
):
    """Build a flax param tree shaped like ``template_params`` from a torch
    state dict. Returns (params, report) where report lists missing/unused keys.
    """
    used = set()
    missing = []

    def build(tree, path=()):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        key = prefix + flax_path_to_torch_key(path, renames)
        leaf = path[-1]
        if key not in torch_state:
            missing.append((".".join(path), key))
            return jnp.asarray(tree)  # keep template init
        used.add(key)
        v = torch_tensor_to_flax(np.asarray(torch_state[key]), leaf)
        if tuple(v.shape) != tuple(np.shape(tree)):
            raise ValueError(
                f"shape mismatch for {key}: torch {v.shape} vs flax {np.shape(tree)}"
            )
        return jnp.asarray(v, dtype=dtype)

    params = build(template_params)
    if strict and missing:
        raise KeyError(f"missing torch keys for {len(missing)} params, e.g. {missing[:5]}")
    report = {"missing": missing, "unused": sorted(set(torch_state) - used)}
    return params, report


# ------------------------------- per-model rename tables -------------------

CLIP_RENAMES = {
    "mlp_fc1": "mlp.fc1",
    "mlp_fc2": "mlp.fc2",
    "layers.": "encoder.layers.",
    "token_embedding": "embeddings.token_embedding",
    "position_embedding.weight": "embeddings.position_embedding.weight",
}

UNET_RENAMES: Dict[str, str] = {
    "net.0": "net.0",  # GEGLU naming already aligned
}

VAE_RENAMES: Dict[str, str] = {}


def from_pretrained_2d(
    template_params,
    torch_state_2d: Dict[str, np.ndarray],
    renames: Optional[Dict[str, str]] = None,
):
    """Inflate 2-D (stable-diffusion-x4-upscaler) UNet weights into the video
    UNet template (ref unet_video.py:577-601 ``from_pretrained_2d``).

    Spatial params load from the 2-D state dict; params whose torch key is
    absent (all the ``temporal`` additions) keep their fresh template init —
    exactly the reference's ``state_dict.update`` of new keys. Returns
    (params, report); combine with ``training.temporal_param_mask`` to freeze
    the loaded subset (ref :597-600).
    """
    return convert_state_dict(template_params, torch_state_2d, renames=renames,
                              strict=False)


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.bin``/``.pth`` state dict into numpy (host-side)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not isinstance(v, (int, float)) for v in sd.values()
    ):
        sd = sd["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def convert_bundle(model_dir: str, out_dir: Optional[str] = None) -> None:
    """Offline conversion of a released weight bundle to Orbax checkpoints.

    Usage: python -m upscale_a_video_tpu.utils.convert <model_dir>
    Converts unet/vae(/text_encoder/raft) .bin files next to themselves (or
    under ``out_dir``) so pipeline loads skip torch entirely.
    """
    import jax.numpy as jnp

    from ..config import UNetVideoConfig, VaeConfig
    from ..models import AutoencoderKLVideo, UNetVideoModel
    from .checkpoint import save_params
    from .param_init import fast_init
    from pathlib import Path

    root = Path(model_dir)
    out_root = Path(out_dir) if out_dir else root

    unet_bin = root / "unet/unet_video.bin"
    if unet_bin.exists():
        cfg = UNetVideoConfig.from_json(root / "unet/unet_video_config.json")
        model = UNetVideoModel(cfg)
        tpl = fast_init(model, jnp.zeros((1, 2, 16, 16, 4)), 0,
                        jnp.zeros((1, 2, 16, 16, 3)),
                        jnp.zeros((1, 77, cfg.cross_attention_dim)), 0)
        params, report = convert_state_dict(tpl["params"],
                                            load_torch_state(str(unet_bin)))
        save_params(str(out_root / "unet/orbax"), {"params": params})
        print(f"unet: converted ({len(report['unused'])} unused keys)")

    for name in ("vae_3d", "vae_video"):
        vae_bin = root / f"vae/{name}.bin"
        if not vae_bin.exists():
            continue
        cfg = VaeConfig.from_json(root / f"vae/{name}_config.json")
        model = AutoencoderKLVideo(cfg)
        if cfg.condition_img:
            enc = fast_init(model, jnp.zeros((1, 1, 16, 16, 3)),
                            method=model.encode_moments)
            dec = fast_init(model, jnp.zeros((1, 1, 16, 16, cfg.latent_channels)),
                            method=model.decode, img=jnp.zeros((1, 1, 16, 16, 3)))
            tpl = {"params": {**enc["params"], **dec["params"]}}
        else:
            tpl = fast_init(model, jnp.zeros((1, 1, 16, 16, 3)))
        params, report = convert_state_dict(tpl["params"],
                                            load_torch_state(str(vae_bin)))
        save_params(str(out_root / f"vae/{name}_orbax"), {"params": params})
        print(f"{name}: converted ({len(report['unused'])} unused keys)")


if __name__ == "__main__":
    import sys

    convert_bundle(*sys.argv[1:])
