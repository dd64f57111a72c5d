"""Model configuration dataclasses.

Loaders accept the reference's JSON config files unchanged
(`/root/reference/configs/{unet_video_config,vae_3d_config,vae_video_config}.json`),
so released configs drive the TPU models directly.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple


def _load_json(path) -> dict:
    with open(path) as f:
        return json.load(f)


@dataclasses.dataclass(frozen=True)
class UNetVideoConfig:
    """Mirror of UNetVideoModel's registered config (ref unet_video.py:106-163)."""

    in_channels: int = 7
    out_channels: int = 4
    max_noise_level: int = 350
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    attention_head_dim: int = 8
    block_out_channels: Tuple[int, ...] = (256, 512, 512, 1024)
    down_block_types: Tuple[str, ...] = (
        "DownBlock3D", "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
    )
    mid_block_type: str = "UNetMidBlock3DCrossAttn"
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D", "UpBlock3D",
    )
    only_cross_attention: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    downsample_padding: int = 1
    act_fn: str = "silu"
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    num_class_embeds: Optional[int] = 1000
    center_input_sample: bool = False
    # temporal module placement (ref unet_video.py:109-113)
    down_temporal_idx: Tuple[int, ...] = (0, 1, 2, 3)
    mid_temporal: bool = True
    up_temporal_idx: Tuple[int, ...] = (0, 1, 2, 3)

    @classmethod
    def from_dict(cls, d: dict) -> "UNetVideoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in known:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        if isinstance(kwargs.get("only_cross_attention"), bool):
            n = len(kwargs.get("down_block_types", cls.down_block_types))
            kwargs["only_cross_attention"] = (kwargs["only_cross_attention"],) * n
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path) -> "UNetVideoConfig":
        return cls.from_dict(_load_json(path))


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    """Mirror of AutoencoderKLVideo's config (ref autoencoder_kl_cond_video.py:48-97,
    configs/vae_3d_config.json and configs/vae_video_config.json)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock3D",) * 3
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock3D",) * 3
    layers_per_block: int = 2
    norm_num_groups: int = 32
    act_fn: str = "silu"
    scaling_factor: float = 0.08333
    condition_img: bool = False
    condition_channels: int = 128
    use_temporal_block: bool = False

    @property
    def is_plus(self) -> bool:
        return self.up_block_types[0] == "UpDecoderBlock3D_plus"

    @property
    def spatial_scale(self) -> int:
        """Decoder upscale factor: 2^(num up stages - 1) ... each up block but
        the last has a ×2 upsampler → ×4 for 3 blocks."""
        return 2 ** (len(self.up_block_types) - 1)

    @classmethod
    def from_dict(cls, d: dict) -> "VaeConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: (tuple(v) if isinstance(v, list) else v) for k, v in d.items() if k in known}
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path) -> "VaeConfig":
        return cls.from_dict(_load_json(path))


def reference_config_dir() -> Optional[Path]:
    p = Path("/root/reference/configs")
    return p if p.exists() else None
