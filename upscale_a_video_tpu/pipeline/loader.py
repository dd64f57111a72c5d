"""Pipeline assembly from a released weight bundle.

Mirrors the reference's model-loading block (inference_upscale_a_video.py:96-131)
against the published bundle layout (README.md:80-101):

    <model_dir>/
      scheduler/scheduler_config.json
      low_res_scheduler/scheduler_config.json
      text_encoder/{config.json, pytorch_model.bin}
      tokenizer/...
      unet/{unet_video_config.json, unet_video.bin}
      vae/{vae_3d_config.json, vae_3d.bin, vae_video_config.json, vae_video.bin}
      propagator/raft-things.pth

Torch state dicts are converted on first load (utils/convert.py) and cached as
orbax checkpoints next to the originals. ``random_init=True`` builds the same
models with fresh params (smoke tests / benches without weights).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import UNetVideoConfig, VaeConfig
from ..models import AutoencoderKLVideo, UNetVideoModel
from ..models.clip_text import CLIPTextConfig, CLIPTextModel
from ..sampling import DDIMScheduler, DDPMScheduler
from ..utils.convert import CLIP_RENAMES, convert_state_dict, load_torch_state
from .pipeline import PipelineModules, VideoUpscalePipeline


def _maybe_json(path: Path, default: dict) -> dict:
    if path.exists():
        with open(path) as f:
            return json.load(f)
    return default


class HFTokenizerAdapter:
    """CLIPTokenizer → int32 (B, 77) ids (ref _encode_prompt padding scheme,
    pipeline_upscale_a_video.py:231-240)."""

    def __init__(self, tokenizer_dir: Optional[str] = None,
                 local_files_only: bool = False):
        from transformers import CLIPTokenizer

        if tokenizer_dir and os.path.isdir(tokenizer_dir):
            self.tok = CLIPTokenizer.from_pretrained(tokenizer_dir)
        else:
            self.tok = CLIPTokenizer.from_pretrained(
                "openai/clip-vit-base-patch32",
                local_files_only=local_files_only)

    def __call__(self, prompts):
        import numpy as np

        enc = self.tok(
            list(prompts), padding="max_length", max_length=self.tok.model_max_length,
            truncation=True, return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


class FallbackTokenizer:
    """Deterministic stand-in for shape/perf tests WITHOUT tokenizer assets.

    The ids it fabricates are byte hashes, NOT CLIP BPE tokens — conditioning
    built from them is garbage. ``load_pipeline`` only constructs it when
    explicitly asked (``allow_fallback_tokenizer=True``); real runs that lack
    assets fail loudly instead of silently degrading.
    """

    def __init__(self, vocab_size: int = 49408):
        import warnings

        # ids must land inside the TEXT MODEL's vocab: tiny smoke configs
        # shrink vocab_size, and out-of-range ids turn into NaN embeddings
        # (jnp.take fills OOB gathers with NaN outside jit)
        self.vocab_size = vocab_size
        warnings.warn(
            "FallbackTokenizer in use: tokenizer assets are missing, prompt "
            "conditioning will be MEANINGLESS. Provide a tokenizer dir "
            "(vocab.json+merges.txt) for real runs.",
            RuntimeWarning, stacklevel=2,
        )

    def __call__(self, prompts):
        import logging

        import numpy as np

        logging.getLogger(__name__).warning(
            "FallbackTokenizer encoding %d prompt(s) with byte-hash ids — "
            "NOT real CLIP tokens", len(prompts))
        v = self.vocab_size
        ids = np.full((len(prompts), 77), min(49407, v - 1), dtype=np.int32)
        ids[:, 0] = min(49406, v - 2)
        for i, p in enumerate(prompts):
            for j, ch in enumerate(p.encode()[:60]):
                ids[i, 1 + j] = ch % min(49000, v - 2)
        return ids


def _resolve_tokenizer(tokenizer_dir: Optional[str], allow_fallback: bool,
                       vocab_size: int = 49408):
    """Tokenizer resolution order: in-repo CLIP BPE from the bundle's
    ``tokenizer/`` assets → HF CLIPTokenizer (hub name, needs network/cache)
    → FallbackTokenizer only when explicitly allowed."""
    from ..utils.clip_bpe import load_clip_tokenizer

    if tokenizer_dir and os.path.isdir(tokenizer_dir):
        try:
            return load_clip_tokenizer(tokenizer_dir)
        except FileNotFoundError:
            pass  # dir exists but holds some other HF layout — try HF below
        try:
            return HFTokenizerAdapter(tokenizer_dir)
        except Exception:
            pass
    else:
        try:
            return HFTokenizerAdapter(None, local_files_only=True)  # HF cache
        except Exception:
            pass
        if not allow_fallback:
            # network fetch ONLY as a last resort on real runs: on an
            # air-gapped host transformers retries with backoff for minutes
            # per missing file, which must never gate fallback-eligible runs
            try:
                return HFTokenizerAdapter(None)
            except Exception:
                pass
    if allow_fallback:
        return FallbackTokenizer(vocab_size)
    raise FileNotFoundError(
        "no CLIP tokenizer assets found: provide <model_dir>/tokenizer/ with "
        "vocab.json+merges.txt (released bundle layout) or pass "
        "allow_fallback_tokenizer=True for shape-only runs")


def load_pipeline(
    model_dir: Optional[str] = None,
    use_video_vae: bool = False,
    dtype=jnp.bfloat16,
    decode_dtype=jnp.float32,
    random_init: bool = False,
    seed: int = 0,
    allow_fallback_tokenizer: Optional[bool] = None,
) -> VideoUpscalePipeline:
    if allow_fallback_tokenizer is None:
        # random-init runs are shape/perf tests — meaningless ids are fine
        allow_fallback_tokenizer = random_init
    root = Path(model_dir) if model_dir else None
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    # configs: bundle copies if present, else the reference's
    ref_cfg = Path("/root/reference/configs")
    unet_cfg_path = (root / "unet/unet_video_config.json") if root else None
    if not (unet_cfg_path and unet_cfg_path.exists()):
        unet_cfg_path = ref_cfg / "unet_video_config.json"
    vae_name = "vae_video" if use_video_vae else "vae_3d"
    vae_cfg_path = (root / f"vae/{vae_name}_config.json") if root else None
    if not (vae_cfg_path and vae_cfg_path.exists()):
        vae_cfg_path = ref_cfg / f"{vae_name}_config.json"

    unet_cfg = UNetVideoConfig.from_json(unet_cfg_path)
    vae_cfg = VaeConfig.from_json(vae_cfg_path)

    text_cfg = CLIPTextConfig.from_dict(
        _maybe_json(root / "text_encoder/config.json", {}) if root else {}
    )

    unet = UNetVideoModel(unet_cfg, dtype=dtype)
    vae = AutoencoderKLVideo(vae_cfg, dtype=decode_dtype)
    clip = CLIPTextModel(text_cfg, dtype=dtype)

    from ..utils.param_init import fast_init

    unet_params = fast_init(
        unet, jnp.zeros((1, 2, 16, 16, 4), dtype), 0,
        jnp.zeros((1, 2, 16, 16, 3), dtype),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim), dtype), 0,
    )
    if vae_cfg.condition_img:
        # conditional decoder needs `img`; init encoder and decoder separately
        # and merge the param trees
        enc_params = fast_init(
            vae, jnp.zeros((1, 1, 16, 16, 3)), method=vae.encode_moments, seed=1
        )
        dec_params = fast_init(
            vae, jnp.zeros((1, 1, 16, 16, vae_cfg.latent_channels)),
            method=vae.decode, img=jnp.zeros((1, 1, 16, 16, 3)), seed=1,
        )
        vae_params = {"params": {**enc_params["params"], **dec_params["params"]}}
    else:
        vae_params = fast_init(vae, jnp.zeros((1, 1, 16, 16, 3)), seed=1)
    clip_params = fast_init(clip, jnp.zeros((1, 77), dtype=jnp.int32), seed=2)

    if not random_init:
        if root is None:
            raise ValueError("model_dir is required unless random_init=True")
        from ..utils.checkpoint import load_params as load_orbax

        # prefer pre-converted Orbax checkpoints (utils.convert.convert_bundle)
        unet_orbax = root / "unet/orbax"
        if unet_orbax.exists():
            unet_params = load_orbax(str(unet_orbax), unet_params)
        else:
            unet_bin = root / "unet/unet_video.bin"
            unet_params = {"params": convert_state_dict(
                unet_params["params"], load_torch_state(str(unet_bin)))[0]}
        vae_orbax = root / f"vae/{vae_name}_orbax"
        if vae_orbax.exists():
            vae_params = load_orbax(str(vae_orbax), vae_params)
        else:
            vae_bin = root / f"vae/{vae_name}.bin"
            vae_params = {"params": convert_state_dict(
                vae_params["params"], load_torch_state(str(vae_bin)))[0]}
        text_bin = root / "text_encoder/pytorch_model.bin"
        if text_bin.exists():
            clip_params = {"params": convert_state_dict(
                clip_params["params"], load_torch_state(str(text_bin)),
                renames=CLIP_RENAMES, prefix="text_model.")[0]}

    # defaults follow the stable-diffusion-x4-upscaler bundle (SD2 betas for
    # the DDIM sampler, wider betas for the LR-noising DDPM); the bundle's own
    # scheduler_config.json overrides when present
    sched_cfg = _maybe_json(
        root / "scheduler/scheduler_config.json" if root else Path("/nonexistent"),
        {"beta_schedule": "scaled_linear", "beta_start": 0.00085, "beta_end": 0.012,
         "num_train_timesteps": 1000, "clip_sample": False, "prediction_type": "epsilon",
         "steps_offset": 1, "set_alpha_to_one": False},
    )
    lrs_cfg = _maybe_json(
        root / "low_res_scheduler/scheduler_config.json" if root else Path("/nonexistent"),
        {"beta_schedule": "scaled_linear", "beta_start": 0.0001, "beta_end": 0.02,
         "num_train_timesteps": 1000},
    )

    tokenizer = _resolve_tokenizer(
        str(root / "tokenizer") if root else None, allow_fallback_tokenizer,
        vocab_size=text_cfg.vocab_size)

    modules = PipelineModules(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=clip, text_params=clip_params,
        tokenizer=tokenizer,
        scheduler=DDIMScheduler.from_dict(sched_cfg),
        low_res_scheduler=DDPMScheduler.from_dict(lrs_cfg),
    )
    return VideoUpscalePipeline(modules, dtype=dtype, decode_dtype=decode_dtype)
