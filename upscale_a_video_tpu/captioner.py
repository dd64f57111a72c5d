"""Pluggable video captioner (the reference's LLaVA agent role).

The reference vendors an 8.4 kLoC LLaVA tree and runs
``liuhaotian/llava-v1.5-13b`` on a second GPU to caption frame 0
(llava/llava_agent.py:18-102; driver inference_upscale_a_video.py:158-178).
The rest of the system consumes only a *string*, so the captioner is a clean
plug-point (SURVEY §7 step 7). Backends, tried in order:

1. ``UAV_CAPTION_ENDPOINT`` env var — an HTTP service receiving a PNG and
   returning the caption text (how a production TPU deployment would host the
   VLM on its own slice).
2. Local HF transformers pipeline (torch CPU) when weights are available.
3. Disabled → empty caption (the reference's ``--no_llava`` path).

The reference's exact prompt and preprocessing are preserved: frame 0 resized
so the short side is 512 (bicubic), question "Describe this image and its
style in a very detailed manner." (llava_agent.py:34), caption prepended to
``a_prompt``.
"""

from __future__ import annotations

import io
import os
from typing import Callable, Optional

import numpy as np

CAPTION_QUESTION = "Describe this image and its style in a very detailed manner."


def _resize_short_side(frame_u8: np.ndarray, target: int = 512) -> np.ndarray:
    """Bicubic resize so min(H, W) == target (ref driver :162-168)."""
    import jax.numpy as jnp

    from .ops.resize import resize_2d

    h, w = frame_u8.shape[:2]
    scale = target / min(w, h)
    h0, w0 = round(h * scale), round(w * scale)
    out = resize_2d(jnp.asarray(frame_u8, jnp.float32), (h0, w0), "bicubic")
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


class EndpointCaptioner:
    def __init__(self, url: str):
        self.url = url

    def __call__(self, frame_u8: np.ndarray) -> str:
        import urllib.request

        from PIL import Image

        img = Image.fromarray(_resize_short_side(frame_u8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(
            self.url, data=buf.getvalue(),
            headers={"Content-Type": "image/png", "X-Question": CAPTION_QUESTION},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.read().decode().strip()


class HFCaptioner:
    """Local torch-CPU fallback via any HF image-to-text checkpoint."""

    def __init__(self, model_name: str, load_8bit: bool = False):
        from transformers import pipeline

        self.pipe = pipeline("image-to-text", model=model_name)

    def __call__(self, frame_u8: np.ndarray) -> str:
        from PIL import Image

        img = Image.fromarray(_resize_short_side(frame_u8))
        out = self.pipe(img, prompt=CAPTION_QUESTION)
        if out and isinstance(out, list):
            return str(out[0].get("generated_text", "")).strip()
        return ""


def build_captioner(load_8bit: bool = False) -> Optional[Callable[[np.ndarray], str]]:
    """Best-available captioner, or None (≡ --no_llava).

    Backends by env var, in priority order:
    - ``UAV_CAPTION_JAX_MODEL``: JAX LLaVA (models/llava) from an HF checkpoint
      dir — runs on the TPU alongside the upscaler
    - ``UAV_CAPTION_ENDPOINT``: external HTTP captioning service
    - ``UAV_CAPTION_MODEL``: HF image-to-text pipeline (torch CPU)
    """
    jax_model_dir = os.environ.get("UAV_CAPTION_JAX_MODEL")
    if jax_model_dir:
        try:
            from .models.llava.loader import load_llava_captioner

            cap = load_llava_captioner(jax_model_dir, load_8bit=load_8bit)
            return lambda frame_u8: cap.caption(frame_u8)
        except Exception as e:  # noqa: BLE001
            print(f"jax llava unavailable ({e}); trying other backends")
    endpoint = os.environ.get("UAV_CAPTION_ENDPOINT")
    if endpoint:
        return EndpointCaptioner(endpoint)
    model_name = os.environ.get("UAV_CAPTION_MODEL")
    if model_name:
        try:
            return HFCaptioner(model_name, load_8bit)
        except Exception as e:  # noqa: BLE001
            print(f"captioner unavailable ({e}); continuing without captions")
    return None
