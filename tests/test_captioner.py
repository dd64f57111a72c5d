"""Captioner plumbing: image preprocessing, prompt template, backend selection."""

import numpy as np
import pytest

from upscale_a_video_tpu.captioner import _resize_short_side, build_captioner
from upscale_a_video_tpu.models.llava.conversation import (
    QUESTION,
    build_caption_prompt,
    preprocess_image,
)


def test_resize_short_side_512():
    img = np.zeros((720, 1280, 3), np.uint8)
    out = _resize_short_side(img, 512)
    assert min(out.shape[:2]) == 512
    assert out.shape[1] == round(1280 * 512 / 720)


def test_preprocess_image_clip_norm():
    img = np.full((400, 600, 3), 128, np.uint8)
    out = preprocess_image(img, size=336)
    assert out.shape == (336, 336, 3)
    # CLIP-normalized mid-gray is near zero
    assert abs(float(out.mean())) < 1.0
    assert out.dtype == np.float32


class FakeTok:
    def __call__(self, text, add_special_tokens=True):
        ids = [1] if add_special_tokens else []
        ids += [10 + (ord(c) % 50) for c in text[:20]]
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return "caption"


def test_build_caption_prompt_places_image():
    ids, pos = build_caption_prompt(FakeTok())
    assert ids.ndim == 1
    assert 0 < pos < len(ids)
    assert QUESTION.startswith("Describe this image")


def test_build_captioner_disabled_by_default(monkeypatch):
    monkeypatch.delenv("UAV_CAPTION_ENDPOINT", raising=False)
    monkeypatch.delenv("UAV_CAPTION_MODEL", raising=False)
    assert build_captioner() is None


def test_build_captioner_endpoint(monkeypatch):
    monkeypatch.setenv("UAV_CAPTION_ENDPOINT", "http://x/caption")
    cap = build_captioner()
    assert cap is not None and cap.url == "http://x/caption"
