"""Eval harness: ledger resume + metrics aggregation with a fake pipeline."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.pipeline.eval import evaluate_directory
from upscale_a_video_tpu.utils import video_io
from upscale_a_video_tpu.utils.checkpoint import ClipLedger


class FakePipeline:
    def __init__(self):
        self.calls = []

    def __call__(self, prompt, video, **kw):
        self.calls.append(video.shape)
        return jnp.repeat(jnp.repeat(video, 4, axis=2), 4, axis=3)


@pytest.fixture()
def clip_dir(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "clips"
    d.mkdir()
    for name in ("a", "b"):
        frames = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
        video_io.write_video(str(d / f"{name}.mp4"), frames, fps=8)
    return str(d)


def test_eval_runs_and_reports(clip_dir, tmp_path):
    out = str(tmp_path / "out")
    pipe = FakePipeline()
    agg = evaluate_directory(pipe, clip_dir, out, num_inference_steps=2)
    assert agg["clips"] == 2
    assert "fps" in agg
    assert len(pipe.calls) == 2
    report = os.path.join(out, "eval_report.jsonl")
    entries = [json.loads(x) for x in open(report)]
    assert {e["clip"] for e in entries} == {"a", "b"}


def test_eval_resumes_from_ledger(clip_dir, tmp_path):
    out = str(tmp_path / "out")
    pipe = FakePipeline()
    evaluate_directory(pipe, clip_dir, out, num_inference_steps=2)
    pipe2 = FakePipeline()
    agg = evaluate_directory(pipe2, clip_dir, out, num_inference_steps=2)
    assert len(pipe2.calls) == 0  # all clips already done
    assert agg["clips"] == 2


def test_ledger(tmp_path):
    path = str(tmp_path / "ledger.jsonl")
    led = ClipLedger(path)
    assert not led.is_done("x")
    led.mark_done("x", sec=1.5)
    assert led.is_done("x")
    led2 = ClipLedger(path)  # reload from disk
    assert led2.is_done("x")
    assert led2.pending(["x", "y"]) == ["y"]
