"""Predictor streaming-ingest mode (serving/predictor.py
``segment_frames``): bounded ring-fed decode → per-segment pipeline →
incremental mp4 write, plus live progress callbacks."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from upscale_a_video_tpu.serving.predictor import Predictor
from upscale_a_video_tpu.utils import video_io


class FakePipeline:
    """Stands in for VideoUpscalePipeline: 4× nearest upscale + progress."""

    def __init__(self):
        self.calls = []

    def __call__(self, prompt, video, flows_bi=None, progress_cb=None, **kw):
        self.calls.append(np.asarray(video).shape)
        if progress_cb is not None:
            progress_cb("denoise", kw.get("num_inference_steps", 1),
                        kw.get("num_inference_steps", 1))
            progress_cb("decode", 1, 1)
        v = np.asarray(video)
        return v.repeat(4, axis=2).repeat(4, axis=3)


@pytest.fixture()
def clip(tmp_path):
    path = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (24, 24))
    assert w.isOpened()
    for i in range(21):  # 21 frames: exercises the short tail segment
        w.write(np.full((24, 24, 3), 10 * i, np.uint8))
    w.release()
    return path


def _make_predictor(tmp_path):
    p = Predictor()
    p.pipeline = FakePipeline()
    p.captioner = None
    p.raft = None
    p.model_dir = str(tmp_path)
    return p


def test_stream_video_bounded_batches(clip):
    batches = list(video_io.stream_video(clip, batch=8))
    assert [len(b) for b in batches] == [8, 8, 5]
    assert batches[0].shape[1:] == (24, 24, 3)


def test_segmented_predict_writes_incrementally(tmp_path, clip):
    pred = _make_predictor(tmp_path)
    events = []
    out = pred.predict(
        clip, output_path=str(tmp_path / "out"), inference_steps=2,
        seed=3, segment_frames=8,
        progress_cb=lambda s, i, n: events.append((s, i, n)))
    # 21 frames → segments of 8, 8, 5
    assert [c[1] for c in pred.pipeline.calls] == [8, 8, 5]
    assert os.path.getsize(out) > 0
    frames, _fps, _ = video_io.read_video(out)
    assert frames.shape == (21, 96, 96, 3)
    stages = {e[0] for e in events}
    assert {"denoise", "decode", "segment"} <= stages
    assert [e for e in events if e[0] == "segment"] == [
        ("segment", 1, -1), ("segment", 2, -1), ("segment", 3, -1)]


def test_nonstream_predict_progress(tmp_path, clip):
    pred = _make_predictor(tmp_path)
    events = []
    out = pred.predict(clip, output_path=str(tmp_path / "o2"),
                       inference_steps=2, seed=3,
                       progress_cb=lambda s, i, n: events.append((s, i, n)))
    assert os.path.getsize(out) > 0
    assert pred.pipeline.calls == [(1, 21, 24, 24, 3)]
    assert ("denoise", 2, 2) in events
