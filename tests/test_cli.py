"""CLI smoke test: tiny synthetic video, random weights, end-to-end to an
mp4 + PNG frames on disk (exercises IO, tiling plumbing, color fix flags)."""

import os

import numpy as np
import pytest

from upscale_a_video_tpu.utils import video_io


@pytest.fixture()
def tiny_video(tmp_path):
    rng = np.random.RandomState(0)
    frames = (rng.rand(3, 32, 32, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "clip.mp4")
    video_io.write_video(path, frames, fps=8)
    return path


def test_video_io_roundtrip(tiny_video):
    frames, fps, name = video_io.read_video(tiny_video)
    assert frames.shape[0] == 3
    assert frames.shape[-1] == 3
    assert name == "clip"


def test_model_range_roundtrip():
    u8 = np.array([[0, 128, 255]], dtype=np.uint8).reshape(1, 1, 3, 1)
    x = video_io.to_model_range(u8)
    assert x.min() >= -1 and x.max() <= 1
    back = video_io.from_model_range(x)
    np.testing.assert_array_equal(back, u8)


@pytest.mark.slow
def test_cli_end_to_end(tiny_video, tmp_path, monkeypatch):
    from upscale_a_video_tpu import cli

    out_dir = str(tmp_path / "out")
    # tiny models would still be the full-size configs via loader; use the
    # random-weights path with few steps — heavy on CPU, so marked slow.
    args = cli.build_parser().parse_args([
        "-i", tiny_video, "-o", out_dir, "-s", "2", "-n", "50", "-g", "1",
        "--no_llava", "--random_weights", "--color_fix", "AdaIn",
    ])
    cli.run(args)
    vids = os.listdir(os.path.join(out_dir, "video"))
    assert len(vids) == 1
    frames, _, _ = video_io.read_video(os.path.join(out_dir, "video", vids[0]))
    assert frames.shape[1] == 128  # 32 × 4


def test_compile_cache_dir_resolution(tmp_path, monkeypatch):
    from upscale_a_video_tpu import cli

    # Opt-out only for truthy values; "" and "0" keep the cache ON.
    assert cli.resolve_compile_cache_dir({"UAV_NO_COMPILE_CACHE": "1"}) is None
    override = str(tmp_path / "cache")
    for keep_on in ("", "0"):
        got = cli.resolve_compile_cache_dir(
            {"UAV_NO_COMPILE_CACHE": keep_on, "UAV_COMPILE_CACHE": override})
        assert got == override and os.path.isdir(override)

    # Unwritable target falls back to the per-user cache dir.
    ro = tmp_path / "ro"
    ro.mkdir()
    ro.chmod(0o555)
    fake_home = tmp_path / "home"
    monkeypatch.setenv("HOME", str(fake_home))
    got = cli.resolve_compile_cache_dir({"UAV_COMPILE_CACHE": str(ro)})
    if os.geteuid() == 0:  # root ignores mode bits; fallback can't trigger
        assert got == str(ro)
    else:
        assert got == os.path.join(
            str(fake_home), ".cache", "upscale_a_video_tpu", "jax_cache")
        assert os.path.isdir(got)
