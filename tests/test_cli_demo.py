"""L5 acceptance path on a REAL reference demo input (VERDICT r3 item 6).

The reference's de-facto test suite is its demo videos + README command
lines (/root/reference/inputs/*.mp4, README.md:113-138). This drives one of
them — aigc_1.mp4, 256×256@47f — through the actual CLI end to end
(mp4 decode → window-planned denoise → chunked decode → color fix → mp4
write) with a TINY config bundle (random weights) so it runs on CPU. The
full-size on-chip runs live in BENCH_LOCAL.json (scripts/demo_inputs.sh).
"""

import json
import os

import numpy as np
import pytest

from upscale_a_video_tpu.utils import video_io

REF_INPUT = "/root/reference/inputs/aigc_1.mp4"

TINY_UNET = {
    "_class_name": "UNetVideoModel",
    "block_out_channels": [8, 16, 16, 32],
    "attention_head_dim": 4,
    "norm_num_groups": 4,
    "cross_attention_dim": 16,
    "layers_per_block": 1,
}
TINY_VAE = {
    "_class_name": "AutoencoderKL3D",
    "block_out_channels": [8, 16, 16],
    "norm_num_groups": 4,
    "layers_per_block": 1,
}
TINY_CLIP = {
    "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "max_position_embeddings": 77,  # tokenizer pads prompts to CLIP's 77
}


@pytest.fixture()
def tiny_bundle(tmp_path):
    root = tmp_path / "bundle"
    for sub, cfg in (("unet", None), ("vae", None), ("text_encoder", TINY_CLIP)):
        (root / sub).mkdir(parents=True)
        if cfg is not None:
            (root / sub / "config.json").write_text(json.dumps(cfg))
    (root / "unet/unet_video_config.json").write_text(json.dumps(TINY_UNET))
    (root / "vae/vae_3d_config.json").write_text(json.dumps(TINY_VAE))
    return str(root)


def test_fallback_tokenizer_respects_vocab_size():
    """Fabricated ids must land inside the TEXT MODEL's vocab: tiny smoke
    configs shrink vocab_size and OOB ids become NaN embeddings (jnp.take
    fills out-of-range gathers with NaN outside jit) — the failure mode that
    produced all-black CLI output."""
    import warnings

    from upscale_a_video_tpu.pipeline.loader import FallbackTokenizer

    for vocab in (64, 49408):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tok = FallbackTokenizer(vocab)
        ids = tok(["a photo of a cat", ""])
        assert ids.shape == (2, 77) and ids.dtype == np.int32
        assert ids.min() >= 0 and ids.max() < vocab


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_INPUT),
                    reason="reference demo inputs not present")
def test_reference_demo_input_end_to_end(tiny_bundle, tmp_path):
    from upscale_a_video_tpu import cli

    out_dir = str(tmp_path / "out")
    cli.main([
        "-i", REF_INPUT, "-o", out_dir, "-s", "2", "-n", "50", "-g", "1",
        "--no_llava", "--random_weights", "--model_dir", tiny_bundle,
        "--color_fix", "Wavelet", "--max_frames", "10", "--max_size", "64",
    ])
    vids = os.listdir(os.path.join(out_dir, "video"))
    assert len(vids) == 1 and vids[0].endswith(".mp4")
    frames, fps, _ = video_io.read_video(os.path.join(out_dir, "video", vids[0]))
    # real 256×256 mp4 area-downsampled to 64² (1-core CPU budget; the full
    # 256² on-chip runs live in BENCH_LOCAL via scripts/demo_inputs.sh),
    # T=10 > 8 so the host-mode window plan runs; ×4 → 256², fps preserved
    assert frames.shape == (10, 256, 256, 3)
    assert abs(fps - 23.083) < 0.5
    # real content in, non-degenerate content out (random weights: output is
    # garbage but must not be constant/NaN — IO and range handling intact)
    assert frames.std() > 1.0
