"""End-to-end pipeline smoke test on tiny models (the minimum slice of
SURVEY §7 M3): random weights, 10-frame 16×16 clip → 64×64 output, with and
without CFG and propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
from upscale_a_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from upscale_a_video_tpu.pipeline.pipeline import PipelineModules, VideoUpscalePipeline
from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig, DDPMScheduler


class DummyTokenizer:
    """Maps strings to deterministic token ids (77-padded)."""

    def __call__(self, prompts):
        out = np.full((len(prompts), 8), 3, dtype=np.int32)
        for i, p in enumerate(prompts):
            h = abs(hash(p)) % 60
            out[i, 0] = 1
            out[i, 1] = h
            out[i, -1] = 2
        return out


@pytest.fixture(scope="module")
def tiny_pipeline():
    key = jax.random.PRNGKey(0)
    unet_cfg = UNetVideoConfig(
        block_out_channels=(8, 16, 16, 32), attention_head_dim=4,
        norm_num_groups=4, cross_attention_dim=16,
    )
    vae_cfg = VaeConfig(block_out_channels=(8, 16, 16), norm_num_groups=4)
    clip_cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=8,
    )

    unet = UNetVideoModel(unet_cfg)
    vae = AutoencoderKLVideo(vae_cfg)
    clip = CLIPTextModel(clip_cfg)

    k1, k2, k3 = jax.random.split(key, 3)
    unet_params = unet.init(k1, jnp.zeros((1, 2, 8, 8, 4)), 0,
                            jnp.zeros((1, 2, 8, 8, 3)), jnp.zeros((1, 8, 16)), 0)
    vae_params = vae.init(k2, jnp.zeros((1, 1, 8, 8, 3)))
    clip_params = clip.init(k3, jnp.zeros((1, 8), dtype=jnp.int32))

    modules = PipelineModules(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=clip, text_params=clip_params,
        tokenizer=DummyTokenizer(),
        scheduler=DDIMScheduler(DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler(),
    )
    return VideoUpscalePipeline(modules, dtype=jnp.float32)


@pytest.mark.slow
def test_short_clip_no_cfg(tiny_pipeline):
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 16, 16, 3), minval=-1, maxval=1)
    out = tiny_pipeline("a cat", img, num_inference_steps=3, guidance_scale=1.0,
                        noise_level=20)
    assert out.shape == (1, 4, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


@pytest.mark.slow
def test_windowed_cfg(tiny_pipeline):
    # 10 frames > window 8 → 2 windows with overlap blending
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 10, 16, 16, 3), minval=-1, maxval=1)
    out = tiny_pipeline("a dog", img, num_inference_steps=2, guidance_scale=5.0,
                        noise_level=50)
    assert out.shape == (1, 10, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_propagation_path(tiny_pipeline):
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 4, 16, 16, 3), minval=-1, maxval=1)
    flows_f = jnp.zeros((1, 3, 16, 16, 2))
    flows_b = jnp.zeros((1, 3, 16, 16, 2))
    out = tiny_pipeline("x", img, flows_bi=(flows_f, flows_b),
                        num_inference_steps=3, guidance_scale=1.0,
                        noise_level=20, propagation_steps=[1])
    assert out.shape == (1, 4, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_deterministic_given_key(tiny_pipeline):
    img = jax.random.uniform(jax.random.PRNGKey(4), (1, 4, 16, 16, 3), minval=-1, maxval=1)
    a = tiny_pipeline("d", img, num_inference_steps=2, guidance_scale=1.0,
                      noise_level=20, key=jax.random.PRNGKey(7))
    b = tiny_pipeline("d", img, num_inference_steps=2, guidance_scale=1.0,
                      noise_level=20, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noise_level_bound(tiny_pipeline):
    img = jnp.zeros((1, 2, 16, 16, 3))
    with pytest.raises(ValueError):
        tiny_pipeline("x", img, noise_level=351)


class TestCheckInputs:
    def test_bad_image_shape(self, tiny_pipeline):
        import pytest

        with pytest.raises(ValueError):
            tiny_pipeline("x", jnp.zeros((1, 16, 16, 3)))  # 4-D

    def test_batch_mismatch(self, tiny_pipeline):
        import pytest

        with pytest.raises(ValueError):
            tiny_pipeline(["a", "b"], jnp.zeros((1, 2, 16, 16, 3)),
                          num_inference_steps=1)

    def test_channels_last_required(self, tiny_pipeline):
        import pytest

        with pytest.raises(ValueError):
            tiny_pipeline("x", jnp.zeros((1, 2, 3, 16, 16)))  # NCHW-ish


def test_progress_callback(tiny_pipeline):
    """progress_cb ticks for denoise and every decode chunk (scan mode)."""
    img = jnp.zeros((1, 4, 16, 16, 3))
    events = []
    tiny_pipeline("a cat", img, num_inference_steps=2, guidance_scale=1.0,
                  progress_cb=lambda s, i, n: events.append((s, i, n)))
    assert ("denoise", 2, 2) in events
    assert [e for e in events if e[0] == "decode"] == [
        ("decode", 1, 2), ("decode", 2, 2)]  # 4 frames / 3-frame chunks
