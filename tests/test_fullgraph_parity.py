"""FULL-GRAPH parity against the reference's own torch modules.

The reference models (`/root/reference/models_video`) are imported through
minimal shims (tests/torch_shims: diffusers-0.16 symbols, rotary-embedding-
torch 0.2.3, torchvision.ops.deform_conv2d), random-initialized, converted
with utils/convert.convert_state_dict, and their forward outputs compared to
the flax stack at fp32 tolerance. This is the only pre-weights test that can
catch a converter or wiring error in the whole graph (UNetVideoModel.forward
ref unet_video.py:404; AutoencoderKLVideo.encode/decode ref
autoencoder_kl_cond_video.py:174,209; DDIMScheduler ref scheduling_ddim.py).
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_shims")
REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference package through the shims."""
    for p in (SHIMS, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    import models_video.unet_video as ref_unet
    import models_video.autoencoder_kl_cond_video as ref_vae
    import models_video.scheduling_ddim as ref_ddim

    return ref_unet, ref_vae, ref_ddim


TINY_UNET = {
    "in_channels": 7,
    "out_channels": 4,
    "block_out_channels": [32, 64, 64, 128],
    "down_block_types": ["DownBlock3D", "CrossAttnDownBlock3D",
                         "CrossAttnDownBlock3D", "CrossAttnDownBlock3D"],
    "up_block_types": ["CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
                       "CrossAttnUpBlock3D", "UpBlock3D"],
    "only_cross_attention": [True, True, True, False],
    "layers_per_block": 2,
    # dim_head must be >= the shared RotaryEmbedding(32) dim
    # (unet_video.py:203; rotary asserts rot_dim <= dim_head)
    "attention_head_dim": 1,
    "norm_num_groups": 32,
    "cross_attention_dim": 64,
    "num_class_embeds": 1000,
    "use_linear_projection": True,
    "down_temporal_idx": [0, 1, 2, 3],
    "mid_temporal": True,
    "up_temporal_idx": [0, 1, 2, 3],
    "temporal_module_config": {"attention_block_types": ["", ""]},
}

TINY_VAE_3D = {
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 4,
    "block_out_channels": [32, 64, 64],
    "down_block_types": ["DownEncoderBlock3D"] * 3,
    "up_block_types": ["UpDecoderBlock3D"] * 3,
    "layers_per_block": 2,
    "norm_num_groups": 32,
    "scaling_factor": 0.08333,
}

TINY_VAE_VIDEO = {
    **TINY_VAE_3D,
    "up_block_types": ["UpDecoderBlock3D_plus"] * 3,
    "condition_img": True,
    "condition_channels": 32,
    "use_temporal_block": True,
}

# torch buffers that have no flax parameter (recomputed at trace time)
_KNOWN_UNUSED = ("rotary_emb.freqs",)


def _convert(template, torch_module, renames=None):
    from upscale_a_video_tpu.utils.convert import convert_state_dict

    sd = {k: v.detach().float().numpy()
          for k, v in torch_module.state_dict().items()}
    params, report = convert_state_dict(template, sd, renames=renames,
                                        strict=True)
    leftover = [k for k in report["unused"]
                if not any(s in k for s in _KNOWN_UNUSED)]
    assert not leftover, f"torch keys not consumed by the converter: {leftover[:8]}"
    return params


@pytest.mark.slow
def test_unet_fullgraph_parity(ref_models):
    ref_unet, _, _ = ref_models
    from upscale_a_video_tpu.config import UNetVideoConfig
    from upscale_a_video_tpu.models import UNetVideoModel

    torch.manual_seed(0)
    tm = ref_unet.UNetVideoModel.from_config(dict(TINY_UNET))
    tm.eval()

    cfg = UNetVideoConfig.from_dict(TINY_UNET)
    jm = UNetVideoModel(cfg)
    b, t, h, w = 1, 4, 16, 16
    tpl = jm.init(jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 4)), 0,
                  jnp.zeros((b, t, h, w, 3)),
                  jnp.zeros((b, 5, cfg.cross_attention_dim)), 0)
    params = _convert(tpl["params"], tm)

    rng = np.random.RandomState(1)
    sample = rng.randn(b, 4, t, h, w).astype(np.float32)
    low_res = rng.randn(b, 3, t, h, w).astype(np.float32)
    ctx = rng.randn(b, 5, cfg.cross_attention_dim).astype(np.float32)
    tstep, lvl = 500, 120

    with torch.no_grad():
        out_t = tm(torch.from_numpy(sample), tstep,
                   torch.from_numpy(low_res),
                   encoder_hidden_states=torch.from_numpy(ctx),
                   class_labels=torch.tensor([lvl])).sample.numpy()

    out_j = jm.apply({"params": params},
                     jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),
                     jnp.int32(tstep),
                     jnp.asarray(low_res.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(ctx), jnp.full((b,), lvl, jnp.int32))
    out_j = np.asarray(out_j).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("vae_cfg,conditioned", [
    (TINY_VAE_3D, False),
    (TINY_VAE_VIDEO, True),
])
@pytest.mark.slow
def test_vae_fullgraph_parity(ref_models, vae_cfg, conditioned, monkeypatch):
    # Pin f32 operand storage in the mid attention: the torch shim computes
    # f32 attention, and this test checks the MATH (graph/weights/wiring).
    # The default bf16-operand storage's accuracy bound has its own test
    # (test_cross_attention_block.py::test_vae_mid_attn_bf16_gate) and
    # docs/PARITY.md "Decode precision".
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")
    _, ref_vae, _ = ref_models
    from upscale_a_video_tpu.config import VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo
    from upscale_a_video_tpu.utils.param_init import fast_init

    torch.manual_seed(0)
    tv = ref_vae.AutoencoderKLVideo.from_config(dict(vae_cfg))
    tv.eval()

    cfg = VaeConfig.from_dict(dict(vae_cfg))
    jv = AutoencoderKLVideo(cfg)
    b, t, h, w = 1, 2, 16, 16
    if conditioned:
        enc = jv.init(jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 3)),
                      method=jv.encode_moments)
        dec = jv.init(jax.random.PRNGKey(0),
                      jnp.zeros((b, t, h, w, cfg.latent_channels)),
                      method=jv.decode, img=jnp.zeros((b, t, h, w, 3)))
        tpl = {"params": {**enc["params"], **dec["params"]}}
    else:
        tpl = jv.init(jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 3)))
    params = _convert(tpl["params"], tv)

    rng = np.random.RandomState(2)
    x = rng.randn(b, 3, t, h, w).astype(np.float32)
    z = rng.randn(b, cfg.latent_channels, t, h, w).astype(np.float32)

    with torch.no_grad():
        moments_t = tv.quant_conv(tv.encoder(torch.from_numpy(x))).numpy()
        if conditioned:
            out_t = tv.decode(torch.from_numpy(z), torch.from_numpy(x),
                              1.0).sample.numpy()
        else:
            out_t = tv.decode(torch.from_numpy(z)).sample.numpy()

    moments_j = jv.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                         method=jv.encode_moments)
    moments_j = np.asarray(moments_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(moments_j, moments_t, atol=2e-4, rtol=2e-3)

    kwargs = {"img": jnp.asarray(x.transpose(0, 2, 3, 4, 1)), "w_lr": 1.0} \
        if conditioned else {}
    out_j = jv.apply({"params": params},
                     jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                     method=jv.decode, **kwargs)
    out_j = np.asarray(out_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=2e-3)


def test_ddim_scheduler_parity(ref_models):
    """step == the reference's torch DDIMScheduler bit-for-bit (fp32), for all
    prediction types, plus the split step_v0/step_vt and add_noise."""
    _, _, ref_ddim = ref_models
    from upscale_a_video_tpu.sampling import DDIMScheduler, DDIMSchedulerConfig

    for pred_type in ("epsilon", "v_prediction", "sample"):
        ts = ref_ddim.DDIMScheduler(
            beta_schedule="scaled_linear", prediction_type=pred_type)
        ts.set_timesteps(10)
        js = DDIMScheduler(DDIMSchedulerConfig(
            beta_schedule="scaled_linear", prediction_type=pred_type))

        rng = np.random.RandomState(3)
        sample = rng.randn(1, 4, 2, 8, 8).astype(np.float32)
        for i, t in enumerate(ts.timesteps.numpy()):
            model_out = rng.randn(*sample.shape).astype(np.float32)
            with torch.no_grad():
                got_t = ts.step(torch.from_numpy(model_out), int(t),
                                torch.from_numpy(sample)).prev_sample.numpy()
                v0_t = ts.step_v0(torch.from_numpy(model_out), int(t),
                                  torch.from_numpy(sample)
                                  ).pred_original_sample.numpy()
                vt_t = ts.step_vt(torch.from_numpy(v0_t),
                                  torch.from_numpy(model_out), int(t),
                                  torch.from_numpy(sample)).prev_sample.numpy()

            got_j = np.asarray(js.step(jnp.asarray(model_out), int(t),
                                       jnp.asarray(sample), 10)[0])
            v0_j = np.asarray(js.step_v0(jnp.asarray(model_out), int(t),
                                         jnp.asarray(sample)))
            vt_j = np.asarray(js.step_vt(jnp.asarray(v0_j),
                                         jnp.asarray(model_out), int(t),
                                         jnp.asarray(sample), 10))
            np.testing.assert_allclose(got_j, got_t, atol=1e-5, rtol=1e-5,
                                       err_msg=f"{pred_type} step t={t}")
            np.testing.assert_allclose(v0_j, v0_t, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(vt_j, vt_t, atol=1e-5, rtol=1e-5)
            sample = got_j

        # add_noise / get_velocity
        x0 = rng.randn(2, 4, 8, 8).astype(np.float32)
        noise = rng.randn(*x0.shape).astype(np.float32)
        tt = np.array([3, 7])
        with torch.no_grad():
            noised_t = ts.add_noise(torch.from_numpy(x0),
                                    torch.from_numpy(noise),
                                    torch.from_numpy(tt)).numpy()
        noised_j = np.asarray(js.add_noise(jnp.asarray(x0), jnp.asarray(noise),
                                           jnp.asarray(tt)))
        np.testing.assert_allclose(noised_j, noised_t, atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_unet_fullsize_parity(ref_models):
    """Full released-config UNet (691M params) — slow, run with -m slow."""
    ref_unet, _, _ = ref_models
    from upscale_a_video_tpu.config import UNetVideoConfig
    from upscale_a_video_tpu.models import UNetVideoModel

    torch.manual_seed(0)
    tm = ref_unet.UNetVideoModel.from_config(
        "/root/reference/configs/unet_video_config.json")
    tm.eval()

    cfg = UNetVideoConfig.from_json(
        "/root/reference/configs/unet_video_config.json")
    jm = UNetVideoModel(cfg)
    b, t, h, w = 1, 2, 16, 16
    tpl = jax.eval_shape(
        lambda: jm.init(jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 4)), 0,
                        jnp.zeros((b, t, h, w, 3)),
                        jnp.zeros((b, 5, cfg.cross_attention_dim)), 0))
    tpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tpl)
    params = _convert(tpl["params"], tm)

    rng = np.random.RandomState(1)
    sample = rng.randn(b, 4, t, h, w).astype(np.float32)
    low_res = rng.randn(b, 3, t, h, w).astype(np.float32)
    ctx = rng.randn(b, 5, cfg.cross_attention_dim).astype(np.float32)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(sample), 500,
                   torch.from_numpy(low_res),
                   encoder_hidden_states=torch.from_numpy(ctx),
                   class_labels=torch.tensor([120])).sample.numpy()

    out_j = jm.apply({"params": params},
                     jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),
                     jnp.int32(500),
                     jnp.asarray(low_res.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(ctx), jnp.full((b,), 120, jnp.int32))
    out_j = np.asarray(out_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=5e-3)
