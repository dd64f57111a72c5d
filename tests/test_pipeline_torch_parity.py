"""PIPELINE-LEVEL torch parity: the reference's own
``VideoUpscalePipeline.__call__`` (pipeline_upscale_a_video.py:436-717),
driven through the shims with its real torch modules, vs our
``pipeline/pipeline.py`` with converted weights and matched noise.

This composes everything the single-forward fullgraph tests
(test_fullgraph_parity.py) cannot: multi-step DDIM + CFG + the sliding-window
blend + flow-guided propagation between step_v0/step_vt + chunked conditional
VAE decode + CLIP text encoding through the in-repo BPE tokenizer — the
strongest pre-released-weights check of the whole sampling algebra.

Noise matching: torch draws noise via the (shimmed) ``randn_tensor`` and the
initial latents via ``prepare_latents_3d``; the test monkeypatches
``randn_tensor`` to pop pre-drawn arrays and passes the same arrays to our
pipeline through its ``latents=``/``lr_noise=`` seams.
"""

import json
import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_shims")
REFERENCE = "/root/reference"

pytestmark = pytest.mark.slow

TINY_UNET = {
    "in_channels": 7,
    "out_channels": 4,
    "block_out_channels": [32, 64, 64, 128],
    "down_block_types": ["DownBlock3D", "CrossAttnDownBlock3D",
                         "CrossAttnDownBlock3D", "CrossAttnDownBlock3D"],
    "up_block_types": ["CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
                       "CrossAttnUpBlock3D", "UpBlock3D"],
    "only_cross_attention": [True, True, True, False],
    "layers_per_block": 1,
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

TINY_VAE_VIDEO = {
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 4,
    "block_out_channels": [32, 64, 64],
    "down_block_types": ["DownEncoderBlock3D"] * 3,
    "up_block_types": ["UpDecoderBlock3D_plus"] * 3,
    "layers_per_block": 1,
    "norm_num_groups": 32,
    "scaling_factor": 0.08333,
    "condition_img": True,
    "condition_channels": 32,
    "use_temporal_block": True,
}

_KNOWN_UNUSED = ("rotary_emb.freqs",)

# a complete-but-tiny CLIP BPE vocab (all 512 byte tokens + merges +
# specials) — enough for the REAL tokenizer stack on both sides
MERGES = [("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>"),
          ("a", "n"), ("an", "d</w>"), ("d", "o"), ("do", "g</w>")]


def _convert(template, torch_module, renames=None, prefix=""):
    from upscale_a_video_tpu.utils.convert import convert_state_dict

    sd = {k: v.detach().float().numpy()
          for k, v in torch_module.state_dict().items()}
    params, report = convert_state_dict(template, sd, renames=renames,
                                        prefix=prefix, strict=True)
    leftover = [k for k in report["unused"]
                if not any(s in k for s in _KNOWN_UNUSED)
                and "position_ids" not in k]
    assert not leftover, f"unconsumed torch keys: {leftover[:8]}"
    return params


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    from upscale_a_video_tpu.utils.clip_bpe import bytes_to_unicode

    vocab = list(bytes_to_unicode().values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in MERGES]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    d = tmp_path_factory.mktemp("tok")
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump({t: i for i, t in enumerate(vocab)}, f, ensure_ascii=False)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in MERGES:
            f.write(f"{a} {b}\n")
    return str(d)


@pytest.fixture(scope="module")
def ref_pipeline_cls():
    for p in (SHIMS, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    import models_video.pipeline_upscale_a_video as ref_pipe_mod

    return ref_pipe_mod


def test_composed_pipeline_matches_reference(ref_pipeline_cls, tok_dir,
                                             monkeypatch):
    # Pin f32 operand storage in the VAE mid attention for the torch
    # comparison (the shim computes f32 attention); the bf16-operand
    # default's bound is tested/documented separately (PARITY.md
    # "Decode precision").
    monkeypatch.setenv("UAV_VAE_ATTN_F32", "1")
    ref_mod = ref_pipeline_cls
    import transformers

    import models_video.propagation_module as ref_prop
    import models_video.scheduling_ddim as ref_ddim
    import models_video.unet_video as ref_unet
    import models_video.autoencoder_kl_cond_video as ref_vae
    from diffusers.schedulers import DDPMScheduler as ShimDDPM

    from upscale_a_video_tpu.config import UNetVideoConfig, VaeConfig
    from upscale_a_video_tpu.models import AutoencoderKLVideo, UNetVideoModel
    from upscale_a_video_tpu.models.clip_text import (CLIPTextConfig,
                                                      CLIPTextModel)
    from upscale_a_video_tpu.pipeline.pipeline import (PipelineModules,
                                                       VideoUpscalePipeline)
    from upscale_a_video_tpu.sampling import (DDIMScheduler,
                                              DDIMSchedulerConfig,
                                              DDPMScheduler)
    from upscale_a_video_tpu.utils.clip_bpe import load_clip_tokenizer
    from upscale_a_video_tpu.utils.convert import CLIP_RENAMES

    # ---------------------------------------------------------- torch side
    torch.manual_seed(0)
    t_unet = ref_unet.UNetVideoModel.from_config(dict(TINY_UNET)).eval()
    t_vae = ref_vae.AutoencoderKLVideo.from_config(dict(TINY_VAE_VIDEO)).eval()
    vocab_size = 512 + len(MERGES) + 2
    t_clip_cfg = transformers.CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu",
    )
    t_clip = transformers.CLIPTextModel(t_clip_cfg).eval()
    t_tok = transformers.CLIPTokenizer(
        vocab_file=os.path.join(tok_dir, "vocab.json"),
        merges_file=os.path.join(tok_dir, "merges.txt"),
        model_max_length=77)  # the bundle's tokenizer_config.json value
    t_sched = ref_ddim.DDIMScheduler(beta_schedule="scaled_linear")
    t_lrs = ShimDDPM(beta_schedule="linear", beta_start=0.0001, beta_end=0.02)
    t_propagator = ref_prop.Propagation(4, learnable=False)

    ref_pipe = ref_mod.VideoUpscalePipeline(
        text_encoder=t_clip, tokenizer=t_tok, low_res_scheduler=t_lrs,
        scheduler=t_sched, vae=t_vae, unet=t_unet, propagator=t_propagator)

    # ------------------------------------------------------------ jax side
    j_unet = UNetVideoModel(UNetVideoConfig.from_dict(TINY_UNET))
    j_vae = AutoencoderKLVideo(VaeConfig.from_dict(dict(TINY_VAE_VIDEO)))
    j_clip = CLIPTextModel(CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu"))

    b, t, h, w = 1, 10, 16, 16
    u_tpl = j_unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 4)), 0,
                        jnp.zeros((1, 2, h, w, 3)), jnp.zeros((1, 5, 64)), 0)
    enc = j_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, h, w, 3)),
                     method=j_vae.encode_moments)
    dec = j_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, h, w, 4)),
                     method=j_vae.decode, img=jnp.zeros((1, 1, h, w, 3)))
    v_tpl = {"params": {**enc["params"], **dec["params"]}}
    c_tpl = j_clip.init(jax.random.PRNGKey(2), jnp.zeros((1, 77), jnp.int32))

    modules = PipelineModules(
        unet=j_unet, unet_params={"params": _convert(u_tpl["params"], t_unet)},
        vae=j_vae, vae_params={"params": _convert(v_tpl["params"], t_vae)},
        text_encoder=j_clip,
        text_params={"params": _convert(c_tpl["params"], t_clip,
                                        renames=CLIP_RENAMES,
                                        prefix="text_model.")},
        tokenizer=load_clip_tokenizer(tok_dir),
        scheduler=DDIMScheduler(
            DDIMSchedulerConfig(beta_schedule="scaled_linear")),
        low_res_scheduler=DDPMScheduler.from_dict(
            {"beta_schedule": "linear", "beta_start": 0.0001,
             "beta_end": 0.02}),
    )
    j_pipe = VideoUpscalePipeline(modules, dtype=jnp.float32,
                                  decode_dtype=jnp.float32)

    # -------------------------------------------------- matched noise/input
    rng = np.random.RandomState(7)
    image = rng.uniform(-1, 1, (b, 3, t, h, w)).astype(np.float32)
    lr_noise = rng.randn(b, 3, t, h, w).astype(np.float32)
    latents0 = rng.randn(b, 4, t, h, w).astype(np.float32)
    # reference flow layout: (B, 2, T-1, H, W) — raft_bi.py:65-67
    flows_f = (rng.randn(b, 2, t - 1, h, w) * 2.0).astype(np.float32)
    flows_b = (rng.randn(b, 2, t - 1, h, w) * 2.0).astype(np.float32)

    queue = [torch.from_numpy(lr_noise)]
    orig_randn = ref_mod.randn_tensor
    ref_mod.randn_tensor = lambda *a, **k: queue.pop(0)
    try:
        with torch.no_grad():
            out_t, lat_t = ref_pipe(
                prompt=["the cat and the dog"],
                image=torch.from_numpy(image),
                flows_bi=[torch.from_numpy(flows_f),
                          torch.from_numpy(flows_b)],
                num_inference_steps=3,
                guidance_scale=4.0,
                noise_level=40,
                negative_prompt=["the dog"],
                propagation_steps=[1],
                latents=torch.from_numpy(latents0),
                w_lr=1.0,
                return_dict=False,
            )
    finally:
        ref_mod.randn_tensor = orig_randn

    # channels-last conversions: (B,C,T,H,W) -> (B,T,H,W,C); flows likewise
    cl = lambda x: jnp.asarray(np.moveaxis(x, 1, -1))
    out_j, lat_j = j_pipe(
        "the cat and the dog", cl(image),
        flows_bi=(cl(flows_f), cl(flows_b)),
        num_inference_steps=3, guidance_scale=4.0, noise_level=40,
        negative_prompt="the dog", propagation_steps=(1,),
        latents=cl(latents0), lr_noise=cl(lr_noise),
        return_latents=True,
    )

    lat_t = lat_t.numpy()
    out_t = out_t.numpy()
    lat_j = np.moveaxis(np.asarray(lat_j), -1, 1)
    out_j = np.moveaxis(np.asarray(out_j), -1, 1)

    np.testing.assert_allclose(lat_j, lat_t, atol=1e-3, rtol=2e-3,
                               err_msg="final latents diverge from torch")
    np.testing.assert_allclose(out_j, out_t, atol=2e-3, rtol=2e-3,
                               err_msg="decoded frames diverge from torch")
