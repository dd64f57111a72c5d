"""Parity against MORE of the reference's own torch modules (beyond the
UNet/VAE/DDIM fullgraph suite): RAFT, the training-free propagator, and the
color-correction module, each imported from /root/reference and compared to
the TPU-native implementation (weights converted where the module has any).

These replace one-step-removed in-test torch reimplementations with the
reference's actual code as the oracle."""

import os
import sys
from argparse import Namespace

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_shims")
REFERENCE = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def _paths():
    for p in (SHIMS, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    # XLA CPU's default conv/matmul precision is reduced (~0.8% rel error);
    # RAFT's instance-norms + iterative GRU amplify that beyond any usable
    # tolerance. HIGHEST makes the comparison fp32-exact.
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


class TestRaft:
    """Full-graph RAFT (the released raft-things architecture, small=False —
    the VSR path, raft_bi.py:25) vs the reference models_video/RAFT/raft.py,
    weights converted via RAFT_RENAMES."""

    @pytest.mark.slow
    def test_flow_matches_reference(self):
        from models_video.RAFT.raft import RAFT as RefRAFT

        from upscale_a_video_tpu.models.raft import RAFT, RAFT_RENAMES
        from upscale_a_video_tpu.utils.convert import convert_state_dict

        torch.manual_seed(0)
        args = Namespace(small=False, mixed_precision=False)
        tm = RefRAFT(args).eval()

        jm = RAFT()
        # >=128 px: at 64 the /8 feature map's 4th corr-pyramid level is 1x1,
        # where the REFERENCE itself produces NaN (grid_sample 2x/(W-1)-1,
        # W=1 — the documented dormant bug, PARITY.md); real inputs never
        # reach that size
        dummy = jnp.zeros((1, 128, 128, 3))
        tpl = jm.init(jax.random.PRNGKey(0), dummy, dummy, 1)
        sd = {k: v.detach().float().numpy()
              for k, v in tm.state_dict().items()}
        params, report = convert_state_dict(tpl["params"], sd,
                                            renames=RAFT_RENAMES, strict=True)
        # legitimately-unused torch keys: BN bookkeeping counters, and the
        # downsample Sequential's alias of norm3 (extractor.py:44-45 puts the
        # SAME module object at both names, duplicating its state-dict keys)
        leftovers = []
        for k in report["unused"]:
            if k.endswith("num_batches_tracked"):
                continue
            if ".downsample.1." in k:
                np.testing.assert_array_equal(
                    sd[k], sd[k.replace("downsample.1", "norm3")])
                continue
            leftovers.append(k)
        assert not leftovers, leftovers[:8]

        rng = np.random.RandomState(1)
        # frames in [-1, 1]: the reference's [0,255] rescale is commented OUT
        # (raft.py:88-89) — raft_bi feeds driver-normalized [-1,1] frames
        i1 = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
        i2 = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
        t1 = torch.from_numpy(i1.copy())
        t2 = torch.from_numpy(i2.copy())
        with torch.no_grad():
            _, want = tm(t1, t2, iters=3, test_mode=True)
        want = want.numpy()

        got = jm.apply({"params": params},
                       jnp.asarray(i1.transpose(0, 2, 3, 1)),
                       jnp.asarray(i2.transpose(0, 2, 3, 1)), 3)
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


class TestPropagation:
    """Training-free propagator vs the reference's own Propagation module
    (propagation_module.py:194-281) with the released hyperparameters."""

    def test_matches_reference_module(self):
        from models_video.propagation_module import Propagation

        from upscale_a_video_tpu.models.propagation import propagate_latents

        tm = Propagation(4, learnable=False)
        rng = np.random.RandomState(2)
        b, c, t, h, w = 1, 4, 6, 16, 16
        x = rng.randn(b, c, t, h, w).astype(np.float32)
        ff = (rng.randn(b, 2, t - 1, 2 * h, 2 * w) * 3).astype(np.float32)
        fb = (rng.randn(b, 2, t - 1, 2 * h, 2 * w) * 3).astype(np.float32)

        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(ff),
                      torch.from_numpy(fb), interpolation="nearest",
                      mode="fuse", fuse_scale=0.5, alpha1=0.001,
                      alpha2=0.05).numpy()

        got = propagate_latents(
            jnp.asarray(np.moveaxis(x, 1, -1)),
            jnp.asarray(np.moveaxis(ff, 1, -1)),
            jnp.asarray(np.moveaxis(fb, 1, -1)),
            interpolation="nearest", fuse_scale=0.5, alpha1=0.001,
            alpha2=0.05)
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_bilinear_variant(self):
        from models_video.propagation_module import Propagation

        from upscale_a_video_tpu.models.propagation import propagate_latents

        tm = Propagation(4, learnable=False)
        rng = np.random.RandomState(3)
        x = rng.randn(1, 4, 4, 12, 12).astype(np.float32)
        ff = (rng.randn(1, 2, 3, 12, 12) * 2).astype(np.float32)
        fb = (rng.randn(1, 2, 3, 12, 12) * 2).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(ff),
                      torch.from_numpy(fb), interpolation="bilinear",
                      mode="fuse", fuse_scale=0.3, alpha1=0.01,
                      alpha2=0.5).numpy()
        got = propagate_latents(
            jnp.asarray(np.moveaxis(x, 1, -1)),
            jnp.asarray(np.moveaxis(ff, 1, -1)),
            jnp.asarray(np.moveaxis(fb, 1, -1)),
            interpolation="bilinear", fuse_scale=0.3, alpha1=0.01, alpha2=0.5)
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class TestColorCorrection:
    """AdaIN + wavelet color fix vs the reference's color_correction.py."""

    def test_adain(self):
        from models_video.color_correction import adain_color_fix as ref_adain

        from upscale_a_video_tpu.pipeline.color import adain_color_fix

        rng = np.random.RandomState(4)
        content = rng.rand(2, 3, 24, 24).astype(np.float32)
        style = (rng.rand(2, 3, 24, 24) * 0.5 + 0.2).astype(np.float32)
        with torch.no_grad():
            want = ref_adain(torch.from_numpy(content),
                             torch.from_numpy(style)).numpy()
        got = adain_color_fix(jnp.asarray(np.moveaxis(content, 1, -1)),
                              jnp.asarray(np.moveaxis(style, 1, -1)))
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_wavelet(self):
        from models_video.color_correction import (
            wavelet_color_fix as ref_wavelet)

        from upscale_a_video_tpu.pipeline.color import wavelet_color_fix

        rng = np.random.RandomState(5)
        content = rng.rand(1, 3, 40, 40).astype(np.float32)
        style = rng.rand(1, 3, 40, 40).astype(np.float32)
        with torch.no_grad():
            want = ref_wavelet(torch.from_numpy(content),
                               torch.from_numpy(style)).numpy()
        got = wavelet_color_fix(jnp.asarray(np.moveaxis(content, 1, -1)),
                                jnp.asarray(np.moveaxis(style, 1, -1)))
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
