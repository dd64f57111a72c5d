"""DDIM scheduler numerics: closed-form identities + torch-free golden checks.

Covers the reference's split-step API (scheduling_ddim.py:261-520) including
the step == step_v0 + step_vt composition the pipeline relies on
(pipeline_upscale_a_video.py:649-659).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_a_video_tpu.sampling import (
    DDIMScheduler,
    DDIMSchedulerConfig,
    DDPMScheduler,
)


def make_sched(**kw):
    return DDIMScheduler(DDIMSchedulerConfig(**kw))


class TestSchedules:
    def test_linear_betas(self):
        s = make_sched(beta_schedule="linear", beta_start=1e-4, beta_end=0.02)
        assert s.betas.shape == (1000,)
        assert np.isclose(s.betas[0], 1e-4)
        assert np.isclose(s.betas[-1], 0.02)

    def test_scaled_linear_betas(self):
        s = make_sched(beta_schedule="scaled_linear")
        # linear in sqrt-space
        sq = np.sqrt(s.betas)
        diffs = np.diff(sq)
        assert np.allclose(diffs, diffs[0], atol=1e-6)

    def test_cosine_betas_capped(self):
        s = make_sched(beta_schedule="squaredcos_cap_v2")
        assert s.betas.max() <= 0.999 + 1e-6
        assert (s.betas > 0).all()

    def test_alphas_cumprod_monotone(self):
        s = make_sched()
        assert (np.diff(s.alphas_cumprod) < 0).all()
        assert 0 < s.alphas_cumprod[-1] < s.alphas_cumprod[0] < 1


class TestTimesteps:
    def test_grid_default(self):
        s = make_sched()
        ts = s.timesteps(30)
        # descending integer grid with stride num_train//steps (ref :237-259)
        assert ts.shape == (30,)
        assert ts[0] == 33 * 29
        assert ts[-1] == 0
        assert (np.diff(ts) == -33).all()

    def test_steps_offset(self):
        s = make_sched(steps_offset=1)
        ts = s.timesteps(10)
        assert ts[-1] == 1

    def test_too_many_steps_raises(self):
        with pytest.raises(ValueError):
            make_sched().timesteps(1001)


class TestStepAlgebra:
    """Identity checks derivable from the DDIM equations."""

    def test_epsilon_roundtrip_noiseless(self):
        # With the true eps, x0 recovered from add_noise(x0) must equal x0.
        s = make_sched(clip_sample=False)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.uniform(key, (2, 4, 8, 8), minval=-0.9, maxval=0.9)
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = 500
        xt = s.add_noise(x0, noise, jnp.full((2,), t))
        x0_hat = s.step_v0(noise, t, xt)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)

    def test_step_equals_v0_plus_vt(self):
        # The pipeline's split update must match the fused `step`.
        s = make_sched()
        key = jax.random.PRNGKey(2)
        sample = jax.random.normal(key, (1, 4, 8, 8))
        eps = jax.random.normal(jax.random.PRNGKey(3), sample.shape)
        n_steps = 30
        for t in [int(x) for x in s.timesteps(n_steps)[:4]]:
            fused, x0 = s.step(eps, t, sample, n_steps)
            v0 = s.step_v0(eps, t, sample)
            np.testing.assert_allclose(np.asarray(v0), np.asarray(x0), atol=1e-6)
            split = s.step_vt(v0, eps, t, sample, n_steps)
            np.testing.assert_allclose(np.asarray(split), np.asarray(fused), atol=1e-6)

    def test_clip_applied(self):
        s = make_sched(clip_sample=True, clip_sample_range=1.0)
        sample = jnp.full((1, 4, 4, 4), 10.0)
        x0 = s.step_v0(jnp.zeros_like(sample), 10, sample)
        assert float(jnp.max(jnp.abs(x0))) <= 1.0

    def test_final_step_uses_final_alpha(self):
        # At t=0, prev_timestep < 0 → alpha_prod_prev = 1 (set_alpha_to_one).
        s = make_sched(clip_sample=False)
        sample = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8))
        eps = jax.random.normal(jax.random.PRNGKey(5), sample.shape)
        prev, x0 = s.step(eps, 0, sample, 30)
        # alpha_prod_prev = 1 → prev = x0 exactly
        np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), atol=1e-5)

    def test_v_prediction_consistency(self):
        s = make_sched(prediction_type="v_prediction", clip_sample=False)
        x0 = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 8, 8)) * 0.5
        noise = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
        t = jnp.array([400, 700])
        xt = s.add_noise(x0, noise, t)
        v = s.get_velocity(x0, noise, t)
        # step_v0 under v-prediction must recover x0 from (xt, v)
        x0_hat = s.step_v0(v, t, xt)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)

    def test_eta_noise_requires_key(self):
        s = make_sched()
        sample = jnp.zeros((1, 4, 4, 4))
        with pytest.raises(ValueError):
            s.step(sample, 100, sample, 30, eta=0.5)

    def test_eta_deterministic_with_key(self):
        s = make_sched()
        sample = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(9), sample.shape)
        k = jax.random.PRNGKey(10)
        a, _ = s.step(eps, 500, sample, 30, eta=1.0, key=k)
        b, _ = s.step(eps, 500, sample, 30, eta=1.0, key=k)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_jit_scan_denoise_loop(self):
        # The whole loop must compile with traced timesteps.
        s = make_sched(clip_sample=False)
        n_steps = 10
        ts = jnp.asarray(s.timesteps(n_steps))
        x = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 8, 8))

        @jax.jit
        def run(x):
            def body(carry, t):
                eps = carry * 0.1  # stand-in "model"
                v0 = s.step_v0(eps, t, carry)
                nxt = s.step_vt(v0, eps, t, carry, n_steps)
                return nxt, ()

            out, _ = jax.lax.scan(body, x, ts)
            return out

        out = run(x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


class TestDynamicThresholding:
    def test_threshold_scales_to_unit(self):
        s = make_sched(thresholding=True, sample_max_value=1.5)
        sample = jnp.zeros((2, 4, 8, 8))
        big = jnp.full((2, 4, 8, 8), 4.0)
        # x0 = big (epsilon=0, alpha~1 at t=0 → near-identity); thresholded to <= sample_max_value
        x0 = s.step_v0(sample, 0, big)
        assert float(jnp.max(jnp.abs(x0))) <= 1.5 + 1e-5


class TestDDPM:
    def test_add_noise_matches_ddim(self):
        ddpm = DDPMScheduler()
        ddim = make_sched(beta_schedule="scaled_linear")
        x = jax.random.normal(jax.random.PRNGKey(12), (2, 3, 8, 8))
        n = jax.random.normal(jax.random.PRNGKey(13), x.shape)
        t = jnp.array([100, 900])
        np.testing.assert_allclose(
            np.asarray(ddpm.add_noise(x, n, t)), np.asarray(ddim.add_noise(x, n, t)), atol=1e-6
        )

    def test_step_t0_recovers_x0(self):
        ddpm = DDPMScheduler()
        x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(14), (1, 3, 8, 8)) * 0.3, -1, 1)
        noise = jax.random.normal(jax.random.PRNGKey(15), x0.shape)
        t = jnp.array([0])
        xt = ddpm.add_noise(x0, noise, t)
        prev, x0_hat = ddpm.step(noise, 0, xt)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), atol=1e-4)
