"""Schedule/sampler tests: closed-form constants, round-trip invariants,
and jit/scan compilation (SURVEY.md §4 test plan, item c)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.diffusion import (
    DiffusionSchedule,
    ddim_timesteps,
    sample_ddim,
    sample_ddpm,
)


class TestSchedule:
    @pytest.mark.smoke
    def test_scaled_linear_constants(self):
        s = DiffusionSchedule.create()
        betas = np.asarray(s.betas)
        assert betas.shape == (1000,)
        np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
        np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)
        # scaled_linear: sqrt(betas) is affine in t
        sq = np.sqrt(betas)
        diffs = np.diff(sq)
        np.testing.assert_allclose(diffs, diffs[0], rtol=1e-3)
        acp = np.asarray(s.alphas_cumprod)
        np.testing.assert_allclose(acp, np.cumprod(1 - betas), rtol=1e-5)

    def test_add_noise_formula(self):
        s = DiffusionSchedule.create()
        x0 = jnp.ones((2, 4, 4, 4))
        noise = jnp.full((2, 4, 4, 4), 2.0)
        t = jnp.array([0, 999])
        out = np.asarray(s.add_noise(x0, noise, t))
        acp = np.asarray(s.alphas_cumprod)
        for b, tt in enumerate([0, 999]):
            expect = np.sqrt(acp[tt]) * 1.0 + np.sqrt(1 - acp[tt]) * 2.0
            np.testing.assert_allclose(out[b], expect, rtol=1e-5)


class TestDDIM:
    def test_timestep_spacing(self):
        ts = ddim_timesteps(1000, 50)
        assert len(ts) == 50
        assert ts[0] == 980 and ts[-1] == 0
        assert np.all(np.diff(ts) == -20)

    @pytest.mark.smoke
    def test_perfect_eps_recovers_x0(self):
        """If the model predicts the exact epsilon of the trajectory, eta=0
        DDIM returns x0 to numerical precision (samples stay on the
        (x0, eps) line)."""
        s = DiffusionSchedule.create()
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        x0 = jax.random.normal(k1, (2, 8, 8, 4))
        eps = jax.random.normal(k2, (2, 8, 8, 4))
        acp_start = s.alphas_cumprod[980]
        x_start = jnp.sqrt(acp_start) * x0 + jnp.sqrt(1 - acp_start) * eps

        out = sample_ddim(lambda x, t: eps, x_start, s, num_inference_steps=50)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)

    def test_jit_one_program(self):
        s = DiffusionSchedule.create()

        @jax.jit
        def run(lat):
            return sample_ddim(lambda x, t: 0.1 * x, lat, s,
                               num_inference_steps=10)

        out = run(jnp.ones((1, 4, 4, 4)))
        assert out.shape == (1, 4, 4, 4)
        assert bool(jnp.isfinite(out).all())

    def test_clip_sample(self):
        s = DiffusionSchedule.create()
        lat = jnp.full((1, 2, 2, 4), 50.0)
        out = sample_ddim(lambda x, t: jnp.zeros_like(x), lat, s,
                          num_inference_steps=5, clip_sample=True,
                          clip_sample_range=3.0)
        assert float(jnp.abs(out).max()) <= 3.0 + 1e-5

    def test_eta_requires_key(self):
        s = DiffusionSchedule.create()
        lat = jnp.zeros((1, 2, 2, 4))
        try:
            sample_ddim(lambda x, t: x, lat, s, num_inference_steps=2, eta=0.5)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestDDPM:
    def test_full_schedule_denoises(self):
        """Ancestral sampling with a perfect-epsilon oracle should land near
        x0 (up to injected posterior noise)."""
        s = DiffusionSchedule.create(num_train_timesteps=100)
        key = jax.random.PRNGKey(1)
        x0 = jnp.zeros((1, 4, 4, 4))
        lat = jax.random.normal(key, (1, 4, 4, 4))

        def eps_fn(x, t):
            # exact eps for current x given target x0=0:
            # x = sqrt(acp) x0 + sqrt(1-acp) eps  =>  eps = x / sqrt(1-acp)
            acp = s.alphas_cumprod[t.astype(jnp.int32)]
            return x / jnp.sqrt(1 - acp).reshape(-1, 1, 1, 1)

        out = sample_ddpm(eps_fn, lat, s, key=jax.random.PRNGKey(2),
                          clip_sample=False)
        assert float(jnp.abs(out - x0).mean()) < 0.2
