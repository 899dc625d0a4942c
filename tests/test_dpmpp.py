"""DPM-Solver++ (2M) sampler verification (SURVEY.md §4 strategy: pin
numerics with independent oracles, then integration-smoke the wiring).

Three layers of evidence, none of which require diffusers in-env:
  1. an exact-epsilon GAUSSIAN oracle where the probability-flow ODE is
     known to arbitrary precision (a 1000-step DDIM integration of the
     same linear vector field): the solver must (a) beat first-order DDIM
     at equal step count and (b) show ~2nd-order error decay in the step
     count — this verifies the SOLVER, not just a transcription;
  2. a float64 pure-numpy cross-implementation of the same update
     (independent code path; catches scan/coefficient wiring bugs);
  3. pipeline integration: `RefinerPipelineConfig(sampler="dpmpp")`
     through the real FacialRefiner stack, hoisted and unhoisted.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifidiff_tpu.diffusion import (
    DiffusionSchedule,
    ddim_timesteps,
    sample_ddim,
    sample_dpmpp_2m,
)


def gaussian_eps_fn(schedule, mu, v):
    """Exact epsilon-posterior for data x0 ~ N(mu, v^2 I):
    E[eps | x_t] = (x_t - a_t * mu) * s_t / (a_t^2 v^2 + s_t^2)."""
    acp = jnp.asarray(schedule.alphas_cumprod)

    def eps_fn(x, t):
        a2 = acp[t.astype(jnp.int32)][0]
        a, s = jnp.sqrt(a2), jnp.sqrt(1.0 - a2)
        return (x - a * mu) * s / (a2 * v * v + s * s)

    return eps_fn


class TestSolverOrder:
    """Both oracles admit CLOSED-FORM probability-flow solutions, so the
    solvers are measured against exact truth (not another sampler). Note
    the 'leading' grid starts at t0 = T - T//n, so the exact endpoint is
    computed from each run's own start point."""

    def _gaussian_errors(self, steps_list):
        """Data x0 ~ N(mu, v^2): the flow preserves the marginal quantile,
        x_t = a_t*mu + sqrt(a_t^2 v^2 + s_t^2) * z with z constant."""
        s = DiffusionSchedule.create()
        acp = np.asarray(s.alphas_cumprod, np.float64)
        mu, v = 0.7, 0.5
        eps_fn = gaussian_eps_fn(s, mu, v)
        x_t = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 2),
                                jnp.float32)
        out = {}
        for n in steps_list:
            t0 = 1000 - 1000 // n
            a2s = acp[t0]
            z = ((np.asarray(x_t, np.float64) - np.sqrt(a2s) * mu)
                 / np.sqrt(a2s * v * v + 1.0 - a2s))
            # propagate to grid-end t=0, apply the exact posterior mean
            # (= the solvers' final sigma->0 boundary step)
            a20 = acp[0]
            x0g = np.sqrt(a20) * mu + np.sqrt(a20 * v * v + 1 - a20) * z
            a, s2 = np.sqrt(a20), 1.0 - a20
            ref = mu + (a * v * v / (a20 * v * v + s2)) * (x0g - a * mu)
            out[("ddim", n)] = float(np.max(np.abs(np.asarray(
                sample_ddim(eps_fn, x_t, s, num_inference_steps=n),
                np.float64) - ref)))
            out[("dpmpp", n)] = float(np.max(np.abs(np.asarray(
                sample_dpmpp_2m(eps_fn, x_t, s, num_inference_steps=n),
                np.float64) - ref)))
        return out

    def _linear_errors(self, steps_list):
        """eps = (1-C) x / sigma_t <=> x0-pred m = C x / alpha_t: the flow
        ODE integrates to x(lam) = x_s (sigma/sigma_s) exp(C (lam-lam_s)).
        m varies strongly along the trajectory, so the D1 term matters."""
        s = DiffusionSchedule.create()
        acp = np.asarray(s.alphas_cumprod, np.float64)
        accp = jnp.asarray(s.alphas_cumprod)
        C = 0.3
        x_t = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 2),
                                jnp.float32)

        def eps_fn(x, t):
            a2 = accp[t.astype(jnp.int32)][0]
            return (1.0 - C) * x / jnp.sqrt(1.0 - a2)

        out = {}
        for n in steps_list:
            t0 = 1000 - 1000 // n
            a2s, a20 = acp[t0], acp[0]
            ss, s0 = np.sqrt(1 - a2s), np.sqrt(1 - a20)
            lams = np.log(np.sqrt(a2s) / ss)
            lam0 = np.log(np.sqrt(a20) / s0)
            x0g = (np.asarray(x_t, np.float64) * (s0 / ss)
                   * np.exp(C * (lam0 - lams)))
            ref = C * x0g / np.sqrt(a20)   # final boundary step, exact
            scale = float(np.max(np.abs(ref)))
            out[("ddim", n)] = float(np.max(np.abs(np.asarray(
                sample_ddim(eps_fn, x_t, s, num_inference_steps=n),
                np.float64) - ref))) / scale
            out[("dpmpp", n)] = float(np.max(np.abs(np.asarray(
                sample_dpmpp_2m(eps_fn, x_t, s, num_inference_steps=n),
                np.float64) - ref))) / scale
        return out

    @pytest.mark.smoke
    def test_beats_ddim_on_linear_oracle(self):
        # measured (CPU, f32 sampler vs f64 closed form):
        #   n=10: ddim 2.35 dpmpp 1.33 | n=20: 1.22/0.50 | n=40: 0.66/0.21
        err = self._linear_errors([10, 20, 40])
        for n in (10, 20, 40):
            assert err[("dpmpp", n)] < 0.65 * err[("ddim", n)], err
        # decays at least as fast as first order with margin
        assert err[("dpmpp", 10)] / max(err[("dpmpp", 40)], 1e-12) > 4.0, err

    def test_gaussian_posterior_oracle(self):
        # measured: n=20 ddim 0.136 dpmpp 0.130 | n=40 0.070/0.035
        # (the noisy-end lambda steps of the leading grid are huge, so the
        # 2nd-order win only opens up once h shrinks — same reason
        # diffusers defaults lower_order_final on for <15 steps)
        err = self._gaussian_errors([20, 40])
        assert err[("dpmpp", 20)] < 1.1 * err[("ddim", 20)], err
        assert err[("dpmpp", 40)] < 0.7 * err[("ddim", 40)], err

    def test_bf16_latents_stay_bf16(self):
        """The production pipeline scans bf16; solver math runs f32
        internally but the sample carry must keep the caller's dtype
        (found by an on-device drive: f32-promoted carry broke the scan)."""
        s = DiffusionSchedule.create()
        accp = jnp.asarray(s.alphas_cumprod)
        x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 2))

        def eps_fn(x, t):
            a2 = accp[t.astype(jnp.int32)][0]
            return (x.astype(jnp.float32) - jnp.sqrt(a2) * x0) \
                / jnp.sqrt(1.0 - a2)

        x_t = jax.random.normal(jax.random.PRNGKey(6), x0.shape,
                                jnp.bfloat16)
        out = jax.jit(lambda x: sample_dpmpp_2m(
            eps_fn, x, s, num_inference_steps=8))(x_t)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(x0), atol=0.05)

    def test_point_mass_recovered_exactly(self):
        """v -> 0: the x0-prediction is constant, so D1 = 0 and EVERY
        consistent solver ends exactly at x0 regardless of step count."""
        s = DiffusionSchedule.create()
        key = jax.random.PRNGKey(1)
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        acp = jnp.asarray(s.alphas_cumprod)

        def eps_fn(x, t):
            a2 = acp[t.astype(jnp.int32)][0]
            return (x - jnp.sqrt(a2) * x0) / jnp.sqrt(1.0 - a2)

        out = sample_dpmpp_2m(eps_fn, jax.random.normal(key, x0.shape), s,
                              num_inference_steps=12)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=2e-4)


def dpmpp_2m_numpy(eps_fn, x, acp, num_steps):
    """Independent float64 transcription of DPM-Solver++ (2M) (epsilon
    prediction, midpoint 2nd order, final sigma 0, first-order first and
    final steps), written directly from the update equations — a separate
    code path from `diffusion/sampling.py` (no shared coefficient code)."""
    acp = np.asarray(acp, np.float64)
    T = len(acp)
    ratio = T // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(int)
    x = np.asarray(x, np.float64)
    m_prev, h_prev = None, None
    for i, t in enumerate(ts):
        a2 = acp[t]
        a, sg = np.sqrt(a2), np.sqrt(1.0 - a2)
        m0 = (x - sg * np.asarray(eps_fn(x, t), np.float64)) / a
        t_next = t - ratio
        if t_next >= 0:
            a2n = acp[t_next]
            an, sn = np.sqrt(a2n), np.sqrt(1.0 - a2n)
            lam, lam_n = np.log(a / sg), np.log(an / sn)
            h = lam_n - lam
            if m_prev is None or i == num_steps - 1:
                x = (sn / sg) * x - an * np.expm1(-h) * m0
            else:
                r0 = h_prev / h
                d1 = (m0 - m_prev) / r0
                x = (sn / sg) * x - an * np.expm1(-h) * (m0 + 0.5 * d1)
            h_prev = h
        else:
            x = m0  # final boundary: alpha_bar=1, sigma=0
        m_prev = m0
    return x


class TestNumpyCrossImplementation:
    def test_matches_scan_implementation(self):
        s = DiffusionSchedule.create()
        key = jax.random.PRNGKey(2)
        x_t = jax.random.normal(key, (2, 6, 6, 2), jnp.float32)
        acp = np.asarray(s.alphas_cumprod)

        def eps_np(x, t):
            return np.tanh(0.3 * x + t / 1000.0)

        def eps_jax(x, t):
            return jnp.tanh(0.3 * x + t[0] / 1000.0)

        for n in (8, 20):
            ours = np.asarray(sample_dpmpp_2m(eps_jax, x_t, s,
                                              num_inference_steps=n))
            ref = dpmpp_2m_numpy(eps_np, np.asarray(x_t), acp, n)
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_grid_matches_ddim_spacing(self):
        from hifidiff_tpu.diffusion.sampling import dpmpp_2m_coeffs

        s = DiffusionSchedule.create()
        co = dpmpp_2m_coeffs(s, 20)
        np.testing.assert_array_equal(co["t"], ddim_timesteps(1000, 20))
        # first and final steps are first-order: no D1 contribution
        assert co["c_d1"][0] == 0.0 and co["c_d1"][-1] == 0.0
        assert np.all(np.isfinite(co["c_x"]))
        assert np.all(np.isfinite(co["c_d0"]))
        assert np.all(np.isfinite(co["c_d1"]))
        # final boundary: sigma=0 kills the x term, alpha=1 keeps x0
        assert co["c_x"][-1] == 0.0
        np.testing.assert_allclose(co["c_d0"][-1], 1.0, rtol=1e-12)


class TestPipelineIntegration:
    def _tiny_stack(self):
        from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
        from hifidiff_tpu.vae import AutoencoderKL

        key = jax.random.PRNGKey(0)
        res, latent = 32, 8
        cr = CoarseRestoration(width=8, resolution=res, enc_nums=(1, 1),
                               mid_num=1, dec_nums=(1, 1))
        vae = AutoencoderKL(block_out=(32, 32, 32), layers_per_block=1)
        refiner = FacialRefiner(latent_size=latent, width=16,
                                enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1),
                                idc_stage_sizes=(1, 1, 1, 1))
        rv = refiner.init(key, jnp.zeros((1, latent, latent, 4)),
                          jnp.zeros((1,)), jnp.zeros((1, res, res, 3)),
                          jnp.zeros((1, latent, latent, 4)), train=False)
        return cr, vae, refiner, res, latent, {
            "refiner": {"params": rv["params"],
                        "batch_stats": rv.get("batch_stats", {})},
            "cr": cr.init(key, jnp.zeros((1, res, res, 3)))["params"],
            "vae": vae.init(key, jnp.zeros((1, res, res, 3)))["params"],
        }

    def test_dpmpp_through_refiner_pipeline(self):
        from hifidiff_tpu.pipeline import (
            RefinerPipelineConfig,
            build_refiner_sampler_split,
        )

        cr, vae, refiner, res, latent, variables = self._tiny_stack()
        schedule = DiffusionSchedule.create()
        lr = jax.random.uniform(jax.random.PRNGKey(3), (2, res, res, 3))
        outs = {}
        for hoist in (True, False):
            cfg = RefinerPipelineConfig(num_inference_steps=6,
                                        latent_size=latent, sampler="dpmpp",
                                        hoist_invariants=hoist)
            fn = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                             cfg)
            out = np.asarray(fn(variables, lr, jax.random.PRNGKey(4)))
            assert out.shape == (2, res, res, 3)
            assert np.isfinite(out).all()
            outs[hoist] = out
        # hoisting is an identical-math transform for dpmpp too
        np.testing.assert_allclose(outs[True], outs[False], rtol=2e-2,
                                   atol=2e-3)

    def test_config_validation(self):
        from hifidiff_tpu.pipeline import RefinerPipelineConfig

        with pytest.raises(ValueError):
            RefinerPipelineConfig(sampler="dpmpp", cache_interval=2)
        with pytest.raises(ValueError):
            RefinerPipelineConfig(sampler="dpmpp", eta=0.5)
        with pytest.raises(ValueError):
            RefinerPipelineConfig(sampler="euler")
