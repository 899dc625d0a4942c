"""Golden tests of DDIM/DDPM stepping against a plain-numpy transcription
of the diffusers schedulers the reference runs (VERDICT round-1 item 5).

The reference constructs `DDIMScheduler(num_train_timesteps=1000,
beta_schedule="scaled_linear", prediction_type="epsilon")` and loops
`scheduler.step(model_output, t, latents)` (`/root/reference/
test_refiner.py:85-91`, `pretrain_denoiser.py:261-272`). diffusers is not
installed in this environment, so the oracle below is a line-by-line
transcription of `DDIMScheduler.step` / `DDPMScheduler.step` semantics
(diffusers v0.25+, defaults the reference uses):

  * "leading" timestep spacing: ts = (arange(n) * (T//n)).round()[::-1]
  * set_alpha_to_one=True: alpha_prod_prev for prev_t < 0 is 1.0
  * epsilon prediction: x0 = (x - sqrt(1-a_t) eps) / sqrt(a_t)
  * clip_sample clips x0 AFTER prediction; the direction term keeps the
    RAW model epsilon (diffusers does not re-derive eps from clipped x0
    for prediction_type="epsilon")
  * DDPM fixed_small variance: var = (1-a_prev)/(1-a_t) * beta_t,
    clamped >= 1e-20, no noise at t == 0

These run the jax samplers and the numpy oracle with the SAME synthetic
eps function (and, for DDPM, the same PRNG noise sequence replayed into
the oracle) and require agreement to float32 precision.
"""

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


def synth_eps(x, t_scalar):
    """Deterministic, state-dependent pseudo-model (numpy/jax polyglot)."""
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.tanh(x) * 0.3 + (t_scalar / 1000.0) * 0.1


def numpy_ddim_loop(x, acp, num_train_timesteps, num_inference_steps,
                    eta=0.0, clip_sample=False, clip_sample_range=1.0):
    """diffusers DDIMScheduler.step loop, transcribed (eta=0 path)."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
    ts = ts.astype(np.int64)
    x = np.asarray(x, np.float32).copy()
    for t in ts:
        eps = synth_eps(x, float(t)).astype(np.float32)
        prev_t = t - step_ratio
        alpha_prod_t = acp[t]
        alpha_prod_prev = acp[prev_t] if prev_t >= 0 else 1.0  # alpha->one
        beta_prod_t = 1.0 - alpha_prod_t
        x0 = (x - beta_prod_t ** 0.5 * eps) / alpha_prod_t ** 0.5
        if clip_sample:
            x0 = np.clip(x0, -clip_sample_range, clip_sample_range)
        variance = ((1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t)
                    * (1.0 - alpha_prod_t / alpha_prod_prev))
        std_dev_t = eta * variance ** 0.5
        # direction keeps the raw model epsilon (see module docstring)
        pred_dir = (1.0 - alpha_prod_prev - std_dev_t ** 2) ** 0.5 * eps
        x = alpha_prod_prev ** 0.5 * x0 + pred_dir
        x = x.astype(np.float32)
    return x


def numpy_ddpm_loop(x, betas, acp, noises, clip_sample=True,
                    clip_sample_range=1.0):
    """diffusers DDPMScheduler.step loop (fixed_small), transcribed.
    `noises`: (T, *x.shape) pre-drawn noise replayed from the jax side."""
    T = len(betas)
    x = np.asarray(x, np.float32).copy()
    for i, t in enumerate(range(T - 1, -1, -1)):
        eps = synth_eps(x, float(t)).astype(np.float32)
        alpha_prod_t = acp[t]
        alpha_prod_prev = acp[t - 1] if t - 1 >= 0 else 1.0
        beta_t = betas[t]
        alpha_t = 1.0 - beta_t
        x0 = (x - (1.0 - alpha_prod_t) ** 0.5 * eps) / alpha_prod_t ** 0.5
        if clip_sample:
            x0 = np.clip(x0, -clip_sample_range, clip_sample_range)
        x0_coef = alpha_prod_prev ** 0.5 * beta_t / (1.0 - alpha_prod_t)
        xt_coef = (alpha_t ** 0.5 * (1.0 - alpha_prod_prev)
                   / (1.0 - alpha_prod_t))
        mean = x0_coef * x0 + xt_coef * x
        var = np.maximum(
            (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * beta_t, 1e-20)
        if t > 0:
            mean = mean + var ** 0.5 * noises[i]
        x = mean.astype(np.float32)
    return x


class TestDDIMGolden:
    def _run(self, num_steps, clip_sample=False, clip_range=1.0):
        s = DiffusionSchedule.create()
        acp = np.asarray(s.alphas_cumprod, np.float64)
        x_init = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4)),
            np.float32)

        def eps_fn(x, t):
            return synth_eps(x, t[0])

        ours = sample_ddim(eps_fn, jnp.asarray(x_init), s,
                           num_inference_steps=num_steps,
                           clip_sample=clip_sample,
                           clip_sample_range=clip_range)
        golden = numpy_ddim_loop(x_init, acp, 1000, num_steps,
                                 clip_sample=clip_sample,
                                 clip_sample_range=clip_range)
        np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-4,
                                   rtol=1e-4)

    @pytest.mark.smoke
    def test_ddim50_matches_diffusers_semantics(self):
        self._run(50)

    def test_ddim50_with_clip_range3(self):
        """test_refiner.py:166-171 config: clip_sample, range 3.0."""
        self._run(50, clip_sample=True, clip_range=3.0)

    def test_ddim_odd_step_counts(self):
        # non-divisor counts exercise the leading-spacing rounding
        self._run(7)
        self._run(13)

    def test_leading_spacing_and_alpha_to_one_edge(self):
        """Explicit checks of the two semantics diffusers bakes in:
        leading spacing (ts start at (n-1)*ratio, end at 0) and the final
        step targeting alpha_bar == 1 exactly."""
        ts = ddim_timesteps(1000, 50)
        assert ts[0] == 980 and ts[-1] == 0
        # final step: prev_t = -20 < 0 -> alpha_prev must be 1.0, i.e. the
        # last update is x = x0 + 0 * eps when eta=0. Drive one step:
        s = DiffusionSchedule.create()
        acp = np.asarray(s.alphas_cumprod)
        x = np.full((1, 2, 2, 4), 0.7, np.float32)
        eps = np.full_like(x, 0.2)
        out = sample_ddim(lambda xx, tt: jnp.asarray(eps), jnp.asarray(x),
                          s, num_inference_steps=1000)
        # with 1000 steps the first t is 999; just check finiteness here —
        # the alpha-to-one edge itself:
        a_t = acp[0]
        x0_expect = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        one_step = sample_ddim(
            lambda xx, tt: jnp.asarray(eps), jnp.asarray(x),
            DiffusionSchedule.create(num_train_timesteps=1),
            num_inference_steps=1)
        a_t1 = np.asarray(
            DiffusionSchedule.create(num_train_timesteps=1).alphas_cumprod)
        x0_1 = (x - np.sqrt(1 - a_t1[0]) * eps) / np.sqrt(a_t1[0])
        np.testing.assert_allclose(np.asarray(one_step), x0_1, rtol=1e-5)
        assert np.isfinite(np.asarray(out)).all()
        del x0_expect


class TestDDPMGolden:
    def test_ddpm_matches_diffusers_semantics(self):
        T = 60
        s = DiffusionSchedule.create(num_train_timesteps=T)
        betas = np.asarray(s.betas, np.float64)
        acp = np.asarray(s.alphas_cumprod, np.float64)
        x_init = np.asarray(
            jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 4)),
            np.float32)
        key = jax.random.PRNGKey(9)

        def eps_fn(x, t):
            return synth_eps(x, t[0])

        ours = sample_ddpm(eps_fn, jnp.asarray(x_init), s, key=key,
                           clip_sample=True, clip_sample_range=1.0)

        # replay the exact noise sequence sample_ddpm drew
        keys = jax.random.split(key, T)
        noises = np.stack([
            np.asarray(jax.random.normal(keys[i], x_init.shape,
                                         jnp.float32))
            for i in range(T)])
        golden = numpy_ddpm_loop(x_init, betas, acp, noises,
                                 clip_sample=True)
        np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-4,
                                   rtol=1e-4)

    def test_no_noise_at_t0(self):
        """sigma multiplies to zero at the last (t==0) step — the final
        update must be deterministic given x_1."""
        T = 4
        s = DiffusionSchedule.create(num_train_timesteps=T)
        x = jnp.ones((1, 2, 2, 4)) * 0.5
        a = sample_ddpm(lambda xx, tt: jnp.zeros_like(xx), x, s,
                        key=jax.random.PRNGKey(0), clip_sample=False)
        b = sample_ddpm(lambda xx, tt: jnp.zeros_like(xx), x, s,
                        key=jax.random.PRNGKey(0), clip_sample=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
