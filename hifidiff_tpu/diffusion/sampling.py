"""Reverse-diffusion samplers compiled to a single `lax.scan`.

Matches the stepping semantics the reference gets from diffusers'
DDIM/DDPM schedulers (`pretrain_denoiser.py:101-110`, `test_refiner.py:85-91`)
— epsilon prediction, "leading" timestep spacing, eta=0 deterministic DDIM,
optional x0 clipping (`clip_sample`/`clip_sample_range=3.0` in
`test_refiner.py:166-171`) — but with TPU-native structure: all per-step
constants are precomputed host-side into stacked arrays, the model call runs
inside `lax.scan`, and the whole sampler (50 UNet forwards) is ONE compiled
XLA program instead of 50 host dispatches.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.diffusion.schedule import DiffusionSchedule

EpsFn = Callable[[jax.Array, jax.Array], jax.Array]
# eps_fn(latents_NHWC, timesteps_B) -> predicted epsilon


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int,
                   steps_offset: int = 0) -> np.ndarray:
    """diffusers 'leading' spacing: descending [.., 2r, r, 0] + offset."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
    return ts.astype(np.int64) + steps_offset


def _x0_from_eps(sample, eps, alpha_prod):
    return (sample - jnp.sqrt(1.0 - alpha_prod) * eps) / jnp.sqrt(alpha_prod)


def sample_ddim(
    eps_fn: EpsFn,
    latents: jax.Array,
    schedule: DiffusionSchedule,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
    key: Optional[jax.Array] = None,
    steps_offset: int = 0,
    unroll: int = 1,
    per_step_aux=None,
) -> jax.Array:
    """Deterministic (eta=0) or stochastic DDIM, one fused scan.

    Args:
      eps_fn: closure over model params; gets (x_t, t_batch) and returns eps.
        With `per_step_aux`, gets (x_t, t_batch, aux_slice) instead.
      latents: (B, h, w, C) initial noise.
      schedule: training schedule (1000-step scaled_linear for parity).
      per_step_aux: optional pytree whose leaves have leading axis
        `num_inference_steps` — scan-sliced per step and passed to eps_fn
        (used for precomputed FiLM tables; see
        FusedDenoiser mode="precompute").
    """
    acp = np.asarray(schedule.alphas_cumprod)
    ts = ddim_timesteps(schedule.num_train_timesteps, num_inference_steps,
                        steps_offset)
    prev_ts = ts - schedule.num_train_timesteps // num_inference_steps
    alpha_t = acp[ts]
    # diffusers set_alpha_to_one=True: final step targets alpha_bar = 1
    alpha_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], 1.0)

    if eta > 0.0 and key is None:
        raise ValueError("stochastic DDIM (eta>0) requires a PRNG key")
    keys = (jax.random.split(key, num_inference_steps) if eta > 0.0
            else np.zeros((num_inference_steps, 2), dtype=np.uint32))

    xs = {
        "t": jnp.asarray(ts, dtype=jnp.float32),
        "alpha_t": jnp.asarray(alpha_t, dtype=jnp.float32),
        "alpha_prev": jnp.asarray(alpha_prev, dtype=jnp.float32),
        "key": jnp.asarray(keys),
    }
    if per_step_aux is not None:
        xs["aux"] = per_step_aux
    batch = latents.shape[0]

    def step(x, c):
        t_batch = jnp.full((batch,), c["t"], dtype=jnp.float32)
        eps = (eps_fn(x, t_batch) if per_step_aux is None
               else eps_fn(x, t_batch, c["aux"]))
        x0 = _x0_from_eps(x, eps, c["alpha_t"])
        if clip_sample:
            x0 = jnp.clip(x0, -clip_sample_range, clip_sample_range)
        if eta > 0.0:
            var = ((1.0 - c["alpha_prev"]) / (1.0 - c["alpha_t"])
                   * (1.0 - c["alpha_t"] / c["alpha_prev"]))
            sigma = eta * jnp.sqrt(var)
            noise = jax.random.normal(c["key"], x.shape, x.dtype)
        else:
            sigma = 0.0
            noise = 0.0
        dir_xt = jnp.sqrt(1.0 - c["alpha_prev"] - sigma ** 2) * eps
        x_prev = jnp.sqrt(c["alpha_prev"]) * x0 + dir_xt + sigma * noise
        return x_prev, None

    final, _ = jax.lax.scan(step, latents, xs, unroll=unroll)
    return final


def sample_ddim_cached(
    encode_fn: Callable,
    decode_fn: Callable,
    latents: jax.Array,
    schedule: DiffusionSchedule,
    num_inference_steps: int = 50,
    cache_interval: int = 1,
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
    steps_offset: int = 0,
    per_step_aux=None,
) -> jax.Array:
    """DDIM (eta=0) with encoder-propagation caching.

    The UNet encoder's features drift slowly across adjacent timesteps
    (arXiv:2312.09608 "Faster Diffusion"; arXiv:2312.03209 block caching).
    Every `cache_interval`-th step runs the full network and refreshes the
    conditioned bottleneck + skip cache; the steps between run ONLY the
    decoder half with a fresh time embedding. interval=1 is numerically
    identical to `sample_ddim`; larger intervals trade fidelity for up to
    ~60% of the per-step FLOPs/weight-streaming.

    Args:
      encode_fn(x, t_batch) -> cache pytree ({"x", "skips"}).
      decode_fn(cache, t_batch) -> predicted epsilon.
      per_step_aux: optional pytree (leading axis num_inference_steps),
        scan-sliced and passed as a third argument to both fns.
    """
    acp = np.asarray(schedule.alphas_cumprod)
    ts = ddim_timesteps(schedule.num_train_timesteps, num_inference_steps,
                        steps_offset)
    prev_ts = ts - schedule.num_train_timesteps // num_inference_steps
    alpha_t = acp[ts]
    alpha_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], 1.0)
    refresh = (np.arange(num_inference_steps) % max(1, cache_interval)) == 0
    refresh[0] = False  # step 0's cache is computed before the scan

    xs = {
        "t": jnp.asarray(ts, dtype=jnp.float32),
        "alpha_t": jnp.asarray(alpha_t, dtype=jnp.float32),
        "alpha_prev": jnp.asarray(alpha_prev, dtype=jnp.float32),
        "refresh": jnp.asarray(refresh),
    }
    if per_step_aux is not None:
        xs["aux"] = per_step_aux
    batch = latents.shape[0]

    t0 = jnp.full((batch,), float(ts[0]), dtype=jnp.float32)
    if per_step_aux is None:
        cache0 = encode_fn(latents, t0)
    else:
        aux0 = jax.tree_util.tree_map(lambda a: a[0], per_step_aux)
        cache0 = encode_fn(latents, t0, aux0)

    def step(carry, c):
        x, cache = carry
        t_batch = jnp.full((batch,), c["t"], dtype=jnp.float32)
        enc_args = ((x, t_batch) if per_step_aux is None
                    else (x, t_batch, c["aux"]))
        cache = jax.lax.cond(
            c["refresh"],
            lambda operand: encode_fn(*operand),
            lambda operand: cache,
            enc_args)
        eps = (decode_fn(cache, t_batch) if per_step_aux is None
               else decode_fn(cache, t_batch, c["aux"]))
        x0 = _x0_from_eps(x, eps, c["alpha_t"])
        if clip_sample:
            x0 = jnp.clip(x0, -clip_sample_range, clip_sample_range)
        x_prev = (jnp.sqrt(c["alpha_prev"]) * x0
                  + jnp.sqrt(1.0 - c["alpha_prev"]) * eps)
        return (x_prev, cache), None

    (final, _), _ = jax.lax.scan(step, (latents, cache0), xs)
    return final


def dpmpp_2m_coeffs(schedule: DiffusionSchedule, num_inference_steps: int,
                    steps_offset: int = 0):
    """Host-side per-step constants for DPM-Solver++ (2M).

    All solver math that does not involve the sample is precomputed here in
    float64 numpy (exactly once, outside the scan): timesteps (same
    'leading' spacing as our DDIM for pipeline consistency), the
    half-log-SNR grid lambda = ln(alpha/sigma) with alpha = sqrt(acp),
    sigma = sqrt(1-acp), the step sizes h, and the first/second-order
    update coefficients. The final boundary is alpha_bar = 1 (sigma = 0,
    diffusers set_alpha_to_one / final_sigmas_type='zero'): lambda -> +inf
    there, which is why the last step is forced first-order (D1's 1/r0
    blows up; diffusers' lower_order_final exists for the same reason) —
    the masked h keeps every precomputed coefficient finite.
    """
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = ddim_timesteps(schedule.num_train_timesteps, num_inference_steps,
                        steps_offset)
    prev_ts = ts - schedule.num_train_timesteps // num_inference_steps
    acp_t = acp[ts]
    acp_next = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], 1.0)

    alpha_t, sigma_t = np.sqrt(acp_t), np.sqrt(1.0 - acp_t)
    alpha_n, sigma_n = np.sqrt(acp_next), np.sqrt(1.0 - acp_next)
    lam_t = np.log(alpha_t) - np.log(np.maximum(sigma_t, 1e-300))
    lam_n = np.log(alpha_n) - np.log(np.maximum(sigma_n, 1e-300))
    h = lam_n - lam_t                      # > 0; +inf at the final step
    finite = np.isfinite(h)
    h_safe = np.where(finite, h, 1.0)
    ehm1 = np.where(finite, np.expm1(-h_safe), -1.0)   # exp(-h) - 1

    # x_next = c_x * x + c_d0 * m0 + c_d1 * (m0 - m_prev)
    c_x = np.where(sigma_t > 0, sigma_n / np.maximum(sigma_t, 1e-300), 0.0)
    c_d0 = -alpha_n * ehm1
    # second-order (midpoint) term: -alpha_n*(e^{-h}-1) * 0.5 * D1 with
    # D1 = (m0 - m_prev) / r0, r0 = h_prev / h
    h_prev = np.concatenate([[1.0], h_safe[:-1]])
    r0 = h_prev / h_safe
    use2 = np.ones(num_inference_steps, bool)
    use2[0] = False                        # no m_prev yet
    use2[-1] = False                       # lower_order_final (see above)
    c_d1 = np.where(use2, c_d0 * 0.5 / r0, 0.0)
    return {
        "t": ts.astype(np.float64),
        "acp_t": acp_t,
        "c_x": c_x, "c_d0": c_d0, "c_d1": c_d1,
    }


def sample_dpmpp_2m(
    eps_fn: EpsFn,
    latents: jax.Array,
    schedule: DiffusionSchedule,
    num_inference_steps: int = 20,
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
    steps_offset: int = 0,
    unroll: int = 1,
    per_step_aux=None,
) -> jax.Array:
    """DPM-Solver++ (2M): second-order multistep ODE solver, one scan.

    Matches diffusers' DPMSolverMultistepScheduler semantics
    (algorithm_type='dpmsolver++', solver_order=2, solver_type='midpoint',
    epsilon prediction, final sigma 0) on our 'leading' timestep grid; the
    final step is always first-order (lower_order_final — see
    `dpmpp_2m_coeffs`). The reference samples DDIM-50
    (`test_refiner.py:85-91`); a second-order solver reaches comparable
    sample quality in ~20 steps, and since the 50-step scan is ~half the
    exact pipeline's wall time this is the principled (solver-accuracy-
    bounded, not feature-dropping) fast path. Verified by an order-of-
    convergence test against an exact-epsilon Gaussian oracle and a
    float64 numpy cross-implementation (`tests/test_dpmpp.py`).

    Carry = (x, m_prev): the previous step's x0-prediction is the 2M
    multistep state; per-step update is
        m0     = (x - sigma_t * eps) / alpha_t          (x0 from epsilon)
        x_next = c_x * x + c_d0 * m0 + c_d1 * (m0 - m_prev)
    with all coefficients precomputed host-side.
    """
    co = dpmpp_2m_coeffs(schedule, num_inference_steps, steps_offset)
    xs = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in co.items()}
    if per_step_aux is not None:
        xs["aux"] = per_step_aux
    batch = latents.shape[0]

    def step(carry, c):
        x, m_prev = carry
        t_batch = jnp.full((batch,), c["t"], dtype=jnp.float32)
        eps = (eps_fn(x, t_batch) if per_step_aux is None
               else eps_fn(x, t_batch, c["aux"]))
        # solver math in f32 (the D1 difference is precision-sensitive);
        # the sample carry keeps the caller's dtype (bf16 latents stay bf16
        # through the scan, the model sees its native input dtype)
        m0 = _x0_from_eps(x.astype(jnp.float32), eps.astype(jnp.float32),
                          c["acp_t"])
        if clip_sample:
            m0 = jnp.clip(m0, -clip_sample_range, clip_sample_range)
        x_next = (c["c_x"] * x.astype(jnp.float32) + c["c_d0"] * m0
                  + c["c_d1"] * (m0 - m_prev))
        return (x_next.astype(x.dtype), m0), None

    m0_init = jnp.zeros(latents.shape, jnp.float32)
    (final, _), _ = jax.lax.scan(step, (latents, m0_init), xs,
                                 unroll=unroll)
    return final


def sample_ddpm(
    eps_fn: EpsFn,
    latents: jax.Array,
    schedule: DiffusionSchedule,
    key: jax.Array,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
) -> jax.Array:
    """Full-schedule ancestral DDPM sampling (fixed_small variance),
    matching diffusers DDPMScheduler.step semantics, as one scan over all
    T timesteps."""
    acp = np.asarray(schedule.alphas_cumprod)
    betas = np.asarray(schedule.betas)
    T = schedule.num_train_timesteps
    ts = np.arange(T)[::-1]
    alpha_t = acp[ts]
    alpha_prev = np.where(ts - 1 >= 0, acp[np.clip(ts - 1, 0, None)], 1.0)
    beta_t = betas[ts]
    alphas = 1.0 - beta_t

    # posterior q(x_{t-1} | x_t, x_0) coefficients
    x0_coef = np.sqrt(alpha_prev) * beta_t / (1.0 - alpha_t)
    xt_coef = np.sqrt(alphas) * (1.0 - alpha_prev) / (1.0 - alpha_t)
    var = np.clip((1.0 - alpha_prev) / (1.0 - alpha_t) * beta_t, 1e-20, None)
    sigma = np.sqrt(var) * (ts > 0)  # no noise at t=0

    xs = {
        "t": jnp.asarray(ts, dtype=jnp.float32),
        "alpha_t": jnp.asarray(alpha_t, dtype=jnp.float32),
        "x0_coef": jnp.asarray(x0_coef, dtype=jnp.float32),
        "xt_coef": jnp.asarray(xt_coef, dtype=jnp.float32),
        "sigma": jnp.asarray(sigma, dtype=jnp.float32),
        "key": jax.random.split(key, T),
    }
    batch = latents.shape[0]

    def step(x, c):
        t_batch = jnp.full((batch,), c["t"], dtype=jnp.float32)
        eps = eps_fn(x, t_batch)
        x0 = _x0_from_eps(x, eps, c["alpha_t"])
        if clip_sample:
            x0 = jnp.clip(x0, -clip_sample_range, clip_sample_range)
        mean = c["x0_coef"] * x0 + c["xt_coef"] * x
        noise = jax.random.normal(c["key"], x.shape, x.dtype)
        return mean + c["sigma"] * noise, None

    final, _ = jax.lax.scan(step, latents, xs)
    return final
