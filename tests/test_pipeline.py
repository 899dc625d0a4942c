"""End-to-end sampler tests: fused vs split execution must be numerically
identical (same PRNG stream, same math), on tiny model configs."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.diffusion import DiffusionSchedule
from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
from hifidiff_tpu.pipeline import (
    RefinerPipelineConfig,
    build_refiner_sampler,
    build_refiner_sampler_split,
    build_unconditional_sampler,
)
from hifidiff_tpu.vae import AutoencoderKL


def tiny_stack():
    key = jax.random.PRNGKey(0)
    res, latent = 32, 8
    cr = CoarseRestoration(width=8, resolution=res, enc_nums=(1, 1),
                           mid_num=1, dec_nums=(1, 1))
    vae = AutoencoderKL(block_out=(32, 32, 32), layers_per_block=1)
    refiner = FacialRefiner(latent_size=latent, width=16, enc_nums=(1, 1),
                            mid_num=1, dec_nums=(1, 1),
                            idc_stage_sizes=(1, 1, 1, 1))
    cr_p = cr.init(key, jnp.zeros((1, res, res, 3)))["params"]
    vae_p = vae.init(key, jnp.zeros((1, res, res, 3)))["params"]
    rv = refiner.init(key, jnp.zeros((1, latent, latent, 4)),
                      jnp.zeros((1,)), jnp.zeros((1, res, res, 3)),
                      jnp.zeros((1, latent, latent, 4)), train=False)
    variables = {
        "refiner": {"params": rv["params"],
                    "batch_stats": rv.get("batch_stats", {})},
        "cr": cr_p, "vae": vae_p,
    }
    cfg = RefinerPipelineConfig(num_inference_steps=3, latent_size=latent)
    return refiner, cr, vae, variables, cfg, res


class TestRefinerSampler:
    def test_split_equals_fused(self):
        refiner, cr, vae, variables, cfg, res = tiny_stack()
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(7)
        lr = jax.random.uniform(jax.random.PRNGKey(1), (2, res, res, 3))

        fused = jax.jit(build_refiner_sampler(refiner, cr, vae, schedule,
                                              cfg))
        split = build_refiner_sampler_split(refiner, cr, vae, schedule, cfg)
        a = fused(variables, lr, key)
        b = split(variables, lr, key)
        assert a.shape == (2, res, res, 3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0

    def test_warm_compile_matches_lazy(self):
        """warm_compile AOT-compiles the three stage programs (optionally
        from ShapeDtypeStruct avals, the bench's overlapped cold-start
        path) and pins the executables; outputs must be bit-identical to
        the lazily jit-compiled path."""
        refiner, cr, vae, variables, cfg, res = tiny_stack()
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(7)
        lr = jax.random.uniform(jax.random.PRNGKey(1), (2, res, res, 3))

        lazy = build_refiner_sampler_split(refiner, cr, vae, schedule, cfg)
        ref_out = np.asarray(lazy(variables, lr, key))

        warm = build_refiner_sampler_split(refiner, cr, vae, schedule, cfg)
        compiled = warm.warm_compile(variables, lr, key)
        assert set(compiled) == {"prep", "scan", "decode"}
        np.testing.assert_array_equal(
            np.asarray(warm(variables, lr, key)), ref_out)

        aval = build_refiner_sampler_split(refiner, cr, vae, schedule, cfg)
        avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
        aval.warm_compile(avals, jax.ShapeDtypeStruct(lr.shape, lr.dtype),
                          key, parallel=False)
        np.testing.assert_array_equal(
            np.asarray(aval(variables, lr, key)), ref_out)

    def test_hoisted_invariants_match_naive(self):
        """FiLM/IDC/HCA-gate hoisting (mode="precompute") is pure code
        motion: sampling with hoist_invariants=True must match the naive
        per-step recomputation exactly (f32 CPU)."""
        import dataclasses

        refiner, cr, vae, variables, cfg, res = tiny_stack()
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(11)
        lr = jax.random.uniform(jax.random.PRNGKey(12), (2, res, res, 3))

        hoisted = build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            dataclasses.replace(cfg, hoist_invariants=True))
        naive = build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            dataclasses.replace(cfg, hoist_invariants=False))
        a = hoisted(variables, lr, key)
        b = naive(variables, lr, key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        # cached sampler path with hoisting enabled stays finite & close
        cached = build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            dataclasses.replace(cfg, num_inference_steps=6,
                                cache_interval=2, hoist_invariants=True))
        c = cached(variables, lr, key)
        assert bool(jnp.isfinite(c).all())

    def test_cached_sampler_interval1_exact(self):
        """cache_interval=1 refreshes every step -> bitwise-equal to the
        plain sampler; interval=3 drifts but stays sane."""
        refiner, cr, vae, variables, cfg, res = tiny_stack()
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(3)
        lr = jax.random.uniform(jax.random.PRNGKey(4), (2, res, res, 3))

        import dataclasses

        plain = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                            dataclasses.replace(
                                                cfg, num_inference_steps=6))
        cached1 = build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            dataclasses.replace(cfg, num_inference_steps=6,
                                cache_interval=1))
        # interval=1 goes through the plain path; force the cached path by
        # interval=1 -> use 2 then compare drift bounds instead
        a = plain(variables, lr, key)
        b = cached1(variables, lr, key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        cached3 = build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            dataclasses.replace(cfg, num_inference_steps=6,
                                cache_interval=3))
        c = cached3(variables, lr, key)
        assert bool(jnp.isfinite(c).all())
        # same value range, moderate drift from the exact trajectory
        assert float(jnp.abs(c - a).mean()) < 0.5

    def test_cached_sampler_every_step_refresh_matches(self):
        """Drive sample_ddim_cached directly with interval=1 semantics
        (refresh every step) and check it equals sample_ddim."""
        from hifidiff_tpu.diffusion import sample_ddim, sample_ddim_cached
        from hifidiff_tpu.models import FusedDenoiser

        kwargs = dict(width=16, latent_size=8, enc_nums=(1, 1), mid_num=1,
                      dec_nums=(1, 1))
        model = FusedDenoiser(**kwargs)
        key = jax.random.PRNGKey(0)
        lat = jax.random.normal(key, (2, 8, 8, 4))
        prior_shapes = [(2, 2, 2, 64), (2, 4, 4, 32), (2, 8, 8, 16)]
        priors = [jax.random.normal(jax.random.fold_in(key, i), s)
                  for i, s in enumerate(prior_shapes)]
        emb = jax.random.normal(key, (2, 2048))
        v = model.init(key, lat, jnp.zeros((2,)), priors, emb, train=False)
        schedule = DiffusionSchedule.create()

        def eps_fn(x, t):
            return model.apply(v, x, t, priors, emb, train=False)

        def encode_fn(x, t):
            return model.apply(v, x, t, priors, emb, train=False,
                               mode="encode")

        def decode_fn(cache, t):
            return model.apply(v, lat, t, priors, emb, train=False,
                               mode="decode", cache=cache)

        a = sample_ddim(eps_fn, lat, schedule, num_inference_steps=4)
        b = sample_ddim_cached(encode_fn, decode_fn, lat, schedule,
                               num_inference_steps=4, cache_interval=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_unconditional_sampler(self):
        _, _, vae, variables, _, res = tiny_stack()
        from hifidiff_tpu.models import Denoiser

        dn = Denoiser(width=16, enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1))
        key = jax.random.PRNGKey(0)
        dn_p = dn.init(key, jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)))["params"]
        schedule = DiffusionSchedule.create()
        sampler = jax.jit(build_unconditional_sampler(
            dn, vae, schedule, num_inference_steps=2, latent_size=8,
            batch=2))
        img = sampler(dn_p, variables["vae"], key)
        assert img.shape == (2, res, res, 3)
        assert bool(jnp.isfinite(img).all())
