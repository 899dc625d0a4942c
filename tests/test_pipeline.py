"""End-to-end sampler tests: fused vs split execution must be numerically
identical (same PRNG stream, same math), on tiny model configs."""

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
