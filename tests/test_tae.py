"""Tiny distilled autoencoder (vae/tiny.py) + pipeline integration.

Beyond-reference component: the PyTorch repo's only autoencoder is the
frozen diffusers AutoencoderKL (`pretrain_denoiser.py:256-259`); the tiny
pair is distilled from it (TAESD-style) to replace the pipeline's most
expensive stage. These tests pin shapes/conventions, that one distillation
step reduces the loss, and that the sampler with tiny modules swapped in
runs end-to-end with the same output contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifidiff_tpu.diffusion import DiffusionSchedule
from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
from hifidiff_tpu.pipeline import (
    RefinerPipelineConfig,
    build_refiner_sampler_split,
)
from hifidiff_tpu.train.distill import make_tae_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.vae import (
    AutoencoderKL,
    TinyDecoder,
    TinyEncoder,
    tiny_autoencoder_pair,
)


class TestTinyModules:
    @pytest.mark.smoke
    def test_shapes_factor8(self):
        enc, dec = tiny_autoencoder_pair(8)
        k = jax.random.PRNGKey(0)
        ve = enc.init(k, jnp.zeros((1, 128, 128, 3)))
        vd = dec.init(k, jnp.zeros((1, 16, 16, 4)))
        z = enc.apply(ve, jnp.zeros((2, 128, 128, 3)))
        img = dec.apply(vd, jnp.zeros((2, 16, 16, 4)))
        assert z.shape == (2, 16, 16, 4)
        assert img.shape == (2, 128, 128, 3)

    def test_shapes_factor2(self):
        enc, dec = tiny_autoencoder_pair(2)
        k = jax.random.PRNGKey(0)
        ve = enc.init(k, jnp.zeros((1, 32, 32, 3)))
        vd = dec.init(k, jnp.zeros((1, 16, 16, 4)))
        assert enc.apply(ve, jnp.zeros((1, 32, 32, 3))).shape == (1, 16, 16, 4)
        assert dec.apply(vd, jnp.zeros((1, 16, 16, 4))).shape == (1, 32, 32, 3)

    def test_param_count_is_tiny(self):
        # the point of the module: ~1M params vs the SD decoder's ~50M
        _, dec = tiny_autoencoder_pair(8)
        vd = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
        n = sum(x.size for x in jax.tree_util.tree_leaves(vd))
        assert n < 2_000_000


class TestTaeTrainStep:
    def _setup(self):
        key = jax.random.PRNGKey(0)
        vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)
        enc = TinyEncoder(widths=(8, 8), blocks_per_stage=1)
        dec = TinyDecoder(widths=(8, 8), blocks_per_stage=1)
        vae_params = vae.init(key, jnp.zeros((1, 16, 16, 3)))["params"]
        params = {
            "enc": enc.init(key, jnp.zeros((1, 16, 16, 3)))["params"],
            "dec": dec.init(key, jnp.zeros((1, 8, 8, 4)))["params"],
        }
        return key, vae, enc, dec, vae_params, params

    def test_loss_decreases(self):
        key, vae, enc, dec, vae_params, params = self._setup()
        tx = adamw_cosine(1e-3, 0, 60)
        state = TrainState.create(params, tx)
        step = jax.jit(make_tae_train_step(vae, enc, dec), donate_argnums=0)
        batch = {"image": jax.random.uniform(key, (4, 16, 16, 3))}
        first = None
        for i in range(50):
            state, m = step(state, vae_params, batch,
                            jax.random.fold_in(key, i))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < 0.5 * first

    def test_on_policy_extra_latents(self):
        """batch["extra_z"] adds the on-policy decoder term: the loss sees
        the extra latents (changing them changes the loss) and the
        decoder learns latents far outside the GT posterior (the sampler
        regime that motivated the term — train/distill.py)."""
        key, vae, enc, dec, vae_params, params = self._setup()
        tx = adamw_cosine(1e-3, 0, 60)
        state = TrainState.create(params, tx)
        step = jax.jit(make_tae_train_step(vae, enc, dec))
        img = jax.random.uniform(key, (4, 16, 16, 3))
        z_far = jax.random.normal(key, (4, 8, 8, 4)) * 10.0
        _, m1 = step(state, vae_params,
                     {"image": img, "extra_z": z_far}, key)
        _, m2 = step(state, vae_params,
                     {"image": img, "extra_z": z_far * 2.0}, key)
        _, m0 = step(state, vae_params, {"image": img}, key)
        assert float(m1["dec_loss"]) != float(m2["dec_loss"])
        assert float(m1["dec_loss"]) > float(m0["dec_loss"])

        first = None
        for i in range(50):
            state, m = step(state, vae_params,
                            {"image": img, "extra_z": z_far},
                            jax.random.fold_in(key, i))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < 0.5 * first

    def test_frozen_teacher_untouched(self):
        key, vae, enc, dec, vae_params, params = self._setup()
        tx = adamw_cosine(1e-3, 0, 10)
        state = TrainState.create(params, tx)
        step = jax.jit(make_tae_train_step(vae, enc, dec))
        before = jax.device_get(vae_params)
        batch = {"image": jax.random.uniform(key, (2, 16, 16, 3))}
        state, _ = step(state, vae_params, batch, key)
        after = jax.device_get(vae_params)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)


class TestTinyPipeline:
    def test_sampler_with_tiny_modules(self):
        """The split sampler with tiny_enc+tiny_dec swapped in keeps the
        exact I/O contract (uint8 in/out, same shapes) and runs the same
        scan; only the autoencoder seams change."""
        key = jax.random.PRNGKey(0)
        size, latent = 16, 8
        cr = CoarseRestoration(width=8, resolution=size, enc_nums=(1,),
                               mid_num=1, dec_nums=(1,))
        vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)
        refiner = FacialRefiner(latent_size=latent, width=8, enc_nums=(1,),
                                mid_num=1, dec_nums=(1,),
                                idc_stage_sizes=(1, 1, 1, 1))
        enc = TinyEncoder(widths=(8, 8), blocks_per_stage=1)
        dec = TinyDecoder(widths=(8, 8), blocks_per_stage=1)
        schedule = DiffusionSchedule.create()
        rv = refiner.init(key, jnp.zeros((1, latent, latent, 4)),
                          jnp.zeros((1,)), jnp.zeros((1, size, size, 3)),
                          jnp.zeros((1, latent, latent, 4)), train=False)
        variables = {
            "refiner": {"params": rv["params"],
                        "batch_stats": rv.get("batch_stats", {})},
            "cr": cr.init(key, jnp.zeros((1, size, size, 3)))["params"],
            "vae": vae.init(key, jnp.zeros((1, size, size, 3)))["params"],
            "tiny_enc": enc.init(key,
                                 jnp.zeros((1, size, size, 3)))["params"],
            "tiny_dec": dec.init(key,
                                 jnp.zeros((1, latent, latent, 4)))["params"],
        }
        cfg = RefinerPipelineConfig(num_inference_steps=2,
                                    latent_size=latent, io_uint8=True)
        sampler = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                              cfg, tiny_enc=enc,
                                              tiny_dec=dec)
        lr = (jax.random.uniform(key, (2, size, size, 3)) * 255
              ).astype(jnp.uint8)
        out = sampler(variables, lr, key)
        assert out.shape == (2, size, size, 3)
        assert out.dtype == jnp.uint8

        # decode-only swap also works (the bench --tiny-ae decode path)
        sampler_d = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                                cfg, tiny_dec=dec)
        out_d = sampler_d(variables, lr, key)
        assert out_d.shape == (2, size, size, 3)

        # DPM-Solver++ composes with the tiny AE at the same seams — the
        # recommended turbo mode (README: dpmpp@10 + TAE costs -0.75 dB
        # where ddim@10 + TAE costs -1.96 on the n=192 trained stack)
        cfg_p = RefinerPipelineConfig(num_inference_steps=3, sampler="dpmpp",
                                      latent_size=latent, io_uint8=True)
        sampler_p = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                                cfg_p, tiny_enc=enc,
                                                tiny_dec=dec)
        out_p = sampler_p(variables, lr, key)
        assert out_p.shape == (2, size, size, 3)
        assert out_p.dtype == jnp.uint8
        # a different solver must actually change the trajectory
        assert not np.array_equal(np.asarray(out_p), np.asarray(out))
