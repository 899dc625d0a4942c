"""Tiny distilled CR (models/tiny_cr.py) + pipeline integration.

Beyond-reference component: the PyTorch repo's only restoration net is
the full CoarseRestoration (`models/cr/model.py:33-88`, trained by
`train_cr.py`); TinyCR is distilled from it (the tiny-autoencoder recipe
applied to the CR seam) to shrink the turbo pipeline's largest remaining
stage. These tests pin shapes/conventions, that one distillation step
reduces the loss with a frozen teacher, and that the sampler with the
tiny CR swapped in keeps the exact output contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifidiff_tpu.diffusion import DiffusionSchedule
from hifidiff_tpu.models import CoarseRestoration, FacialRefiner, TinyCR
from hifidiff_tpu.pipeline import (
    RefinerPipelineConfig,
    build_refiner_sampler_split,
)
from hifidiff_tpu.train.distill import make_tiny_cr_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.vae import AutoencoderKL, TinyDecoder, TinyEncoder


class TestTinyCRModule:
    @pytest.mark.smoke
    def test_shapes_128(self):
        m = TinyCR()
        k = jax.random.PRNGKey(0)
        v = m.init(k, jnp.zeros((1, 128, 128, 3)))
        out = m.apply(v, jnp.zeros((2, 128, 128, 3)))
        assert out.shape == (2, 128, 128, 3)

    def test_shapes_tiny_stack(self):
        # the convergence-demo geometry (size 32)
        m = TinyCR(width=16, blocks=2)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        assert m.apply(v, jnp.zeros((3, 32, 32, 3))).shape == (3, 32, 32, 3)

    def test_param_count_is_tiny(self):
        # the point of the module: ~0.3M params vs the exact CR's ~4M
        m = TinyCR()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        n = sum(x.size for x in jax.tree_util.tree_leaves(v))
        assert n < 600_000

    def test_global_residual(self):
        """The net predicts a delta on top of the input: zeroing conv_out's
        kernel/bias must make it the identity (the distillation starts
        near the teacher's near-identity regime)."""
        m = TinyCR(width=8, blocks=1)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(jnp.asarray, v["params"])
        params["conv_out"]["kernel"] = jnp.zeros_like(
            params["conv_out"]["kernel"])
        params["conv_out"]["bias"] = jnp.zeros_like(
            params["conv_out"]["bias"])
        np.testing.assert_allclose(
            np.asarray(m.apply({"params": params}, x)), np.asarray(x),
            atol=1e-6)


class TestTinyCRTrainStep:
    def _setup(self, size=16):
        key = jax.random.PRNGKey(0)
        cr = CoarseRestoration(width=8, resolution=size, enc_nums=(1,),
                               mid_num=1, dec_nums=(1,))
        tiny = TinyCR(width=8, blocks=1)
        cr_params = cr.init(key, jnp.zeros((1, size, size, 3)))["params"]
        params = tiny.init(key, jnp.zeros((1, size, size, 3)))["params"]
        batch = {"lr": jax.random.uniform(key, (4, size, size, 3)),
                 "gt": jax.random.uniform(jax.random.fold_in(key, 1),
                                          (4, size, size, 3))}
        return key, cr, tiny, cr_params, params, batch

    def test_loss_decreases(self):
        key, cr, tiny, cr_params, params, batch = self._setup()
        state = TrainState.create(params, adamw_cosine(1e-3, 0, 60))
        step = jax.jit(make_tiny_cr_train_step(cr, tiny), donate_argnums=0)
        first = None
        for _ in range(50):
            state, m = step(state, cr_params, batch)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < 0.5 * first

    def test_gt_term(self):
        """gt_weight mixes in direct supervision: with gt_weight > 0 the
        loss must see the gt (changing it changes the loss); without a
        "gt" key the step still runs (teacher-only distillation)."""
        key, cr, tiny, cr_params, params, batch = self._setup()
        state = TrainState.create(params, adamw_cosine(1e-3, 0, 10))
        step = jax.jit(make_tiny_cr_train_step(cr, tiny, gt_weight=0.5))
        _, m1 = step(state, cr_params, batch)
        _, m2 = step(state, cr_params, dict(batch, gt=batch["gt"] * 0.5))
        assert float(m1["loss"]) != float(m2["loss"])
        assert float(m1["teacher_loss"]) == float(m2["teacher_loss"])
        step0 = jax.jit(make_tiny_cr_train_step(cr, tiny))
        _, m0 = step0(state, cr_params, {"lr": batch["lr"]})
        assert np.isfinite(float(m0["loss"]))
        assert float(m0["gt_loss"]) == 0.0

    def test_frozen_teacher_untouched(self):
        key, cr, tiny, cr_params, params, batch = self._setup()
        state = TrainState.create(params, adamw_cosine(1e-3, 0, 10))
        step = jax.jit(make_tiny_cr_train_step(cr, tiny))
        before = jax.device_get(cr_params)
        state, _ = step(state, cr_params, batch)
        after = jax.device_get(cr_params)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)


class TestTinyCRPipeline:
    def test_sampler_with_tiny_cr(self):
        """The split sampler with tiny_cr swapped in keeps the exact I/O
        contract (uint8 in/out, same shapes); composing with the tiny
        autoencoder (the full composed-turbo config) also runs."""
        key = jax.random.PRNGKey(0)
        size, latent = 16, 8
        cr = CoarseRestoration(width=8, resolution=size, enc_nums=(1,),
                               mid_num=1, dec_nums=(1,))
        tiny_cr = TinyCR(width=8, blocks=1)
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
            "tiny_cr": tiny_cr.init(
                key, jnp.zeros((1, size, size, 3)))["params"],
            "tiny_enc": enc.init(key,
                                 jnp.zeros((1, size, size, 3)))["params"],
            "tiny_dec": dec.init(key,
                                 jnp.zeros((1, latent, latent, 4)))["params"],
        }
        cfg = RefinerPipelineConfig(num_inference_steps=2,
                                    latent_size=latent, io_uint8=True)
        lr = (jax.random.uniform(key, (2, size, size, 3)) * 255
              ).astype(jnp.uint8)

        sampler_exact = build_refiner_sampler_split(refiner, cr, vae,
                                                    schedule, cfg)
        out_exact = sampler_exact(variables, lr, key)

        sampler = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                              cfg, tiny_cr=tiny_cr)
        out = sampler(variables, lr, key)
        assert out.shape == (2, size, size, 3)
        assert out.dtype == jnp.uint8
        # a different CR must actually change the conditioning/trajectory
        assert not np.array_equal(np.asarray(out), np.asarray(out_exact))

        # full composed turbo: tiny CR + tiny AE + dpmpp
        cfg_p = RefinerPipelineConfig(num_inference_steps=3, sampler="dpmpp",
                                      latent_size=latent, io_uint8=True)
        sampler_t = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                                cfg_p, tiny_enc=enc,
                                                tiny_dec=dec,
                                                tiny_cr=tiny_cr)
        out_t = sampler_t(variables, lr, key)
        assert out_t.shape == (2, size, size, 3)
        assert out_t.dtype == jnp.uint8
