"""Training-layer tests: loss parity vs torch oracles, freeze masks, and a
data-parallel train step on the 8-device CPU mesh (SURVEY.md §4 item d)."""

import pytest
import sys

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from hifidiff_tpu.diffusion import DiffusionSchedule  # noqa: E402
from hifidiff_tpu.models import Denoiser, FacialRefiner  # noqa: E402
from hifidiff_tpu.parallel import make_mesh, replicated, shard_batch  # noqa: E402
from hifidiff_tpu.train import (  # noqa: E402
    cr_loss,
    key_region_loss,
    triplet_margin_loss,
)
from hifidiff_tpu.train.losses import smooth_l1_loss, ssim  # noqa: E402
from hifidiff_tpu.train.optim import (  # noqa: E402
    adamw_cosine,
    cosine_with_warmup,
    masked,
    refiner_freeze_mask,
)
from hifidiff_tpu.train.steps import (  # noqa: E402
    TrainState,
    make_denoiser_train_step,
)
from hifidiff_tpu.vae import AutoencoderKL  # noqa: E402

RNG = np.random.default_rng(3)


class TestLossParity:
    def test_key_region_loss_vs_reference(self):
        from models.cr.loss import cr_loss as ref_cr_loss
        from models.cr.loss import key_region_loss as ref_krl

        b, p, h, w, c = 3, 4, 16, 16, 3
        pred = RNG.uniform(0, 1, (b, h, w, c)).astype(np.float32)
        gt = RNG.uniform(0, 1, (b, h, w, c)).astype(np.float32)
        # patch images: gt * box masks (like get_masked_patches)
        patches = np.zeros((b, p, h, w, c), dtype=np.float32)
        for bi in range(b):
            for pi in range(p):
                t0, l0 = RNG.integers(0, h - 4, 2)
                patches[bi, pi, t0:t0 + 4, l0:l0 + 4] = gt[bi, t0:t0 + 4,
                                                           l0:l0 + 4]

        tp = torch.tensor(np.ascontiguousarray(
            np.transpose(pred, (0, 3, 1, 2))))
        tg = torch.tensor(np.ascontiguousarray(np.transpose(gt, (0, 3, 1, 2))))
        tpatch = torch.tensor(np.ascontiguousarray(
            np.transpose(patches, (0, 1, 4, 2, 3))))  # (B,P,C,H,W)

        ref_k = ref_krl(tp, tg, tpatch).item()
        ref_total = ref_cr_loss(tp, tg, tpatch).item()

        ours_k = float(key_region_loss(jnp.asarray(pred), jnp.asarray(gt),
                                       jnp.asarray(patches)))
        ours_total = float(cr_loss(jnp.asarray(pred), jnp.asarray(gt),
                                   jnp.asarray(patches)))
        np.testing.assert_allclose(ours_k, ref_k, rtol=1e-5)
        np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5)

    def test_triplet_vs_torch(self):
        a = RNG.standard_normal((4, 64), dtype=np.float32)
        p = RNG.standard_normal((4, 64), dtype=np.float32)
        n = RNG.standard_normal((4, 64), dtype=np.float32)
        ref = tF.triplet_margin_loss(torch.tensor(a), torch.tensor(p),
                                     torch.tensor(n)).item()
        ours = float(triplet_margin_loss(jnp.asarray(a), jnp.asarray(p),
                                         jnp.asarray(n)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    @pytest.mark.smoke
    def test_smooth_l1_vs_torch(self):
        x = RNG.standard_normal((2, 8, 8, 3), dtype=np.float32) * 2
        y = RNG.standard_normal((2, 8, 8, 3), dtype=np.float32)
        ref = tF.smooth_l1_loss(torch.tensor(x), torch.tensor(y)).item()
        ours = float(smooth_l1_loss(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_ssim_identical_images(self):
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        assert abs(float(ssim(x, x)) - 1.0) < 1e-5
        y = jnp.clip(x + 0.5, 0, 1)
        assert float(ssim(x, y)) < 0.9


class TestSchedulesAndMasks:
    def test_cosine_warmup_shape(self):
        s = cosine_with_warmup(1e-4, 500, 10_000)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(250)), 5e-5, rtol=1e-5)
        np.testing.assert_allclose(float(s(500)), 1e-4, rtol=1e-5)
        assert float(s(10_000)) < 1e-9
        # monotone decreasing after warmup
        assert float(s(2000)) > float(s(8000))

    def test_refiner_freeze_mask(self):
        refiner = FacialRefiner(latent_size=8, width=16, enc_nums=(1, 1),
                                mid_num=1, dec_nums=(1, 1),
                                idc_stage_sizes=(1, 1, 1, 1))
        key = jax.random.PRNGKey(0)
        rv = refiner.init(key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8, 8, 4)),
                          train=False)
        mask = refiner_freeze_mask(rv["params"])
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        frozen = {"/".join(str(getattr(k, "key", k)) for k in p)
                  for p, v in flat if not v}
        trainable = {"/".join(str(getattr(k, "key", k)) for k in p)
                     for p, v in flat if v}
        assert any(p.startswith("idc/") for p in frozen)
        assert any(p.startswith("denoiser/intro") for p in frozen)
        assert any("enc0_blk0" in p and p.startswith("denoiser/")
                   for p in frozen)
        # downs, decoders, fpg stay trainable (torch startswith semantics)
        assert any(p.startswith("denoiser/down0") for p in trainable)
        assert any(p.startswith("denoiser/dec0_blk0") for p in trainable)
        assert any(p.startswith("fpg/") for p in trainable)

    def test_masked_updates_keep_frozen_fixed(self):
        refiner = FacialRefiner(latent_size=8, width=16, enc_nums=(1, 1),
                                mid_num=1, dec_nums=(1, 1),
                                idc_stage_sizes=(1, 1, 1, 1))
        key = jax.random.PRNGKey(0)
        rv = refiner.init(key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8, 8, 4)),
                          train=False)
        mask = refiner_freeze_mask(rv["params"])
        tx = masked(adamw_cosine(total_steps=10), mask)
        params = rv["params"]
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        flat_u = jax.tree_util.tree_flatten_with_path(updates)[0]
        for path, u in flat_u:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if name.startswith("idc/") or name.startswith("denoiser/intro"):
                assert float(jnp.abs(u).max()) == 0.0, name


class TestDataParallelStep:
    def test_denoiser_train_step_on_mesh(self):
        """Tiny denoiser + tiny VAE, batch sharded over 8 CPU devices; one
        step must run, produce a finite loss, and update params."""
        denoiser = Denoiser(width=16, enc_nums=(1, 1), mid_num=1,
                            dec_nums=(1, 1))
        vae = AutoencoderKL(block_out=(32, 32, 32), layers_per_block=1)
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(0)

        dn_params = denoiser.init(key, jnp.zeros((1, 8, 8, 4)),
                                  jnp.zeros((1,)))["params"]
        vae_params = vae.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
        # warmup 0: with the HF-parity schedule, step 0 uses lr=0 and the
        # first update would be a no-op
        tx = adamw_cosine(total_steps=100, warmup_steps=0)
        # snapshot before the step donates (and deletes) these buffers
        params_before = jax.tree_util.tree_map(np.asarray, dn_params)
        state = TrainState.create(dn_params, tx)
        step = make_denoiser_train_step(denoiser, vae, schedule)

        mesh = make_mesh(8)
        images = RNG.uniform(0, 1, (16, 32, 32, 3)).astype(np.float32)
        state = jax.device_put(state, replicated(mesh))
        vp = jax.device_put(vae_params, replicated(mesh))
        imgs = shard_batch(images, mesh)

        new_state, metrics = jax.jit(step, donate_argnums=0)(
            state, vp, imgs, key)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        # params actually moved
        delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - jnp.asarray(b)).max()),
            new_state.params, params_before)
        assert max(jax.tree_util.tree_leaves(delta)) > 0.0


class TestCachedLatentStep:
    def test_bit_identical_to_image_step(self):
        """`make_denoiser_train_step_cached` fed the frozen VAE's cached
        posterior moments must reproduce the image-fed step: same PRNG key
        => bit-identical posterior sample and loss; updated params agree
        to XLA-recompilation rounding (the two steps are different fused
        programs, so backward-pass float rounding differs at ~1e-11) —
        the correctness contract of `--cache-latents`."""
        from hifidiff_tpu.train.steps import make_denoiser_train_step_cached

        denoiser = Denoiser(width=16, enc_nums=(1, 1), mid_num=1,
                            dec_nums=(1, 1))
        vae = AutoencoderKL(block_out=(32, 32, 32), layers_per_block=1)
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(3)

        dn_params = denoiser.init(key, jnp.zeros((1, 8, 8, 4)),
                                  jnp.zeros((1,)))["params"]
        vae_params = vae.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
        tx = adamw_cosine(total_steps=100, warmup_steps=0)
        images = jnp.asarray(
            RNG.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))

        step_img = jax.jit(make_denoiser_train_step(denoiser, vae, schedule))
        step_cached = jax.jit(make_denoiser_train_step_cached(
            denoiser, schedule))

        s_img, m_img = step_img(TrainState.create(dn_params, tx),
                                vae_params, images, key)

        mean, logvar = vae.apply(
            {"params": vae_params}, jnp.clip(images, 0.0, 1.0) * 2.0 - 1.0,
            method=vae.moments)
        s_c, m_c = step_cached(TrainState.create(dn_params, tx),
                               {"mean": mean, "logvar": logvar}, key)

        np.testing.assert_array_equal(np.asarray(m_img["loss"]),
                                      np.asarray(m_c["loss"]))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8),
            s_img.params, s_c.params)


class TestEMA:
    def test_ema_tracks_params(self):
        import optax

        from hifidiff_tpu.train.steps import TrainState

        params = {"w": jnp.zeros((4,))}
        tx = optax.sgd(1.0)
        state = TrainState.create(params, tx, ema_decay=0.5)
        grads = {"w": -jnp.ones((4,))}          # params -> 1, 2, 3 ...
        state = state.apply_gradients(grads)
        np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]),
                                   0.5)     # 0*0.5 + 1*0.5
        state = state.apply_gradients(grads)
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]),
                                   1.25)    # 0.5*0.5 + 2*0.5
        assert state.eval_params is state.ema_params

    def test_ema_off_by_default(self):
        import optax

        from hifidiff_tpu.train.steps import TrainState

        state = TrainState.create({"w": jnp.ones((2,))}, optax.sgd(0.1))
        assert state.ema_params is None
        state = state.apply_gradients({"w": jnp.ones((2,))})
        assert state.ema_params is None
        assert state.eval_params is state.params
