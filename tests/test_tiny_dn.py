"""Tiny-denoiser width distillation (train/distill.py:make_tiny_dn_train_step).

Beyond-reference component: the PyTorch repo's denoiser always runs at
full width (`models/denoiser.py`, `test_refiner.py:85-91`); the tiny-DN
student is a narrower FacialRefiner trained to match the trained
teacher's epsilon predictions pointwise (on-policy rollout waypoints +
dense forward-diffused t), so it drops into every existing sampler
unchanged. These tests pin that one distillation step reduces the loss
against a frozen teacher, that the teacher is untouched, that the
on-policy/forward terms are both live, and that a narrower student runs
through the split sampler with the exact I/O contract.
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
from hifidiff_tpu.train.distill import make_tiny_dn_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.vae import AutoencoderKL


def _stack(size=16, latent=8, teacher_width=8, student_width=8):
    key = jax.random.PRNGKey(0)
    cr = CoarseRestoration(width=8, resolution=size, enc_nums=(1,),
                           mid_num=1, dec_nums=(1,))
    vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)

    def refiner_of(width):
        return FacialRefiner(latent_size=latent, width=width, enc_nums=(1,),
                             mid_num=1, dec_nums=(1,),
                             idc_stage_sizes=(1, 1, 1, 1))

    def init_refiner(m, k):
        return m.init(k, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,)),
                      jnp.zeros((1, size, size, 3)),
                      jnp.zeros((1, latent, latent, 4)), train=True)

    teacher = refiner_of(teacher_width)
    student = refiner_of(student_width)
    tv = init_refiner(teacher, key)
    sv = init_refiner(student, jax.random.fold_in(key, 7))
    frozen = {
        "cr": cr.init(key, jnp.zeros((1, size, size, 3)))["params"],
        "vae": vae.init(key, jnp.zeros((1, size, size, 3)))["params"],
    }
    teacher_vars = {"params": tv["params"],
                    "batch_stats": tv.get("batch_stats", {})}
    batch = {"lr": jax.random.uniform(key, (2, size, size, 3)),
             "gt": jax.random.uniform(jax.random.fold_in(key, 1),
                                      (2, size, size, 3))}
    return (key, cr, vae, teacher, student, teacher_vars, sv, frozen, batch)


class TestTinyDNTrainStep:
    def test_loss_decreases(self):
        (key, cr, vae, teacher, student, teacher_vars, sv, frozen,
         batch) = _stack()
        schedule = DiffusionSchedule.create()
        state = TrainState.create(sv["params"], adamw_cosine(1e-3, 0, 80),
                                  batch_stats=sv.get("batch_stats", {}))
        step = jax.jit(
            make_tiny_dn_train_step(teacher, student, cr, vae, schedule,
                                    rollout_steps=2),
            donate_argnums=0)
        first = None
        for i in range(60):
            state, m = step(state, teacher_vars, frozen, batch,
                            jax.random.fold_in(key, i))
            if first is None:
                first = float(m["loss"])
                assert np.isfinite(first)
        assert float(m["loss"]) < 0.5 * first

    def test_both_terms_live_and_finite(self):
        (key, cr, vae, teacher, student, teacher_vars, sv, frozen,
         batch) = _stack()
        schedule = DiffusionSchedule.create()
        state = TrainState.create(sv["params"], adamw_cosine(1e-3, 0, 10),
                                  batch_stats=sv.get("batch_stats", {}))
        step = jax.jit(
            make_tiny_dn_train_step(teacher, student, cr, vae, schedule,
                                    rollout_steps=2, fwd_weight=0.5))
        _, m = step(state, teacher_vars, frozen, batch, key)
        for k in ("loss", "onpolicy_loss", "fwd_loss"):
            assert np.isfinite(float(m[k])), k
        assert float(m["onpolicy_loss"]) > 0.0
        assert float(m["fwd_loss"]) > 0.0
        # fwd_weight=0 must drop the forward term from the total
        step0 = jax.jit(
            make_tiny_dn_train_step(teacher, student, cr, vae, schedule,
                                    rollout_steps=2, fwd_weight=0.0))
        _, m0 = step0(state, teacher_vars, frozen, batch, key)
        np.testing.assert_allclose(float(m0["loss"]),
                                   float(m0["onpolicy_loss"]), rtol=1e-6)

    def test_frozen_teacher_untouched(self):
        (key, cr, vae, teacher, student, teacher_vars, sv, frozen,
         batch) = _stack()
        schedule = DiffusionSchedule.create()
        state = TrainState.create(sv["params"], adamw_cosine(1e-3, 0, 10),
                                  batch_stats=sv.get("batch_stats", {}))
        step = jax.jit(
            make_tiny_dn_train_step(teacher, student, cr, vae, schedule,
                                    rollout_steps=2))
        before = jax.device_get((teacher_vars, frozen))
        state, _ = step(state, teacher_vars, frozen, batch, key)
        after = jax.device_get((teacher_vars, frozen))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_perfect_student_has_zero_onpolicy_loss(self):
        """When the student IS the teacher (same arch + same weights), the
        on-policy eps-matching loss must be ~0 — the target really is the
        teacher's own prediction at the rollout waypoints."""
        (key, cr, vae, teacher, student, teacher_vars, sv, frozen,
         batch) = _stack()
        schedule = DiffusionSchedule.create()
        state = TrainState.create(teacher_vars["params"],
                                  adamw_cosine(1e-3, 0, 10),
                                  batch_stats=teacher_vars["batch_stats"])
        step = jax.jit(
            make_tiny_dn_train_step(teacher, teacher, cr, vae, schedule,
                                    rollout_steps=2))
        _, m = step(state, teacher_vars, frozen, batch, key)
        # not exactly 0: the student runs train=True (HCA BatchNorm uses
        # batch stats) while the teacher target ran train=False (running
        # stats — at random init, zeros/ones). Measured 0.016 here vs ~1+
        # for a random student; assert well below the random level.
        assert float(m["onpolicy_loss"]) < 0.05


class TestTinyDNSampler:
    @pytest.mark.smoke
    def test_narrow_student_drops_into_split_sampler(self):
        """A narrower FacialRefiner is a drop-in at the ordinary refiner
        seam — same split sampler, same uint8 I/O contract (this is the
        whole point of width distillation: no new pipeline code)."""
        key = jax.random.PRNGKey(0)
        size, latent = 16, 8
        cr = CoarseRestoration(width=8, resolution=size, enc_nums=(1,),
                               mid_num=1, dec_nums=(1,))
        vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)
        student = FacialRefiner(latent_size=latent, width=4, enc_nums=(1,),
                                mid_num=1, dec_nums=(1,),
                                idc_stage_sizes=(1, 1, 1, 1))
        schedule = DiffusionSchedule.create()
        sv = student.init(key, jnp.zeros((1, latent, latent, 4)),
                          jnp.zeros((1,)), jnp.zeros((1, size, size, 3)),
                          jnp.zeros((1, latent, latent, 4)), train=False)
        variables = {
            "refiner": {"params": sv["params"],
                        "batch_stats": sv.get("batch_stats", {})},
            "cr": cr.init(key, jnp.zeros((1, size, size, 3)))["params"],
            "vae": vae.init(key, jnp.zeros((1, size, size, 3)))["params"],
        }
        cfg = RefinerPipelineConfig(num_inference_steps=2,
                                    latent_size=latent, io_uint8=True)
        lr = (jax.random.uniform(key, (2, size, size, 3)) * 255
              ).astype(jnp.uint8)
        out = build_refiner_sampler_split(student, cr, vae, schedule,
                                          cfg)(variables, lr, key)
        assert out.shape == (2, size, size, 3)
        assert out.dtype == jnp.uint8
