"""Progressive-distillation tests (arXiv:2202.00512-style, see
`train/distill.py`): DDIM two-step/one-step telescoping identity, step
tables, odd-ratio rejection, and a tiny end-to-end distillation run whose
loss must drop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifidiff_tpu.diffusion import DiffusionSchedule
from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
from hifidiff_tpu.train.distill import (
    ddim_step,
    distill_eps_target,
    make_distill_train_step,
    student_step_tables,
)
from hifidiff_tpu.train.optim import adam
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.vae import AutoencoderKL

RNG = np.random.default_rng(11)


class TestDistillMath:
    @pytest.mark.parametrize("substeps", [2, 5])
    def test_constant_eps_substeps_telescope_and_solver_recovers(
            self, substeps):
        """For an x-independent eps, DDIM steps telescope: k sub-steps
        equal one direct step, and the eps-target solve returns the
        original eps at every student step (incl. the final one where
        alpha_prev = 1)."""
        sched = DiffusionSchedule.create()
        tabs = student_step_tables(sched, 10, substeps)
        x0 = jnp.asarray(RNG.normal(size=(10, 4, 4, 2)), jnp.float32)
        eps = jnp.asarray(RNG.normal(size=(10, 4, 4, 2)), jnp.float32)
        a_sub = jnp.asarray(tabs["alpha_sub"])
        x = x0
        for j in range(substeps):
            x = ddim_step(x, eps, a_sub[:, j], a_sub[:, j + 1])
        x_one = ddim_step(x0, eps, a_sub[:, 0], a_sub[:, -1])
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_one),
                                   atol=2e-5)
        rec = distill_eps_target(x0, x, a_sub[:, 0], a_sub[:, -1])
        np.testing.assert_allclose(np.asarray(rec), np.asarray(eps),
                                   atol=5e-4)

    def test_tables_shape_and_final_step(self):
        sched = DiffusionSchedule.create()
        tabs = student_step_tables(sched, 25)
        assert tabs["t"].shape == (25,)
        assert tabs["t_sub"].shape == (25, 2)
        assert tabs["alpha_sub"].shape == (25, 3)
        # descending leading spacing ends at t=0 with alpha_prev -> 1
        assert tabs["t"][-1] == 0.0
        assert tabs["alpha_sub"][-1, -1] == 1.0
        assert tabs["alpha_sub"][-1, 1] == 1.0  # half step below 0 clamps
        # the eps-target denominator is bounded away from zero everywhere
        a_t, a_prev = tabs["alpha_sub"][:, 0], tabs["alpha_sub"][:, -1]
        denom = (np.sqrt(1 - a_prev)
                 - np.sqrt(a_prev / a_t) * np.sqrt(1 - a_t))
        assert np.abs(denom).min() > 1e-3

    def test_indivisible_step_ratio_rejected(self):
        sched = DiffusionSchedule.create()
        with pytest.raises(ValueError, match="divisible"):
            student_step_tables(sched, 8)  # ratio 125, not divisible by 2
        with pytest.raises(ValueError, match="divisible"):
            student_step_tables(sched, 25, substeps=3)  # 40 % 3 != 0


class TestDistillTraining:
    def test_distill_loss_decreases(self):
        """Tiny refiner stack: init the student from the teacher and run a
        few dozen distillation steps — loss must fall materially (the
        student learns to jump two teacher steps at once)."""
        size, latent = 32, 8
        cr = CoarseRestoration(width=8, resolution=size, enc_nums=(1, 1),
                               mid_num=1, dec_nums=(1, 1))
        vae = AutoencoderKL(block_out=(32, 32, 32), layers_per_block=1)
        refiner = FacialRefiner(latent_size=latent, width=16,
                                enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1),
                                idc_stage_sizes=(1, 1, 1, 1))
        sched = DiffusionSchedule.create()
        key = jax.random.PRNGKey(0)
        rv = refiner.init(key, jnp.zeros((1, latent, latent, 4)),
                          jnp.zeros((1,)), jnp.zeros((1, size, size, 3)),
                          jnp.zeros((1, latent, latent, 4)), train=False)
        cr_params = cr.init(key, jnp.zeros((1, size, size, 3)))["params"]
        vae_params = vae.init(key, jnp.zeros((1, size, size, 3)),
                              sample=False)["params"]
        teacher = {"params": rv["params"],
                   "batch_stats": rv.get("batch_stats", {})}
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, rv["params"]), adam(2e-3),
            batch_stats=rv.get("batch_stats", {}))
        frozen = {"cr": cr_params, "vae": vae_params}
        batch = {
            "lr": jnp.asarray(RNG.uniform(0, 1, (2, size, size, 3)),
                              jnp.float32),
            "gt": jnp.asarray(RNG.uniform(0, 1, (2, size, size, 3)),
                              jnp.float32),
        }
        step = jax.jit(make_distill_train_step(refiner, cr, vae, sched,
                                               num_student_steps=10))
        losses = []
        for i in range(60):
            state, m = step(state, teacher, frozen, batch,
                            jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert np.all(np.isfinite(losses))
        first, last = np.mean(losses[:5]), np.mean(losses[-5:])
        assert last < 0.5 * first, (first, last)

        # stratified variant (per-batch even step coverage): same program
        # contract — finite loss, trains. Its quality outcome on the real
        # stack is the measured negative in DISTILL_QUALITY_R5.json.
        strat = jax.jit(make_distill_train_step(refiner, cr, vae, sched,
                                                num_student_steps=10,
                                                stratified=True))
        s2 = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, rv["params"]), adam(2e-3),
            batch_stats=rv.get("batch_stats", {}))
        for i in range(3):
            s2, m2 = strat(s2, teacher, frozen, batch,
                           jax.random.fold_in(key, 100 + i))
            assert np.isfinite(float(m2["loss"]))
