"""jit-discipline sanitizers (SURVEY.md §5): retrace counting, donation
verification, purity. Applied to the real train step so regressions in the
framework's own jit hygiene fail loudly."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.utils.checks import (
    RetraceCounter,
    assert_donated,
    assert_jit_pure,
)


class TestRetraceCounter:
    @pytest.mark.smoke
    def test_steady_state_traces_once(self):
        counter = RetraceCounter(lambda x: x * 2)
        f = jax.jit(counter)
        for i in range(5):
            f(jnp.ones((4,)) * i)
        counter.assert_max(1)

    def test_shape_churn_detected(self):
        counter = RetraceCounter(lambda x: x * 2)
        f = jax.jit(counter)
        f(jnp.ones((4,)))
        f(jnp.ones((5,)))  # new shape -> retrace
        try:
            counter.assert_max(1)
            raise AssertionError("expected retrace assertion")
        except AssertionError as e:
            assert "traced 2 times" in str(e)


class TestDonation:
    def test_train_step_donates_state(self):
        """The real stage-3 train step donates its TrainState — verify the
        old state's buffers are actually freed."""
        from hifidiff_tpu.diffusion import DiffusionSchedule
        from hifidiff_tpu.models import Denoiser
        from hifidiff_tpu.train.optim import adamw_cosine
        from hifidiff_tpu.train.steps import (
            TrainState,
            make_denoiser_train_step,
        )
        from hifidiff_tpu.vae import AutoencoderKL

        denoiser = Denoiser(width=16, enc_nums=(1,), mid_num=1,
                            dec_nums=(1,))
        vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)
        schedule = DiffusionSchedule.create()
        key = jax.random.PRNGKey(0)
        dn = denoiser.init(key, jnp.zeros((1, 16, 16, 4)),
                           jnp.zeros((1,)))["params"]
        vp = vae.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
        state = TrainState.create(dn, adamw_cosine(total_steps=4))
        step = jax.jit(make_denoiser_train_step(denoiser, vae, schedule),
                       donate_argnums=0)
        imgs = jax.random.uniform(key, (2, 32, 32, 3))
        new_state, _ = step(state, vp, imgs, key)
        assert_donated(state.params)
        assert not jax.tree_util.tree_leaves(new_state.params)[0].is_deleted()

    def test_undonated_detected(self):
        f = jax.jit(lambda x: x + 1)  # no donation
        x = jnp.ones((4,))
        f(x)
        try:
            assert_donated({"x": x})
            raise AssertionError("expected donation assertion")
        except AssertionError as e:
            assert "donation ineffective" in str(e)


class TestPurity:
    def test_pure_fn_passes(self):
        assert_jit_pure(lambda x: jnp.sin(x) * 2, jnp.ones((3,)))

    def test_hidden_state_detected(self):
        state = {"n": 0}

        def impure(x):
            state["n"] += 1
            return x * state["n"]

        try:
            assert_jit_pure(impure, jnp.ones((3,)))
            raise AssertionError("expected purity assertion")
        except AssertionError as e:
            assert "different jaxprs" in str(e)
