"""Eval metric + checkpoint tests."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.eval.metrics import (
    identity_cosine,
    identity_verification_accuracy,
    min_max_normalize,
    psnr,
)
from hifidiff_tpu.eval.niqe import fit_niqe_model, niqe
from hifidiff_tpu.train.checkpoint import (
    CheckpointManager,
    _merge_strict_false,
)

RNG = np.random.default_rng(11)


class TestMetrics:
    def test_psnr_known_value(self):
        x = jnp.zeros((1, 8, 8, 3))
        y = jnp.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 20 dB
        np.testing.assert_allclose(float(psnr(x, y)), 20.0, rtol=1e-5)

    def test_min_max_normalize(self):
        x = jnp.asarray(RNG.uniform(-3, 5, (2, 4, 4, 3)).astype(np.float32))
        n = min_max_normalize(x)
        assert float(n.min()) >= 0.0 and float(n.max()) <= 1.0 + 1e-6
        for b in range(2):
            assert abs(float(n[b].max()) - 1.0) < 1e-5
            assert abs(float(n[b].min())) < 1e-5

    def test_identity_cosine_and_accuracy(self):
        a = jnp.asarray(RNG.standard_normal((8, 32), dtype=np.float32))
        sims = identity_cosine(a, a * 2.0)  # same direction -> 1
        np.testing.assert_allclose(np.asarray(sims), 1.0, atol=1e-5)
        acc = identity_verification_accuracy(a, a, -a)
        assert float(acc) == 1.0


class TestNIQE:
    def test_natural_vs_noise(self):
        # smooth structured images as the "pristine" corpus
        xs, ys = np.meshgrid(np.linspace(0, 6, 192), np.linspace(0, 6, 192))
        pristine = [
            (0.5 + 0.4 * np.sin(xs * (1 + k * 0.3) + ys))[..., None].repeat(
                3, -1) + RNG.normal(0, 0.01, (192, 192, 3))
            for k in range(4)
        ]
        pristine = [np.clip(p, 0, 1).astype(np.float32) for p in pristine]
        mu, cov = fit_niqe_model(pristine)
        similar = pristine[0]
        noise = RNG.uniform(0, 1, (192, 192, 3)).astype(np.float32)
        assert niqe(similar, mu, cov) < niqe(noise, mu, cov)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from hifidiff_tpu.train.optim import adam
        from hifidiff_tpu.train.steps import TrainState

        params = {"layer": {"kernel": jnp.asarray(
            RNG.standard_normal((4, 4), dtype=np.float32))}}
        state = TrainState.create(params, adam(1e-3))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, jax.device_get(state), wait=True)
        assert mgr.latest_step() == 7
        restored = mgr.restore(template=jax.device_get(state))["state"]
        np.testing.assert_allclose(
            np.asarray(restored.params["layer"]["kernel"]),
            np.asarray(params["layer"]["kernel"]))
        mgr.close()

    def test_merge_strict_false(self):
        init = {"a": np.zeros(3), "b": {"c": np.zeros(2), "d": np.zeros(1)}}
        loaded = {"a": np.ones(3), "b": {"c": np.ones(2)},
                  "extra": np.ones(9)}
        out = _merge_strict_false(init, loaded)
        np.testing.assert_allclose(out["a"], 1.0)
        np.testing.assert_allclose(out["b"]["c"], 1.0)
        np.testing.assert_allclose(out["b"]["d"], 0.0)  # kept from init
        assert "extra" not in out
