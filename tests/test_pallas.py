"""Pallas kernel parity tests (interpreter mode on CPU; the same code
compiles via Mosaic on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.ops.pallas import ln_film_pallas

RNG = np.random.default_rng(21)


def ref_ln_film(x, w, b, s, t, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps)
    return (y * w + b) * (1.0 + s[:, None, None, :]) + t[:, None, None, :]


def make_inputs(bsz=2, h=4, w=4, c=128):
    x = jnp.asarray(RNG.standard_normal((bsz, h, w, c), dtype=np.float32))
    wt = jnp.asarray(RNG.standard_normal(c, dtype=np.float32))
    bs = jnp.asarray(RNG.standard_normal(c, dtype=np.float32))
    s = jnp.asarray(RNG.standard_normal((bsz, c), dtype=np.float32) * 0.1)
    t = jnp.asarray(RNG.standard_normal((bsz, c), dtype=np.float32) * 0.1)
    return x, wt, bs, s, t


class TestLnFilmPallas:
    def test_forward_parity(self):
        x, w, b, s, t = make_inputs()
        out = ln_film_pallas(x, w, b, s, t)
        ref = ref_ln_film(x, w, b, s, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_forward_zero_film_is_plain_ln(self):
        x, w, b, _, _ = make_inputs()
        z = jnp.zeros((x.shape[0], x.shape[-1]))
        out = ln_film_pallas(x, w, b, z, z)
        from hifidiff_tpu.ops import layer_norm_2d

        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(layer_norm_2d(x, w, b)),
                                   atol=1e-5)

    def test_grad_parity(self):
        x, w, b, s, t = make_inputs(bsz=2, h=2, w=2, c=128)

        def loss_pallas(*args):
            return jnp.sum(jnp.sin(ln_film_pallas(*args)))

        def loss_ref(*args):
            return jnp.sum(jnp.sin(ref_ln_film(*args)))

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
        for a, c_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                       atol=2e-4, rtol=1e-4)

    def test_multi_tile_rows(self):
        # rows > DEFAULT_TILE exercises the grid + accumulators
        x, w, b, s, t = make_inputs(bsz=1, h=32, w=32, c=128)
        out = ln_film_pallas(x, w, b, s, t)
        ref = ref_ln_film(x, w, b, s, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        g1 = jax.grad(lambda *a: jnp.sum(ln_film_pallas(*a) ** 2),
                      argnums=(1, 3))(x, w, b, s, t)
        g2 = jax.grad(lambda *a: jnp.sum(ref_ln_film(*a) ** 2),
                      argnums=(1, 3))(x, w, b, s, t)
        for a, c_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                       atol=1e-3, rtol=1e-4)
