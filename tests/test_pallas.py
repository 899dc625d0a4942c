"""Pallas kernel parity tests (interpreter mode on CPU; the same code
compiles via Mosaic on TPU)."""

import pytest
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
    @pytest.mark.smoke
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


class TestGroupNormSiluPallas:
    def _ref(self, x, s, b, g=32, eps=1e-6):
        from hifidiff_tpu.ops.norm import _gn_silu_ref

        return _gn_silu_ref(x, s, b, g, eps)

    def test_forward_parity(self):
        from hifidiff_tpu.ops.pallas.groupnorm_silu import (
            group_norm_silu_pallas,
        )

        for shape in ((2, 4, 4, 128), (1, 8, 8, 256)):
            x = jnp.asarray(
                RNG.standard_normal(shape, dtype=np.float32))
            s = jnp.asarray(
                RNG.standard_normal(shape[-1], dtype=np.float32))
            b = jnp.asarray(
                RNG.standard_normal(shape[-1], dtype=np.float32))
            out = group_norm_silu_pallas(x, s, b)
            ref = self._ref(x, s, b)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)

    def test_multi_chunk_rows(self):
        """HW > in-kernel chunk exercises the two chunked loops."""
        import hifidiff_tpu.ops.pallas.groupnorm_silu as gn

        orig = gn._CHUNK
        gn._CHUNK = 16
        try:
            x = jnp.asarray(
                RNG.standard_normal((1, 8, 8, 128), dtype=np.float32))
            s = jnp.ones((128,))
            b = jnp.zeros((128,))
            out = gn.group_norm_silu_pallas(x, s, b)
            ref = self._ref(x, s, b)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)
        finally:
            gn._CHUNK = orig

    def test_grad_via_ref_path(self):
        from hifidiff_tpu.ops.norm import group_norm_silu

        x = jnp.asarray(
            RNG.standard_normal((1, 4, 4, 128), dtype=np.float32))
        s = jnp.asarray(RNG.standard_normal(128, dtype=np.float32))
        b = jnp.asarray(RNG.standard_normal(128, dtype=np.float32))

        gx = jax.grad(lambda x_: jnp.sum(group_norm_silu(x_, s, b) ** 2))(x)
        gr = jax.grad(lambda x_: jnp.sum(self._ref(x_, s, b) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)

    def test_bf16_io(self):
        from hifidiff_tpu.ops.pallas.groupnorm_silu import (
            group_norm_silu_pallas,
        )

        x = jnp.asarray(RNG.standard_normal((2, 4, 4, 128),
                                            dtype=np.float32))
        out = group_norm_silu_pallas(x.astype(jnp.bfloat16),
                                     jnp.ones((128,)), jnp.zeros((128,)))
        assert out.dtype == jnp.bfloat16
        ref = self._ref(x, jnp.ones((128,)), jnp.zeros((128,)))
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=0.05)


class TestFusedCNafBlock:
    """Fused 1x1-spatial ConditionalNAFBlock kernel (interpret on CPU).
    beta/gamma are zero-init (block == identity), so tests randomize them
    — otherwise parity is vacuous."""

    def _setup(self, c=256, w8=False, seed=0):
        import os

        import hifidiff_tpu.ops.quant as quant
        from hifidiff_tpu.nn.naf import ConditionalNAFBlock
        from hifidiff_tpu.ops.quant import quantize_variables

        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (3, 1, 1, c))
        film = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                 (1, 4 * c)) * 0.2
        t = jax.random.normal(jax.random.PRNGKey(seed + 2), (3, 512))
        blk = ConditionalNAFBlock(c)
        force = os.environ.pop("HIFIDIFF_FORCE_FUSED_NAF", None)
        try:
            v = ConditionalNAFBlock(c).init(key, x, t)
        finally:
            if force is not None:
                os.environ["HIFIDIFF_FORCE_FUSED_NAF"] = force
        p = dict(v["params"])
        p["beta"] = jax.random.normal(jax.random.PRNGKey(7), (c,)) * 0.5
        p["gamma"] = jax.random.normal(jax.random.PRNGKey(8), (c,)) * 0.5
        if w8:
            # tree-driven seam: the quantized params ARE the switch
            p = quantize_variables(p)
        return blk, {"params": p}, x, film, t

    def test_fused_matches_standard(self, monkeypatch):
        blk, v, x, film, t = self._setup()
        ref = blk.apply(v, x, film=film)     # default: standard path
        monkeypatch.setenv("HIFIDIFF_FORCE_FUSED_NAF", "1")
        out = blk.apply(v, x, film=film)
        # non-vacuous: the block must actually transform the input
        assert float(jnp.abs(ref - x).max()) > 0.1
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_fused_w8_close_to_float(self, monkeypatch):
        import hifidiff_tpu.ops.quant as quant

        monkeypatch.setenv("HIFIDIFF_FORCE_FUSED_NAF", "1")
        monkeypatch.setattr(quant, "W8_MIN_WEIGHT_PARAMS", 0)
        blk, v, x, film, t = self._setup()
        ref = blk.apply(v, x, film=film)
        blk_q, vq, *_ = self._setup(w8=True)
        out = blk_q.apply(vq, x, film=film)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert 0 < rel < 0.02, rel  # int8 drift: nonzero but small

    def test_param_structure_identical_between_paths(self, monkeypatch):
        """The fused branch declares params via declare_only modules; the
        tree must match the standard branch exactly (checkpoints/imports
        interchange)."""
        from hifidiff_tpu.nn.naf import ConditionalNAFBlock

        c = 256
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 1, 1, c))
        film = jnp.zeros((1, 4 * c))
        v_std = ConditionalNAFBlock(c).init(key, x, film=film)
        monkeypatch.setenv("HIFIDIFF_FORCE_FUSED_NAF", "1")
        v_fused = ConditionalNAFBlock(c).init(key, x, film=film)
        assert (jax.tree_util.tree_structure(v_std)
                == jax.tree_util.tree_structure(v_fused))
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(v_std)[0],
                jax.tree_util.tree_flatten_with_path(v_fused)[0]):
            assert pa == pb and a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_batchful_film_unfused(self, monkeypatch):
        """Per-sample films (training shape) must not dispatch to the
        fused kernel (it assumes a shared batch-1 film)."""
        monkeypatch.setenv("HIFIDIFF_FORCE_FUSED_NAF", "1")
        blk, v, x, film, t = self._setup()
        film_b = jnp.broadcast_to(film, (3, film.shape[-1]))
        out = blk.apply(v, x, film=film_b)       # takes the standard path
        monkeypatch.delenv("HIFIDIFF_FORCE_FUSED_NAF")
        ref = blk.apply(v, x, film=film_b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_fused_2x2_matches_standard(self, monkeypatch):
        """2x2 spatial: depthwise 3x3 lowered to a position-mix, SCA pool
        over the 4 positions."""
        import os

        from hifidiff_tpu.nn.naf import ConditionalNAFBlock

        c = 256
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (3, 2, 2, c))
        film = jax.random.normal(jax.random.PRNGKey(4), (1, 4 * c)) * 0.2
        t = jax.random.normal(jax.random.PRNGKey(5), (3, 512))
        blk = ConditionalNAFBlock(c)
        v = blk.init(key, x, t)
        p = dict(v["params"])
        p["beta"] = jax.random.normal(jax.random.PRNGKey(7), (c,)) * 0.5
        p["gamma"] = jax.random.normal(jax.random.PRNGKey(8), (c,)) * 0.5
        v = {"params": p}
        ref = blk.apply(v, x, film=film)
        monkeypatch.setenv("HIFIDIFF_FORCE_FUSED_NAF", "1")
        out = blk.apply(v, x, film=film)
        assert float(jnp.abs(ref - x).max()) > 0.1  # non-vacuous
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


class TestGroupNormStability:
    def test_near_constant_large_mean_group_no_nan(self):
        """One-pass E[x^2]-mu^2 cancels catastrophically for near-constant
        groups with large mean (code-review r2 finding); the kernel must
        use the two-pass form."""
        from hifidiff_tpu.ops.norm import _gn_silu_ref
        from hifidiff_tpu.ops.pallas.groupnorm_silu import (
            group_norm_silu_pallas,
        )

        x = 50.0 + 1e-3 * jnp.asarray(
            RNG.standard_normal((1, 32, 32, 128), dtype=np.float32))
        s = jnp.ones((128,))
        b = jnp.zeros((128,))
        out = group_norm_silu_pallas(x, s, b)
        assert bool(jnp.isfinite(out).all())
        ref = _gn_silu_ref(x, s, b, 32, 1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=1e-2)
