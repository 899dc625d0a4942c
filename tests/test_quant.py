"""w8 int8 inference-path tests: converter structure + numeric drift
bounds vs the f32 path."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.models import FusedDenoiser
from hifidiff_tpu.ops.quant import (
    dense_w8,
    quantize_variables,
    quantize_weight_per_cout,
)

RNG = np.random.default_rng(23)


class TestQuantPrimitives:
    @pytest.mark.smoke
    def test_weight_quantization_roundtrip(self):
        w = jnp.asarray(RNG.standard_normal((64, 32), dtype=np.float32))
        q, s = quantize_weight_per_cout(w)
        assert q.dtype == jnp.int8 and s.shape == (32,)
        recon = q.astype(jnp.float32) * s
        rel = float(jnp.abs(recon - w).max() / jnp.abs(w).max())
        assert rel < 1e-2  # <= half a quant step relative to the max

    def test_dense_w8_accuracy(self):
        # cout=64 is below the int8 lane tile -> exercises the dequant
        # fallback branch
        x = jnp.asarray(RNG.standard_normal((8, 128), dtype=np.float32))
        w = jnp.asarray(RNG.standard_normal((128, 64), dtype=np.float32))
        q, s = quantize_weight_per_cout(w)
        y = dense_w8(x, q, s)
        ref = x @ w
        rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_matmul_w8_kernel_matches_dequant(self):
        """Pallas kernel (interpret on CPU) == dequantized matmul, incl.
        a ragged M that forces row padding and multi-tile K/N grids."""
        from hifidiff_tpu.ops.pallas.int8_matmul import matmul_w8

        for m, k, n in ((50, 256, 256), (8, 1024, 1536), (300, 128, 128)):
            x = jnp.asarray(
                RNG.standard_normal((m, k), dtype=np.float32))
            w = jnp.asarray(
                RNG.standard_normal((k, n), dtype=np.float32))
            q, s = quantize_weight_per_cout(w)
            y = matmul_w8(x, q, s, block_m=128, block_n=128, block_k=128)
            ref = x @ (q.astype(jnp.float32) * s)
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       atol=5e-2, rtol=1e-4)

    def test_conv_w8_1x1_dispatch(self):
        """1x1 conv routes through the matmul and matches the dequantized
        XLA conv; 3x3 depthwise uses the dequant conv branch."""
        from hifidiff_tpu.ops.quant import conv_w8

        x = jnp.asarray(
            RNG.standard_normal((2, 4, 4, 128), dtype=np.float32))
        w = jnp.asarray(
            RNG.standard_normal((1, 1, 128, 128), dtype=np.float32))
        q, s = quantize_weight_per_cout(w)
        y = conv_w8(x, q, s, (1, 1), 0)
        ref = jax.lax.conv_general_dilated(
            x, q.astype(jnp.float32) * s, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=5e-2, rtol=1e-4)

        wd = jnp.asarray(
            RNG.standard_normal((3, 3, 1, 128), dtype=np.float32))
        qd, sd = quantize_weight_per_cout(wd)
        yd = conv_w8(x, qd, sd, (1, 1), ((1, 1), (1, 1)),
                     feature_group_count=128)
        assert yd.shape == x.shape and bool(jnp.isfinite(yd).all())

    def test_legacy_w8a8_dense(self):
        from hifidiff_tpu.ops.quant import dense_w8a8

        x = jnp.asarray(RNG.standard_normal((8, 128), dtype=np.float32))
        w = jnp.asarray(RNG.standard_normal((128, 64), dtype=np.float32))
        q, s = quantize_weight_per_cout(w)
        y = dense_w8a8(x, q, s)
        ref = x @ w
        rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
        assert rel < 0.03, rel


class TestQuantizedDenoiser:
    def test_convert_and_forward_close_to_f32(self, monkeypatch):
        # tiny widths fall below the production weight-size threshold —
        # force every layer onto the quantized path for coverage
        from hifidiff_tpu.ops import quant

        monkeypatch.setattr(quant, "W8_MIN_WEIGHT_PARAMS", 0)
        kwargs = dict(width=16, latent_size=8, enc_nums=(1, 1), mid_num=1,
                      dec_nums=(1, 1))
        f32_model = FusedDenoiser(**kwargs)
        key = jax.random.PRNGKey(0)

        lat = jax.random.normal(key, (2, 8, 8, 4))
        t = jnp.array([10.0, 700.0])
        prior_shapes = [(2, 2, 2, 64), (2, 4, 4, 32), (2, 8, 8, 16)]
        priors = [jax.random.normal(jax.random.fold_in(key, i), s)
                  for i, s in enumerate(prior_shapes)]
        emb = jax.random.normal(key, (2, 2048))

        fv = f32_model.init(key, lat, t, priors, emb, train=False)
        q_params = quantize_variables(fv["params"])
        # every conv/dense kernel must have been converted (threshold 0)
        flat = jax.tree_util.tree_flatten_with_path(q_params)[0]
        names = {p[-1].key for p, _ in flat}
        assert "kernel_q" in names and "kernel" not in names

        out_f = f32_model.apply(fv, lat, t, priors, emb, train=False)
        # SAME module, quantized tree: the params are the switch
        out_q = f32_model.apply(
            {"params": q_params, "batch_stats": fv.get("batch_stats", {})},
            lat, t, priors, emb, train=False)
        rel = float(jnp.linalg.norm(out_q - out_f)
                    / jnp.maximum(jnp.linalg.norm(out_f), 1e-9))
        # int8 across ~10 quantized layers: a few percent relative drift
        assert rel < 0.15, rel
        assert bool(jnp.isfinite(out_q).all())
