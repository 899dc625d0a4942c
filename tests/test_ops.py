"""Parity tests for core ops vs PyTorch CPU ground truth.

Each op's semantics come from the reference (see docstrings in
hifidiff_tpu/ops/*); torch here is only the oracle, not a dependency of the
framework itself.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hifidiff_tpu.ops import (
    affine_grid,
    affine_warp,
    grid_sample,
    layer_norm_2d,
    pixel_shuffle,
    resize_bicubic_torch,
    simple_gate,
    sinusoidal_time_embed,
)

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


class TestLayerNorm2d:
    def test_forward_matches_torch(self):
        x = RNG.standard_normal((2, 5, 7, 16), dtype=np.float32)
        w = RNG.standard_normal(16, dtype=np.float32)
        b = RNG.standard_normal(16, dtype=np.float32)
        out = layer_norm_2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))

        xt = torch.tensor(nchw(x))
        mu = xt.mean(1, keepdim=True)
        var = (xt - mu).pow(2).mean(1, keepdim=True)
        y = (xt - mu) / (var + 1e-6).sqrt()
        ref = torch.tensor(w).view(1, -1, 1, 1) * y + torch.tensor(b).view(1, -1, 1, 1)
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()), atol=1e-5)

    def test_grad_matches_autodiff(self):
        # the custom VJP must equal plain autodiff of the same math
        x = jnp.asarray(RNG.standard_normal((2, 4, 4, 8), dtype=np.float32))
        w = jnp.asarray(RNG.standard_normal(8, dtype=np.float32))
        b = jnp.asarray(RNG.standard_normal(8, dtype=np.float32))

        def plain(x, w, b):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
            return jnp.sum(((x - mu) / jnp.sqrt(var + 1e-6) * w + b) ** 2)

        def custom(x, w, b):
            return jnp.sum(layer_norm_2d(x, w, b) ** 2)

        g1 = jax.grad(plain, argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(custom, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


class TestSimpleGate:
    def test_matches_torch_chunk(self):
        x = RNG.standard_normal((2, 3, 3, 10), dtype=np.float32)
        out = simple_gate(jnp.asarray(x))
        xt = torch.tensor(nchw(x))
        a, b = xt.chunk(2, dim=1)
        np.testing.assert_allclose(np.asarray(out), nhwc((a * b).numpy()), atol=1e-6)


class TestPixelShuffle:
    @pytest.mark.parametrize("r", [1, 2])
    def test_matches_torch(self, r):
        x = RNG.standard_normal((2, 4, 5, 12 * r * r), dtype=np.float32)
        out = pixel_shuffle(jnp.asarray(x), r)
        ref = F.pixel_shuffle(torch.tensor(nchw(x)), r)
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()), atol=1e-6)


class TestSinusoidalEmbed:
    def test_matches_reference_formula(self):
        # float32 oracle (the reference computes in float32 too; float64
        # ground truth differs by ~1e-3 at t~1000 purely from fp32 trig)
        t = np.array([0.0, 1.0, 17.0, 999.0], dtype=np.float32)
        out = sinusoidal_time_embed(jnp.asarray(t), 128)
        half = 64
        emb = np.log(10000.0) / (half - 1)
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        args = torch.tensor(t)[:, None] * freqs[None, :]
        ref = torch.cat([args.sin(), args.cos()], dim=-1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


class TestAffineWarp:
    @pytest.mark.parametrize(
        "theta_np",
        [
            np.array([[[1.0, 0, 0], [0, 1.0, 0]]], dtype=np.float32),  # identity
            np.array([[[0.9, 0.1, 0.05], [-0.08, 1.1, -0.1]]], dtype=np.float32),
            np.array([[[1.5, 0.0, 0.6], [0.0, 1.5, -0.6]]], dtype=np.float32),  # out-of-bounds
        ],
    )
    def test_matches_torch_grid_sample(self, theta_np):
        x = RNG.standard_normal((1, 16, 16, 3), dtype=np.float32)
        out = affine_warp(jnp.asarray(x), jnp.asarray(theta_np))

        xt = torch.tensor(nchw(x))
        grid = F.affine_grid(torch.tensor(theta_np), xt.shape, align_corners=False)
        ref = F.grid_sample(xt, grid, align_corners=False)
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()), atol=1e-5)

    def test_batched_theta(self):
        x = RNG.standard_normal((3, 8, 8, 4), dtype=np.float32)
        theta = RNG.standard_normal((3, 2, 3)).astype(np.float32) * 0.1
        theta[:, 0, 0] += 1.0
        theta[:, 1, 1] += 1.0
        out = affine_warp(jnp.asarray(x), jnp.asarray(theta))
        xt = torch.tensor(nchw(x))
        grid = F.affine_grid(torch.tensor(theta), xt.shape, align_corners=False)
        ref = F.grid_sample(xt, grid, align_corners=False)
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()), atol=1e-5)

    def test_grid_matches_torch(self):
        theta = np.array([[[0.8, 0.2, -0.1], [0.1, 1.2, 0.3]]], dtype=np.float32)
        g = affine_grid(jnp.asarray(theta), (6, 10))
        ref = F.affine_grid(torch.tensor(theta), (1, 1, 6, 10), align_corners=False)
        np.testing.assert_allclose(np.asarray(g), ref.numpy(), atol=1e-6)


class TestBicubicResize:
    @pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (128, 128)),
                                              ((128, 128), (32, 32)),
                                              ((16, 16), (128, 128)),
                                              ((17, 23), (64, 48))])
    def test_matches_torch_interpolate(self, in_hw, out_hw):
        x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
        out = resize_bicubic_torch(jnp.asarray(x), out_hw)
        ref = F.interpolate(torch.tensor(nchw(x)), size=out_hw, mode="bicubic",
                            align_corners=False)
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()),
                                   atol=2e-5, rtol=1e-4)


class TestFastWarp:
    """Hat-matmul warp (MXU formulation) must match the gather formulation
    exactly — same bilinear math, different execution strategy."""

    def _theta(self, b, scale=0.05, seed=0):
        rng = np.random.default_rng(seed)
        identity = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32),
                           (b, 1, 1))
        return jnp.asarray(
            identity + rng.normal(0, scale, (b, 2, 3)).astype(np.float32))

    def test_matmul_small_matches_gather(self, monkeypatch):
        from hifidiff_tpu.ops.warp import affine_warp

        monkeypatch.setenv("HIFIDIFF_FORCE_FAST_WARP", "1")
        for res, c in ((8, 16), (16, 8), (32, 4)):
            x = jax.random.normal(jax.random.PRNGKey(res), (3, res, res, c))
            theta = self._theta(3, seed=res)
            fast = affine_warp(x, theta)
            ref = affine_warp(x, theta, method="gather")
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                       atol=2e-5, rtol=1e-5)

    def test_rowwin_pallas_matches_gather(self, monkeypatch):
        from hifidiff_tpu.ops.warp import affine_warp

        monkeypatch.setenv("HIFIDIFF_FORCE_FAST_WARP", "1")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 8))
        theta = self._theta(2, scale=0.03)
        fast = affine_warp(x, theta)  # H*W > 1024 -> pallas (interpret)
        ref = affine_warp(x, theta, method="gather")
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_rowwin_k16_branch_matches_gather(self, monkeypatch):
        """Mid shear: span > K_SMALL but <= K -> the default dispatch
        stays on the K=16 kernel (not the gather fallback); must stay
        exact bilinear."""
        from hifidiff_tpu.ops.warp import affine_warp

        monkeypatch.setenv("HIFIDIFF_FORCE_FAST_WARP", "1")
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 8))
        theta = jnp.tile(jnp.asarray(
            [[1.0, 0.02, 0.01], [0.12, 1.0, -0.02]], jnp.float32)[None],
            (2, 1, 1))  # ay=0.12 -> span ~ 0.12*63+3 ~ 10.6: K=16 branch
        fast = affine_warp(x, theta)
        ref = affine_warp(x, theta, method="gather")
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("mode_env", ["HIFIDIFF_WARP_PACKED",
                                          "HIFIDIFF_WARP_ADAPTIVE"])
    @pytest.mark.parametrize("shear", [0.005, 0.12, 0.9])
    def test_env_gated_variants_match_gather(self, monkeypatch, mode_env,
                                             shear):
        """The opt-in lane-PACKED kernel body and the span-ADAPTIVE
        K4/K16/gather dispatch must both stay exact bilinear across the
        near-identity (K=4-eligible), mid-shear (K=16) and extreme-shear
        (gather-fallback) regimes."""
        from hifidiff_tpu.ops.warp import affine_warp

        monkeypatch.setenv("HIFIDIFF_FORCE_FAST_WARP", "1")
        monkeypatch.setenv(mode_env, "1")
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 8))
        theta = jnp.tile(jnp.asarray(
            [[1.0, 0.01, 0.02], [shear, 1.0, -0.01]], jnp.float32)[None],
            (2, 1, 1))
        fast = affine_warp(x, theta)
        ref = affine_warp(x, theta, method="gather")
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_extreme_shear_falls_back_exactly(self, monkeypatch):
        """|dsy/dj| too large for the K-row window -> lax.cond picks the
        gather branch; result must still be exact."""
        from hifidiff_tpu.ops.warp import affine_warp

        monkeypatch.setenv("HIFIDIFF_FORCE_FAST_WARP", "1")
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 4))
        theta = jnp.tile(jnp.asarray(
            [[1.0, 0.0, 0.0], [0.9, 1.0, 0.0]], jnp.float32)[None],
            (2, 1, 1))  # huge y-shear: span ~ 0.9 * 64 >> K
        fast = affine_warp(x, theta)
        ref = affine_warp(x, theta, method="gather")
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_gradients_match_gather(self, monkeypatch):
        from hifidiff_tpu.ops.warp import affine_warp

        monkeypatch.setenv("HIFIDIFF_FORCE_FAST_WARP", "1")
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        theta = self._theta(2, scale=0.04, seed=9)

        def loss_fast(x, t):
            return jnp.sum(affine_warp(x, t) ** 2)

        def loss_ref(x, t):
            return jnp.sum(affine_warp(x, t, method="gather") ** 2)

        gx_f, gt_f = jax.grad(loss_fast, argnums=(0, 1))(x, theta)
        gx_r, gt_r = jax.grad(loss_ref, argnums=(0, 1))(x, theta)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r),
                                   atol=1e-3, rtol=1e-3)

    def test_cpu_default_is_gather(self):
        from hifidiff_tpu.ops import warp as warp_mod

        x = jnp.ones((1, 64, 64, 4))
        assert not warp_mod._fast_allowed(x)  # cpu backend, no force env
