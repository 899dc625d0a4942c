"""pyiqa metric-convention oracles (VERDICT r2 missing #2 / weak #4).

The reference's reported numbers come from `pyiqa.create_metric('psnr')` /
`('ssim')` (`/root/reference/test_refiner.py:107-120`). pyiqa is not
installable here (zero egress), so — like `test_scheduler_golden.py` did
for diffusers — this file transcribes the published pipelines those
metrics implement (MATLAB rgb2ycbcr / Wang et al. ssim.m with the official
downsampling rule / per-image PSNR with data_range) into independent
float64 numpy oracles, plus the BT.601 studio-swing golden values, and
pins `eval.metrics.psnr_pyiqa` / `ssim_pyiqa` / `rgb_to_y` against them.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hifidiff_tpu.eval.metrics import (
    min_max_normalize,
    psnr,
    psnr_pyiqa,
    rgb_to_y,
    ssim,
    ssim_pyiqa,
)

RNG = np.random.default_rng(42)


# ---------- independent float64 numpy transcription -----------------------

def np_rgb_to_y(x):
    """MATLAB rgb2ycbcr luma row, inputs [0,1]: Y in [16, 235]."""
    x = x.astype(np.float64)
    return (65.481 * x[..., 0] + 128.553 * x[..., 1]
            + 24.966 * x[..., 2] + 16.0)[..., None]


def np_psnr_pyiqa(pred, target, test_y_channel=False):
    if test_y_channel:
        pred, target = np_rgb_to_y(pred), np_rgb_to_y(target)
        data_range = 255.0
    else:
        data_range = 1.0
    mse = np.mean((pred.astype(np.float64) - target.astype(np.float64)) ** 2,
                  axis=(1, 2, 3))
    return 10.0 * np.log10(data_range ** 2 / (mse + 1e-8))


def _np_gauss_win(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _np_valid_conv(img, win):
    """Direct sliding-window VALID 2D convolution, (H, W) float64."""
    k = win.shape[0]
    h, w = img.shape
    s = np.lib.stride_tricks.sliding_window_view(img, (k, k))
    return np.einsum("ijkl,kl->ij", s, win)


def np_ssim_pyiqa(pred, target):
    """Wang et al. ssim.m on BT.601 Y with the official downsampling rule —
    the algorithm behind pyiqa's 'ssim' default (test_y_channel=True)."""
    x = np_rgb_to_y(pred)[..., 0]
    y = np_rgb_to_y(target)[..., 0]
    out = []
    win = _np_gauss_win()
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    for xi, yi in zip(x, y):
        h, w = xi.shape
        f = max(1, round(min(h, w) / 256))
        if f > 1:
            xi = xi[:h - h % f, :w - w % f] \
                .reshape(h // f, f, w // f, f).mean(axis=(1, 3))
            yi = yi[:h - h % f, :w - w % f] \
                .reshape(h // f, f, w // f, f).mean(axis=(1, 3))
        mu_x = _np_valid_conv(xi, win)
        mu_y = _np_valid_conv(yi, win)
        sig_x = _np_valid_conv(xi * xi, win) - mu_x ** 2
        sig_y = _np_valid_conv(yi * yi, win) - mu_y ** 2
        sig_xy = _np_valid_conv(xi * yi, win) - mu_x * mu_y
        m = ((2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)) / \
            ((mu_x ** 2 + mu_y ** 2 + c1) * (sig_x + sig_y + c2))
        out.append(m.mean())
    return np.asarray(out)


# ---------- tests ----------------------------------------------------------

class TestYChannelGolden:
    @pytest.mark.smoke
    def test_bt601_golden_values(self):
        """Studio-swing anchors from the BT.601 spec itself."""
        rgb = jnp.asarray([[[[1.0, 1.0, 1.0]]],    # white -> 235
                           [[[0.0, 0.0, 0.0]]],    # black -> 16
                           [[[1.0, 0.0, 0.0]]],    # red   -> 81.481
                           [[[0.0, 1.0, 0.0]]],    # green -> 144.553
                           [[[0.0, 0.0, 1.0]]]])   # blue  -> 40.966
        y = np.asarray(rgb_to_y(rgb))[..., 0].ravel()
        np.testing.assert_allclose(
            y, [235.0, 16.0, 81.481, 144.553, 40.966], atol=1e-3)

    def test_matches_numpy_oracle(self):
        x = RNG.uniform(0, 1, (3, 9, 9, 3)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(rgb_to_y(jnp.asarray(x))),
                                   np_rgb_to_y(x), rtol=1e-5, atol=1e-3)


class TestPSNRPyiqa:
    def test_matches_oracle_rgb_and_y(self):
        a = RNG.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1) \
            .astype(np.float32)
        for yflag in (False, True):
            ours = np.asarray(psnr_pyiqa(jnp.asarray(a), jnp.asarray(b),
                                         test_y_channel=yflag))
            ref = np_psnr_pyiqa(a, b, test_y_channel=yflag)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)

    def test_per_image_convention(self):
        """pyiqa returns per-image scores which the reference then means —
        NOT the PSNR of the pooled MSE. With unequal per-image errors the
        two genuinely differ; `eval.metrics.psnr` already follows the
        per-image convention."""
        a = RNG.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        b = a.copy()
        b[0] += 0.1   # image 0 noisy, image 1 exact-ish
        b[1] += 0.001
        b = np.clip(b, 0, 1)
        per_image_mean = float(np.mean(np_psnr_pyiqa(a, b)))
        pooled = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
        assert abs(per_image_mean - pooled) > 1.0
        ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
        assert abs(ours - per_image_mean) < 0.05


class TestSSIMPyiqa:
    def test_identical_images(self):
        x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(ssim_pyiqa(x, x)), 1.0,
                                   atol=1e-4)

    def test_matches_oracle_128(self):
        """128^2 — the reference's eval resolution (f == 1)."""
        a = RNG.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.03, a.shape), 0, 1) \
            .astype(np.float32)
        ours = np.asarray(ssim_pyiqa(jnp.asarray(a), jnp.asarray(b)))
        ref = np_ssim_pyiqa(a, b)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)

    def test_matches_oracle_with_downsampling(self):
        """384^2 -> official rule f = round(384/256) = 2 (mean-pool)."""
        a = RNG.uniform(0, 1, (1, 384, 384, 3)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1) \
            .astype(np.float32)
        ours = np.asarray(ssim_pyiqa(jnp.asarray(a), jnp.asarray(b)))
        ref = np_ssim_pyiqa(a, b)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)

    def test_differs_from_rgb_ssim(self):
        """The RGB Gaussian SSIM used as a *loss* is NOT the pyiqa eval
        convention (Y channel, [0,255] constants) — quantify that they
        disagree so nobody conflates the two numbers."""
        a = RNG.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        rgb = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        yval = float(np.mean(np.asarray(ssim_pyiqa(jnp.asarray(a),
                                                   jnp.asarray(b)))))
        assert abs(rgb - yval) > 1e-3


class TestMinMaxConvention:
    def test_batch_global_matches_reference_semantics(self):
        """`test_refiner.py:113-119` normalizes with the min/max of the
        WHOLE batch tensor."""
        x = RNG.uniform(-1, 2, (3, 4, 4, 3)).astype(np.float32)
        ref = (x - x.min()) / (x.max() - x.min())
        ours = np.asarray(min_max_normalize(jnp.asarray(x),
                                            per_sample=False))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
        per = np.asarray(min_max_normalize(jnp.asarray(x)))
        assert per.reshape(3, -1).min(1).max() < 1e-6  # each sample spans 0..1
