"""NIQE convention oracles (VERDICT r2 missing #3, algorithmic half).

The reference reports NIQE via `pyiqa.create_metric('niqe')`
(`/root/reference/test_refiner.py:107-109`). pyiqa is not installable here
(zero egress), so — like `test_pyiqa_golden.py` for PSNR/SSIM — this file
transcribes the published basicsr/pyiqa NIQE pipeline into an INDEPENDENT
float64 numpy oracle (direct-loop MSCN, its own GGD/AGGD moment-matching
fitters, its own MATLAB-imresize) and pins `eval.niqe` against it, plus a
committed golden feature vector for a deterministic procedural-face image
so any future regression in any stage of the pipeline is caught by fixed
numbers, not just oracle agreement.
"""

import math

import numpy as np
import pytest
from scipy.special import gamma as _g

from hifidiff_tpu.eval.niqe import (
    imresize_half,
    mscn,
    niqe_features,
    rgb_to_luma,
)

# ---------- independent float64 transcription ------------------------------


def np_cubic(x):
    ax = np.abs(x.astype(np.float64))
    return ((1.5 * ax ** 3 - 2.5 * ax ** 2 + 1) * (ax <= 1)
            + (-0.5 * ax ** 3 + 2.5 * ax ** 2 - 4 * ax + 2)
            * ((ax > 1) & (ax <= 2)))


def _mirror(i, n):
    """MATLAB symmetric boundary: reflect an arbitrary integer index into
    [0, n) per aux=[1:n, n:-1:1] — recursive reflection, no wraparound
    tables (deliberately different from the implementation's aux map)."""
    while i < 0 or i >= n:
        if i < 0:
            i = -i - 1
        if i >= n:
            i = 2 * n - 1 - i
    return i


def np_imresize_half(img):
    """MATLAB imresize(scale=0.5, bicubic, antialias) — direct per-output
    loop (slow, independent of the vectorized implementation)."""
    img = img.astype(np.float64)

    def one_dim(a, axis):
        n_in = a.shape[axis]
        n_out = math.ceil(n_in * 0.5)
        out_shape = list(a.shape)
        out_shape[axis] = n_out
        out = np.zeros(out_shape)
        kw = 8.0
        for o in range(n_out):
            u = (o + 0.5) / 0.5 - 0.5
            left = math.floor(u - kw / 2)
            js = np.arange(left, left + 10)
            w = np_cubic((u - js) * 0.5) * 0.5
            w = w / w.sum()
            js = np.asarray([_mirror(int(j), n_in) for j in js])
            sl = [slice(None)] * a.ndim
            acc = np.zeros([s for i, s in enumerate(a.shape) if i != axis])
            for wi, ji in zip(w, js):
                sl[axis] = ji
                acc = acc + wi * a[tuple(sl)]
            slo = [slice(None)] * a.ndim
            slo[axis] = o
            out[tuple(slo)] = acc
        return out

    return one_dim(one_dim(img, 0), 1)


def np_mscn(img):
    """Direct sliding-window MSCN, replicate borders, 7x7 sigma-7/6."""
    img = img.astype(np.float64)
    half = 3
    xs = np.arange(-half, half + 1)
    g1 = np.exp(-(xs ** 2) / (2 * (7.0 / 6.0) ** 2))
    k = np.outer(g1, g1)
    k /= k.sum()
    pad = np.pad(img, half, mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(pad, (7, 7))
    mu = np.einsum("ijkl,kl->ij", win, k)
    pad2 = np.pad(img * img, half, mode="edge")
    win2 = np.lib.stride_tricks.sliding_window_view(pad2, (7, 7))
    sigma = np.sqrt(np.abs(np.einsum("ijkl,kl->ij", win2, k) - mu * mu))
    return (img - mu) / (sigma + 1.0)


_GAM = np.arange(0.2, 10.001, 0.001)


def np_fit_ggd(x):
    x = x.astype(np.float64).ravel()
    r_gam = _g(1 / _GAM) * _g(3 / _GAM) / _g(2 / _GAM) ** 2
    sigma_sq = (x ** 2).mean()
    rho = sigma_sq / max(np.abs(x).mean() ** 2, 1e-12)
    return _GAM[np.argmin(np.abs(r_gam - rho))], sigma_sq


def np_fit_aggd(x):
    x = x.astype(np.float64).ravel()
    l2 = (x[x < 0] ** 2).mean() if (x < 0).any() else 1e-12
    r2 = (x[x > 0] ** 2).mean() if (x > 0).any() else 1e-12
    gh = math.sqrt(l2) / math.sqrt(r2)
    rhat = np.abs(x).mean() ** 2 / max((x ** 2).mean(), 1e-12)
    rhn = rhat * (gh ** 3 + 1) * (gh + 1) / (gh ** 2 + 1) ** 2
    ra = _g(2 / _GAM) ** 2 / (_g(1 / _GAM) * _g(3 / _GAM))
    alpha = _GAM[np.argmin((ra - rhn) ** 2)]
    const = math.sqrt(_g(1 / alpha) / _g(3 / alpha))
    mean = (math.sqrt(r2) - math.sqrt(l2)) * const * (_g(2 / alpha)
                                                      / _g(1 / alpha))
    return alpha, mean, l2, r2


def np_niqe_features(img):
    """Full two-scale 36-feature pipeline, independent implementation.
    Crops to the 96-multiple BEFORE the scale loop, exactly where basicsr
    `calculate_niqe` does (`img[0:num_block_h*96, 0:num_block_w*96]`)."""
    img = img[:(img.shape[0] // 96) * 96, :(img.shape[1] // 96) * 96]
    out_scales = []
    patch = 96
    for s in range(2):
        co = np_mscn(img)
        h, w = co.shape
        feats = []
        for i in range(h // patch):
            for j in range(w // patch):
                p = co[i * patch:(i + 1) * patch, j * patch:(j + 1) * patch]
                f = list(np_fit_ggd(p))
                for dy, dx in [(0, 1), (1, 0), (1, 1), (1, -1)]:
                    sh = np.roll(np.roll(p, dy, axis=0), dx, axis=1)
                    f += list(np_fit_aggd(p * sh))
                feats.append(f)
        out_scales.append(np.asarray(feats, np.float64))
        if s == 0:
            img = np_imresize_half(img / 255.0) * 255.0
            patch = 48
    n = min(map(len, out_scales))
    return np.concatenate([out_scales[0][:n], out_scales[1][:n]], axis=1)


def _test_image(size=192):
    """Deterministic procedural face + deterministic texture noise, the
    committed golden input. The noise matters: a noiseless render has
    exactly-flat regions whose MSCN coefficients are exactly 0, and the
    AGGD left/right split (x<0 vs x>0) is then unstable to 1e-12
    implementation jitter between convolution algorithms — real photos
    never have bit-exact-flat patches."""
    from hifidiff_tpu.data.procedural import _identity_params, render_face

    img = render_face(_identity_params(7, 3), 0.3, size)
    rng = np.random.default_rng(123)
    return np.clip(img + rng.normal(0, 0.02, img.shape), 0.0,
                   1.0).astype(np.float32)


# Committed golden values: first patch's scale-1 features (GGD alpha,
# GGD sigma^2, then H/V/D1/D2 AGGD (alpha, mean, sigma_l^2, sigma_r^2)),
# computed by the independent float64 transcription above on the
# deterministic `_test_image()` — regenerate with
#   python -m pytest tests/test_niqe_golden.py -k golden -s
# after any intentional pipeline change.
GOLDEN_PATCH0_SCALE1 = np.asarray([
    2.195, 0.3627759554,
    0.81, -0.0610277327, 0.1585443392, 0.0940130792,
    0.782, -0.0629245107, 0.1642325475, 0.0959663514,
    0.773, -0.0337812835, 0.1495687759, 0.1124210496,
    0.766, -0.0322975068, 0.1512452059, 0.1153047358,
])


class TestNIQEConventions:
    @pytest.mark.smoke
    def test_studio_swing_luma(self):
        white = np.ones((2, 2, 3))
        black = np.zeros((2, 2, 3))
        np.testing.assert_allclose(rgb_to_luma(white), 235.0, atol=1e-3)
        np.testing.assert_allclose(rgb_to_luma(black), 16.0, atol=1e-3)

    def test_imresize_matches_oracle(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (64, 96))
        np.testing.assert_allclose(imresize_half(img),
                                   np_imresize_half(img),
                                   rtol=1e-10, atol=1e-12)

    def test_imresize_constant_preserved(self):
        img = np.full((32, 32), 0.375)
        np.testing.assert_allclose(imresize_half(img), 0.375, atol=1e-12)

    def test_mscn_matches_oracle(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (40, 40))
        np.testing.assert_allclose(mscn(img), np_mscn(img),
                                   rtol=1e-6, atol=1e-8)


class TestNIQEGolden:
    def test_crop_precedes_scale_loop(self):
        """At 128x128 (the eval size), features must equal the 96x96
        crop's features: basicsr crops BEFORE MSCN and the half-scale
        resize, so pixels 96..127 must not leak in through convolution
        borders or bicubic taps."""
        img = rgb_to_luma(_test_image(128)).round()
        np.testing.assert_allclose(niqe_features(img),
                                   niqe_features(img[:96, :96]),
                                   rtol=1e-12, atol=1e-12)
        # and the oracle agrees at the non-multiple size too
        np.testing.assert_allclose(niqe_features(img),
                                   np_niqe_features(img),
                                   rtol=1e-5, atol=1e-7)

    def test_features_match_independent_oracle(self):
        img = rgb_to_luma(_test_image()).round()
        ours = niqe_features(img)
        ref = np_niqe_features(img)
        assert ours.shape == ref.shape == (4, 36)  # 2x2 patches at 192^2
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)

    def test_committed_golden_vector(self):
        img = rgb_to_luma(_test_image()).round()
        feats = np_niqe_features(img)[0, :18]
        if not np.allclose(feats, GOLDEN_PATCH0_SCALE1, rtol=5e-4,
                           atol=5e-4):
            print("regenerated golden:",
                  np.array2string(feats, precision=10, separator=", "))
        np.testing.assert_allclose(feats, GOLDEN_PATCH0_SCALE1,
                                   rtol=5e-4, atol=5e-4)
