"""Evaluation metrics in pure JAX (the reference shells out to pyiqa —
`train_refiner.py:398-401`, `test_refiner.py:107-109`; LPIPS and NIQE live
in their own modules since they need external model statistics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hifidiff_tpu.train.losses import ssim  # noqa: F401  (re-export)


def psnr(pred: jax.Array, target: jax.Array,
         max_val: float = 1.0) -> jax.Array:
    """Mean PSNR over the batch, NHWC in [0, max_val]."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32)
                              - target.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return jnp.mean(20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse))


def rgb_to_y(x: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma: NHWC RGB in [0,1] -> (N,H,W,1) Y in [16, 235].

    This is pyiqa's `to_y_channel(img, 255., 'ycbcr')` convention
    (pyiqa/utils/color_util.py — itself the MATLAB `rgb2ycbcr` studio-swing
    transform): Y = 65.481 R + 128.553 G + 24.966 B + 16 with R,G,B in
    [0,1]. The reference's reported SSIM numbers are computed on this
    channel (`test_refiner.py:107-109` via pyiqa's ssim default
    test_y_channel=True)."""
    x = x.astype(jnp.float32)
    return (65.481 * x[..., 0:1] + 128.553 * x[..., 1:2]
            + 24.966 * x[..., 2:3] + 16.0)


def psnr_pyiqa(pred: jax.Array, target: jax.Array,
               test_y_channel: bool = False) -> jax.Array:
    """Per-image PSNR, the exact pyiqa `psnr` pipeline
    (pyiqa/archs/psnr_arch.py): inputs NHWC in [0,1]; with
    test_y_channel=False (pyiqa's default for the 'psnr' metric) the MSE is
    over RGB with data_range 1; with True, over BT.601 Y with data_range
    255. Returns (B,) scores — the reference means them
    (`test_refiner.py:120`,  `metric(...).mean()`)."""
    eps = 1e-8
    if test_y_channel:
        pred, target = rgb_to_y(pred), rgb_to_y(target)
        data_range = 255.0
    else:
        data_range = 1.0
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32)
                              - target.astype(jnp.float32)), axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range ** 2 / (mse + eps))


def _fspecial_gauss(size: int, sigma: float) -> jax.Array:
    """MATLAB fspecial('gaussian', size, sigma), normalized (size, size)."""
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_pyiqa(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image SSIM, the pyiqa 'ssim' metric pipeline
    (pyiqa/archs/ssim_arch.py, itself the Wang et al. MATLAB ssim.m):
    NHWC RGB in [0,1] -> BT.601 Y in [0,255]; official downsampling
    f = max(1, round(min(H, W)/256)) by f x f mean-pooling when f > 1;
    11x11 Gaussian window sigma 1.5 in VALID mode (the window never crosses
    the border — MATLAB's implicit border handling); C1 = (0.01*255)^2,
    C2 = (0.03*255)^2. Returns (B,) scores. At the reference's 128^2 eval
    resolution f == 1, but the rule is kept for generality."""
    x = rgb_to_y(pred)
    y = rgb_to_y(target)
    h, w = x.shape[1], x.shape[2]
    f = max(1, round(min(h, w) / 256))
    if f > 1:
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, f, f, 1),
                                  (1, f, f, 1), "VALID") / (f * f)
        y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, f, f, 1),
                                  (1, f, f, 1), "VALID") / (f * f)
    win = _fspecial_gauss(11, 1.5).reshape(11, 11, 1, 1)

    def blur(img):
        return jax.lax.conv_general_dilated(
            img, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    mu_x, mu_y = blur(x), blur(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = blur(x * x) - mu_x2
    sig_y = blur(y * y) - mu_y2
    sig_xy = blur(x * y) - mu_xy
    ssim_map = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / \
        ((mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def min_max_normalize(x: jax.Array, per_sample: bool = True) -> jax.Array:
    """Min-max to [0,1], applied to both prediction and GT before metrics
    (`test_refiner.py:113-119`). The reference's `result.min()` is the
    min over the WHOLE batch tensor — pass per_sample=False to replicate
    that exactly (the eval CLIs do); per_sample=True normalizes each image
    independently (batch-size invariant, the saner default elsewhere)."""
    axes = (1, 2, 3) if per_sample else (0, 1, 2, 3)
    lo = jnp.min(x, axis=axes, keepdims=True)
    hi = jnp.max(x, axis=axes, keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, 1e-12)


@jax.jit
def reference_eval_metrics(pred: jax.Array, gt: jax.Array):
    """The reference's exact eval convention as ONE jitted program:
    batch-GLOBAL min-max normalization of prediction AND ground truth
    (`test_refiner.py:113-119`), then pyiqa 'psnr' (per-image RGB, data
    range 1, batch mean) and pyiqa 'ssim' (BT.601-Y, MATLAB window/border
    rules) — pinned by tests/test_pyiqa_golden.py. Returns
    ({"psnr", "ssim"}, pred_n, gt_n); the normalized tensors feed the
    optional LPIPS/NIQE stages in `cli.test_refiner`. Shared by the
    train-refiner val loop and the eval CLI so the convention lives in one
    place, and jitted because eager per-op dispatch through the TPU tunnel
    costs ~6 ms per op (docs/PERF.md)."""
    pred_n = min_max_normalize(pred, per_sample=False)
    gt_n = min_max_normalize(gt, per_sample=False)
    return ({"psnr": jnp.mean(psnr_pyiqa(pred_n, gt_n)),
             "ssim": jnp.mean(ssim_pyiqa(pred_n, gt_n))}, pred_n, gt_n)


def identity_cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity of (B, D) identity embeddings -> (B,)."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(a * b, axis=-1)


def identity_verification_accuracy(anchor: jax.Array, positive: jax.Array,
                                   negative: jax.Array) -> jax.Array:
    """Fraction of samples where cos(anchor, positive) > cos(anchor,
    negative) — `test_idc.py:23-39` semantics."""
    sim_pos = identity_cosine(anchor, positive)
    sim_neg = identity_cosine(anchor, negative)
    return jnp.mean((sim_pos > sim_neg).astype(jnp.float32))
