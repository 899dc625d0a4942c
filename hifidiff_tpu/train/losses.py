"""Training losses, vectorized (no per-sample Python loops).

Semantics from the reference:
  * `cr_loss` = MSE(pred, y) + key-region MSE (`models/cr/loss.py:4-17`).
    The key-region term zeroes everything outside the facial-component mask
    (mask = any-channel-positive of the patch image) but keeps the FULL
    tensor size in the denominator — exactly what the reference's per-sample
    `F.mse_loss(pred*mask, y*mask)` loop computes; here it is one batched
    masked reduction instead of a host loop (SURVEY.md §3.5 hot spot #5).
  * `triplet_margin_loss` — torch `F.triplet_margin_loss` defaults
    (`pretrain_idc.py:27-28`): margin 1.0, p=2, eps=1e-6 added inside the
    distance, mean reduction.
  * `smooth_l1` / `ssim` / `vgg` terms of the reference's unused `CRLoss`
    (`loss.py:8-67`) live in `composite_cr_loss` for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def key_region_mask(patches: jax.Array) -> jax.Array:
    """patches: (B, P, H, W, C) stacked facial-component images (the K-Face
    loader stacks P=4 eye/nose/mouth patch images, `dataset_kface.py:101`) ->
    (B, H, W, C) binary union mask. The reference reduces the PATCH axis
    (`y_patch[b].sum(dim=0) > 0`, `models/cr/loss.py:7` on a (P, C, H, W)
    tensor), giving a per-channel union of the component regions."""
    return (jnp.sum(patches, axis=1) > 0.0)


def key_region_loss(pred: jax.Array, target: jax.Array,
                    patches: jax.Array) -> jax.Array:
    """pred/target: (B, H, W, C); patches: (B, P, H, W, C).

    The reference expands the union mask back to (P, C, H, W) and takes
    `F.mse_loss` over the replicated tensor — identical to a single masked
    MSE with the FULL (C, H, W) extent in the denominator. One batched
    reduction here (the reference loops the batch on host,
    `models/cr/loss.py:5-13`).
    """
    mask = key_region_mask(patches).astype(jnp.float32)  # (B,H,W,C)
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) * mask
    return jnp.mean(jnp.square(diff))


def cr_loss(pred: jax.Array, target: jax.Array,
            patches: jax.Array) -> jax.Array:
    return mse_loss(pred, target) + key_region_loss(pred, target, patches)


def _pairwise_distance(a: jax.Array, b: jax.Array, eps: float = 1e-6):
    # torch PairwiseDistance: || a - b + eps ||_2 along the feature axis
    return jnp.sqrt(jnp.sum(jnp.square(a - b + eps), axis=-1))


def triplet_margin_loss(anchor: jax.Array, positive: jax.Array,
                        negative: jax.Array, margin: float = 1.0) -> jax.Array:
    """anchor/positive/negative: (B, D) embeddings."""
    d_ap = _pairwise_distance(anchor, positive)
    d_an = _pairwise_distance(anchor, negative)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def smooth_l1_loss(pred: jax.Array, target: jax.Array,
                   beta: float = 1.0) -> jax.Array:
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(jnp.where(diff < beta, 0.5 * diff * diff / beta,
                              diff - 0.5 * beta))


def ssim(x: jax.Array, y: jax.Array, max_val: float = 1.0,
         filter_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Gaussian-windowed SSIM over NHWC images, mean over batch.

    Standard Wang et al. formulation (the reference uses piqa's SSIM for its
    optional loss `loss.py:19` and pyiqa's for eval `train_refiner.py:398`).
    """
    half = filter_size // 2
    coords = jnp.arange(filter_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()

    def blur(img):
        # separable Gaussian, applied depthwise over channels
        c = img.shape[-1]
        kh = jnp.tile(g.reshape(filter_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, filter_size, 1, 1), (1, 1, 1, c))
        img = jax.lax.conv_general_dilated(
            img, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        return jax.lax.conv_general_dilated(
            img, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x, mu_y = blur(x), blur(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = blur(x * x) - mu_x2
    sig_y = blur(y * y) - mu_y2
    sig_xy = blur(x * y) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)


def composite_cr_loss(pred, target, patches=None, *, lambda_pix=1.0,
                      lambda_ssim=0.0, lambda_vgg=0.0,
                      vgg_features_fn=None) -> jax.Array:
    """The reference's weighted `CRLoss` (`loss.py:40-67`): smooth-L1 pixel +
    key-region smooth-L1, optional (1 - SSIM), optional VGG feature smooth-L1
    (pass a feature extractor via `vgg_features_fn`; the reference computes
    both feature maps without gradient, `loss.py:54-56`, so we stop
    gradients the same way)."""
    loss = smooth_l1_loss(pred, target)
    if patches is not None:
        mask = key_region_mask(patches).astype(jnp.float32)
        loss = loss + smooth_l1_loss(pred * mask, target * mask)
    total = lambda_pix * loss
    if lambda_ssim > 0.0:
        total = total + lambda_ssim * (1.0 - ssim(pred, target))
    if lambda_vgg > 0.0 and vgg_features_fn is not None:
        fp = jax.lax.stop_gradient(vgg_features_fn(pred))
        ft = jax.lax.stop_gradient(vgg_features_fn(target))
        total = total + lambda_vgg * smooth_l1_loss(fp, ft)
    return total
