"""jit-compiled training steps for the four reference training stages.

Each factory returns a pure `step(state, batch, key) -> (state, metrics)`
designed to be jitted over a DP mesh: params replicated, batch sharded on
"data", loss means become global means (XLA inserts the psum — the
functional equivalent of `accelerator.backward`'s all-reduce +
`accelerator.gather(loss)`, `pretrain_denoiser.py:173-178`).

Stages (reference entry points):
  * CR          — `train_cr.py:56-94`: cr_loss(pred, gt, patches), Adam.
  * IDC         — `pretrain_idc.py:13-34`: triplet(IDC(CR(lr)), IDC(gt),
                  IDC(other)), frozen CR.
  * Denoiser    — `pretrain_denoiser.py:123-227`: VAE-encode, add noise at
                  uniform t, MSE(eps_hat, eps), AdamW+cosine.
  * Refiner     — `train_refiner.py:128-209`: frozen CR + frozen VAE feed
                  the FusedDenoiser/FPG/IDC composition; partial freeze via
                  the optimizer mask (`refiner_freeze_mask`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from hifidiff_tpu.diffusion.schedule import DiffusionSchedule
from hifidiff_tpu.train.losses import cr_loss, mse_loss, triplet_margin_loss
from hifidiff_tpu.vae.model import SD_VAE_SCALING


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # exponential moving average of params (beyond-reference: standard
    # diffusion-training practice the PyTorch repo omits). None = off;
    # enabled via `create(..., ema_decay=0.9999)`. Rides in the state
    # pytree, so orbax checkpoints/resume carry it automatically.
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, params, tx, batch_stats=None, ema_decay: float = 0.0):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats or {},
                   opt_state=tx.init(params), tx=tx,
                   ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                               if ema_decay else None),
                   ema_decay=float(ema_decay))

    @property
    def eval_params(self):
        """EMA params when enabled, else the live params."""
        return self.ema_params if self.ema_params is not None else self.params

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=opt_state,
            ema_params=ema,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )


def make_cr_train_step(model, loss_fn: Optional[Callable] = None) -> Callable:
    """loss_fn(pred, gt, patches) defaults to the reference's cr_loss
    (`train_cr.py:178`); pass `composite_cr_loss` variants for the optional
    CRLoss (`loss.py:8-67`)."""
    loss_fn = loss_fn or cr_loss

    def step(state: TrainState, batch, key):
        lr_img, gt, patches = batch["lr"], batch["gt"], batch["patches"]

        def objective(params):
            pred = model.apply({"params": params}, lr_img)
            return loss_fn(pred, gt, patches)

        loss, grads = jax.value_and_grad(objective)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    return step


def make_cr_eval_step(model) -> Callable:
    def step(params, batch):
        pred = model.apply({"params": params}, batch["lr"])
        return pred, {"loss": cr_loss(pred, batch["gt"], batch["patches"])}

    return step


def make_idc_train_step(idc_model, cr_model, cr_params) -> Callable:
    """Triplet pretraining; the CR that produces the anchor is frozen
    (`pretrain_idc.py:113-116`)."""

    def step(state: TrainState, batch, key):
        # positive = a different photo of the identity when the dataset
        # provides one ("pos", e.g. the procedural detail family), else
        # the frontal gt (the reference's positive IS a separate frontal
        # photograph, `pretrain_idc.py:24-28`)
        lr_img, other = batch["lr"], batch["other"]
        gt = batch["pos"] if "pos" in batch else batch["gt"]
        cr_face = jax.lax.stop_gradient(
            cr_model.apply({"params": cr_params}, lr_img))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (anchor, stats1) = idc_model.apply(
                variables, cr_face, train=True, mutable=["batch_stats"])
            (positive, stats2) = idc_model.apply(
                {"params": params, "batch_stats": stats1["batch_stats"]},
                gt, train=True, mutable=["batch_stats"])
            (negative, stats3) = idc_model.apply(
                {"params": params, "batch_stats": stats2["batch_stats"]},
                other, train=True, mutable=["batch_stats"])
            loss = triplet_margin_loss(anchor, positive, negative)
            return loss, stats3["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_stats), {"loss": loss}

    return step


def make_denoiser_train_step(model, vae, schedule: DiffusionSchedule,
                             scaling: float = SD_VAE_SCALING) -> Callable:
    """Unconditional latent-DDPM pretraining step. The VAE is frozen; its
    params ride in the batch-independent `vae_params` closure argument."""

    def step(state: TrainState, vae_params, images, key):
        k_enc, k_noise, k_t = jax.random.split(key, 3)
        imgs = jnp.clip(images, 0.0, 1.0) * 2.0 - 1.0
        latents = vae.apply({"params": vae_params}, imgs, key=k_enc,
                            sample=True, method=vae.encode) * scaling
        latents = jax.lax.stop_gradient(latents)
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        t = jax.random.randint(k_t, (latents.shape[0],), 0,
                               schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, t)

        def loss_fn(params):
            eps = model.apply({"params": params}, noisy,
                              t.astype(jnp.float32))
            return mse_loss(eps, noise)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    return step


def make_denoiser_train_step_cached(model, schedule: DiffusionSchedule,
                                    scaling: float = SD_VAE_SCALING
                                    ) -> Callable:
    """Latent-moments-cached variant of `make_denoiser_train_step`.

    The stage-3 VAE is FROZEN and the HQ pretraining datasets apply no
    augmentation (`dataset_pretraining.py:15-73` resize only), so the
    posterior moments (mean, logvar) of every image are constants across
    epochs. Pre-encoding them once and sampling
    `z = mean + exp(0.5*logvar) * eps` per step matches the reference's
    per-step `vae.encode(...).latent_dist.sample()`
    (`pretrain_denoiser.py:68-73,149-150`) under the same PRNG draw —
    bit-identical sampled latent and loss, params to XLA-recompilation
    rounding (`tests/test_train.py::TestCachedLatentStep`) — while
    removing the frozen encoder from every training step.

    `batch` is {"mean": (B,h,w,4), "logvar": (B,h,w,4)} (unscaled —
    exactly `AutoencoderKL.moments` output; the `scaling` is applied here,
    after sampling, matching the uncached step's order of operations).
    """

    def step(state: TrainState, batch, key):
        k_enc, k_noise, k_t = jax.random.split(key, 3)
        mean, logvar = batch["mean"], batch["logvar"]
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            k_enc, mean.shape, mean.dtype)
        latents = z * scaling
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        t = jax.random.randint(k_t, (latents.shape[0],), 0,
                               schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, t)

        def loss_fn(params):
            eps = model.apply({"params": params}, noisy,
                              t.astype(jnp.float32))
            return mse_loss(eps, noise)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    return step


def make_vae_train_step(vae, beta_kl: float = 1e-6) -> Callable:
    """Recon + KL training step for `AutoencoderKL` (beyond-reference
    utility: the PyTorch repo freezes an externally pretrained SD-2.1 VAE,
    `pretrain_denoiser.py:256-259` — this provides the corresponding fit
    path so the full pipeline can be trained self-contained on custom
    domains, and powers the end-to-end convergence demo)."""

    def step(state: TrainState, batch, key):
        x = jnp.clip(batch["image"], 0.0, 1.0) * 2.0 - 1.0

        def loss_fn(params):
            mean, logvar = vae.apply({"params": params}, x,
                                     method=vae.moments)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype)
            rec = vae.apply({"params": params}, z, method=vae.decode)
            rec_loss = mse_loss(rec, x)
            kl = -0.5 * jnp.mean(1.0 + logvar - jnp.square(mean)
                                 - jnp.exp(logvar))
            return rec_loss + beta_kl * kl, (rec_loss, kl)

        (loss, (rec, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {"loss": loss, "rec": rec,
                                              "kl": kl}

    return step


def make_refiner_train_step(refiner, cr_model, vae,
                            schedule: DiffusionSchedule,
                            scaling: float = SD_VAE_SCALING) -> Callable:
    """Stage-4 conditional training (`train_refiner.py:128-209`): under
    stop-gradient, encode the HF target latent and run CR + encode its
    latent; add noise at uniform t; MSE between predicted and true eps."""

    def step(state: TrainState, frozen, batch, key):
        cr_params, vae_params = frozen["cr"], frozen["vae"]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lr_img, hf_img = batch["lr"], batch["gt"]

        def encode(img, k):
            x = jnp.clip(img, 0.0, 1.0) * 2.0 - 1.0
            z = vae.apply({"params": vae_params}, x, key=k, sample=True,
                          method=vae.encode) * scaling
            return z

        hf_latent = jax.lax.stop_gradient(encode(hf_img, k1))
        cr_face = jax.lax.stop_gradient(
            cr_model.apply({"params": cr_params}, lr_img))
        cr_latent = jax.lax.stop_gradient(encode(cr_face, k2))

        noise = jax.random.normal(k3, hf_latent.shape, hf_latent.dtype)
        t = jax.random.randint(k4, (hf_latent.shape[0],), 0,
                               schedule.num_train_timesteps)
        noisy = schedule.add_noise(hf_latent, noise, t)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            eps, mut = refiner.apply(
                variables, noisy, t.astype(jnp.float32), cr_face, cr_latent,
                train=True, mutable=["batch_stats"])
            return mse_loss(eps, noise), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_stats), {"loss": loss}

    return step
