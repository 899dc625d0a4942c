"""Progressive distillation of the DDIM sampler (beyond-reference).

Implements guided progressive distillation in the style of Salimans & Ho,
"Progressive Distillation for Fast Sampling of Diffusion Models"
(arXiv:2202.00512): a student with N inference steps is trained so that
ONE student DDIM step matches `substeps` teacher DDIM steps on the same
trajectory (substeps=2 is the paper's halving round; substeps=5 distills
the reference's 50-step sampler, `test_refiner.py:85-91`, directly into
a 10-step student — integer 1000-step grids cannot reach 10 by halving
from 50). The reference repo has no distillation — its only fast-sampling
knob is DDIM step reduction, whose quality cost we measure in
CACHE_QUALITY.json.

Measured status (r5, DISTILL_QUALITY_R5.json): on the DISCRIMINATING
n=192 stack — where naive ddim@10 costs ~2 dB and there is real quality
to recover — the 50->10 distilled student comes out BELOW the naive
same-step teacher (16.2 vs 17.9 dB gt at lr 3e-6 x 3000 steps; 16.0 vs
17.9 at lr 1e-5 x 2000), with the train loss high-variance throughout:
the truncated-SNR x0 weighting concentrates ~2 orders of magnitude of
loss weight on the highest-noise student step, which small batches over
10 discrete steps cannot average. Distillation is therefore NOT a
sanctioned fast mode at this scale — use `--sampler dpmpp` instead.
The earlier +0.11/+0.08 dB result (DISTILL_QUALITY.json) came from the
weak n=64 stack whose naive reduction only cost ~0.35 dB; both
artifacts are kept. A stratified variant
(per-batch even step coverage, `stratified=True`) stabilizes the loss
but degrades the student further (14.3 dB) — the negative is
structural at this scale, not sampling variance. The machinery (step
tables, eps-target solve, teacher rollout in one jitted program) is
validated by tests/test_distill.py; a production-scale stack with
bigger batches and longer horizons is where the literature's recipe
operates.

TPU-first shape: the distillation train step is one jitted program (two
teacher evals + one student eval + backward); all DDIM constants are
static tables indexed by a traced per-sample step index, exactly like the
sampler scan (`diffusion/sampling.py`).

Math. One deterministic DDIM step from alpha_bar a to a' is linear in
the model output eps (diffusers step semantics, eta=0):

    x' = sqrt(a'/a) x + (sqrt(1-a') - sqrt(a'/a) sqrt(1-a)) eps

Given the teacher's two-step result x'' (a -> a_mid -> a'), the
eps-space target the student must emit to land on x'' in one step is the
linear solve

    eps~ = (x'' - sqrt(a'/a) x) / (sqrt(1-a') - sqrt(a'/a) sqrt(1-a))

and the loss is the truncated-SNR-weighted x0-space MSE of the paper
(w = max(a/(1-a), 1)). The denominator is nonzero whenever a' > a ...
including the final step, where a' = 1 (set_alpha_to_one) and the
denominator is -sqrt((1-a)/a). When the teacher's HALF step already
lands on a_mid = 1, the second teacher step is automatically the
identity (both coefficients collapse), so the final student step needs
no special-casing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.diffusion.sampling import ddim_timesteps
from hifidiff_tpu.diffusion.schedule import DiffusionSchedule
from hifidiff_tpu.train.losses import mse_loss
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.vae.model import SD_VAE_SCALING

Array = jax.Array


def ddim_step(x: Array, eps: Array, alpha_t: Array, alpha_prev: Array,
              clip_sample: bool = False,
              clip_sample_range: float = 1.0) -> Array:
    """One deterministic DDIM step (eta=0), batched alphas (B,)."""
    shape = (-1,) + (1,) * (x.ndim - 1)
    a_t = alpha_t.reshape(shape)
    a_p = alpha_prev.reshape(shape)
    x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    if clip_sample:
        x0 = jnp.clip(x0, -clip_sample_range, clip_sample_range)
    return jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps


def distill_eps_target(x_t: Array, x_two: Array, alpha_t: Array,
                       alpha_prev: Array) -> Array:
    """Solve for the one-step DDIM eps that maps x_t (at alpha_t) to the
    teacher's two-step result x_two (at alpha_prev). Linear inversion of
    `ddim_step` without clipping."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    a_t = alpha_t.reshape(shape)
    a_p = alpha_prev.reshape(shape)
    ratio = jnp.sqrt(a_p / a_t)
    denom = jnp.sqrt(1.0 - a_p) - ratio * jnp.sqrt(1.0 - a_t)
    return (x_two - ratio * x_t) / denom


def student_step_tables(schedule: DiffusionSchedule,
                        num_student_steps: int, substeps: int = 2):
    """Static per-student-step constant tables (numpy).

    One student step from t = ts[i] spans `substeps` teacher DDIM steps on
    the (num_student_steps * substeps)-step grid — substeps=2 is the
    paper's halving round; substeps=5 distills the 50-step teacher
    directly into a 10-step student. Requires the student step ratio to
    be divisible by `substeps` so the teacher grid subdivides the student
    grid exactly.

    Returns dict:
      t          (N,)    student timestep (model-eval time for the student)
      t_sub      (N, k)  teacher model-eval timesteps per sub-step,
                         clamped to 0 for the embedding (the result is
                         unaffected once the running alpha reaches 1)
      alpha_sub  (N, k+1) alpha_bar waypoints; [:, 0] is the student's
                         alpha_t, [:, k] the student's alpha_prev
                         (set_alpha_to_one at the final step)."""
    T = schedule.num_train_timesteps
    k = substeps
    r = T // num_student_steps
    if r % k:
        raise ValueError(
            f"student step ratio {T}/{num_student_steps}={r} must be "
            f"divisible by substeps={k} so the teacher grid subdivides "
            f"the student grid")
    acp = np.asarray(schedule.alphas_cumprod)
    ts = ddim_timesteps(T, num_student_steps)          # descending, ..0
    sub = ts[:, None] - (r // k) * np.arange(k + 1)[None, :]   # (N, k+1)

    def alpha(tau):
        return np.where(tau >= 0, acp[np.clip(tau, 0, None)], 1.0)

    return {
        "t": ts.astype(np.float32),
        "t_sub": np.maximum(sub[:, :k], 0).astype(np.float32),
        "alpha_sub": alpha(sub).astype(np.float32),
    }


def make_distill_train_step(refiner, cr_model, vae,
                            schedule: DiffusionSchedule,
                            num_student_steps: int,
                            substeps: int = 2,
                            clip_sample: bool = False,
                            clip_sample_range: float = 1.0,
                            stratified: bool = False,
                            scaling: float = SD_VAE_SCALING) -> Callable:
    """Distillation step for the full conditional refiner.

    step(state, teacher, frozen, batch, key) -> (state, metrics):
      state    — student TrainState (init params = copy of the teacher's).
      teacher  — frozen {"params", "batch_stats"} refiner variables.
      frozen   — {"cr": cr_params, "vae": vae_params} (same as stage 4).
      batch    — {"lr", "gt"} images in [0,1] NHWC.

    Per sample: pick a uniform student step i, forward-diffuse the GT
    latent to x_t at t = ts[i] (the paper trains on forward-diffused
    data, not on-policy rollouts), run the teacher `substeps` sub-steps
    along its finer grid, solve the eps target, and minimize the
    truncated-SNR-weighted x0-space MSE. Conditioning (CR face + CR
    latent) is shared by teacher and student, stop-gradient like
    `make_refiner_train_step` (`train_refiner.py:152-156`)."""
    tables = {k: jnp.asarray(v)
              for k, v in student_step_tables(
                  schedule, num_student_steps, substeps).items()}

    def teacher_eps(teacher, x, t, cr_face, cr_latent):
        return refiner.apply(
            {"params": teacher["params"],
             "batch_stats": teacher.get("batch_stats", {})},
            x, t, cr_face, cr_latent, train=False)

    def step(state: TrainState, teacher, frozen, batch, key):
        cr_params, vae_params = frozen["cr"], frozen["vae"]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lr_img, hf_img = batch["lr"], batch["gt"]
        b = hf_img.shape[0]

        def encode(img, k):
            x = jnp.clip(img, 0.0, 1.0) * 2.0 - 1.0
            return vae.apply({"params": vae_params}, x, key=k, sample=True,
                             method=vae.encode) * scaling

        hf_latent = jax.lax.stop_gradient(encode(hf_img, k1))
        cr_face = jax.lax.stop_gradient(
            cr_model.apply({"params": cr_params}, lr_img))
        cr_latent = jax.lax.stop_gradient(encode(cr_face, k2))

        if stratified:
            # every batch covers all student steps near-evenly (randomly
            # permuted so sample<->step pairing still varies): the
            # truncated-SNR objective concentrates ~2 orders of
            # magnitude of loss weight on the highest-noise step, and
            # uniform iid step draws give it a 1/N chance of appearing
            # in a small batch at all — the r5-measured divergence
            # (DISTILL_QUALITY_R5.json)
            base = jnp.arange(b) % num_student_steps
            i = jax.random.permutation(k3, base)
        else:
            i = jax.random.randint(k3, (b,), 0, num_student_steps)
        t = tables["t"][i]
        a_sub = tables["alpha_sub"][i]            # (B, k+1)
        t_sub = tables["t_sub"][i]                # (B, k)
        a_t, a_prev = a_sub[:, 0], a_sub[:, -1]

        noise = jax.random.normal(k4, hf_latent.shape, hf_latent.dtype)
        shape = (-1,) + (1,) * (hf_latent.ndim - 1)
        x_t = (jnp.sqrt(a_t).reshape(shape) * hf_latent
               + jnp.sqrt(1.0 - a_t).reshape(shape) * noise)

        # teacher: `substeps` DDIM sub-steps on its finer grid (frozen,
        # no grad; k is static so this unrolls into the one program)
        x = x_t
        for j in range(substeps):
            eps_t = teacher_eps(teacher, x, t_sub[:, j], cr_face, cr_latent)
            x = ddim_step(x, eps_t, a_sub[:, j], a_sub[:, j + 1],
                          clip_sample, clip_sample_range)
        eps_target = jax.lax.stop_gradient(
            distill_eps_target(x_t, x, a_t, a_prev))

        # truncated-SNR weight on the x0-space error (arXiv:2202.00512 §4)
        a_b = a_t.reshape(shape)
        w = jnp.maximum(a_b / (1.0 - a_b), 1.0)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            eps_s, mut = refiner.apply(
                variables, x_t, t, cr_face, cr_latent, train=True,
                mutable=["batch_stats"])
            x0_err = (jnp.sqrt(1.0 - a_b) / jnp.sqrt(a_b)
                      * (eps_s - eps_target))
            return jnp.mean(w * jnp.square(x0_err)), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_stats), {"loss": loss}

    return step


def make_tiny_dn_train_step(teacher_refiner, student_refiner,
                            cr_model, vae, schedule: DiffusionSchedule,
                            rollout_steps: int = 10,
                            fwd_weight: float = 0.5,
                            clip_sample: bool = False,
                            clip_sample_range: float = 1.0,
                            scaling: float = SD_VAE_SCALING) -> Callable:
    """Width distillation of the denoiser (beyond-reference fast scan).

    Unlike progressive distillation (`make_distill_train_step`, which
    keeps the architecture and shrinks the step count — measured
    marginal on this stack, DISTILL_QUALITY.json), this shrinks the
    NETWORK and keeps the stepping semantics: a narrower FacialRefiner
    student is trained to match the trained teacher's epsilon
    predictions pointwise, so it drops into every existing sampler
    (ddim/dpmpp, any step count, caching) unchanged. The reference has
    no such student — its denoiser always runs at full width
    (`models/denoiser.py`, `test_refiner.py:85-91`); this is a
    sanctioned approximation like `--tiny-ae`/`--tiny-cr`, with quality
    bounds measured by `scripts/tiny_dn_quality.py`.

    step(state, teacher, frozen, batch, key) -> (state, metrics):
      state    — student TrainState (random init; the student's IDC
                 SHOULD be seeded from the teacher's — same arch — see
                 `cli/train_tiny_dn.py`).
      teacher  — frozen {"params", "batch_stats"} full-width refiner.
      frozen   — {"cr": cr_params, "vae": vae_params} (stage-4 shape).
      batch    — {"lr", "gt"} images in [0,1] NHWC.

    Two supervision sources, both eps-space MSE against the teacher:
      on-policy (weight 1): roll the teacher `rollout_steps` DDIM steps
        from pure noise (exactly the serving trajectory,
        `diffusion/sampling.py:sample_ddim` semantics incl.
        set_alpha_to_one), collect every (x_t, t, eps_teacher) visited,
        and supervise the student at ALL of them in one folded
        (K*B)-batch eval — MXU-friendly and exactly the distribution
        inference visits. Measured-necessary precedent: the TAE lost
        >3 dB without on-policy latents (`make_tae_train_step`
        docstring).
      forward-diffused (weight `fwd_weight`): uniform t on forward-
        diffused GT latents — dense t coverage off the K-step grid, so
        the student stays calibrated for OTHER step counts and the
        dpmpp solver's midpoints.
    """
    acp = np.asarray(schedule.alphas_cumprod)
    acp_table = jnp.asarray(acp, jnp.float32)
    T = schedule.num_train_timesteps
    ts = ddim_timesteps(T, rollout_steps)                  # descending
    prev = ts - T // rollout_steps
    tab = {
        "t": jnp.asarray(ts, jnp.float32),
        "alpha_t": jnp.asarray(acp[ts], jnp.float32),
        "alpha_prev": jnp.asarray(
            np.where(prev >= 0, acp[np.clip(prev, 0, None)], 1.0),
            jnp.float32),
    }

    def eps_of(refiner, variables, x, t, cr_face, cr_latent):
        return refiner.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            x, t, cr_face, cr_latent, train=False)

    def step(state: TrainState, teacher, frozen, batch, key):
        cr_params, vae_params = frozen["cr"], frozen["vae"]
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        lr_img, hf_img = batch["lr"], batch["gt"]
        b = hf_img.shape[0]

        def encode(img, k):
            x = jnp.clip(img, 0.0, 1.0) * 2.0 - 1.0
            return vae.apply({"params": vae_params}, x, key=k, sample=True,
                             method=vae.encode) * scaling

        hf_latent = jax.lax.stop_gradient(encode(hf_img, k1))
        cr_face = jax.lax.stop_gradient(
            cr_model.apply({"params": cr_params}, lr_img))
        cr_latent = jax.lax.stop_gradient(encode(cr_face, k2))
        shape = (-1,) + (1,) * (hf_latent.ndim - 1)

        # ---- on-policy: teacher DDIM rollout, collect every waypoint ----
        x_T = jax.random.normal(k3, hf_latent.shape, hf_latent.dtype)

        def rollout(x, c):
            t_b = jnp.full((b,), c["t"], hf_latent.dtype)
            eps = eps_of(teacher_refiner, teacher, x, t_b,
                         cr_face, cr_latent)
            x_prev = ddim_step(x, eps, jnp.full((b,), c["alpha_t"]),
                               jnp.full((b,), c["alpha_prev"]),
                               clip_sample, clip_sample_range)
            return x_prev, {"x": x, "eps": eps}

        _, way = jax.lax.scan(rollout, x_T, tab)
        way = jax.lax.stop_gradient(way)
        K = rollout_steps
        xs = way["x"].reshape((K * b,) + hf_latent.shape[1:])
        eps_onpolicy = way["eps"].reshape(xs.shape)
        t_onpolicy = jnp.repeat(tab["t"], b)

        # ---- forward-diffused: dense-t teacher matching ------------------
        t_fwd = jax.random.randint(k4, (b,), 0, T).astype(hf_latent.dtype)
        a_fwd = acp_table[t_fwd.astype(jnp.int32)].reshape(shape)
        noise = jax.random.normal(k5, hf_latent.shape, hf_latent.dtype)
        x_fwd = jnp.sqrt(a_fwd) * hf_latent + jnp.sqrt(1.0 - a_fwd) * noise
        eps_fwd = jax.lax.stop_gradient(
            eps_of(teacher_refiner, teacher, x_fwd, t_fwd,
                   cr_face, cr_latent))

        tile = lambda a: jnp.concatenate([a] * K)  # noqa: E731

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            eps_s, mut = student_refiner.apply(
                variables, xs, t_onpolicy, tile(cr_face), tile(cr_latent),
                train=True, mutable=["batch_stats"])
            on_loss = mse_loss(eps_s, eps_onpolicy)
            eps_sf, mut = student_refiner.apply(
                {"params": params, "batch_stats": mut["batch_stats"]},
                x_fwd, t_fwd, cr_face, cr_latent,
                train=True, mutable=["batch_stats"])
            fwd_loss = mse_loss(eps_sf, eps_fwd)
            return (on_loss + fwd_weight * fwd_loss,
                    (on_loss, fwd_loss, mut["batch_stats"]))

        (loss, (on_loss, fwd_loss, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_stats), {
            "loss": loss, "onpolicy_loss": on_loss, "fwd_loss": fwd_loss}

    return step


def make_tiny_cr_train_step(cr_model, tiny_cr,
                            gt_weight: float = 0.3) -> Callable:
    """Distillation step for the tiny Coarse Restoration net
    (`models/tiny_cr.py`), mirroring `make_tae_train_step`.

    step(state, cr_params, batch) -> (state, metrics). state.params =
    TinyCR params; the trained exact CR (`models/cr.py`, reference
    `models/cr/model.py:33-88`) is the frozen teacher. Deterministic —
    no PRNG key (neither net is stochastic).

    Losses, in the CR seam's conventions ([0,1]-ish UNCLIPPED images —
    the pipeline clips before the VAE encode but feeds the raw output
    to IDC, so the student matches the teacher's raw output):
      teacher: MSE(tiny(lr), cr(lr))
      gt (when batch carries "gt"): gt_weight * MSE(tiny(lr), gt) —
        the same direct-supervision mix as the tiny autoencoder; keeps
        the student from inheriting teacher artifacts it could fix
        for free.
    """

    def step(state: TrainState, cr_params, batch):
        lr_img = batch["lr"]
        teacher = jax.lax.stop_gradient(
            cr_model.apply({"params": cr_params}, lr_img))
        gt = batch.get("gt")

        def loss_fn(params):
            out = tiny_cr.apply({"params": params}, lr_img)
            t_loss = mse_loss(out, teacher)
            g_loss = (mse_loss(out, gt) if gt is not None
                      else jnp.zeros((), out.dtype))
            return t_loss + gt_weight * g_loss, (t_loss, g_loss)

        (loss, (t_loss, g_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {
            "loss": loss, "teacher_loss": t_loss, "gt_loss": g_loss}

    return step


def make_tae_train_step(vae, tiny_enc, tiny_dec,
                        gt_weight: float = 0.3) -> Callable:
    """Distillation step for the tiny autoencoder (`vae/tiny.py`).

    step(state, vae_params, batch, key) -> (state, metrics). state.params
    = {"enc": tiny_enc params, "dec": tiny_dec params}; the SD VAE is the
    frozen teacher (the reference's only autoencoder,
    `pretrain_denoiser.py:256-259` — it has no tiny/fast variant).

    Losses, all in the teacher's conventions ([-1,1] images, UNSCALED
    latents):
      dec:  MSE(tiny_dec(z), vae_dec(z)) + gt_weight * MSE(tiny_dec(z), x)
            with z the teacher's SAMPLED posterior (the stochastic z
            teaches the decoder the latent neighborhoods the sampler
            actually visits);
      enc:  MSE(tiny_enc(x), posterior mean);
      on-policy dec (when batch carries "extra_z", UNSCALED latents
            harvested from the actual diffusion sampler —
            `train_tae --extra-latents`): MSE(tiny_dec(z'), vae_dec(z')).
            Measured necessity (TAE_QUALITY r3 diagnosis): on the trained
            demo stack the sampler's final latents sit far outside the GT
            posterior (std 5.4 vs 0.4 in diffusion space); the
            GroupNorm-heavy SD decoder saturates gracefully there while a
            posterior-only tiny decoder extrapolates to +/-47 and loses
            >3 dB end-to-end after min-max normalization.
    """

    def step(state: TrainState, vae_params, batch, key):
        x = jnp.clip(batch["image"], 0.0, 1.0) * 2.0 - 1.0
        mean, logvar = vae.apply({"params": vae_params}, x,
                                 method=vae.moments)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            key, mean.shape, mean.dtype)
        teacher_img = vae.apply({"params": vae_params}, z,
                                method=vae.decode)
        mean, z, teacher_img = jax.lax.stop_gradient((mean, z, teacher_img))
        extra_z = batch.get("extra_z")
        if extra_z is not None:
            extra_img = jax.lax.stop_gradient(vae.apply(
                {"params": vae_params}, extra_z, method=vae.decode))

        def loss_fn(params):
            rec = tiny_dec.apply({"params": params["dec"]}, z)
            dec_loss = (mse_loss(rec, teacher_img)
                        + gt_weight * mse_loss(rec, x))
            if extra_z is not None:
                dec_loss = dec_loss + mse_loss(
                    tiny_dec.apply({"params": params["dec"]}, extra_z),
                    extra_img)
            enc_loss = mse_loss(
                tiny_enc.apply({"params": params["enc"]}, x), mean)
            return dec_loss + enc_loss, (dec_loss, enc_loss)

        (loss, (dec_loss, enc_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {
            "loss": loss, "dec_loss": dec_loss, "enc_loss": enc_loss}

    return step
