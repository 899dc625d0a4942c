"""Procedural learnable-face dataset + stage-0 VAE step + native orbax
checkpoint hand-off (the machinery behind the end-to-end convergence demo,
`cli/convergence_demo.py`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifidiff_tpu.data.procedural import (
    ProceduralFaceDataset,
    component_boxes,
    render_face,
    _identity_params,
)


class TestProceduralData:
    @pytest.mark.smoke
    def test_keys_shapes_determinism(self):
        ds = ProceduralFaceDataset(
            8, 32, keys=("lr", "gt", "patches", "other", "image"))
        s, s2 = ds[3], ds[3]
        assert s["lr"].shape == (32, 32, 3)
        assert s["patches"].shape == (4, 32, 32, 3)
        for k in s:
            assert s[k].dtype == np.float32
            np.testing.assert_array_equal(s[k], s2[k])
            assert 0.0 <= s[k].min() and s[k].max() <= 1.0

    def test_hard_family_defaults_bit_stable(self):
        """id_spread=1.0 / light_jitter=0.0 must reproduce the legacy
        family bit-exactly (committed r2/r3 artifacts depend on it): the
        raw rng stream is consumed in the same order and returned
        untouched, and the jitter draw only happens when enabled."""
        legacy = ProceduralFaceDataset(8, 32, keys=("lr", "gt", "other"))
        explicit = ProceduralFaceDataset(8, 32, keys=("lr", "gt", "other"),
                                         id_spread=1.0, light_jitter=0.0)
        for i in (0, 3, 7):
            for k in ("lr", "gt", "other"):
                np.testing.assert_array_equal(legacy[i][k], explicit[i][k])

    def test_id_spread_packs_identities(self):
        """spread < 1 moves every identity parameter toward the family
        mean: pairwise identity-parameter distances shrink by exactly
        the spread factor, and distinct identities stay distinct."""
        wide = [_identity_params(0, i) for i in range(6)]
        tight = [_identity_params(0, i, spread=0.5) for i in range(6)]

        def dist(a, b):
            return sum(float(np.sum(np.abs(np.asarray(a[k])
                                           - np.asarray(b[k]))))
                       for k in a)

        for i in range(5):
            dw, dt = dist(wide[i], wide[i + 1]), dist(tight[i], tight[i + 1])
            assert dt == pytest.approx(0.5 * dw, rel=1e-6)
            assert dt > 0.0

    def test_light_jitter_photo_semantics(self):
        """light_jitter gives each PHOTO its own illumination: the
        degraded input, the different-photo positive ("pos") and the
        negative ("other") each draw a gain from an independent rng
        stream (ADVICE r4: enabling the knob must not shift the legacy
        pose/negative-identity draws), while gt — the same-scene
        restoration target — stays canonical."""
        plain = ProceduralFaceDataset(16, 32,
                                      keys=("lr", "gt", "pos", "other"))
        lit = ProceduralFaceDataset(16, 32,
                                    keys=("lr", "gt", "pos", "other"),
                                    light_jitter=0.3)
        changed = 0
        for i in range(16):
            a, b = plain[i], lit[i]
            np.testing.assert_array_equal(a["gt"], b["gt"])
            # the negative IDENTITY is invariant to the knob: the lit
            # negative is exactly the plain one under its photo gain
            nrng = np.random.default_rng((0, 104734, i))
            gain = 1.0 + nrng.uniform(-0.3, 0.3, 3)
            np.testing.assert_allclose(
                b["other"], np.clip(a["other"] * gain, 0.0, 1.0),
                atol=1e-6)
            if not np.array_equal(a["lr"], b["lr"]):
                changed += 1
        assert changed >= 14  # jitter is per-sample and rarely a no-op
        # deterministic in index: same sample twice is identical
        np.testing.assert_array_equal(lit[5]["lr"], lit[5]["lr"])

    def test_pos_is_same_identity_different_photo(self):
        """"pos" = the identity's frontal as a DIFFERENT photograph:
        bit-identical to gt on the legacy family (clutter=0, jitter=0),
        its own background scene when clutter > 0."""
        legacy = ProceduralFaceDataset(8, 32, keys=("gt", "pos"))
        for i in (0, 3, 7):
            s = legacy[i]
            np.testing.assert_array_equal(s["gt"], s["pos"])
        ds = ProceduralFaceDataset(8, 64, keys=("gt", "pos"), clutter=6)
        s = ds[0]
        assert np.abs(s["gt"] - s["pos"]).max() > 1e-3  # own background
        # face region identical: the center crop (face) matches closely
        c = slice(24, 40)
        assert np.abs(s["gt"][c, c] - s["pos"][c, c]).mean() < 0.02

    def test_id_spread_validated(self):
        with pytest.raises(ValueError):
            ProceduralFaceDataset(4, 32, id_spread=0.0)
        with pytest.raises(ValueError):
            ProceduralFaceDataset(4, 32, id_spread=1.5)

    def test_detail_family_defaults_bit_stable(self):
        """detail=0 / clutter=0 must reproduce the legacy family
        bit-exactly (the new knobs draw from independent rng streams)."""
        legacy = ProceduralFaceDataset(8, 32, keys=("lr", "gt", "other"))
        explicit = ProceduralFaceDataset(8, 32, keys=("lr", "gt", "other"),
                                         detail=0.0, clutter=0)
        for i in (0, 3, 7):
            for k in ("lr", "gt", "other"):
                np.testing.assert_array_equal(legacy[i][k], explicit[i][k])

    def test_detail_identity_deterministic_and_fine(self):
        """The facial-mark pattern is deterministic per identity (same
        frontal gt for every sample of an identity) and FINE: at 128 px
        the x4 degradation destroys most of its high-frequency structure
        (an aliased low-res trace survives — position information — but
        the sharp 128px rendering must be re-synthesized from the
        identity, VERDICT r4 #1/#2)."""
        from hifidiff_tpu.data.procedural import degrade_lr

        plain = ProceduralFaceDataset(16, 128, keys=("lr", "gt"),
                                      num_ids=8)
        fine = ProceduralFaceDataset(16, 128, keys=("lr", "gt"),
                                     num_ids=8, detail=1.0)
        # identity-deterministic: same identity -> identical marked gt
        np.testing.assert_array_equal(fine[0]["gt"], fine[8]["gt"])
        # distinct identities get distinct patterns
        assert np.abs(fine[0]["gt"] - fine[1]["gt"]).max() > 1e-3

        def hf_energy(delta):
            # residual above a x4 bicubic down/up blur of the delta
            blur = degrade_lr(np.clip(delta * 0.5 + 0.5, 0, 1), 128, 4) \
                * 2.0 - 1.0
            return np.abs(delta - blur).mean()

        gt_hf = hf_energy(fine[0]["gt"] - plain[0]["gt"])
        lr_hf = hf_energy(fine[0]["lr"] - plain[0]["lr"])
        assert gt_hf > 0.0
        assert lr_hf < 0.7 * gt_hf, (
            f"degradation must destroy most of the marks' high-frequency "
            f"structure: lr hf {lr_hf:.5f} vs gt hf {gt_hf:.5f}")

    def test_clutter_per_sample_scene(self):
        """Background clutter varies per SAMPLE (not per identity), is
        shared between the posed input and the frontal gt of one sample,
        and the triplet negative gets its own background."""
        ds = ProceduralFaceDataset(16, 64, keys=("lr", "gt", "other"),
                                   num_ids=8, clutter=6)
        # same identity, different samples -> different backgrounds
        assert np.abs(ds[0]["gt"] - ds[8]["gt"]).max() > 1e-3
        # deterministic in index
        np.testing.assert_array_equal(ds[3]["gt"], ds[3]["gt"])
        # scene is shared lr<->gt: the lr (degraded posed render) must be
        # closer to its own gt than to another sample's gt of the SAME
        # identity (backgrounds differ)
        own = np.abs(ds[0]["lr"] - ds[0]["gt"]).mean()
        cross = np.abs(ds[0]["lr"] - ds[8]["gt"]).mean()
        assert own < cross
        # negative has its own background: other != any same-index gt
        assert np.abs(ds[0]["other"] - ds[0]["gt"]).max() > 1e-3

    def test_identity_signal(self):
        # lr must be closer to its own gt than to another identity's gt —
        # otherwise CR/IDC training has nothing to learn
        ds = ProceduralFaceDataset(16, 32, keys=("lr", "gt", "other"))
        for i in range(8):
            s = ds[i]
            own = np.abs(s["lr"] - s["gt"]).mean()
            other = np.abs(s["lr"] - s["other"]).mean()
            assert own < other

    def test_pose_varies_but_identity_fixed(self):
        idp = _identity_params(0, 2)
        frontal = render_face(idp, 0.0, 32)
        posed = render_face(idp, 0.7, 32)
        assert np.abs(frontal - posed).mean() > 1e-3
        # frontal render is pose-deterministic
        np.testing.assert_array_equal(frontal, render_face(idp, 0.0, 32))

    def test_val_split_disjoint_poses_same_identities(self):
        train = ProceduralFaceDataset(8, 32, keys=("lr", "gt"))
        val = ProceduralFaceDataset(8, 32, keys=("lr", "gt"), start=10_000)
        # same identity cycle -> identical frontal gt
        np.testing.assert_array_equal(train[0]["gt"], val[0]["gt"])
        # different pose draw -> different lr
        assert np.abs(train[0]["lr"] - val[0]["lr"]).max() > 1e-4

    def test_smoke_datasets_val_semantics(self):
        """cli/common.smoke_datasets: pose-dependent (lr) stages validate
        on SAME identities / unseen poses; image-only stages (VAE) on
        UNSEEN identities — a start offset alone would reproduce the
        train frontals bit-exactly (pose-independent renders)."""
        import types

        from hifidiff_tpu.cli.common import smoke_datasets

        cfg = types.SimpleNamespace(procedural=16, synthetic=0, size=32,
                                    seed=0)
        tr, va = smoke_datasets(cfg, ("lr", "gt"))
        np.testing.assert_array_equal(tr[0]["gt"], va[0]["gt"])  # same ids
        assert np.abs(tr[0]["lr"] - va[0]["lr"]).max() > 1e-4   # new poses

        tr, va = smoke_datasets(cfg, ("image",))
        # unseen identities: no val image may equal any train image
        train_imgs = [tr[i]["image"] for i in range(len(tr))]
        for j in range(len(va)):
            assert all(np.abs(va[j]["image"] - t).max() > 1e-3
                       for t in train_imgs)

    def test_component_boxes_cover_features(self):
        idp = _identity_params(0, 0)
        boxes = component_boxes(idp, 32)
        assert len(boxes) == 4
        for t, le, b, r in boxes:
            assert 0 <= t < b <= 32 and 0 <= le < r <= 32


class TestVAETrainStep:
    def test_loss_decreases(self):
        from hifidiff_tpu.train.steps import TrainState, make_vae_train_step
        from hifidiff_tpu.vae import AutoencoderKL
        import optax

        ds = ProceduralFaceDataset(4, 32, keys=("image",))
        batch = {"image": jnp.asarray(
            np.stack([ds[i]["image"] for i in range(4)]))}
        vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)
        key = jax.random.PRNGKey(0)
        params = vae.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
        state = TrainState.create(params, optax.adam(1e-3))
        step = jax.jit(make_vae_train_step(vae))
        first = None
        for i in range(15):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first
        assert np.isfinite(float(m["kl"]))


class TestOrbaxHandoff:
    def test_compose_from_orbax_dirs(self, tmp_path):
        """Native stage-2/3 -> stage-4 hand-off: orbax dirs written the way
        the CLIs write them feed `compose_refiner_params` directly."""
        import optax

        from hifidiff_tpu.models import Denoiser, FacialRefiner, IDCEncoder
        from hifidiff_tpu.train.checkpoint import (
            CheckpointManager,
            compose_refiner_params,
        )
        from hifidiff_tpu.train.steps import TrainState

        key = jax.random.PRNGKey(0)
        dn = Denoiser(width=16, enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1))
        dn_params = dn.init(key, jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,)))["params"]
        dn_state = TrainState.create(dn_params, optax.adam(1e-3))
        dn_dir = str(tmp_path / "dn")
        m = CheckpointManager(dn_dir)
        m.save(1, jax.device_get(dn_state), wait=True)
        m.close()

        idc = IDCEncoder(stage_sizes=(1, 1, 1, 1))
        idc_vars = idc.init(key, jnp.zeros((1, 64, 64, 3)), train=True)
        idc_state = TrainState.create(idc_vars["params"], optax.adam(1e-3),
                                      batch_stats=idc_vars["batch_stats"])
        idc_dir = str(tmp_path / "idc")
        m = CheckpointManager(idc_dir)
        m.save(1, jax.device_get(idc_state), wait=True)
        m.close()

        refiner = FacialRefiner(latent_size=8, width=16, enc_nums=(1, 1),
                                mid_num=1, dec_nums=(1, 1),
                                idc_stage_sizes=(1, 1, 1, 1))
        init_vars = refiner.init(
            key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 8, 8, 4)), train=False)
        variables = compose_refiner_params(
            jax.device_get(init_vars), idc_ckpt=idc_dir,
            denoiser_ckpt=dn_dir)

        # denoiser backbone weights must be overlaid wherever names/shapes
        # match the pretrained Denoiser (shared module names)
        flat_ref = jax.tree_util.tree_flatten_with_path(
            variables["params"]["denoiser"])[0]
        flat_dn = dict(jax.tree_util.tree_flatten_with_path(
            jax.device_get(dn_params))[0])
        hits = 0
        for path, leaf in flat_ref:
            src = flat_dn.get(path)
            if src is not None and src.shape == leaf.shape:
                np.testing.assert_array_equal(np.asarray(leaf),
                                              np.asarray(src))
                hits += 1
        assert hits > 0, "no denoiser weights were overlaid"

        # IDC overlay: params + batch stats
        flat_idc_ref = dict(jax.tree_util.tree_flatten_with_path(
            variables["params"]["idc"])[0])
        flat_idc_src = dict(jax.tree_util.tree_flatten_with_path(
            jax.device_get(idc_vars["params"]))[0])
        shared = [p for p in flat_idc_ref
                  if p in flat_idc_src
                  and flat_idc_src[p].shape == flat_idc_ref[p].shape]
        assert shared, "no idc weights were overlaid"
        for p in shared:
            np.testing.assert_array_equal(np.asarray(flat_idc_ref[p]),
                                          np.asarray(flat_idc_src[p]))

    def test_load_vae_params_orbax(self, tmp_path):
        import optax

        from hifidiff_tpu.cli.common import load_vae_params
        from hifidiff_tpu.train.checkpoint import CheckpointManager
        from hifidiff_tpu.train.steps import TrainState
        from hifidiff_tpu.vae import AutoencoderKL

        vae = AutoencoderKL(block_out=(32, 32), layers_per_block=1)
        key = jax.random.PRNGKey(1)
        params = vae.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
        state = TrainState.create(params, optax.adam(1e-3))
        d = str(tmp_path / "vae")
        m = CheckpointManager(d)
        m.save(3, jax.device_get(state), wait=True)
        m.close()
        loaded = load_vae_params(vae, d, key, 32)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            jax.device_get(params), loaded)
