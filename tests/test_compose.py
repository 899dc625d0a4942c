"""Checkpoint-composition test: stage-3/stage-2 torch checkpoints ->
FacialRefiner variables through `compose_refiner_params`, verified against
the torch oracles (mini reference wiring from test_models)."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.test_models import (
    MiniTorchFPG,
    MiniTorchFusedDenoiser,
    TorchResNet50,
    nchw,
    sd_numpy,
)

from hifidiff_tpu.models import FacialRefiner
from hifidiff_tpu.train.checkpoint import compose_refiner_params

RNG = np.random.default_rng(17)


class TestComposeRefiner:
    @pytest.mark.smoke
    def test_compose_from_torch_state_dicts(self, tmp_path):
        torch.manual_seed(3)
        fused = MiniTorchFusedDenoiser(latent=8).eval()
        fpg = MiniTorchFPG().eval()
        idc = TorchResNet50().eval()

        # a saved FacialRefiner: prefix-namespaced composite state dict
        # (what `test_refiner.py:162-164` consumes)
        merged = {}
        merged.update({f"denoiser.{k}": v for k, v in sd_numpy(fused).items()})
        merged.update({f"fpg.{k}": v for k, v in sd_numpy(fpg).items()})
        merged.update({f"idc.{k}": v for k, v in sd_numpy(idc).items()})
        dn_path = str(tmp_path / "refiner.pt")
        torch.save({k: torch.tensor(v) for k, v in merged.items()}, dn_path)

        refiner = FacialRefiner(latent_size=8, width=16, enc_nums=(1, 1),
                                mid_num=1, dec_nums=(1, 1))
        key = jax.random.PRNGKey(0)
        init_vars = refiner.init(
            key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 8, 8, 4)),
            train=False)
        variables = compose_refiner_params(
            jax.device_get(init_vars),
            denoiser_ckpt=dn_path, enc_nums=(1, 1), mid_num=1,
            dec_nums=(1, 1))

        # full refiner forward must match torch composition
        lat = RNG.standard_normal((2, 8, 8, 4), dtype=np.float32)
        face = RNG.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
        cr_lat = RNG.standard_normal((2, 8, 8, 4), dtype=np.float32)
        t = np.array([7.0, 301.0], dtype=np.float32)

        with torch.no_grad():
            priors_t = fpg(torch.tensor(nchw(cr_lat)))
            emb_t = idc(torch.tensor(nchw(face)))
            ref = fused(torch.tensor(nchw(lat)), torch.tensor(t), priors_t,
                        emb_t)

        out = refiner.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            jnp.asarray(lat), jnp.asarray(t), jnp.asarray(face),
            jnp.asarray(cr_lat), train=False)
        np.testing.assert_allclose(
            np.asarray(out),
            np.transpose(ref.detach().numpy(), (0, 2, 3, 1)),
            atol=2e-3, rtol=1e-3)

    def test_partial_checkpoint_keeps_init(self, tmp_path):
        """Stage-3 unconditional checkpoint (no hcas/idc_conv): those params
        must keep their fresh init — torch strict=False semantics."""
        from tests.test_models import MiniTorchUncondDenoiser

        torch.manual_seed(4)
        dn = MiniTorchUncondDenoiser()
        dn_path = str(tmp_path / "dn.pt")
        torch.save(dn.state_dict(), dn_path)

        refiner = FacialRefiner(latent_size=8, width=16, enc_nums=(1, 1),
                                mid_num=1, dec_nums=(1, 1),
                                idc_stage_sizes=(1, 1, 1, 1))
        key = jax.random.PRNGKey(1)
        init_vars = jax.device_get(refiner.init(
            key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8, 8, 4)),
            train=False))
        variables = compose_refiner_params(
            init_vars, denoiser_ckpt=dn_path, enc_nums=(1, 1), mid_num=1,
            dec_nums=(1, 1))
        # loaded: denoiser intro matches torch; kept: hca params == init
        intro_t = np.transpose(dn.intro.weight.detach().numpy(),
                               (2, 3, 1, 0))
        np.testing.assert_allclose(
            variables["params"]["denoiser"]["intro"]["conv"]["kernel"],
            intro_t)
        a = variables["params"]["denoiser"]["hca0"]["ch_fc1"]["dense"]["kernel"]
        b = init_vars["params"]["denoiser"]["hca0"]["ch_fc1"]["dense"]["kernel"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # reference quirk: the FPG picks up the DENOISER's same-named
        # weights (intro/encoder convs/downs), prior convs stay init
        np.testing.assert_allclose(
            variables["params"]["fpg"]["intro"]["conv"]["kernel"], intro_t)
        pc = variables["params"]["fpg"]["prior_conv0"]["conv"]["kernel"]
        pc0 = init_vars["params"]["fpg"]["prior_conv0"]["conv"]["kernel"]
        np.testing.assert_allclose(np.asarray(pc), np.asarray(pc0))


class TestRestoreState:
    def test_clear_errors_and_no_mkdir_side_effect(self, tmp_path):
        """restore_state must fail loudly on a mistyped path (the old
        CheckpointManager(...).restore() returned None -> opaque
        None["state"] TypeError) and must NOT mkdir the bogus path."""
        from hifidiff_tpu.train.checkpoint import restore_state

        missing = tmp_path / "nope"
        with pytest.raises(FileNotFoundError):
            restore_state(str(missing))
        assert not missing.exists()   # read-only: no directory created

        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(FileNotFoundError, match="no orbax checkpoint"):
            restore_state(str(empty))

    def test_round_trip(self, tmp_path):
        from hifidiff_tpu.train.checkpoint import (
            CheckpointManager,
            restore_state,
        )

        state = {"params": {"w": np.arange(4.0, dtype=np.float32)}}
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(3, state, wait=True)
        out = restore_state(str(tmp_path / "ck"))
        np.testing.assert_array_equal(out["state"]["params"]["w"],
                                      state["params"]["w"])

    def test_save_at_existing_step_warns(self, tmp_path):
        """Orbax keeps the existing step dir and silently skips a save at
        a step <= latest; the manager must warn loudly (a fresh rerun into
        an old ckpt dir otherwise evaluates stale weights)."""
        from hifidiff_tpu.train.checkpoint import (
            CheckpointManager,
            restore_state,
        )

        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(5, {"params": {"w": np.zeros(2, np.float32)}}, wait=True)
        with pytest.warns(UserWarning, match="existing latest step"):
            mgr.save(5, {"params": {"w": np.ones(2, np.float32)}},
                     wait=True)
        out = restore_state(str(tmp_path / "ck"))
        # documents the orbax behavior the warning is about
        np.testing.assert_array_equal(out["state"]["params"]["w"],
                                      np.zeros(2, np.float32))
