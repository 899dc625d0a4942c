"""CLI smoke tests on synthetic data with tiny model configs (the reference
ships no runnable tests at all — SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest

from hifidiff_tpu.cli.common import (
    SyntheticFaceDataset,
    parse_config,
    parse_ints,
)
from hifidiff_tpu.data import ConcatDataset, Loader


class TestCommon:
    def test_parse_ints(self):
        assert parse_ints("2,2,4,8") == (2, 2, 4, 8)
        assert parse_ints("1") == (1,)

    def test_synthetic_dataset_keys(self):
        ds = SyntheticFaceDataset(4, 32, keys=("lr", "gt", "patches"))
        s = ds[0]
        assert s["lr"].shape == (32, 32, 3)
        assert s["patches"].shape == (4, 32, 32, 3)
        # deterministic per index
        np.testing.assert_allclose(ds[1]["lr"], ds[1]["lr"])

    @pytest.mark.smoke
    def test_loader_batching_and_order(self):
        ds = SyntheticFaceDataset(10, 8, keys=("lr",))
        loader = Loader(ds, 4, shuffle=False)
        batches = list(loader)
        assert [b["lr"].shape[0] for b in batches] == [4, 4, 2]
        loader2 = Loader(ds, 4, shuffle=False, drop_last=True)
        assert [b["lr"].shape[0] for b in loader2] == [4, 4]

    def test_loader_shuffle_seeded(self):
        ds = SyntheticFaceDataset(16, 4, keys=("lr",))
        l1 = list(Loader(ds, 16, shuffle=True, seed=5))[0]["lr"]
        l2 = list(Loader(ds, 16, shuffle=True, seed=5))[0]["lr"]
        np.testing.assert_allclose(l1, l2)

    def test_concat_dataset(self):
        a = SyntheticFaceDataset(3, 4, keys=("image",), seed=1)
        b = SyntheticFaceDataset(5, 4, keys=("image",), seed=2)
        c = ConcatDataset([a, b])
        assert len(c) == 8
        np.testing.assert_allclose(c[3]["image"], b[0]["image"])


@pytest.mark.slow
class TestTrainCRSmoke:
    def test_one_epoch_synthetic(self, tmp_path):
        from hifidiff_tpu.cli import train_cr

        train_cr.main([
            "--synthetic", "8", "--batch-size", "8", "--num-epochs", "1",
            "--size", "32", "--width", "8", "--enc-depths", "1,1",
            "--mid-depth", "1", "--dump-every", "0",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
        ])
        # a checkpoint must exist
        assert os.path.isdir(tmp_path / "ckpt" / "temp")


@pytest.mark.slow
class TestTrainVAESmoke:
    def test_one_epoch_procedural(self, tmp_path):
        from hifidiff_tpu.cli import train_vae

        train_vae.main([
            "--procedural", "8", "--batch-size", "8", "--num-epochs", "1",
            "--size", "32", "--vae-blocks", "32,32", "--vae-layers", "1",
            "--warmup-steps", "1",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
        ])
        assert os.path.isdir(tmp_path / "ckpt" / "temp")
        assert os.path.exists(tmp_path / "out" / "temp" / "val_e0.png")


@pytest.mark.slow
class TestPretrainDenoiserSmoke:
    def test_one_epoch_synthetic(self, tmp_path):
        from hifidiff_tpu.cli import pretrain_denoiser

        pretrain_denoiser.main([
            "--synthetic", "8", "--batch-size", "8", "--num-epochs", "1",
            "--size", "32", "--width", "16", "--enc-depths", "1,1",
            "--mid-depth", "1", "--dec-depths", "1,1",
            "--vae-blocks", "32,32,32", "--vae-layers", "1",
            "--sample-size", "4", "--save-image-epoch", "1",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
        ])
        assert os.path.exists(tmp_path / "out" / "temp" / "0.png")


@pytest.mark.slow
class TestPretrainIDCSmoke:
    def test_one_epoch_synthetic(self, tmp_path):
        from hifidiff_tpu.cli import pretrain_idc

        pretrain_idc.main([
            "--synthetic", "8", "--batch-size", "8", "--num-epochs", "1",
            "--size", "32", "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--idc-stages", "1,1,1,1",
            "--ckpt-dir", str(tmp_path / "ckpt"),
        ])
        assert os.path.isdir(tmp_path / "ckpt" / "temp")


@pytest.mark.slow
class TestTestIDCSmoke:
    def test_synthetic_eval(self, capsys):
        from hifidiff_tpu.cli import test_idc

        test_idc.main([
            "--synthetic", "8", "--batch-size", "4", "--size", "32",
            "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--idc-stages", "1,1,1,1",
        ])
        out = capsys.readouterr().out
        assert "test accuracy (batch-mean" in out
        assert "test accuracy (per-sample)" in out


@pytest.mark.slow
class TestTestRefinerSmoke:
    def test_synthetic_eval(self, tmp_path, capsys):
        from hifidiff_tpu.cli import test_refiner

        test_refiner.main([
            "--synthetic", "4", "--batch-size", "4", "--size", "32",
            "--width", "16", "--enc-depths", "1,1", "--mid-depth", "1",
            "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
            "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--vae-blocks", "32,32,32", "--vae-layers", "1",
            "--num-inference-steps", "2",
            "--out-dir", str(tmp_path / "out"),
        ])
        out = capsys.readouterr().out
        assert "PSNR:" in out and "SSIM:" in out


@pytest.mark.slow
class TestTrainRefinerSmoke:
    def test_one_epoch_synthetic(self, tmp_path):
        import os

        from hifidiff_tpu.cli import train_refiner

        train_refiner.main([
            "--synthetic", "8", "--batch-size", "8", "--num-epochs", "1",
            "--size", "32", "--width", "16", "--enc-depths", "1,1",
            "--mid-depth", "1", "--dec-depths", "1,1",
            "--idc-stages", "1,1,1,1", "--cr-width", "8",
            "--cr-enc-depths", "1,1", "--vae-blocks", "32,32,32",
            "--vae-layers", "1", "--num-inference-steps", "2",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
        ])
        assert os.path.isdir(tmp_path / "ckpt" / "temp")


@pytest.mark.slow
class TestDistillSmoke:
    def test_one_round_procedural(self, tmp_path):
        from hifidiff_tpu.cli import distill

        res = distill.main([
            "--teacher-steps", "10", "--student-steps", "5",
            "--steps-per-round", "3", "--batch-size", "2",
            "--eval-batch", "2", "--procedural", "8", "--size", "32",
            "--width", "16", "--enc-depths", "1,1", "--mid-depth", "1",
            "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
            "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--cr-mid-depth", "1", "--vae-blocks", "32,32",
            "--vae-layers", "1", "--ckpt-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
        ])
        row = res["rounds"][0]
        assert row["substeps"] == 2
        assert np.isfinite(row["final_loss"])
        assert np.isfinite(row["distilled_vs_exact_psnr"])
        # student checkpoint restorable through the standard loader
        from hifidiff_tpu.train.checkpoint import restore_state

        st = restore_state(str(tmp_path / "ckpt" / "temp" / "round0_s5"))
        assert "params" in st["state"]


@pytest.mark.slow
class TestTrainTAESmoke:
    def test_one_epoch_procedural(self, tmp_path):
        from hifidiff_tpu.cli import test_refiner, train_tae

        train_tae.main([
            "--procedural", "8", "--batch-size", "4", "--num-epochs", "1",
            "--size", "32", "--vae-blocks", "32,32", "--vae-layers", "1",
            "--warmup-steps", "1",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
        ])
        assert os.path.isdir(tmp_path / "ckpt" / "temp")

        # the checkpoint plugs into the eval CLI's --tae-ckpt seam
        res = test_refiner.main([
            "--procedural", "8", "--size", "32", "--batch-size", "4",
            "--vae-blocks", "32,32", "--vae-layers", "1",
            "--width", "16", "--enc-depths", "1,1", "--mid-depth", "1",
            "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
            "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--cr-mid-depth", "1", "--num-inference-steps", "2",
            "--grid-every", "0", "--out-dir", str(tmp_path / "eval"),
            "--tae-ckpt", str(tmp_path / "ckpt" / "temp"),
            "--tae-mode", "both",
        ])
        assert np.isfinite(res["psnr"])


@pytest.mark.slow
class TestTrainTinyCRSmoke:
    def test_one_epoch_procedural(self, tmp_path):
        from hifidiff_tpu.cli import test_refiner, train_tiny_cr

        train_tiny_cr.main([
            "--procedural", "8", "--batch-size", "4", "--num-epochs", "1",
            "--size", "32", "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--cr-mid-depth", "1", "--tiny-width", "8", "--tiny-blocks", "1",
            "--warmup-steps", "1",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
        ])
        assert os.path.isdir(tmp_path / "ckpt" / "temp")

        # the checkpoint plugs into the eval CLI's --tiny-cr-ckpt seam
        res = test_refiner.main([
            "--procedural", "8", "--size", "32", "--batch-size", "4",
            "--vae-blocks", "32,32", "--vae-layers", "1",
            "--width", "16", "--enc-depths", "1,1", "--mid-depth", "1",
            "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
            "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--cr-mid-depth", "1", "--num-inference-steps", "2",
            "--grid-every", "0", "--out-dir", str(tmp_path / "eval"),
            "--tiny-cr-ckpt", str(tmp_path / "ckpt" / "temp"),
            "--tiny-cr-width", "8", "--tiny-cr-blocks", "1",
        ])
        assert np.isfinite(res["psnr"])


@pytest.mark.slow
class TestTrainTinyDNSmoke:
    def test_one_epoch_procedural(self, tmp_path):
        from hifidiff_tpu.cli import test_refiner, train_tiny_dn

        stack = [
            "--size", "32", "--vae-blocks", "32,32", "--vae-layers", "1",
            "--width", "16", "--enc-depths", "1,1", "--mid-depth", "1",
            "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
            "--cr-width", "8", "--cr-enc-depths", "1,1",
            "--cr-mid-depth", "1",
        ]
        train_tiny_dn.main(stack + [
            "--procedural", "8", "--batch-size", "4", "--num-epochs", "1",
            "--tiny-width", "8", "--rollout-steps", "2",
            "--warmup-steps", "1",
            "--out-dir", str(tmp_path / "out"),
            "--ckpt-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
        ])
        assert os.path.isdir(tmp_path / "ckpt" / "temp")

        # the student checkpoint plugs into the ORDINARY refiner seam:
        # --refiner-ckpt <student> with the student's --width (appended
        # last, so it overrides the teacher stack's width)
        res = test_refiner.main(stack + [
            "--procedural", "8", "--batch-size", "4",
            "--num-inference-steps", "2",
            "--grid-every", "0", "--out-dir", str(tmp_path / "eval"),
            "--refiner-ckpt", str(tmp_path / "ckpt" / "temp"),
            "--width", "8",
        ])
        assert np.isfinite(res["psnr"])


@pytest.mark.slow
class TestInferCRSmoke:
    def test_single_image(self, tmp_path):
        from PIL import Image

        from hifidiff_tpu.cli import infer_cr

        img_path = str(tmp_path / "face.png")
        Image.fromarray(
            (np.random.default_rng(0).uniform(0, 255, (64, 64, 3)))
            .astype(np.uint8)).save(img_path)
        out_path = str(tmp_path / "out.png")
        infer_cr.main(["--image", img_path, "--output", out_path,
                       "--size", "32", "--width", "8",
                       "--enc-depths", "1,1", "--mid-depth", "1"])
        assert os.path.exists(out_path)
