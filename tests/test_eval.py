"""Eval metric + checkpoint tests."""

import pytest
import os

import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.eval.metrics import (
    identity_cosine,
    identity_verification_accuracy,
    min_max_normalize,
    psnr,
)
from hifidiff_tpu.eval.niqe import fit_niqe_model, niqe
from hifidiff_tpu.train.checkpoint import (
    CheckpointManager,
    _merge_strict_false,
)

RNG = np.random.default_rng(11)


class TestMetrics:
    @pytest.mark.smoke
    def test_psnr_known_value(self):
        x = jnp.zeros((1, 8, 8, 3))
        y = jnp.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 20 dB
        np.testing.assert_allclose(float(psnr(x, y)), 20.0, rtol=1e-5)

    def test_min_max_normalize(self):
        x = jnp.asarray(RNG.uniform(-3, 5, (2, 4, 4, 3)).astype(np.float32))
        n = min_max_normalize(x)
        assert float(n.min()) >= 0.0 and float(n.max()) <= 1.0 + 1e-6
        for b in range(2):
            assert abs(float(n[b].max()) - 1.0) < 1e-5
            assert abs(float(n[b].min())) < 1e-5

    def test_identity_cosine_and_accuracy(self):
        a = jnp.asarray(RNG.standard_normal((8, 32), dtype=np.float32))
        sims = identity_cosine(a, a * 2.0)  # same direction -> 1
        np.testing.assert_allclose(np.asarray(sims), 1.0, atol=1e-5)
        acc = identity_verification_accuracy(a, a, -a)
        assert float(acc) == 1.0


class TestNIQE:
    def test_natural_vs_noise(self):
        # smooth structured images as the "pristine" corpus
        xs, ys = np.meshgrid(np.linspace(0, 6, 192), np.linspace(0, 6, 192))
        pristine = [
            (0.5 + 0.4 * np.sin(xs * (1 + k * 0.3) + ys))[..., None].repeat(
                3, -1) + RNG.normal(0, 0.01, (192, 192, 3))
            for k in range(4)
        ]
        pristine = [np.clip(p, 0, 1).astype(np.float32) for p in pristine]
        mu, cov = fit_niqe_model(pristine)
        similar = pristine[0]
        noise = RNG.uniform(0, 1, (192, 192, 3)).astype(np.float32)
        assert niqe(similar, mu, cov) < niqe(noise, mu, cov)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from hifidiff_tpu.train.optim import adam
        from hifidiff_tpu.train.steps import TrainState

        params = {"layer": {"kernel": jnp.asarray(
            RNG.standard_normal((4, 4), dtype=np.float32))}}
        state = TrainState.create(params, adam(1e-3))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, jax.device_get(state), wait=True)
        assert mgr.latest_step() == 7
        restored = mgr.restore(template=jax.device_get(state))["state"]
        np.testing.assert_allclose(
            np.asarray(restored.params["layer"]["kernel"]),
            np.asarray(params["layer"]["kernel"]))
        mgr.close()

    def test_merge_strict_false(self):
        init = {"a": np.zeros(3), "b": {"c": np.zeros(2), "d": np.zeros(1)}}
        loaded = {"a": np.ones(3), "b": {"c": np.ones(2)},
                  "extra": np.ones(9)}
        out = _merge_strict_false(init, loaded)
        np.testing.assert_allclose(out["a"], 1.0)
        np.testing.assert_allclose(out["b"]["c"], 1.0)
        np.testing.assert_allclose(out["b"]["d"], 0.0)  # kept from init
        assert "extra" not in out


class TestLPIPS:
    """Formula parity vs a torch oracle transcribing the official lpips
    computation (github.com/richzhang/PerceptualSimilarity), on synthetic
    weights — real pretrained weights can't be fetched in-env. pyiqa's
    `lpips` default backbone is AlexNet (reference `test_refiner.py:107-109`
    reports that variant), so the alex path is the comparable one."""

    def _torch_lpips(self, feats_fn, lins, x, y):
        import torch

        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def prep(img):
            return (img * 2.0 - 1.0 - shift) / scale

        fx, fy = feats_fn(prep(x)), feats_fn(prep(y))
        total = 0.0
        for tx, ty, w in zip(fx, fy, lins):
            nx = tx / tx.pow(2).sum(1, keepdim=True).sqrt().clamp_min(1e-10)
            ny = ty / ty.pow(2).sum(1, keepdim=True).sqrt().clamp_min(1e-10)
            d = (nx - ny).pow(2)
            d = (d * torch.tensor(w).view(1, -1, 1, 1)).sum(1)
            total = total + d.mean(dim=(1, 2))
        return total

    def test_alex_matches_torch_oracle(self):
        import torch
        import torch.nn as tnn

        from hifidiff_tpu.eval.lpips import (
            load_lpips_alex_params,
            lpips_distance,
        )

        torch.manual_seed(0)
        alex = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(),
            tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(),
            tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
        )
        # torchvision state-dict key layout: features.{0,3,6,8,10}
        sd = {}
        conv_positions = {0: 0, 3: 3, 6: 6, 8: 8, 10: 10}
        seq_convs = [m for m in alex if isinstance(m, tnn.Conv2d)]
        for ti, conv in zip((0, 3, 6, 8, 10), seq_convs):
            sd[f"features.{ti}.weight"] = conv.weight.detach().numpy()
            sd[f"features.{ti}.bias"] = conv.bias.detach().numpy()
        del conv_positions
        lins = [np.abs(np.random.default_rng(i).normal(
            size=(c,)).astype(np.float32))
            for i, c in enumerate((64, 192, 384, 256, 256))]
        lpips_sd = {f"lin{i}.model.1.weight": w.reshape(1, -1, 1, 1)
                    for i, w in enumerate(lins)}

        params, jlins = load_lpips_alex_params(sd, lpips_sd)

        rng = np.random.default_rng(42)
        x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
        y = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

        ours = lpips_distance(params, jlins, jnp.asarray(x), jnp.asarray(y),
                              net="alex")

        def feats(img):
            taps, h = [], img
            with torch.no_grad():
                for m in alex:
                    h = m(h)
                    if isinstance(m, tnn.ReLU):
                        taps.append(h)
            return taps

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).permute(0, 3, 1, 2)
        golden = self._torch_lpips(feats, lins, xt, yt)
        np.testing.assert_allclose(np.asarray(ours), golden.numpy(),
                                   rtol=2e-4, atol=2e-5)

    def test_vgg16_matches_torch_oracle(self):
        import torch
        import torch.nn as tnn

        from hifidiff_tpu.eval.lpips import load_lpips_params, lpips_distance

        torch.manual_seed(1)
        cfg = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        layers, sd, ti = [], {}, 0
        in_ch = 3
        for ch, n in cfg:
            for _ in range(n):
                conv = tnn.Conv2d(in_ch, ch, 3, 1, 1)
                layers += [conv, tnn.ReLU()]
                sd[f"features.{ti}.weight"] = conv.weight.detach().numpy()
                sd[f"features.{ti}.bias"] = conv.bias.detach().numpy()
                ti += 2
                in_ch = ch
            layers.append(tnn.MaxPool2d(2, 2))
            ti += 1
        vgg = tnn.Sequential(*layers)
        chans = (64, 128, 256, 512, 512)
        lins = [np.abs(np.random.default_rng(10 + i).normal(
            size=(c,)).astype(np.float32)) for i, c in enumerate(chans)]
        lpips_sd = {f"lin{i}.model.1.weight": w.reshape(1, -1, 1, 1)
                    for i, w in enumerate(lins)}
        params, jlins = load_lpips_params(sd, lpips_sd)

        rng = np.random.default_rng(7)
        x = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        y = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        ours = lpips_distance(params, jlins, jnp.asarray(x), jnp.asarray(y))

        def feats(img):
            taps, h = [], img
            stage_relu_count = {0: 2, 1: 2, 2: 3, 3: 3, 4: 3}
            relu_seen, stage = 0, 0
            with torch.no_grad():
                for m in vgg:
                    if isinstance(m, tnn.MaxPool2d) and stage == 4:
                        break  # lpips taps before the final pool
                    h = m(h)
                    if isinstance(m, tnn.ReLU):
                        relu_seen += 1
                        if relu_seen == stage_relu_count[stage]:
                            taps.append(h)
                            relu_seen, stage = 0, stage + 1
            return taps

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).permute(0, 3, 1, 2)
        golden = self._torch_lpips(feats, lins, xt, yt)
        np.testing.assert_allclose(np.asarray(ours), golden.numpy(),
                                   rtol=2e-4, atol=2e-5)
