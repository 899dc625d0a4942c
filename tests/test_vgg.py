"""VGG19 perceptual trunk tests. Full parity vs torchvision runs where
torchvision is installed; otherwise a synthetic-state_dict importer test +
a hand-rolled torch oracle cover the mapping and the math."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from hifidiff_tpu.eval.vgg import (  # noqa: E402
    VGG19_PLAN,
    VGG19Features22,
    make_vgg_features_fn,
    vgg19_params_from_torch,
)

try:
    import torchvision
except ImportError:
    torchvision = None

RNG = np.random.default_rng(13)


def make_torch_vgg_trunk():
    """torchvision vgg19.features[:22] equivalent (conv/relu/pool plan),
    with torchvision's `features.N` naming."""
    layers = []
    cin = 3
    for si, (ch, n_convs) in enumerate(VGG19_PLAN):
        for _ in range(n_convs):
            layers.append(tnn.Conv2d(cin, ch, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            cin = ch
        if si < len(VGG19_PLAN) - 1:
            layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


class TestVGG19Oracle:
    @pytest.mark.smoke
    def test_parity_with_torch_oracle(self):
        tv = make_torch_vgg_trunk().eval()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in tv.state_dict().items()}
        params = vgg19_params_from_torch(sd)

        x = RNG.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        xt = torch.tensor(np.ascontiguousarray(
            np.transpose((x - mean) / std, (0, 3, 1, 2))))
        with torch.no_grad():
            ref = tv(xt)

        out = VGG19Features22().apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), np.transpose(ref.numpy(), (0, 2, 3, 1)),
            atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(torchvision is None, reason="torchvision not installed")
class TestVGG19Features:
    def test_parity_with_torchvision_trunk(self):
        tv = torchvision.models.vgg19(weights=None).features[:22].eval()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in tv.state_dict().items()}
        params = vgg19_params_from_torch(sd)

        x = RNG.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        xt = torch.tensor(np.ascontiguousarray(
            np.transpose((x - mean) / std, (0, 3, 1, 2))))
        with torch.no_grad():
            ref = tv(xt)

        out = VGG19Features22().apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), np.transpose(ref.numpy(), (0, 2, 3, 1)),
            atol=2e-4, rtol=1e-3)

class TestCompositeCRLoss:
    def test_composite_cr_loss_with_vgg(self):
        from hifidiff_tpu.train.losses import composite_cr_loss

        tv = make_torch_vgg_trunk()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in tv.state_dict().items()}
        fn = make_vgg_features_fn(vgg19_params_from_torch(sd))
        pred = jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        gt = jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        loss = composite_cr_loss(pred, gt, lambda_pix=1.0, lambda_ssim=0.1,
                                 lambda_vgg=0.1, vgg_features_fn=fn)
        assert np.isfinite(float(loss))
        # identical inputs -> only the (zero) pixel/vgg terms remain
        loss0 = composite_cr_loss(gt, gt, lambda_pix=1.0, lambda_ssim=0.1,
                                  lambda_vgg=0.1, vgg_features_fn=fn)
        assert float(loss0) < 1e-6
