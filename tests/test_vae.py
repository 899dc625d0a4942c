"""VAE tests: architecture smoke + torch-oracle parity for the core blocks
and the diffusers-name importer (SURVEY.md §7 hard part #2).

The torch oracles here are small test-local modules implementing the SD-VAE
block math (GroupNorm32+SiLU ResNet, single-head spatial attention) with
diffusers checkpoint naming, so `vae_params_from_torch` is exercised
end-to-end without the diffusers package.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from hifidiff_tpu.vae import AutoencoderKL, vae_params_from_torch
from hifidiff_tpu.vae.model import AttnBlock, ResnetBlock

RNG = np.random.default_rng(7)


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TorchResnetOracle(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class TorchAttnOracle(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        x = self.group_norm(x)
        t = x.reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        attn = torch.softmax(q @ k.transpose(1, 2) * c ** -0.5, dim=-1)
        out = self.to_out[0](attn @ v)
        return res + out.transpose(1, 2).reshape(b, c, h, w)


class TestResnetBlockParity:
    def test_channel_change(self):
        tm = TorchResnetOracle(64, 128).eval()
        sd = {f"r.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
        from hifidiff_tpu.vae.import_torch import _resnet

        params = _resnet(sd, "r")
        x = RNG.standard_normal((2, 8, 8, 64), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)))
        out = ResnetBlock(128).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()),
                                   atol=1e-4, rtol=1e-4)


class TestAttnBlockParity:
    def test_parity(self):
        c = 64
        tm = TorchAttnOracle(c).eval()
        sd = {f"m.attentions.0.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        # reuse the mid-block attn mapping
        from hifidiff_tpu.vae.import_torch import _attn_proj, _gn

        params = {
            "norm": _gn(sd, "m.attentions.0.group_norm"),
            "to_q": _attn_proj(sd, "m.attentions.0.to_q"),
            "to_k": _attn_proj(sd, "m.attentions.0.to_k"),
            "to_v": _attn_proj(sd, "m.attentions.0.to_v"),
            "to_out": _attn_proj(sd, "m.attentions.0.to_out.0"),
        }
        x = RNG.standard_normal((2, 4, 4, c), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)))
        out = AttnBlock(c).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), nhwc(ref.numpy()),
                                   atol=1e-4, rtol=1e-4)


class TestAutoencoderShapes:
    def test_encode_decode_roundtrip_shapes(self):
        vae = AutoencoderKL(block_out=(32, 64), layers_per_block=1)
        key = jax.random.PRNGKey(0)
        img = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
        variables = vae.init(key, img)
        z = vae.apply(variables, img, method=vae.encode, sample=False)
        assert z.shape == (1, 16, 16, 4)  # factor 2 per downsample (1 here)
        rec = vae.apply(variables, z, method=vae.decode)
        assert rec.shape == (1, 32, 32, 3)
        assert bool(jnp.isfinite(rec).all())

    def test_full_config_latent_factor8(self):
        """Full SD config downsamples 128 -> 16 (factor 8), latent 4ch —
        eval_shape only (no FLOPs)."""
        vae = AutoencoderKL()
        key = jax.random.PRNGKey(0)
        img = jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32)
        variables = jax.eval_shape(vae.init, key, img)
        z = jax.eval_shape(
            lambda v, x: vae.apply(v, x, method=vae.encode, sample=False),
            variables, img)
        assert z.shape == (1, 16, 16, 4)

    def test_stochastic_encode_needs_key(self):
        vae = AutoencoderKL(block_out=(32, 64), layers_per_block=1)
        key = jax.random.PRNGKey(0)
        img = jnp.zeros((1, 16, 16, 3))
        variables = vae.init(key, img)
        try:
            vae.apply(variables, img, method=vae.encode, sample=True)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
        z = vae.apply(variables, img, method=vae.encode, sample=True,
                      key=jax.random.PRNGKey(1))
        assert z.shape == (1, 8, 8, 4)
