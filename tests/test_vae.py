"""VAE tests: architecture smoke + torch-oracle parity for the core blocks
and the diffusers-name importer (SURVEY.md §7 hard part #2).

The torch oracles here are small test-local modules implementing the SD-VAE
block math (GroupNorm32+SiLU ResNet, single-head spatial attention) with
diffusers checkpoint naming, so `vae_params_from_torch` is exercised
end-to-end without the diffusers package.
"""

import pytest
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
    @pytest.mark.smoke
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


class TestVAEEndToEndImport:
    """Full-architecture oracle (VERDICT round-1 item 4): a functional
    torch transcription of diffusers AutoencoderKL — asymmetric (0,1,0,1)
    downsample pad, nearest+conv upsampler, mid attention, diffusers
    state-dict key names — run on a synthetic checkpoint, imported via
    `vae_params_from_torch`, and compared end-to-end at factor 8."""

    BLOCKS = (32, 32, 64, 64)
    LAYERS = 2
    LATENT = 4

    def _make_sd(self, seed=0):
        import torch

        g = torch.Generator().manual_seed(seed)
        sd = {}

        def conv(p, cin, cout, k=3):
            sd[f"{p}.weight"] = torch.randn(cout, cin, k, k,
                                            generator=g) * (0.3 / (cin * k))
            sd[f"{p}.bias"] = torch.randn(cout, generator=g) * 0.05

        def gn(p, c):
            sd[f"{p}.weight"] = 1.0 + 0.1 * torch.randn(c, generator=g)
            sd[f"{p}.bias"] = 0.05 * torch.randn(c, generator=g)

        def lin(p, c):
            sd[f"{p}.weight"] = torch.randn(c, c, generator=g) * (0.3 / c)
            sd[f"{p}.bias"] = torch.randn(c, generator=g) * 0.05

        def resnet(p, cin, cout):
            gn(f"{p}.norm1", cin)
            conv(f"{p}.conv1", cin, cout)
            gn(f"{p}.norm2", cout)
            conv(f"{p}.conv2", cout, cout)
            if cin != cout:
                conv(f"{p}.conv_shortcut", cin, cout, k=1)

        def mid(p, c):
            resnet(f"{p}.resnets.0", c, c)
            resnet(f"{p}.resnets.1", c, c)
            a = f"{p}.attentions.0"
            gn(f"{a}.group_norm", c)
            for proj in ("to_q", "to_k", "to_v", "to_out.0"):
                lin(f"{a}.{proj}", c)

        bo, L = self.BLOCKS, self.LAYERS
        conv("encoder.conv_in", 3, bo[0])
        ch = bo[0]
        for i, c in enumerate(bo):
            for j in range(L):
                resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                       ch if j == 0 else c, c)
            ch = c
            if i < len(bo) - 1:
                conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
        mid("encoder.mid_block", bo[-1])
        gn("encoder.conv_norm_out", bo[-1])
        conv("encoder.conv_out", bo[-1], 2 * self.LATENT)
        conv("quant_conv", 2 * self.LATENT, 2 * self.LATENT, k=1)
        conv("post_quant_conv", self.LATENT, self.LATENT, k=1)

        rev = list(reversed(bo))
        conv("decoder.conv_in", self.LATENT, rev[0])
        mid("decoder.mid_block", rev[0])
        ch = rev[0]
        for i, c in enumerate(rev):
            for j in range(L + 1):
                resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       ch if j == 0 else c, c)
            ch = c
            if i < len(rev) - 1:
                conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        gn("decoder.conv_norm_out", rev[-1])
        conv("decoder.conv_out", rev[-1], 3)
        return sd

    def _torch_forward(self, sd, x):
        """Functional transcription of diffusers AutoencoderKL semantics."""
        import torch
        import torch.nn.functional as F

        def conv(x, p, stride=1, pad=1):
            return F.conv2d(x, sd[f"{p}.weight"], sd[f"{p}.bias"],
                            stride=stride, padding=pad)

        def gn(x, p):
            return F.group_norm(x, 32, sd[f"{p}.weight"], sd[f"{p}.bias"],
                                eps=1e-6)

        def resnet(x, p):
            h = conv(F.silu(gn(x, f"{p}.norm1")), f"{p}.conv1")
            h = conv(F.silu(gn(h, f"{p}.norm2")), f"{p}.conv2")
            if f"{p}.conv_shortcut.weight" in sd:
                x = conv(x, f"{p}.conv_shortcut", pad=0)
            return x + h

        def attn(x, p):
            b, c, hh, ww = x.shape
            res = x
            h = gn(x, f"{p}.group_norm")
            t = h.reshape(b, c, hh * ww).permute(0, 2, 1)
            q = F.linear(t, sd[f"{p}.to_q.weight"], sd[f"{p}.to_q.bias"])
            k = F.linear(t, sd[f"{p}.to_k.weight"], sd[f"{p}.to_k.bias"])
            v = F.linear(t, sd[f"{p}.to_v.weight"], sd[f"{p}.to_v.bias"])
            a = torch.softmax(q @ k.transpose(1, 2) * c ** -0.5, dim=-1)
            o = F.linear(a @ v, sd[f"{p}.to_out.0.weight"],
                         sd[f"{p}.to_out.0.bias"])
            return res + o.permute(0, 2, 1).reshape(b, c, hh, ww)

        def mid(x, p):
            x = resnet(x, f"{p}.resnets.0")
            x = attn(x, f"{p}.attentions.0")
            return resnet(x, f"{p}.resnets.1")

        bo, L = self.BLOCKS, self.LAYERS
        with torch.no_grad():
            h = conv(x, "encoder.conv_in")
            for i in range(len(bo)):
                for j in range(L):
                    h = resnet(h, f"encoder.down_blocks.{i}.resnets.{j}")
                if i < len(bo) - 1:
                    h = F.pad(h, (0, 1, 0, 1))  # asymmetric (0,1,0,1)
                    h = conv(h,
                             f"encoder.down_blocks.{i}.downsamplers.0.conv",
                             stride=2, pad=0)
            h = mid(h, "encoder.mid_block")
            h = conv(F.silu(gn(h, "encoder.conv_norm_out")),
                     "encoder.conv_out")
            moments = conv(h, "quant_conv", pad=0)
            mean, logvar = moments.chunk(2, dim=1)
            logvar = logvar.clamp(-30.0, 20.0)

            z = conv(mean, "post_quant_conv", pad=0)
            d = conv(z, "decoder.conv_in")
            d = mid(d, "decoder.mid_block")
            for i in range(len(bo)):
                for j in range(L + 1):
                    d = resnet(d, f"decoder.up_blocks.{i}.resnets.{j}")
                if i < len(bo) - 1:
                    d = F.interpolate(d, scale_factor=2, mode="nearest")
                    d = conv(d, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            d = conv(F.silu(gn(d, "decoder.conv_norm_out")),
                     "decoder.conv_out")
        return mean, logvar, d

    def test_encoder_decoder_parity_factor8(self):
        import torch

        from hifidiff_tpu.vae import AutoencoderKL, vae_params_from_torch

        sd = self._make_sd()
        x_t = torch.randn(2, 3, 64, 64, generator=torch.Generator()
                          .manual_seed(7))
        mean_t, logvar_t, dec_t = self._torch_forward(sd, x_t)

        sd_np = {k: v.numpy() for k, v in sd.items()}
        params = vae_params_from_torch(sd_np, num_blocks=len(self.BLOCKS),
                                       layers_per_block=self.LAYERS)
        vae = AutoencoderKL(block_out=self.BLOCKS,
                            layers_per_block=self.LAYERS)
        x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
        mean_j, logvar_j = vae.apply({"params": params}, x_j,
                                     method=vae.moments)
        assert mean_j.shape == (2, 8, 8, 4)  # factor 8
        np.testing.assert_allclose(
            np.asarray(mean_j), mean_t.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(logvar_j), logvar_t.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)

        dec_j = vae.apply({"params": params}, mean_j, method=vae.decode)
        np.testing.assert_allclose(
            np.asarray(dec_j), dec_t.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3)
