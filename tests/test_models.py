"""Model parity tests vs the reference PyTorch implementation.

Strategy (SURVEY.md §4): import the reference modules from /root/reference
(torch CPU) as the *oracle*, randomly initialize them, convert their
state_dicts through `hifidiff_tpu.utils.torch_import`, and compare outputs.
Full-size forwards are run where cheap (CR, IDC); the deep latent UNets are
checked at full size via parameter-count parity (eval_shape, no FLOPs) and at
reduced width via mini torch oracles wired exactly like the reference
(`models/denoiser/model.py`, `models/fpg/model.py`) but using the reference's
own block classes.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

# --- make the reference importable as an oracle (diffusers is not installed;
# the reference only uses ConfigMixin as an attribute bag) -------------------
sys.path.insert(0, "/root/reference")
if "diffusers" not in sys.modules:
    stub = types.ModuleType("diffusers")

    class _ConfigMixin:  # noqa: D401
        pass

    stub.ConfigMixin = _ConfigMixin
    sys.modules["diffusers"] = stub

from models.cr.model import CoarseRestoration as TorchCR  # noqa: E402
from models.cr.naf import NAFBlock as TorchNAFBlock  # noqa: E402
from models.cr.stn import STNBlock as TorchSTNBlock  # noqa: E402
from models.denoiser.conditional_naf import (  # noqa: E402
    ConditionalNAFBlock as TorchCondNAF,
)
from models.denoiser.model import SinusoidalPosEmb  # noqa: E402
from models.fpg.hca import HybridCrossAttention as TorchHCA  # noqa: E402
from models.idc.model import ResNet50 as TorchResNet50  # noqa: E402
from utils import SimpleGate as TorchSimpleGate  # noqa: E402

from hifidiff_tpu.models import (  # noqa: E402
    CoarseRestoration,
    Denoiser,
    FacialPriorGuidance,
    FusedDenoiser,
    IDCEncoder,
)
from hifidiff_tpu.nn import (  # noqa: E402
    ConditionalNAFBlock,
    HybridCrossAttention,
    NAFBlock,
    STNBlock,
)
from hifidiff_tpu.utils import torch_import as ti  # noqa: E402

torch.manual_seed(0)
RNG = np.random.default_rng(42)


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def assert_close(jax_out, torch_out, atol=1e-4):
    np.testing.assert_allclose(
        np.asarray(jax_out), nhwc(torch_out.detach().numpy()), atol=atol,
        rtol=1e-4,
    )


class TestNAFBlock:
    @pytest.mark.smoke
    def test_parity(self):
        c = 32
        tm = TorchNAFBlock(c).eval()
        x = RNG.standard_normal((2, 16, 16, c), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)))
        params = {"params": ti.naf_block_params(sd_numpy(tm), "")}
        # strip the leading "." produced by empty prefix
        params = jax.tree_util.tree_map(lambda a: a, params)
        out = NAFBlock(c).apply(params, jnp.asarray(x))
        assert_close(out, ref)


class TestConditionalNAFBlock:
    def test_parity(self):
        c, time_dim = 32, 512
        tm = TorchCondNAF(c, time_dim).eval()
        x = RNG.standard_normal((2, 8, 8, c), dtype=np.float32)
        t = RNG.standard_normal((2, time_dim), dtype=np.float32)
        with torch.no_grad():
            ref, _ = tm([torch.tensor(nchw(x)), torch.tensor(t)])
        params = {"params": ti.conditional_naf_block_params(sd_numpy(tm), "")}
        out = ConditionalNAFBlock(c, time_dim).apply(
            params, jnp.asarray(x), jnp.asarray(t)
        )
        assert_close(out, ref)


class TestSTNBlock:
    @pytest.mark.parametrize("res", [8, 16, 32, 64])
    def test_parity(self, res):
        ch = 8
        tm = TorchSTNBlock(ch, res).eval()
        # non-trivial theta: perturb the regressor weights
        with torch.no_grad():
            tm.fc_loc[2].weight.normal_(0, 0.01)
        x = RNG.standard_normal((2, res, res, ch), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)))
        params = {"params": ti.stn_block_params(sd_numpy(tm), "")}
        out = STNBlock(ch, res).apply(params, jnp.asarray(x))
        assert_close(out, ref, atol=2e-4)


class TestHCA:
    def test_parity_eval(self):
        dim = 64
        tm = TorchHCA(dim).eval()
        # randomize running stats so the mapping is actually exercised
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        fg = RNG.standard_normal((2, 8, 8, dim), dtype=np.float32)
        fd = RNG.standard_normal((2, 8, 8, dim), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(fg)), torch.tensor(nchw(fd)))
        p, s = ti.hca_params(sd_numpy(tm), "")
        out = HybridCrossAttention(dim).apply(
            {"params": p, "batch_stats": s},
            jnp.asarray(fg), jnp.asarray(fd), train=False,
        )
        assert_close(out, ref)


@pytest.mark.slow
class TestCoarseRestoration:
    def test_full_parity(self):
        tm = TorchCR().eval()
        x = RNG.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)))
        params = {"params": ti.cr_params(sd_numpy(tm))}
        out = CoarseRestoration().apply(params, jnp.asarray(x))
        assert_close(out, ref, atol=5e-4)


@pytest.mark.slow
class TestIDC:
    def test_full_parity(self):
        tm = TorchResNet50().eval()
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        x = RNG.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)))  # (B, 2048, 1, 1)
        p, s = ti.resnet50_params(sd_numpy(tm))
        out = IDCEncoder().apply(
            {"params": p, "batch_stats": s}, jnp.asarray(x), train=False
        )
        np.testing.assert_allclose(
            np.asarray(out), ref.detach().numpy().reshape(2, 2048),
            atol=1e-3, rtol=1e-3,
        )


# --- mini oracles: reference wiring at reduced width ------------------------

class MiniTorchDenoiser(tnn.Module):
    """Reference Denoiser wiring (`models/denoiser/model.py:32-134`) at
    configurable width/depth, built from the reference's own blocks."""

    def __init__(self, width=16, enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1)):
        super().__init__()
        time_dim = width * 4
        self.time_mlp = tnn.Sequential(
            SinusoidalPosEmb(width),
            tnn.Linear(width, time_dim * 2),
            TorchSimpleGate(),
            tnn.Linear(time_dim, time_dim),
        )
        self.intro = tnn.Conv2d(4, width, 3, padding=1)
        self.ending = tnn.Conv2d(width, 4, 3, padding=1)
        self.encoders = tnn.ModuleList()
        self.downs = tnn.ModuleList()
        self.ups = tnn.ModuleList()
        self.decoders = tnn.ModuleList()
        chan = width
        for num in enc_nums:
            self.encoders.append(tnn.Sequential(
                *[TorchCondNAF(chan, time_dim) for _ in range(num)]))
            self.downs.append(tnn.Conv2d(chan, 2 * chan, 2, 2))
            chan *= 2
        self.middle_blks = tnn.Sequential(
            *[TorchCondNAF(chan, time_dim) for _ in range(mid_num)])
        for num in dec_nums:
            self.ups.append(tnn.Sequential(
                tnn.Conv2d(chan, chan * 2, 1, bias=False), tnn.PixelShuffle(2)))
            chan //= 2
            self.decoders.append(tnn.Sequential(
                *[TorchCondNAF(chan, time_dim) for _ in range(num)]))
        self.bottleneck_chan = width * 2 ** len(enc_nums)

    def forward(self, x, timesteps):
        t = self.time_mlp(timesteps)
        x = self.intro(x)
        skips = []
        for enc, down in zip(self.encoders, self.downs):
            x, _ = enc([x, t])
            skips.append(x)
            x = down(x)
        x, _ = self.middle_blks([x, t])
        return x, t, skips

    def decode(self, x, t, skips):
        for dec, up, skip in zip(self.decoders, self.ups, skips[::-1]):
            x = up(x)
            x = x + skip
            x, _ = dec([x, t])
        return self.ending(x)


class MiniTorchUncondDenoiser(MiniTorchDenoiser):
    def forward(self, x, timesteps):
        h, w = x.shape[-2:]
        x, t, skips = super().forward(x, timesteps)
        x = self.decode(x, t, skips)
        return x[..., :h, :w]


class MiniTorchFusedDenoiser(MiniTorchDenoiser):
    def __init__(self, latent=8, **kw):
        super().__init__(**kw)
        bres = latent // 2 ** len(self.downs)
        self.idc_conv = tnn.Conv2d(
            2048, self.bottleneck_chan * bres * bres, (1, 1))
        self.hcas = tnn.ModuleList(
            [TorchHCA(self.bottleneck_chan)]
            + [TorchHCA(self.bottleneck_chan // 2 ** (i + 1))
               for i in range(len(self.decoders))])

    def forward(self, x, timesteps, priors, id_emb):
        b = x.shape[0]
        h, w = x.shape[-2:]
        x, t, skips = MiniTorchDenoiser.forward(self, x, timesteps)
        idc = self.idc_conv(id_emb)
        x = x + idc.reshape(b, *x.shape[1:])
        x = self.hcas[0](priors[0], x)
        for dec, up, hca, prior, skip in zip(
            self.decoders, self.ups, self.hcas[1:], priors[1:], skips[::-1]
        ):
            x = up(x)
            x = x + skip
            x, _ = dec([x, t])
            x = hca(prior, x)
        return self.ending(x)[..., :h, :w]


class MiniTorchFPG(tnn.Module):
    """Reference FPG wiring (`models/fpg/model.py:7-64`) at reduced width."""

    def __init__(self, width=16, enc_nums=(1, 1)):
        super().__init__()
        self.intro = tnn.Conv2d(4, width, 3, padding=1)
        self.encoders = tnn.ModuleList()
        self.downs = tnn.ModuleList()
        self.convs = tnn.ModuleList()
        chan = width
        for num in enc_nums:
            self.encoders.append(tnn.Sequential(
                *[TorchNAFBlock(chan) for _ in range(num)]))
            self.downs.append(tnn.Conv2d(chan, 2 * chan, 2, 2))
            chan *= 2
        self.convs.append(tnn.Sequential(
            tnn.Conv2d(chan, chan, 1, bias=False), tnn.PixelShuffle(1)))
        for _ in enc_nums:
            self.convs.append(tnn.Sequential(
                tnn.Conv2d(chan, chan * 2, 1, bias=False), tnn.PixelShuffle(2)))
            chan //= 2

    def forward(self, x):
        skips = []
        x = self.intro(x)
        for enc, down in zip(self.encoders, self.downs):
            x = enc(x)
            skips.append(x)
            x = down(x)
        x = self.convs[0](x)
        priors = [x]
        for conv, skip in zip(self.convs[1:], skips[::-1]):
            x = conv(x)
            x = x + skip
            priors.append(x)
        return priors


class TestDenoiserWiring:
    def test_mini_parity(self):
        tm = MiniTorchUncondDenoiser().eval()
        x = RNG.standard_normal((2, 8, 8, 4), dtype=np.float32)
        t = np.array([3.0, 977.0], dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(nchw(x)), torch.tensor(t))
        params = {"params": ti.denoiser_params(
            sd_numpy(tm), enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1))}
        out = Denoiser(width=16, enc_nums=(1, 1), mid_num=1,
                       dec_nums=(1, 1)).apply(
            params, jnp.asarray(x), jnp.asarray(t))
        assert_close(out, ref, atol=2e-4)


class TestFusedDenoiserWiring:
    def test_mini_parity(self):
        tm = MiniTorchFusedDenoiser(latent=8).eval()
        fpg = MiniTorchFPG().eval()
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.2)
                    m.running_var.uniform_(0.5, 2.0)
        x = RNG.standard_normal((2, 8, 8, 4), dtype=np.float32)
        lat = RNG.standard_normal((2, 8, 8, 4), dtype=np.float32)
        emb = RNG.standard_normal((2, 2048), dtype=np.float32)
        t = np.array([10.0, 500.0], dtype=np.float32)
        with torch.no_grad():
            priors_t = fpg(torch.tensor(nchw(lat)))
            ref = tm(torch.tensor(nchw(x)), torch.tensor(t), priors_t,
                     torch.tensor(emb).reshape(2, 2048, 1, 1))

        fpg_params = {"params": ti.fpg_params(sd_numpy(fpg), enc_nums=(1, 1))}
        priors = FacialPriorGuidance(width=16, enc_nums=(1, 1)).apply(
            fpg_params, jnp.asarray(lat))
        for pj, pt in zip(priors, priors_t):
            assert_close(pj, pt, atol=2e-4)

        p, s = ti.fused_denoiser_params(
            sd_numpy(tm), enc_nums=(1, 1), mid_num=1, dec_nums=(1, 1))
        out = FusedDenoiser(width=16, latent_size=8, enc_nums=(1, 1),
                            mid_num=1, dec_nums=(1, 1)).apply(
            {"params": p, "batch_stats": s},
            jnp.asarray(x), jnp.asarray(t), priors, jnp.asarray(emb),
            train=False)
        assert_close(out, ref, atol=5e-4)


class TestFullSizeParamCounts:
    """Full-size wiring sanity without FLOPs: parameter-count parity via
    eval_shape against the reference's full-size modules."""

    @staticmethod
    def _flax_count(model, *args_shapes):
        shapes = jax.eval_shape(
            lambda k, *a: model.init(k, *a), jax.random.PRNGKey(0),
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in args_shapes],
        )
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(shapes["params"]))

    def test_cr(self):
        tc = sum(p.numel() for p in TorchCR().parameters())
        jc = self._flax_count(CoarseRestoration(), (1, 128, 128, 3))
        assert tc == jc

    def test_idc(self):
        tc = sum(p.numel() for p in TorchResNet50().parameters())
        jc = self._flax_count(IDCEncoder(), (1, 128, 128, 3))
        assert tc == jc


@pytest.mark.slow
class TestFullSizeFusedDenoiserParity:
    """VERDICT round-1 item 3: the ACTUAL reference FusedDenoiser +
    FacialPriorGuidance at full width 128 (~450M params, torch CPU, one
    forward) vs ours with imported weights. Closes the parity hole left by
    the width-16 mini oracles (`/root/reference/models/denoiser/
    model.py:137-266`, `models/fpg/model.py:7-64`)."""

    def test_full_size_forward_parity(self):
        from models.denoiser.model import (
            FusedDenoiser as TorchFusedDenoiser,
        )
        from models.fpg.model import (
            FacialPriorGuidance as TorchFPG,
        )

        torch.manual_seed(7)
        tm = TorchFusedDenoiser(latent_size=16).eval()
        fpg_t = TorchFPG().eval()
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.2)
                    m.running_var.uniform_(0.5, 2.0)

        b = 1
        x = RNG.standard_normal((b, 16, 16, 4), dtype=np.float32)
        lat = RNG.standard_normal((b, 16, 16, 4), dtype=np.float32)
        emb = RNG.standard_normal((b, 2048), dtype=np.float32)
        t = np.array([500.0] * b, dtype=np.float32)

        with torch.no_grad():
            priors_t = fpg_t(torch.tensor(nchw(lat)))
            ref = tm(torch.tensor(nchw(x)), torch.tensor(t), priors_t,
                     torch.tensor(emb).reshape(b, 2048, 1, 1))
        ref = ref.sample if hasattr(ref, "sample") else ref

        fpg_params = {"params": ti.fpg_params(sd_numpy(fpg_t),
                                              enc_nums=(2, 2, 4, 8))}
        priors = FacialPriorGuidance().apply(fpg_params, jnp.asarray(lat))
        for pj, pt in zip(priors, priors_t):
            assert_close(pj, pt, atol=2e-3)

        p, s = ti.fused_denoiser_params(sd_numpy(tm))
        out = FusedDenoiser().apply(
            {"params": p, "batch_stats": s},
            jnp.asarray(x), jnp.asarray(t), priors, jnp.asarray(emb),
            train=False)
        assert_close(out, ref, atol=5e-3)
