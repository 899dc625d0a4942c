"""Mesh utility tests (8 virtual CPU devices via conftest)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from hifidiff_tpu.parallel import (
    batch_sharding,
    device_prefetch,
    make_mesh,
    replicated,
    shard_batch,
)

RNG = np.random.default_rng(31)


class TestMesh:
    @pytest.mark.smoke
    def test_make_mesh_shapes(self):
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8}
        mesh2 = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_shard_batch_divisible_and_ragged(self):
        mesh = make_mesh(8)
        div = shard_batch(np.zeros((16, 4), np.float32), mesh)
        assert div.sharding.spec[0] == "data"
        ragged = shard_batch(np.zeros((5, 4), np.float32), mesh)
        assert ragged.sharding.spec == ()  # replicated fallback

    def test_wrap_pad_leading(self):
        """The multi-process ragged pad must WRAP (repeat the array), not
        slice: xa[:pad] clips when pad > n (r3 regression — a final local
        batch of 1 padding to a 4-device multiple under-padded to 2 and
        broke the inferred global shape in mp_dryrun's val loop)."""
        from hifidiff_tpu.parallel.mesh import wrap_pad_leading

        x = np.arange(3 * 2, dtype=np.float32).reshape(3, 2)
        np.testing.assert_array_equal(wrap_pad_leading(x, 3), x)  # no-op
        p4 = wrap_pad_leading(x, 4)                       # pad 1 < n
        assert p4.shape == (4, 2)
        np.testing.assert_array_equal(p4[3], x[0])
        one = x[:1]
        p = wrap_pad_leading(one, 4)                      # pad 3 > n=1
        assert p.shape == (4, 2)
        for row in p:
            np.testing.assert_array_equal(row, one[0])
        p6 = wrap_pad_leading(x[:2], 6)                   # pad 4 > n=2
        assert p6.shape == (6, 2)
        np.testing.assert_array_equal(p6, np.tile(x[:2], (3, 1)))

    def test_device_prefetch_order_and_completeness(self):
        mesh = make_mesh(8)
        batches = [{"x": RNG.uniform(0, 1, (8, 2)).astype(np.float32)}
                   for _ in range(5)]
        out = list(device_prefetch(iter(batches), mesh, depth=2))
        assert len(out) == 5
        for a, b in zip(out, batches):
            np.testing.assert_allclose(np.asarray(a["x"]), b["x"])

    def test_tp_sharded_params_same_result(self):
        """Denoiser forward with output-channel-sharded params on a
        (data=4, model=2) mesh must equal the replicated result — GSPMD
        inserts the collectives, numerics unchanged."""
        import jax.numpy as jnp

        from hifidiff_tpu.models import Denoiser
        from hifidiff_tpu.parallel import shard_params_tp

        model = Denoiser(width=32, enc_nums=(1, 1), mid_num=1,
                         dec_nums=(1, 1))
        key = jax.random.PRNGKey(0)
        lat = jax.random.normal(key, (4, 8, 8, 4))
        t = jnp.full((4,), 100.0)
        params = model.init(key, lat, t)["params"]
        ref = model.apply({"params": params}, lat, t)

        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        # min_features low so the 128-ch bottleneck of this tiny model shards
        tp_params = shard_params_tp(params, mesh, min_features=64)
        # at least one kernel must actually be sharded on "model"
        specs = [x.sharding.spec for x in
                 jax.tree_util.tree_leaves(tp_params)]
        assert any("model" in [s for s in spec if s] for spec in specs)
        lat_s = shard_batch(lat, mesh)
        out = jax.jit(lambda p, x, tt: model.apply({"params": p}, x, tt))(
            tp_params, lat_s, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_sharded_mean_is_global(self):
        """jnp.mean over a sharded batch inside jit is the global mean —
        the GSPMD property the loss reductions rely on."""
        mesh = make_mesh(8)
        x = np.arange(16, dtype=np.float32)
        xs = shard_batch(x, mesh)
        m = jax.jit(jnp.mean)(xs)
        np.testing.assert_allclose(float(m), x.mean(), rtol=1e-6)
