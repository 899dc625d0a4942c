"""Dataset semantics tests over synthetic on-disk fixture trees mimicking
the K-Face / Multi-PIE layouts (`dataset_kface.py`, `dataset_multipie.py`)."""

import pytest
import os

import numpy as np
from PIL import Image

from hifidiff_tpu.data import (
    KFaceDataset,
    KFaceIDCDataset,
    MultiPIEDataset,
    MultiPIEHQDataset,
    MultiPIEInferenceDataset,
    MultiPIESingleViewDataset,
    CelebAHQDataset,
)
from hifidiff_tpu.data.degradations import (
    bivariate_gaussian_kernel,
    quantize_8bit,
    random_mixed_kernel,
)

RNG = np.random.default_rng(9)


def _save_img(path, size=(160, 160)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = RNG.uniform(0, 255, (*size, 3)).astype(np.uint8)
    Image.fromarray(arr).save(path)


def make_kface_tree(root, split="train", ids=("id1", "id2")):
    for pid in ids:
        for light in ("L1", "L3"):
            for expr in ("E01", "E02", "E03"):
                base = os.path.join(root, split, pid, "S001", light, expr)
                for angle in range(1, 21):
                    _save_img(os.path.join(base, f"C{angle}.jpg"))
                    # meta: 7 filler lines, head bbox, 4 component bboxes
                    lines = ["x"] * 7
                    lines.append("10\t10\t120\t120")   # head
                    for _ in range(4):
                        lines.append("30\t30\t20\t20")  # components
                    with open(os.path.join(base, f"C{angle}.txt"),
                              "w") as f:
                        f.write("\n".join(lines))


def make_multipie_tree(root, split="train", pids=("p1", "p2"),
                       with_patches=False):
    angles = ["11_0", "12_0", "09_0", "19_1", "08_1", "20_0", "01_0",
              "24_0", "08_0", "13_0", "14_0", "05_0", "04_1", "19_0",
              "05_1"]
    for pid in pids:
        for angle in angles:
            for light in ("00", "01"):
                _save_img(os.path.join(root, split, pid, angle,
                                       f"{light}.png"), (128, 128))
                if with_patches and angle == "05_1":
                    _save_img(os.path.join(root, split, pid, angle,
                                           f"{light}_patch.png"), (128, 128))


class TestKFace:
    def test_samples_and_shapes(self, tmp_path):
        make_kface_tree(str(tmp_path))
        ds = KFaceDataset(str(tmp_path), split="train")
        # 2 ids x 2 lights x 3 exprs x 19 non-frontal angles
        assert len(ds) == 2 * 2 * 3 * 19
        s = ds[0]
        assert s["lr"].shape == (128, 128, 3)
        assert s["gt"].shape == (128, 128, 3)
        assert s["patches"].shape == (4, 128, 128, 3)
        # patches are masked copies of the GT: zero outside, GT inside
        mask = s["patches"].sum(axis=0).sum(axis=-1) > 0
        assert mask.any() and not mask.all()
        assert 0.0 <= s["lr"].min() and s["lr"].max() <= 1.0

    def test_idc_triplets_distinct_identities(self, tmp_path):
        make_kface_tree(str(tmp_path), ids=tuple(f"id{i}" for i in range(21)))
        ds = KFaceIDCDataset(str(tmp_path), split="train")
        s = ds[0]
        assert set(s.keys()) == {"lr", "gt", "other"}
        assert not np.allclose(s["gt"], s["other"])


class TestMultiPIE:
    def test_blind_and_clean_branches(self, tmp_path):
        make_multipie_tree(str(tmp_path))
        blind = MultiPIEDataset(str(tmp_path), split="train",
                                use_blind=True, seed=0)
        clean = MultiPIEDataset(str(tmp_path), split="train",
                                use_blind=False, augment_flip=False)
        # uni: 14 input angles x 2 lights x 2 pids
        assert len(blind) == 14 * 2 * 2
        sb, sc = blind[0], clean[0]
        for s in (sb, sc):
            assert s["lr"].shape == (128, 128, 3)
            assert s["gt"].shape == (128, 128, 3)
        # lr must be 8-bit-quantized
        q = quantize_8bit(sc["lr"])
        np.testing.assert_allclose(sc["lr"], q, atol=1e-7)

    def test_single_view_dataset(self, tmp_path):
        make_multipie_tree(str(tmp_path), with_patches=True)
        ds = MultiPIESingleViewDataset(str(tmp_path), angle="11_0")
        assert len(ds) == 2 * 2  # pids x lights
        s = ds[0]
        assert s["angle"] == "11_0"
        assert s["lr"].shape == (128, 128, 3)
        assert s["patches"].shape == (1, 128, 128, 3)

    def test_inference_dataset(self, tmp_path):
        make_multipie_tree(str(tmp_path))
        ds = MultiPIEInferenceDataset(str(tmp_path))
        assert len(ds) == 14 * 2 * 2
        s = ds[0]
        assert s["lr"].shape == (128, 128, 3)
        assert isinstance(s["path"], str) and s["path"].endswith(".png")

    def test_hq_dataset(self, tmp_path):
        make_multipie_tree(str(tmp_path))
        ds = MultiPIEHQDataset(str(tmp_path))
        # 7 angles (6 moderate + frontal) x 2 lights x 2 pids
        assert len(ds) == 7 * 2 * 2
        assert ds[0]["image"].shape == (128, 128, 3)


def make_kface_crop_tree(root, split="train", ids=("a", "b"),
                         with_patches=True):
    lights = ["L1", "L2", "L3", "L4", "L8", "L9", "L10", "L13"]
    for pid in ids:
        for light in lights[:2]:  # sparse: only 2 light conds exist
            for expr in ("E01", "E02", "E03"):
                base = os.path.join(root, split, pid, "S001", light, expr)
                _save_img(os.path.join(base, "C7.jpg"))
                for angle in (1, 3):  # sparse angle coverage
                    _save_img(os.path.join(base, f"C{angle}.jpg"))
                    if with_patches:
                        # pre-rendered patches ship at the target size
                        for k in range(8):
                            _save_img(os.path.join(base,
                                                   f"C{angle}_{k}.jpg"),
                                      (128, 128))


class TestKFaceCrop:
    def test_crop_dataset(self, tmp_path):
        from hifidiff_tpu.data import KFaceCropDataset

        make_kface_crop_tree(str(tmp_path))
        ds = KFaceCropDataset(str(tmp_path), split="train")
        # 2 ids x 2 lights x 3 exprs x 2 existing angles
        assert len(ds) == 2 * 2 * 3 * 2
        s = ds[0]
        assert s["lr"].shape == (128, 128, 3)
        assert s["patches"].shape == (8, 128, 128, 3)

    def test_crop_idc_dataset(self, tmp_path):
        from hifidiff_tpu.data import KFaceCropIDCDataset

        make_kface_crop_tree(str(tmp_path),
                             ids=tuple(f"p{i:02d}" for i in range(21)),
                             with_patches=False)
        ds = KFaceCropIDCDataset(str(tmp_path), split="train")
        assert len(ds) > 0
        s = ds[0]
        assert set(s.keys()) == {"lr", "gt", "other"}

    def test_hr_datasets(self, tmp_path):
        from hifidiff_tpu.data import KFaceCropHRDataset, KFaceHRDataset

        make_kface_tree(str(tmp_path))
        hr = KFaceHRDataset(str(tmp_path), size=64)
        assert len(hr) == 2 * 2 * 3 * 20
        assert hr[0]["image"].shape == (64, 64, 3)

        make_kface_crop_tree(str(tmp_path / "crop"))
        chr_ = KFaceCropHRDataset(str(tmp_path / "crop"), size=64)
        # C7 + 2 angles per (id, light, expr)
        assert len(chr_) == 2 * 2 * 3 * 3
        assert chr_[0]["image"].shape == (64, 64, 3)


class TestCelebAHQ:
    def test_flat_dir(self, tmp_path):
        for i in range(5):
            _save_img(str(tmp_path / f"{i}.jpg"), (64, 64))
        (tmp_path / "notes.txt").write_text("not an image")
        ds = CelebAHQDataset(str(tmp_path), size=32)
        assert len(ds) == 5
        assert ds[0]["image"].shape == (32, 32, 3)


class TestDegradations:
    @pytest.mark.smoke
    def test_iso_kernel_symmetric(self):
        k = bivariate_gaussian_kernel(9, 0.5, 0.5, 0.0)
        assert abs(k.sum() - 1.0) < 1e-6
        np.testing.assert_allclose(k, k.T, atol=1e-7)

    def test_aniso_kernel_rotation(self):
        k0 = bivariate_gaussian_kernel(11, 0.3, 1.0, 0.0)
        k90 = bivariate_gaussian_kernel(11, 0.3, 1.0, np.pi / 2)
        np.testing.assert_allclose(k90, k0.T, atol=1e-7)

    def test_random_mixed_deterministic(self):
        a = random_mixed_kernel(np.random.default_rng(3), 9)
        b = random_mixed_kernel(np.random.default_rng(3), 9)
        np.testing.assert_allclose(a, b)


class TestArrayDataset:
    """In-memory dict-of-arrays dataset (the latent-moments cache backing
    store for `pretrain_denoiser --cache-latents`)."""

    def test_round_trip_through_loader(self):
        import numpy as np

        from hifidiff_tpu.data import ArrayDataset, Loader

        mean = np.arange(24, dtype=np.float32).reshape(6, 2, 2)
        lv = -mean
        ds = ArrayDataset({"mean": mean, "logvar": lv})
        assert len(ds) == 6
        batches = list(Loader(ds, 4, shuffle=False))
        assert [b["mean"].shape[0] for b in batches] == [4, 2]
        np.testing.assert_array_equal(
            np.concatenate([b["mean"] for b in batches]), mean)
        np.testing.assert_array_equal(
            np.concatenate([b["logvar"] for b in batches]), lv)

    def test_ragged_arrays_rejected(self):
        import numpy as np

        from hifidiff_tpu.data import ArrayDataset

        with pytest.raises(AssertionError):
            ArrayDataset({"a": np.zeros((3,)), "b": np.zeros((4,))})


class TestLoaderSharding:
    """Multi-process Loader sharding (Accelerate-sharded-DataLoader
    equivalent): disjoint cover, equal batch counts, DistributedSampler
    wrap-padding."""

    def _ds(self, n):
        from hifidiff_tpu.cli.common import SyntheticFaceDataset

        return SyntheticFaceDataset(n, 8, keys=("idx_marker",))

    @pytest.mark.smoke
    def test_shards_cover_disjointly(self):
        from hifidiff_tpu.data import Loader

        class IdxDataset:
            def __len__(self):
                return 12

            def __getitem__(self, i):
                return {"i": np.asarray([i])}

        seen = []
        for shard in range(3):
            loader = Loader(IdxDataset(), 2, shuffle=True, seed=5,
                            shard_index=shard, num_shards=3)
            ids = [int(v) for b in loader for v in b["i"].ravel()]
            assert len(ids) == 4  # 12 / 3
            seen.extend(ids)
        assert sorted(seen) == list(range(12))  # disjoint cover

    def test_equal_batch_counts_with_padding(self):
        from hifidiff_tpu.data import Loader

        class IdxDataset:
            def __len__(self):
                return 10  # not divisible by 3 -> wrap-pad to 12

            def __getitem__(self, i):
                return {"i": np.asarray([i])}

        counts, all_ids = [], []
        for shard in range(3):
            loader = Loader(IdxDataset(), 2, shuffle=False,
                            shard_index=shard, num_shards=3)
            batches = list(loader)
            counts.append(len(batches))
            all_ids.extend(int(v) for b in batches for v in b["i"].ravel())
        assert counts == [2, 2, 2]  # every process yields the same count
        assert set(all_ids) == set(range(10))  # all samples appear
        assert len(all_ids) == 12  # 2 wrap-padded duplicates

    def test_same_seed_same_global_order(self):
        from hifidiff_tpu.data import Loader

        class IdxDataset:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return {"i": np.asarray([i])}

        def order(shard):
            loader = Loader(IdxDataset(), 2, shuffle=True, seed=3,
                            shard_index=shard, num_shards=2)
            return [int(v) for b in loader for v in b["i"].ravel()]

        # shards are strides of ONE global shuffle: rebuilding either
        # shard gives the same sequence (epoch counter reset per Loader)
        assert order(0) == order(0)
        assert order(1) == order(1)
        assert not set(order(0)) & set(order(1))

    def test_invalid_shard_raises(self):
        from hifidiff_tpu.data import Loader

        try:
            Loader(self._ds(4), 2, shard_index=2, num_shards=2)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestLoaderShardPadding:
    def test_tiny_dataset_many_shards_equal_batches(self):
        """Wrap-pad must cycle when pad > len(dataset): every shard gets
        the SAME number of batches or multi-process collectives deadlock
        (code-review r2 finding)."""
        from hifidiff_tpu.data.core import Dataset, Loader

        class Tiny(Dataset):
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"x": np.full((2,), i, np.float32)}

        counts = []
        for shard in range(8):
            loader = Loader(Tiny(), batch_size=1, shuffle=False,
                            num_threads=1, shard_index=shard, num_shards=8)
            counts.append(sum(1 for _ in loader))
        assert len(set(counts)) == 1 and counts[0] == 1, counts
