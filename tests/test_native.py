"""C++ data-path core parity tests vs cv2 (skipped when the lib isn't
built; CI builds it with `sh native/build.sh`)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hifidiff_tpu.data import native  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native lib not built (sh native/build.sh)")

RNG = np.random.default_rng(5)


class TestNativeResize:
    @pytest.mark.parametrize("out_hw,cubic", [((128, 96), True),
                                              ((17, 23), True),
                                              ((128, 96), False),
                                              ((17, 23), False)])
    def test_matches_cv2(self, out_hw, cubic):
        img = RNG.uniform(0, 1, (64, 48, 3)).astype(np.float32)
        ours = native.resize(img, out_hw, cubic=cubic)
        interp = cv2.INTER_CUBIC if cubic else cv2.INTER_LINEAR
        ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=interp)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_batch_matches_single(self):
        imgs = RNG.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
        out = native.resize_batch(imgs, (16, 16), num_threads=2)
        for i in range(4):
            np.testing.assert_allclose(out[i],
                                       native.resize(imgs[i], (16, 16)))


class TestNativeFilterAndNoise:
    def test_filter2d_matches_cv2(self):
        img = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        k = RNG.uniform(0, 1, (11, 11)).astype(np.float32)
        k /= k.sum()
        np.testing.assert_allclose(native.filter2d(img, k),
                                   cv2.filter2D(img, -1, k), atol=1e-6)

    def test_noise_statistics_and_determinism(self):
        img = np.full((64, 64, 3), 0.5, np.float32)
        a = native.add_gaussian_noise(img, 0.02, 123)
        b = native.add_gaussian_noise(img, 0.02, 123)
        np.testing.assert_array_equal(a, b)  # same seed -> same noise
        assert abs(float(np.std(a - img)) - 0.02) < 0.003
        assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0

    @pytest.mark.smoke
    def test_quantize8(self):
        img = RNG.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(
            native.quantize8(img),
            np.clip(np.rint(img * 255), 0, 255) / 255.0)

    def test_degrade_stage1_composition(self):
        img = RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        k = RNG.uniform(0, 1, (9, 9)).astype(np.float32)
        k /= k.sum()
        out = native.degrade_stage1(img, k, (16, 16), 0.0, 0)
        # sigma=0: must equal filter2d + linear resize exactly
        ref = native.resize(native.filter2d(img, k), (16, 16), cubic=False)
        np.testing.assert_allclose(out, ref, atol=1e-6)
