"""Native preprocessing library vs the reference-parity Python paths."""
import numpy as np
import pytest

from s2m2_tpu import native
from s2m2_tpu.utils.image import image_pad


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


def test_native_pad_matches_python(lib_ok, rng):
    img = rng.uniform(0, 255, (100, 130, 3)).astype(np.float32)
    ref = image_pad(img[None], 32)[0]
    got = native.image_pad_native(img, 32)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_native_remap_matches_cv2(lib_ok, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 255, (64, 80, 3)).astype(np.uint8)
    map_x = rng.uniform(-2, 82, (50, 70)).astype(np.float32)
    map_y = rng.uniform(-2, 66, (50, 70)).astype(np.float32)
    ref = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT)
    got = native.remap_bilinear(img, map_x, map_y)
    # integer rounding can differ by 1 at bilinear ties
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_numpy_fallback_remap(rng, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    monkeypatch.setattr(native, "_load", lambda: None)
    img = rng.uniform(0, 255, (32, 40, 3)).astype(np.uint8)
    map_x = rng.uniform(0, 39, (30, 35)).astype(np.float32)
    map_y = rng.uniform(0, 31, (30, 35)).astype(np.float32)
    ref = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT)
    got = native.remap_bilinear(img, map_x, map_y)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
