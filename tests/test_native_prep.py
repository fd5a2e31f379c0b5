"""Native C++ preprocessing vs numpy reference."""
import numpy as np
import pytest

from meta_interpolation_tpu.data import native


def _numpy_ref(frames, crop_h, crop_w, oys, oxs, flips, mean, std):
    b, t, h, w, _ = frames.shape
    out = np.empty((b, t, crop_h, crop_w, 3), np.float32)
    for i in range(b):
        clip = frames[i, ::-1] if flips[i] else frames[i]
        crop = clip[:, oys[i]:oys[i] + crop_h, oxs[i]:oxs[i] + crop_w]
        out[i] = (crop.astype(np.float32) / 255.0 - mean) / std
    return out


def test_prep_batch_matches_numpy():
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 256, (3, 7, 20, 24, 3), dtype=np.uint8)
    oys = np.asarray([0, 2, 4])
    oxs = np.asarray([1, 0, 6])
    flips = np.asarray([0, 1, 0])
    mean = np.asarray([0.1, 0.2, 0.3], np.float32)
    std = np.asarray([1.0, 0.5, 2.0], np.float32)
    got = native.prep_batch(frames, 16, 16, oys, oxs, flips, mean, std,
                            num_threads=2)
    if got is None:
        pytest.skip("native toolchain unavailable")
    expected = _numpy_ref(frames, 16, 16, oys, oxs, flips, mean, std)
    np.testing.assert_allclose(got, expected, atol=1e-6)
