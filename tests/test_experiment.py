"""Experiment driver unit tests (tiling recursion, checkpoint cadence)
with a mocked system — no model compile needed."""
import numpy as np

from meta_interpolation_tpu.config import Config
from meta_interpolation_tpu.core.experiment import ExperimentBuilder


class FakeSystem:
    """Echoes shapes; counts calls (stands in for SceneAdaptiveInterpolation)."""

    class _MD:
        tile_pixel_limit = 5e5
        denormalize = staticmethod(lambda x: x)

    model_def = _MD()

    def __init__(self):
        self.calls = []

    def run_validation_iter(self, frames):
        self.calls.append(frames.shape)
        preds = np.asarray(frames)[:, 3]
        return {"loss": 1.0, "psnr": 30.0, "ssim": 0.9}, preds

    def state_dict(self):
        return {}


def _builder(system):
    cfg = Config(mode="val", dataset="synthetic", use_tensorboard=False)
    return ExperimentBuilder(cfg, data=None, system=system)


def test_tiling_splits_oversized_frames():
    """H*W > limit → recursive halving along the longer side
    (reference experiment_builder.py:103-128)."""
    sys_ = FakeSystem()
    b = _builder(sys_)
    frames = np.random.RandomState(0).rand(1, 7, 1088, 1920, 3).astype(
        np.float32)  # 1080p-ish: 2.09 MP > 5e5
    losses, preds = b._tiled_val_iter(frames, limit=5e5)
    assert preds.shape == (1, 1088, 1920, 3)
    # every actual system call must be under the pixel limit
    for shape in sys_.calls:
        assert shape[2] * shape[3] <= 5e5, shape
    # loss averaged over tiles
    np.testing.assert_allclose(losses["loss"], 1.0)


def test_tiling_passthrough_small_frames():
    sys_ = FakeSystem()
    b = _builder(sys_)
    frames = np.random.RandomState(1).rand(1, 7, 256, 448, 3).astype(
        np.float32)
    losses, preds = b._tiled_val_iter(frames, limit=5e5)
    assert len(sys_.calls) == 1  # no split
    assert preds.shape == (1, 256, 448, 3)


def test_tiling_reassembles_exact_pixels():
    """Stitched prediction must be the target frame exactly (the fake
    system echoes frames[:, 3], so any mis-ordering of tiles shows up)."""
    sys_ = FakeSystem()
    b = _builder(sys_)
    frames = np.random.RandomState(2).rand(1, 7, 1024, 1024, 3).astype(
        np.float32)
    _losses, preds = b._tiled_val_iter(frames, limit=5e5)
    np.testing.assert_allclose(preds, frames[:, 3], atol=1e-7)
