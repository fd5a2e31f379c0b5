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


class NoisySystem(FakeSystem):
    """Prediction = target + per-tile-varying noise, plus per-tile psnr in
    the losses dict — lets the test distinguish stitched-frame metrics from
    mean-of-tile metrics."""

    def run_validation_iter(self, frames):
        self.calls.append(frames.shape)
        f = np.asarray(frames)
        # noise amplitude depends on the tile's mean content, so different
        # tiles have genuinely different MSEs (=> mean-of-tile-PSNRs !=
        # stitched-frame PSNR, since PSNR is log of mean MSE)
        amp = 0.02 + 0.1 * float(f[:, 3].mean())
        rng = np.random.RandomState(int(f.sum() * 1e3) % (2 ** 31))
        preds = f[:, 3] + amp * rng.rand(*f[:, 3].shape).astype(np.float32)
        from meta_interpolation_tpu.core import metrics as metrics_lib
        psnr, ssim = metrics_lib.calc_metrics(preds, f[:, 3])
        return {"loss": 1.0, "psnr": float(psnr), "ssim": float(ssim)}, preds


class OneBatchData:
    def __init__(self, frames):
        self.frames = frames

    def get_val_batches(self, total_batches=-1):
        yield self.frames, [{}]


def test_val_metrics_use_stitched_frame_protocol():
    """Reported val PSNR/SSIM must follow the reference protocol
    (experiment_builder.py:115,131-141): stitch tile outputs, then compute
    calc_metrics ONCE on the full frame (batch element 0) — NOT the mean of
    the per-tile psnr values returned inside the losses dict."""
    from meta_interpolation_tpu.core import metrics as metrics_lib

    sys_ = NoisySystem()
    b = _builder(sys_)
    # 1024x1024 > 5e5-pixel limit -> tiles; gradient content so tile means
    # (and hence noise amplitudes) differ between tiles
    frames = np.tile(
        np.linspace(0, 1, 1024, dtype=np.float32)[None, None, :, None, None],
        (1, 7, 1, 1024, 3))
    b.data = OneBatchData(frames)
    out = b.validate()
    assert len(sys_.calls) > 1  # tiling actually happened

    # ground truth: stitched pred through the same tiling, full-frame metric
    sys2 = NoisySystem()
    b2 = _builder(sys2)
    _losses, preds = b2._tiled_val_iter(frames, limit=5e5)
    want_psnr, want_ssim = metrics_lib.calc_metrics(
        np.asarray(preds)[0], frames[0, 3])
    np.testing.assert_allclose(out["psnr"], float(want_psnr), rtol=1e-5)
    np.testing.assert_allclose(out["ssim"], float(want_ssim), rtol=1e-5)
    # and it must NOT equal the mean of per-tile PSNRs
    tile_mean_psnr = _losses["psnr"]
    assert abs(out["psnr"] - tile_mean_psnr) > 1e-3


def test_val_metrics_batch_element_zero():
    """Reference computes metrics on outputs[0] vs images[3][0] — batch
    element 0 only (experiment_builder.py:132-141); a batch-mean would
    differ whenever element 0 is not average."""
    from meta_interpolation_tpu.core import metrics as metrics_lib

    class BatchSystem(FakeSystem):
        def run_validation_iter(self, frames):
            f = np.asarray(frames)
            preds = f[:, 3].copy()
            preds[0] += 0.05   # element 0 degraded
            preds[1:] += 0.005  # others nearly perfect
            return {"loss": 1.0}, preds

    sys_ = BatchSystem()
    b = _builder(sys_)
    frames = np.random.RandomState(3).rand(3, 7, 64, 64, 3).astype(np.float32)
    b.data = OneBatchData(frames)
    out = b.validate()
    # recompute exactly as the driver sees it
    preds = frames[:, 3].copy()
    preds[0] += 0.05
    want_psnr, want_ssim = metrics_lib.calc_metrics(preds[0], frames[0, 3])
    np.testing.assert_allclose(out["psnr"], float(want_psnr), rtol=1e-5)
    np.testing.assert_allclose(out["ssim"], float(want_ssim), rtol=1e-5)
