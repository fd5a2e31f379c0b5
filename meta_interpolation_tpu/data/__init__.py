"""Data pipeline — task (septuplet) loading for meta-VFI.

TPU-native replacement for ``/root/reference/data/`` (torch DataLoader with
worker processes): datasets yield numpy ``(T, H, W, C)`` float32 clips in
model input space; :class:`TaskLoader` batches them to ``(B, T, H, W, C)``
with a background-thread prefetcher that overlaps decode with device compute
and pins the next batch into HBM via ``jax.device_put``.

Datasets (reference files):
  * VimeoSeptuplet  — data/vimeo_septuplet.py:10-89 (train: random 256-crop +
    random temporal flip; per-model normalization)
  * Middlebury      — data/middlebury.py:12-109 (eval-only pseudo-septuplet)
  * HD              — data/hd_dataset.py:11-81 (sliding 7-frame windows, stride 2)
  * SNUFILM         — data/snufilm.py:8-67 (quintuplet list zero-padded to 7)
  * Video           — data/video.py:9-60 (custom frame dir, 4-frame clips,
    ×2 slow-motion on repeat)
  * Synthetic       — no reference equivalent: procedurally generated moving
    scenes so tests/benchmarks run without the Vimeo download.
"""
from .datasets import (VimeoSeptuplet, Middlebury, HDDataset, SNUFILM,
                       VideoDataset, DAVIS, SyntheticSeptuplet, get_dataset)
from .loader import TaskLoader, MetaLearningSystemDataLoader

__all__ = ["VimeoSeptuplet", "Middlebury", "HDDataset", "SNUFILM",
           "VideoDataset", "DAVIS", "SyntheticSeptuplet", "get_dataset",
           "TaskLoader", "MetaLearningSystemDataLoader"]
