"""Task batching + background prefetch.

The reference parallelizes decode with torch DataLoader worker *processes*
(data/__init__.py:559-567). The TPU-native version uses a thread pool (PIL
decode releases the GIL) plus a double-buffered prefetcher so the next batch
is decoded and staged while the device runs the current episode.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np


class TaskLoader:
    """Iterate (B, T, H, W, C) float32 batches from a dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        self._norm_ok: Optional[bool] = None

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        idx = list(range(n))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _native_norm_ok(self) -> bool:
        """The C++ transform normalizes as (u8·inv255 − mean)/std; verify
        once that the dataset's constants reproduce the registry's
        ModelDef.normalize — a model with a custom normalize the affine
        form cannot express must take the python path, not silently
        train on wrongly normalized data."""
        if self._norm_ok is None:
            ds = self.dataset
            if not hasattr(ds, "norm_constants"):
                self._norm_ok = False
            else:
                from .datasets import normalize_for_model
                mean, std, inv255 = ds.norm_constants()
                probe = (np.arange(6, dtype=np.float32)
                         .reshape(2, 1, 3) * 51.0)
                expected = normalize_for_model(probe / 255.0, ds.model)
                got = (probe * inv255 - mean) / std
                self._norm_ok = bool(np.allclose(expected, got, atol=1e-5))
                if not self._norm_ok:
                    import warnings
                    warnings.warn(
                        f"native prep constants do not reproduce "
                        f"ModelDef.normalize for model {ds.model!r}; "
                        f"using the python data path")
        return self._norm_ok

    def _native_batch(self, pool, batch_idx):
        """Fast path: PIL decode to uint8 in threads, then one C++ call for
        crop/flip/normalize/batch (data/native/prep.cpp). Falls back to the
        python path when unsupported."""
        from . import native
        ds = self.dataset
        if (native.load() is None or not hasattr(ds, "get_raw")):
            return None
        if not self._native_norm_ok():
            return None
        items = list(pool.map(ds.get_raw, batch_idx))
        raw = [it[0] for it in items]
        meta = [it[1] for it in items]
        h, w = raw[0].shape[1], raw[0].shape[2]
        if any(r.shape != raw[0].shape for r in raw):
            return None
        oys, oxs, flips = [], [], []
        crop_h = crop_w = None
        for _ in raw:
            oy, ox, flip, ch, cw = ds.aug_params(h, w)
            oys.append(oy)
            oxs.append(ox)
            flips.append(flip)
            crop_h, crop_w = ch, cw
        mean, std, inv255 = ds.norm_constants()
        # temporal flip must flip paths too (reference vimeo_septuplet.py:64-67)
        for i, f in enumerate(flips):
            if f:
                meta[i] = {"imgpaths": list(meta[i]["imgpaths"])[::-1]}
        frames = native.prep_batch(np.stack(raw), crop_h, crop_w,
                                   np.asarray(oys), np.asarray(oxs),
                                   np.asarray(flips), mean, std, inv255,
                                   num_threads=self.num_workers)
        if frames is None:
            return None
        return frames, meta

    def __iter__(self) -> Iterator[Tuple[np.ndarray, list]]:
        indices = self._indices()
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if not batches:
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        use_native = hasattr(self.dataset, "get_raw")

        def produce():
            ds = self.dataset
            # datasets with a seeded aug stream: draw it HERE (serially,
            # in batch order) and ship the params to the pool workers —
            # drawing inside __getitem__ from pool threads would make the
            # crop/flip sequence depend on thread scheduling
            serial_aug = (hasattr(ds, "getitem_with_aug")
                          and hasattr(ds, "aug_params"))
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        break
                    item = (self._native_batch(pool, batch_idx)
                            if use_native else None)
                    if item is None:
                        if serial_aug:
                            hw = ds.frame_hw()
                            augs = [ds.aug_params(*hw) for _ in batch_idx]
                            items = list(pool.map(
                                lambda p: ds.getitem_with_aug(*p),
                                zip(batch_idx, augs)))
                        else:
                            items = list(pool.map(ds.__getitem__, batch_idx))
                        item = (np.stack([it[0] for it in items]),
                                [it[1] for it in items])
                    q.put(item)
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class MetaLearningSystemDataLoader:
    """Facade matching the reference loader API
    (data/__init__.py:520-625): get_train_batches / get_val_batches /
    get_test_batches generators."""

    def __init__(self, cfg, current_iter: int = 0, mesh_task_size: int = 1):
        from .datasets import get_dataset
        self.cfg = cfg
        self.dataset = get_dataset(cfg.dataset, cfg.data_root, cfg.model,
                                   cfg.mode, crop_size=cfg.crop_size,
                                   test_mode=cfg.test_mode,
                                   img_fmt=cfg.img_fmt)
        self.batch_size = {"train": cfg.batch_size,
                           "val": cfg.val_batch_size,
                           "test": cfg.test_batch_size}
        self.num_workers = cfg.num_workers
        self.seed = cfg.random_seed
        # episode parallelism: the jitted train step requires B divisible by
        # the mesh task axis, so the final partial train batch is dropped
        # (benign with shuffle — the reference's train loop is
        # iteration-count-driven anyway). Eval/test keep every sample; a
        # partial eval batch falls back to replicated placement
        # (parallel/mesh.shard_task_batch).
        self.mesh_task_size = max(1, int(mesh_task_size))

    def _loader(self, mode: str, epoch: int = 0) -> TaskLoader:
        # per-split shallow copy: switch_set mutates current_set_name, and
        # a still-running train producer thread sharing the dataset object
        # would start serving val-branch items mid-batch (the reference is
        # immune only because torch worker processes snapshot the dataset
        # at fork). File lists are shared read-only; the seeded aug RNG
        # object stays shared (only train draws from it).
        import copy
        dataset = copy.copy(self.dataset)
        dataset.switch_set(mode)
        loader = TaskLoader(dataset, self.batch_size[mode],
                            shuffle=(mode == "train"),
                            num_workers=self.num_workers, seed=self.seed,
                            drop_last=(mode == "train"
                                       and self.mesh_task_size > 1))
        loader.set_epoch(epoch)
        return loader

    def get_train_batches(self, total_batches: int = -1, epoch: int = 0):
        loader = self._loader("train", epoch)
        count = 0
        for batch in loader:
            yield batch
            count += 1
            if 0 < total_batches <= count:
                break

    def get_val_batches(self, total_batches: int = -1):
        loader = self._loader("val")
        count = 0
        for batch in loader:
            yield batch
            count += 1
            if 0 < total_batches <= count:
                break

    def get_test_batches(self, total_batches: int = -1):
        loader = self._loader("test")
        count = 0
        for batch in loader:
            yield batch
            count += 1
            if 0 < total_batches <= count:
                break
