"""Dataset classes. Pure-python + numpy (PIL decode); no torch.

Each dataset exposes:
  * ``set_name`` state with ``switch_set(name)``
  * ``__len__`` / ``__getitem__(i) -> (frames, metadata)`` where ``frames`` is
    a numpy (T, H, W, C) float32 clip already in *model input space* and
    metadata carries the image paths.

Normalization conventions (reference data/vimeo_septuplet.py:31-40,73-81):
frames load as RGB in [0,1]; superslomo subtracts (0.429, 0.431, 0.397);
voxelflow keeps 0-255 then normalizes mean/std=127.5.
"""
from __future__ import annotations

import glob
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

SSM_MEAN = np.asarray([0.429, 0.431, 0.397], np.float32)


def normalize_for_model(img01: np.ndarray, model: str) -> np.ndarray:
    """[0,1] HWC float32 → model input space.

    Single source of truth: delegates to the registry's per-model
    ``ModelDef.normalize`` (pure arithmetic, numpy-compatible), so a new
    model's custom normalize automatically reaches the data pipeline.
    Unregistered names pass through unchanged."""
    from ..models import registry
    try:
        return np.asarray(registry.get(model).normalize(img01), np.float32)
    except NotImplementedError:
        return img01


def load_image(path: str) -> np.ndarray:
    """Decode to HWC RGB float32 in [0,1]."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


class _Base:
    current_set_name: str = "train"
    data_length: Dict[str, int]

    def switch_set(self, set_name: str, current_iter=None):
        self.current_set_name = set_name

    def __len__(self):
        return self.data_length[self.current_set_name]


class VimeoSeptuplet(_Base):
    """Vimeo90K septuplets (reference data/vimeo_septuplet.py:10-89).

    Train: random crop_size crop + random temporal flip. The reference decodes
    BGR with cv2 then swaps to RGB (:52,:70); PIL gives RGB directly.
    """

    def __init__(self, data_root: str, model: str = "cain", mode: str = "train",
                 crop_size: int = 256, rng: Optional[random.Random] = None):
        self.data_root = data_root
        self.image_root = os.path.join(data_root, "sequences")
        self.model = model
        self.crop_size = crop_size
        self.rng = rng or random.Random(12345)
        with open(os.path.join(data_root, "sep_trainlist.txt")) as f:
            self.trainlist = f.read().splitlines()
        with open(os.path.join(data_root, "sep_testlist.txt")) as f:
            self.testlist = f.read().splitlines()
        self.current_set_name = "train" if mode == "train" else "val"
        self.data_length = {"train": len(self.trainlist),
                            "val": len(self.testlist), "test": 0}

    def _paths(self, index):
        lst = self.trainlist if self.current_set_name == "train" else self.testlist
        seq = lst[index % len(lst)]
        return [os.path.join(self.image_root, seq, f"im{i}.png")
                for i in range(1, 8)]

    def frame_hw(self):
        """(H, W) of the dataset's frames — PIL reads the header only."""
        if getattr(self, "_hw", None) is None:
            with Image.open(self._paths(0)[0]) as im:
                self._hw = (im.height, im.width)
        return self._hw

    def getitem_with_aug(self, index, aug):
        """Load one clip with externally drawn augmentation — lets the
        loader draw the (seeded) aug stream serially in its producer
        thread while decodes run in the pool, keeping augmentation
        deterministic under threading."""
        oy, ox, flip, ch, cw = aug
        paths = self._paths(index)
        images = [load_image(p) for p in paths]
        if self.current_set_name == "train":
            images = [im[oy:oy + ch, ox:ox + cw] for im in images]
            if flip:
                images = images[::-1]
                paths = paths[::-1]
        frames = np.stack([normalize_for_model(im, self.model)
                           for im in images])
        return frames, {"imgpaths": paths}

    def __getitem__(self, index):
        return self.getitem_with_aug(index, self.aug_params(*self.frame_hw()))

    # -- native fast path (data/native): decode to uint8 + C++ transform ---
    def get_raw(self, index):
        """(T, H, W, 3) uint8 frames + metadata, untransformed."""
        paths = self._paths(index)
        frames = []
        for p in paths:
            with Image.open(p) as im:
                frames.append(np.asarray(im.convert("RGB"), np.uint8))
        return np.stack(frames), {"imgpaths": paths}

    def aug_params(self, h: int, w: int):
        """Per-clip crop offsets + temporal flip — ONE seeded RNG stream
        shared by the python and native paths (both draw it serially in
        the loader's producer thread). The crop clamps to the frame size
        (the reference's oversized crop would read out of bounds in the
        C++ path and silently shrink in the python path)."""
        if self.current_set_name != "train":
            return 0, 0, 0, h, w
        ch, cw = min(self.crop_size, h), min(self.crop_size, w)
        rh = self.rng.randint(0, max(0, h - ch))
        rw = self.rng.randint(0, max(0, w - cw))
        flip = int(self.rng.random() >= 0.5)
        return rh, rw, flip, ch, cw

    def norm_constants(self):
        """(mean, std, inv255) for the C++ normalize."""
        if self.model == "superslomo":
            return SSM_MEAN, np.ones(3, np.float32), 1.0 / 255.0
        if self.model == "voxelflow":
            return (np.full(3, 127.5, np.float32),
                    np.full(3, 127.5, np.float32), 1.0)
        return (np.zeros(3, np.float32), np.ones(3, np.float32), 1.0 / 255.0)


class Middlebury(_Base):
    """Middlebury OTHERS eval set (reference data/middlebury.py:12-109).

    8-frame dirs → middle 4 frames + frame10i11.png GT, packed as the
    pseudo-septuplet [i0, 0, i1, gt, i2, 0, i3].
    """

    def __init__(self, data_root: str, model: str = "cain", **_kw):
        self.model = model
        image_root = os.path.join(data_root, "other-data-all")
        gt_root = os.path.join(data_root, "other-gt-interp")
        self.imglist: List[List[str]] = []
        self.gt_list: List[str] = []
        for d in sorted(glob.glob(image_root + "/*")):
            imgs = sorted(glob.glob(d + "/*.png"))
            if len(imgs) == 8:
                self.imglist.append(imgs[2:6])
                self.gt_list.append(os.path.join(gt_root, os.path.basename(d),
                                                 "frame10i11.png"))
        self.current_set_name = "val"
        self.data_length = {"train": 0, "val": len(self.imglist), "test": 0}

    def __getitem__(self, index):
        imgs = [normalize_for_model(load_image(p), self.model)
                for p in self.imglist[index]]
        gt = normalize_for_model(load_image(self.gt_list[index]), self.model)
        dummy = np.zeros_like(gt)
        frames = np.stack([imgs[0], dummy, imgs[1], gt, imgs[2], dummy, imgs[3]])
        paths = [self.imglist[index][0], "", self.imglist[index][1],
                 self.gt_list[index], self.imglist[index][2], "",
                 self.imglist[index][3]]
        return frames, {"imgpaths": paths}


class HDDataset(_Base):
    """HD (1080p/720p) sequences, sliding 7-frame windows with stride 2
    (reference data/hd_dataset.py:11-81)."""

    def __init__(self, data_root: str, model: str = "cain", **_kw):
        self.model = model
        self.clips: List[List[str]] = []
        for d in sorted(glob.glob(os.path.join(data_root, "*"))):
            if not os.path.isdir(d):
                continue
            imgs = sorted(glob.glob(os.path.join(d, "*.png")))
            # stride-2 windows; the reference's tail handling appends the
            # final 7-frame window once per remaining stride step
            # (hd_dataset.py:24-34) — replicated exactly for eval parity
            t = 0
            while t < len(imgs):
                if len(imgs) >= 7:
                    if t + 7 <= len(imgs):
                        self.clips.append(imgs[t:t + 7])
                    else:
                        self.clips.append(imgs[-7:])
                else:
                    self.clips.append(imgs)
                t += 2
        self.current_set_name = "val"
        self.data_length = {"train": 0, "val": len(self.clips), "test": 0}

    def __getitem__(self, index):
        paths = self.clips[index]
        frames = np.stack([normalize_for_model(load_image(p), self.model)
                           for p in paths])
        return frames, {"imgpaths": paths}


class SNUFILM(_Base):
    """SNU-FILM quintuplet list, zero-padded to septuplets
    (reference data/snufilm.py:8-67)."""

    def __init__(self, data_root: str, model: str = "cain",
                 test_mode: str = "hard", **_kw):
        self.model = model
        # NOTE the reference hardcodes 'hard' regardless of --test_mode
        # (snufilm.py:16, SURVEY §2.2 quirk); here test_mode is honored.
        list_file = os.path.join(data_root, f"test-{test_mode}-meta.txt")
        self.quintuplets: List[List[str]] = []
        if os.path.exists(list_file):
            with open(list_file) as f:
                for line in f.read().splitlines():
                    parts = line.split(" ")
                    if parts and parts[0]:
                        self.quintuplets.append(parts)
        self.current_set_name = "val"
        self.data_length = {"train": 0, "val": len(self.quintuplets), "test": 0}

    def __getitem__(self, index):
        paths = self.quintuplets[index]
        imgs = [normalize_for_model(load_image(p), self.model) for p in paths]
        zero = np.zeros_like(imgs[0])
        # quintuplet [a,b,c,d,e] → septuplet [a, 0, b, c, d, 0, e]
        # (reference snufilm.py:57-58): support (0,2,4)=(a,b,d),
        # query (2,4)→3 = (b,d)→c
        frames = np.stack([imgs[0], zero, imgs[1], imgs[2], imgs[3], zero,
                           imgs[4]])
        meta_paths = [paths[0], "", paths[1], paths[2], paths[3], "",
                      paths[4]]
        return frames, {"imgpaths": meta_paths}


class VideoDataset(_Base):
    """Custom video frame dir for ×2 slow-motion (reference data/video.py:9-60).

    Frames renamed to ``name_%.06f.ext`` float indices; serves sliding
    4-frame clips. Re-running on the output directory doubles the frame rate.
    """

    def __init__(self, data_root: str, model: str = "cain",
                 img_fmt: str = "png", rename: bool = True, **_kw):
        self.model = model
        self.data_root = data_root
        self.img_fmt = img_fmt
        images = sorted(glob.glob(os.path.join(data_root, f"*.{img_fmt}")))
        if rename:
            for im in images:
                try:
                    float(im.split("_")[-1][:-(len(img_fmt) + 1)])
                except ValueError:
                    os.rename(im, "%s_%.06f.%s" % (im[:-(len(img_fmt) + 1)],
                                                   0.0, img_fmt))
            images = sorted(glob.glob(os.path.join(data_root, f"*.{img_fmt}")))
        if images and len(images) < 4:
            images = images + [images[-1]] * (4 - len(images))
            self.imglist = [images]
        else:
            self.imglist = [images[i:i + 4] for i in range(len(images) - 3)]
        self.current_set_name = "test"
        self.data_length = {"train": 0, "val": 0, "test": len(self.imglist)}

    def __getitem__(self, index):
        paths = self.imglist[index]
        frames = np.stack([normalize_for_model(load_image(p), self.model)
                           for p in paths])
        return frames, {"imgpaths": paths}


class DAVIS(_Base):
    """DAVIS video sequences as sliding septuplet windows.

    The reference *dispatches* to ``data.davis`` which does not exist
    (data/__init__.py:544-546 — a latent ImportError, SURVEY.md §7 quirk).
    Implemented here for real: each sequence directory of frames yields
    sliding 7-frame windows, stride 2 (the HD protocol).
    """

    def __init__(self, data_root: str, model: str = "cain", **_kw):
        self.model = model
        self.clips: List[List[str]] = []
        seq_root = os.path.join(data_root, "JPEGImages", "480p")
        if not os.path.isdir(seq_root):
            seq_root = data_root
        for d in sorted(glob.glob(os.path.join(seq_root, "*"))):
            if not os.path.isdir(d):
                continue
            imgs = sorted(glob.glob(os.path.join(d, "*.jpg"))
                          or glob.glob(os.path.join(d, "*.png")))
            for s in range(0, len(imgs) - 6, 2):
                self.clips.append(imgs[s:s + 7])
        self.current_set_name = "val"
        self.data_length = {"train": 0, "val": len(self.clips), "test": 0}

    def __getitem__(self, index):
        paths = self.clips[index]
        frames = np.stack([normalize_for_model(load_image(p), self.model)
                           for p in paths])
        return frames, {"imgpaths": paths}


class SyntheticSeptuplet(_Base):
    """Procedural septuplets (no reference equivalent) — deterministic moving
    scenes with linear motion, so frame 4 is exactly the midpoint of 3 and 5.
    Lets the full train/val/test stack and benchmarks run without Vimeo90K.
    """

    def __init__(self, model: str = "cain", mode: str = "train",
                 size: Tuple[int, int] = (256, 256), length: int = 64,
                 num_frames: int = 7, seed: int = 0, motion: float = 8.0,
                 **_kw):
        self.model = model
        self.size = size
        self.num_frames = num_frames
        self.seed = seed
        # blob velocity range: |v| <= motion/2 px/frame (default matches
        # the original fixed 8.0). The warp-clamp stress protocol sweeps
        # this past the bounded warp's range (scripts/warp_quality.py).
        self.motion = float(motion)
        self.current_set_name = "train" if mode == "train" else mode
        self.data_length = {"train": length, "val": max(1, length // 8),
                            "test": max(1, length // 8)}
        # rendered clips are deterministic in (set, index) — cache them so
        # repeat epochs are memory reads, not re-renders (the render is
        # ~100 ms/clip of numpy on this box's single core, which would
        # otherwise dominate full-size training throughput). Shared across
        # the loader's shallow per-split copies by design.
        self._cache: Dict[Tuple[str, int], Tuple[np.ndarray, list]] = {}

    def _render(self, rng: np.random.RandomState) -> np.ndarray:
        h, w = self.size
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        n_blobs = 6
        cx = rng.rand(n_blobs) * w
        cy = rng.rand(n_blobs) * h
        vx = (rng.rand(n_blobs) - 0.5) * self.motion
        vy = (rng.rand(n_blobs) - 0.5) * self.motion
        radius = 10 + rng.rand(n_blobs) * 30
        color = rng.rand(n_blobs, 3).astype(np.float32)
        bg_phase = rng.rand() * 6.28
        frames = []
        for t in range(self.num_frames):
            img = 0.25 + 0.15 * np.sin(
                xx / 37.0 + yy / 53.0 + bg_phase)[..., None].astype(np.float32)
            img = np.repeat(img, 3, axis=2)
            for b in range(n_blobs):
                d2 = ((xx - (cx[b] + vx[b] * t)) ** 2
                      + (yy - (cy[b] + vy[b] * t)) ** 2)
                mask = np.exp(-d2 / (2 * radius[b] ** 2)).astype(np.float32)
                img = img * (1 - mask[..., None]) + mask[..., None] * color[b]
            frames.append(np.clip(img, 0.0, 1.0))
        return np.stack(frames)

    def __getitem__(self, index):
        key = (self.current_set_name, index)
        hit = self._cache.get(key)
        if hit is not None:
            return hit[0], {"imgpaths": list(hit[1])}
        salt = {"train": 0, "val": 10_000, "test": 20_000}[self.current_set_name]
        rng = np.random.RandomState(self.seed + salt + index)
        frames = self._render(rng)
        frames = np.stack([normalize_for_model(f, self.model) for f in frames])
        # the same ndarray object is handed to every caller — make it
        # read-only so an in-place mutation (e.g. a future augmentation
        # path) fails loudly instead of corrupting later epochs. Memory
        # bound: one (T, H, W, 3) f32 clip per (split, index) ever touched.
        frames.setflags(write=False)
        paths = [f"synthetic://{index}/{t}" for t in range(self.num_frames)]
        self._cache[key] = (frames, paths)
        return frames, {"imgpaths": list(paths)}


def get_dataset(name: str, data_root: str, model: str, mode: str,
                crop_size: int = 256, test_mode: str = "hard",
                img_fmt: str = "png"):
    """Dataset dispatch (reference data/__init__.py:535-552). Falls back to
    SyntheticSeptuplet when the requested root is missing."""
    name = name.lower()
    if name == "synthetic":
        return SyntheticSeptuplet(model=model, mode=mode,
                                  size=(crop_size, crop_size))
    if name == "vimeo90k":
        if not os.path.exists(os.path.join(data_root, "sep_trainlist.txt")):
            print(f"[data] {data_root} missing — using SyntheticSeptuplet")
            return SyntheticSeptuplet(model=model, mode=mode,
                                      size=(crop_size, crop_size))
        return VimeoSeptuplet(data_root, model=model, mode=mode,
                              crop_size=crop_size)
    if name == "middlebury":
        return Middlebury(data_root, model=model)
    if name == "davis":
        return DAVIS(data_root, model=model)
    if name == "hd":
        return HDDataset(data_root, model=model)
    if name == "snufilm":
        return SNUFILM(data_root, model=model, test_mode=test_mode)
    if name == "test":
        return VideoDataset(data_root, model=model, img_fmt=img_fmt)
    raise NotImplementedError(f"dataset {name!r}")
