"""Image / video export (reference utils.py:276-387)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_image(img01: np.ndarray, path: str):
    """Save an HWC [0,1] float image as PNG (reference utils.save_image)."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def save_batch_images(preds, paths_meta, out_root: str, target_idx: int = 3):
    """Save predicted frames next to their source paths, reference-style
    (experiment_builder.py:227-234 writes .../im4.png under the exp dir)."""
    saved = []
    preds = np.asarray(preds)
    for b in range(preds.shape[0]):
        imgpaths = paths_meta[b]["imgpaths"]
        name = str(imgpaths[target_idx]).replace("/", "_").replace(":", "")
        path = os.path.join(out_root, f"{name or f'pred_{b}'}.png")
        save_image(preds[b], path)
        saved.append(path)
    return saved


def make_video(frame_dir: str, out_path: str, fps: int = 30,
               img_fmt: str = "png") -> Optional[str]:
    """Assemble frames into a video via ffmpeg if present (utils.py:362-387);
    silently skipped when ffmpeg is unavailable."""
    import glob
    import shutil
    import subprocess
    if shutil.which("ffmpeg") is None:
        print("[viz] ffmpeg not found — skipping video export")
        return None
    pattern = os.path.join(frame_dir, f"*.{img_fmt}")
    if not glob.glob(pattern):
        return None
    cmd = ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob",
           "-i", pattern, "-pix_fmt", "yuv420p", out_path]
    subprocess.run(cmd, check=False, capture_output=True)
    return out_path
