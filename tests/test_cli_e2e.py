"""Real-data day-one path: drive ``main.py`` end-to-end over tiny FAKE
on-disk dataset trees (VERDICT r3 item 4).

No Vimeo90K / HD / SNU-FILM / Middlebury data or released ``.pth`` weights
exist in this environment, so these tests pin the exact path a user with
real data hits on day one: the CLI entry (`main(argv)`) → dataset dispatch
by directory layout (reference data/__init__.py:535-552) → loader →
[tiling] → stitched-frame metrics (experiment_builder.py:131-141) → image
save — and assert the RETURNED PSNR equals a value recomputed directly
from the saved prediction file vs the on-disk ground truth.

A tiny random-init CAIN (depth 2, 1 resblock) keeps each drive to a few
seconds of CPU; the PSNR is poor but exact and deterministic.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from meta_interpolation_tpu.core import metrics as metrics_lib
from meta_interpolation_tpu.main import main


def _write_frame(path: str, seed: int, h: int = 48, w: int = 64):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(seed)
    # smooth-ish content (pure noise makes PSNR insensitive to bugs)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.5 + 0.4 * np.sin(xx / 7.0 + seed) * np.cos(yy / 5.0 - seed)
    img = np.stack([img, np.roll(img, seed, 0), img.T[:h, :w] if h == w
                    else np.roll(img, seed, 1)], -1)
    img = np.clip(img + 0.05 * rs.rand(h, w, 3), 0, 1)
    Image.fromarray((img * 255).astype(np.uint8)).save(path)


def _cli(dataset: str, data_root: str, ckpt_dir: str, extra=()):
    return ["--model", "cain", "--depth", "2", "--n_resblocks", "1",
            "--mode", "val", "--dataset", dataset, "--data_root", data_root,
            "--checkpoint_dir", ckpt_dir, "--exp_name", "e2e",
            "--val_batch_size", "1", "--viz", "--episode_parallel", "false",
            "--loss", "1*L1", "--inner_lr", "1e-5"] + list(extra)


def _saved_pngs(ckpt_dir: str, dataset: str):
    out_root = os.path.join(ckpt_dir, "e2e", dataset)
    assert os.path.isdir(out_root), f"no saved images under {out_root}"
    return sorted(os.path.join(out_root, f)
                  for f in os.listdir(out_root) if f.endswith(".png"))


def _psnr_files(pred_path: str, gt_path: str) -> float:
    pred = np.asarray(Image.open(pred_path), np.float32) / 255.0
    gt = np.asarray(Image.open(gt_path).convert("RGB"), np.float32) / 255.0
    p, _s = metrics_lib.calc_metrics(jnp.asarray(pred), jnp.asarray(gt))
    return float(p)


# PNG save rounds x*255+0.5 down (half-up) while the metric quantize uses
# jnp.round (half-even); continuous float predictions make exact .5 hits
# measure-zero, so the file-recomputed PSNR matches to well under this
PSNR_TOL = 0.02


def test_cli_val_vimeo_fake_tree(tmp_path):
    root = str(tmp_path / "vimeo")
    seq = os.path.join(root, "sequences", "00001", "0001")
    for i in range(1, 8):
        _write_frame(os.path.join(seq, f"im{i}.png"), seed=i)
    for name in ("sep_trainlist.txt", "sep_testlist.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("00001/0001\n")
    ckpt = str(tmp_path / "ckpt")

    stats = main(_cli("vimeo90k", root, ckpt))
    saved = _saved_pngs(ckpt, "vimeo90k")
    assert len(saved) == 1
    got = _psnr_files(saved[0], os.path.join(seq, "im4.png"))
    assert abs(stats["psnr"] - got) < PSNR_TOL, (stats["psnr"], got)


def test_cli_val_hd_fake_tree_with_tiling(tmp_path, monkeypatch):
    """HD layout (dirs of PNG sequences, stride-2 septuplet windows) AND
    the recursive tiling path: the tile limit is patched below the frame
    area so the driver splits, stitches, and reports the stitched-frame
    PSNR (reference experiment_builder.py:103-128,131-141) — the
    file-recomputed value only matches if stitching happened correctly."""
    root = str(tmp_path / "hd")
    for i in range(7):
        _write_frame(os.path.join(root, "seq0", f"f{i:03d}.png"), seed=10 + i)
    ckpt = str(tmp_path / "ckpt")

    from meta_interpolation_tpu.models import registry
    model_def = registry.get("cain")
    monkeypatch.setattr(model_def, "tile_pixel_limit", 2000.0)  # 48*64=3072

    stats = main(_cli("hd", root, ckpt))
    saved = _saved_pngs(ckpt, "hd")
    assert len(saved) == 1
    got = _psnr_files(saved[0],
                      os.path.join(root, "seq0", "f003.png"))
    assert abs(stats["psnr"] - got) < PSNR_TOL, (stats["psnr"], got)


def test_cli_val_snufilm_fake_tree(tmp_path):
    root = str(tmp_path / "snufilm")
    paths = []
    for i in range(5):
        p = os.path.join(root, "frames", f"q{i}.png")
        _write_frame(p, seed=20 + i)
        paths.append(p)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "test-hard-meta.txt"), "w") as f:
        f.write(" ".join(paths) + "\n")
    ckpt = str(tmp_path / "ckpt")

    stats = main(_cli("snufilm", root, ckpt))
    saved = _saved_pngs(ckpt, "snufilm")
    assert len(saved) == 1
    # quintuplet [a,b,c,d,e] → septuplet [a,0,b,c,d,0,e]; query target = c
    got = _psnr_files(saved[0], paths[2])
    assert abs(stats["psnr"] - got) < PSNR_TOL, (stats["psnr"], got)


def test_cli_val_middlebury_fake_tree(tmp_path):
    root = str(tmp_path / "mb")
    seq = os.path.join(root, "other-data-all", "Beanbags")
    for i in range(8):
        _write_frame(os.path.join(seq, f"frame{i:02d}.png"), seed=30 + i)
    gt = os.path.join(root, "other-gt-interp", "Beanbags", "frame10i11.png")
    _write_frame(gt, seed=99)
    ckpt = str(tmp_path / "ckpt")

    stats = main(_cli("middlebury", root, ckpt))
    saved = _saved_pngs(ckpt, "middlebury")
    assert len(saved) == 1
    got = _psnr_files(saved[0], gt)
    assert abs(stats["psnr"] - got) < PSNR_TOL, (stats["psnr"], got)


def test_cli_test_video_dir(tmp_path):
    """--mode test on a custom frame dir (reference data/video.py +
    experiment_builder.py:184-209): frames are renamed to _0.000000 float
    indices, and the synthesized midpoints land BETWEEN the inputs
    (float_ind2==0 → 1.0, :201-202) — never overwriting them."""
    root = str(tmp_path / "vid")
    for i in range(5):
        _write_frame(os.path.join(root, f"frame{i:03d}.png"), seed=40 + i)
    ckpt = str(tmp_path / "ckpt")

    before = {f for f in os.listdir(root)}
    argv = ["--model", "cain", "--depth", "2", "--n_resblocks", "1",
            "--mode", "test", "--dataset", "test", "--data_root", root,
            "--checkpoint_dir", ckpt, "--exp_name", "e2e",
            "--test_batch_size", "1", "--episode_parallel", "false"]
    count = main(argv)
    files = sorted(os.listdir(root))
    renamed = {f"frame{i:03d}_0.000000.png" for i in range(5)}
    assert renamed <= set(files), files
    # 5 frames → 2 sliding 4-clips → 2 midpoints at _0.500000 between
    # inputs (clip k synthesizes between frames k+1 and k+2)
    assert count == 2
    mids = [f for f in files if f.endswith("_0.500000.png")]
    assert sorted(mids) == ["frame001_0.500000.png",
                            "frame002_0.500000.png"], files
    # inputs intact (renamed, not overwritten): originals were moved
    assert len(files) == len(before) + 2

    # re-run doubles the frame rate again: new midpoints at 0.25/0.75
    count2 = main(argv)
    assert count2 == 4
    files2 = sorted(os.listdir(root))
    assert "frame001_0.250000.png" in files2
    assert "frame001_0.750000.png" in files2


def test_cli_val_davis_fake_tree(tmp_path):
    """DAVIS layout (JPEGImages/480p/<seq>/*.jpg) — the reference
    DISPATCHES to a data.davis module that does not exist
    (data/__init__.py:544-546); implemented for real here."""
    root = str(tmp_path / "davis")
    seq = os.path.join(root, "JPEGImages", "480p", "bear")
    for i in range(7):
        p = os.path.join(seq, f"{i:05d}.jpg")
        os.makedirs(seq, exist_ok=True)
        _write_frame(p.replace(".jpg", ".png"), seed=50 + i)
        os.rename(p.replace(".jpg", ".png"), p)
    ckpt = str(tmp_path / "ckpt")

    stats = main(_cli("davis", root, ckpt))
    saved = _saved_pngs(ckpt, "davis")
    assert len(saved) == 1
    assert np.isfinite(stats["psnr"])


def test_cli_pretrained_pth_loading(tmp_path):
    """Day-one released-weights path through the REAL CLI: a torch-saved
    .pth state_dict loads via --pretrained_model (converter + lossy merge,
    reference meta_learning_system.py:159-171), changes the predictions,
    and --fix_loaded freezes the loaded leaves (utils.py:79-84)."""
    import torch
    from meta_interpolation_tpu.models import cain

    root = str(tmp_path / "vimeo")
    seq = os.path.join(root, "sequences", "00001", "0001")
    for i in range(1, 8):
        _write_frame(os.path.join(seq, f"im{i}.png"), seed=60 + i)
    for name in ("sep_trainlist.txt", "sep_testlist.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("00001/0001\n")

    # a DIFFERENT tiny-CAIN init exported in torch layout/naming
    donor = cain.init(jax.random.PRNGKey(99), depth=2, n_resblocks=1)
    sd = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k + ".")
            elif k == "kernel":
                sd[prefix + "weight"] = torch.from_numpy(
                    np.asarray(v).transpose(3, 2, 0, 1).copy())
            else:
                sd[prefix + k] = torch.from_numpy(np.asarray(v).copy())

    walk(donor, "")
    pth = str(tmp_path / "donor.pth")
    torch.save(sd, pth)

    ckpt_a = str(tmp_path / "ckpt_a")
    ckpt_b = str(tmp_path / "ckpt_b")
    stats_plain = main(_cli("vimeo90k", root, ckpt_a))
    stats_loaded = main(_cli("vimeo90k", root, ckpt_b,
                             extra=["--pretrained_model", pth,
                                    "--fix_loaded"]))
    # the loaded weights must actually reach the forward
    pa = _saved_pngs(ckpt_a, "vimeo90k")[0]
    pb = _saved_pngs(ckpt_b, "vimeo90k")[0]
    a = np.asarray(Image.open(pa), np.float32)
    b = np.asarray(Image.open(pb), np.float32)
    assert np.abs(a - b).max() > 0, "pretrained weights had no effect"
    # and the returned PSNR still matches the saved file (pipeline intact)
    got = _psnr_files(pb, os.path.join(seq, "im4.png"))
    assert abs(stats_loaded["psnr"] - got) < PSNR_TOL
