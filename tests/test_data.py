"""Data pipeline tests: vimeo layout, loaders, native fast path parity."""
import os

import numpy as np
import pytest
from PIL import Image

from meta_interpolation_tpu.data import datasets as ds_lib
from meta_interpolation_tpu.data.loader import TaskLoader


@pytest.fixture()
def fake_vimeo(tmp_path):
    """Minimal Vimeo90K-septuplet layout with 3 sequences of 7 frames."""
    root = tmp_path / "vimeo"
    seq_names = ["00001/0001", "00001/0002", "00002/0001"]
    rs = np.random.RandomState(0)
    for s in seq_names:
        d = root / "sequences" / s
        os.makedirs(d)
        for i in range(1, 8):
            arr = rs.randint(0, 255, (32, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    (root / "sep_trainlist.txt").write_text("\n".join(seq_names[:2]) + "\n")
    (root / "sep_testlist.txt").write_text(seq_names[2] + "\n")
    return str(root)


def test_vimeo_train_crop_and_shape(fake_vimeo):
    ds = ds_lib.VimeoSeptuplet(fake_vimeo, model="cain", mode="train",
                               crop_size=16)
    assert len(ds) == 2
    frames, meta = ds[0]
    assert frames.shape == (7, 16, 16, 3)
    assert frames.dtype == np.float32
    assert 0.0 <= frames.min() and frames.max() <= 1.0


def test_vimeo_val_full_frames(fake_vimeo):
    ds = ds_lib.VimeoSeptuplet(fake_vimeo, model="cain", mode="val")
    ds.switch_set("val")
    frames, meta = ds[0]
    assert frames.shape == (7, 32, 48, 3)
    assert len(meta["imgpaths"]) == 7


def test_native_loader_path_matches_python(fake_vimeo):
    """The C++ fast path must produce the same pixels as the numpy path
    (identical normalization; augmentation RNG streams are independent, so
    compare in val mode where augmentation is off)."""
    ds = ds_lib.VimeoSeptuplet(fake_vimeo, model="cain", mode="val")
    ds.switch_set("val")
    python_frames, _ = ds[0]

    from meta_interpolation_tpu.data import native
    if native.load() is None:
        pytest.skip("no native toolchain")
    loader = TaskLoader(ds, batch_size=1, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    native_frames = batches[0][0][0]
    np.testing.assert_allclose(native_frames, python_frames, atol=1e-6)


def test_voxelflow_normalization(fake_vimeo):
    ds = ds_lib.VimeoSeptuplet(fake_vimeo, model="voxelflow", mode="val")
    ds.switch_set("val")
    frames, _ = ds[0]
    assert -1.01 <= frames.min() and frames.max() <= 1.01


def test_synthetic_septuplet_midpoint_property():
    """Synthetic scenes use linear motion — frame 3 ≈ midpoint of 2 and 4
    (exactly the structure the meta-learner exploits)."""
    ds = ds_lib.SyntheticSeptuplet(model="cain", mode="val", size=(64, 64))
    frames, _ = ds[0]
    blend_err = np.abs((frames[2] + frames[4]) / 2 - frames[3]).mean()
    far_err = np.abs((frames[0] + frames[6]) / 2 - frames[3]).mean()
    assert blend_err < far_err


def test_middlebury_packing(tmp_path):
    root = tmp_path / "mb"
    rs = np.random.RandomState(1)
    d = root / "other-data-all" / "Beanbags"
    os.makedirs(d)
    for i in range(8):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(
            d / f"frame{i:02d}.png")
    g = root / "other-gt-interp" / "Beanbags"
    os.makedirs(g)
    Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(
        g / "frame10i11.png")
    ds = ds_lib.Middlebury(str(root), model="cain")
    assert len(ds) == 1
    frames, meta = ds[0]
    assert frames.shape == (7, 16, 16, 3)
    # pseudo-septuplet [i0, 0, i1, gt, i2, 0, i3] (middlebury.py:97-99)
    np.testing.assert_allclose(frames[1], 0.0)
    np.testing.assert_allclose(frames[5], 0.0)


def test_video_dataset_sliding_clips(tmp_path):
    root = tmp_path / "vid"
    os.makedirs(root)
    rs = np.random.RandomState(2)
    for i in range(6):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            root / f"frame_{i:03d}.png")
    ds = ds_lib.VideoDataset(str(root), model="cain")
    ds.switch_set("test")
    assert len(ds) == 3  # 6 frames → 3 sliding 4-frame clips
    frames, meta = ds[0]
    assert frames.shape == (4, 8, 8, 3)
    # frames renamed to float-indexed names (video.py:12-26)
    assert all("_0.000000" in p or "_" in p for p in meta["imgpaths"])


def test_hd_dataset_stride2_windows_and_tail(tmp_path):
    """Stride-2 sliding 7-frame windows with the reference's tail rule
    (hd_dataset.py:24-34): once t+7 overruns, every remaining stride step
    appends the final 7-frame window again."""
    root = tmp_path / "hd"
    d = root / "clip0"
    os.makedirs(d)
    rs = np.random.RandomState(3)
    for i in range(9):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            d / f"{i:03d}.png")
    ds = ds_lib.HDDataset(str(root), model="cain")
    # t=0 -> [0..6], t=2 -> [2..8], t=4/6/8 -> last-7 each
    assert len(ds) == 5
    f0, m0 = ds[0]
    assert f0.shape == (7, 8, 8, 3)
    assert [os.path.basename(p) for p in m0["imgpaths"]] == [
        f"{i:03d}.png" for i in range(7)]
    _, m1 = ds[1]
    assert [os.path.basename(p) for p in m1["imgpaths"]] == [
        f"{i:03d}.png" for i in range(2, 9)]
    _, m2 = ds[2]
    assert m2["imgpaths"] == m1["imgpaths"]  # tail repeats last-7

    # a short clip (<7 frames) is served whole (hd_dataset.py:32-33)
    d2 = root / "clip1"
    os.makedirs(d2)
    for i in range(3):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            d2 / f"{i:03d}.png")
    ds2 = ds_lib.HDDataset(str(root), model="cain")
    assert len(ds2) == 5 + 2  # t=0 and t=2 both emit the whole short clip


def test_snufilm_quintuplet_padding(tmp_path):
    """Quintuplet [a,b,c,d,e] → septuplet [a,0,b,c,d,0,e] (snufilm.py:57-58):
    support (0,2,4)=(a,b,d), query (2,4)→3 = (b,d)→c."""
    root = tmp_path / "snu"
    os.makedirs(root)
    rs = np.random.RandomState(4)
    paths = []
    for i in range(5):
        p = root / f"q{i}.png"
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(p)
        paths.append(str(p))
    with open(root / "test-hard-meta.txt", "w") as f:
        f.write(" ".join(paths) + "\n")
    ds = ds_lib.SNUFILM(str(root), model="cain")
    assert len(ds) == 1
    frames, meta = ds[0]
    assert frames.shape == (7, 8, 8, 3)
    np.testing.assert_allclose(frames[1], 0.0)
    np.testing.assert_allclose(frames[5], 0.0)
    # order preserved: slots (0,2,3,4,6) hold (a,b,c,d,e)
    imgs = [np.asarray(Image.open(p), np.float32) / 255.0 for p in paths]
    for slot, img in zip((0, 2, 3, 4, 6), imgs):
        np.testing.assert_allclose(frames[slot], img, atol=1e-6)
    assert meta["imgpaths"][1] == "" and meta["imgpaths"][5] == ""

    # test_mode is honored (the reference hardcodes 'hard'; snufilm.py:16)
    with open(root / "test-easy-meta.txt", "w") as f:
        f.write(" ".join(paths) + "\n" + " ".join(paths) + "\n")
    ds_easy = ds_lib.SNUFILM(str(root), model="cain", test_mode="easy")
    assert len(ds_easy) == 2


def test_davis_sliding_septuplets(tmp_path):
    """DAVIS loader (implemented for real — the reference's davis branch is
    a latent ImportError, data/__init__.py:544-546): JPEGImages/480p layout,
    sliding 7-frame windows with stride 2."""
    root = tmp_path / "davis"
    d = root / "JPEGImages" / "480p" / "bear"
    os.makedirs(d)
    rs = np.random.RandomState(5)
    for i in range(11):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            d / f"{i:05d}.jpg")
    ds = ds_lib.DAVIS(str(root), model="cain")
    # windows start at 0, 2, 4 (4+7=11 fits; 6+7=13 doesn't)
    assert len(ds) == 3
    frames, meta = ds[1]
    assert frames.shape == (7, 8, 8, 3)
    assert [os.path.basename(p) for p in meta["imgpaths"]] == [
        f"{i:05d}.jpg" for i in range(2, 9)]

    # flat layout (no JPEGImages/480p) also works
    root2 = tmp_path / "flat"
    d2 = root2 / "seq"
    os.makedirs(d2)
    for i in range(7):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            d2 / f"{i:03d}.png")
    assert len(ds_lib.DAVIS(str(root2), model="cain")) == 1
