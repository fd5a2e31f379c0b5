"""Checkpoint store + torch .pth import tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from meta_interpolation_tpu.core import checkpoint as ckpt


def test_save_load_roundtrip(tmp_path):
    state = {"epoch": 3, "best_PSNR": 31.5,
             "system": {"meta_params": {"net": {"w": jnp.ones((2, 3))}},
                        "epoch": 3}}
    ckpt.save_checkpoint(state, str(tmp_path), is_best=True)
    assert os.path.exists(tmp_path / "checkpoint.pkl")
    assert os.path.exists(tmp_path / "model_best.pkl")
    loaded = ckpt.load_checkpoint(str(tmp_path))
    assert loaded["epoch"] == 3
    np.testing.assert_allclose(loaded["system"]["meta_params"]["net"]["w"],
                               np.ones((2, 3)))


def test_torch_state_dict_conversion_conv_and_linear():
    sd = {
        "encoder.interpolate.headConv.weight": np.arange(
            2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3),  # OIHW
        "encoder.interpolate.headConv.bias": np.zeros(2, np.float32),
        "fc.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
        "fc.bias": np.ones(2, np.float32),
        "bn.weight": np.ones(4, np.float32),
        "bn.bias": np.zeros(4, np.float32),
        "bn.running_mean": np.zeros(4, np.float32),
        "bn.running_var": np.ones(4, np.float32),
        "bn.num_batches_tracked": np.asarray(7),
    }
    tree = ckpt.torch_state_dict_to_pytree(sd)
    conv = tree["encoder"]["interpolate"]["headConv"]
    assert conv["kernel"].shape == (3, 3, 3, 2)  # HWIO
    # OIHW→HWIO: kernel[h,w,i,o] == sd[o,i,h,w]
    np.testing.assert_allclose(np.asarray(conv["kernel"])[1, 2, 0, 1],
                               sd["encoder.interpolate.headConv.weight"][1, 0, 1, 2])
    assert tree["fc"]["kernel"].shape == (3, 2)
    assert set(tree["bn"]) == {"scale", "bias", "mean", "var"}


def test_lossy_merge_skips_mismatches():
    target = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}
    loaded = {"a": jnp.ones((2, 2)), "b": jnp.ones((4,))}  # b mismatched
    merged = ckpt.lossy_merge(target, loaded, verbose=False)
    np.testing.assert_allclose(np.asarray(merged["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["b"]), 0.0)


def test_import_pth_from_real_torch_file(tmp_path):
    """End-to-end .pth import: a torch Conv2d module's state_dict must land
    in our tree and reproduce the same convolution output."""
    import torch.nn as nn
    import torch.nn.functional as F
    from meta_interpolation_tpu.models import layers

    torch.manual_seed(0)
    mod = nn.Conv2d(3, 5, 3, padding=1)
    path = str(tmp_path / "weights.pth")
    torch.save({"state_dict": {"conv." + k: v for k, v in
                               mod.state_dict().items()}}, path)

    target = {"conv": layers.conv_init(jax.random.PRNGKey(0), 3, 5, 3)}
    merged = ckpt.import_pth(path, target)

    x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    ours = layers.conv2d(merged["conv"], jnp.asarray(x), padding=1)
    with torch.no_grad():
        theirs = mod(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_fix_loaded_freezes_loaded_leaves():
    """--fix_loaded: leaves that lossy_merge actually loaded get frozen in
    the outer trainable mask (reference utils.py:79-84)."""
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    cfg = Config(model="cain", depth=2, n_resblocks=1, crop_size=16,
                 batch_size=1)
    system = SceneAdaptiveInterpolation(cfg)
    net = system.meta_params["net"]
    # fake 'loaded' tree: only headConv matched
    partial = {"encoder": {"interpolate": {
        "headConv": jax.tree.map(lambda x: np.asarray(x) * 0 + 1.0,
                                 net["encoder"]["interpolate"]["headConv"])}}}
    merged, mask = ckpt.lossy_merge(net, partial, verbose=False,
                                    return_mask=True)
    assert mask["encoder"]["interpolate"]["headConv"]["kernel"] is True
    assert mask["encoder"]["interpolate"]["tailConv"]["kernel"] is False
    system.meta_params["net"] = merged
    system.freeze_loaded(mask)
    tm = system._trainable_mask["net"]["encoder"]["interpolate"]
    assert tm["headConv"]["kernel"] is False   # loaded -> frozen
    assert tm["tailConv"]["kernel"] is True    # unloaded -> still trains


def test_state_dict_round_trips_scheduler():
    """Resume must carry the plateau scheduler (a fresh scheduler would
    reset a decayed LR back to cfg.outer_lr on the first epoch_end)."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    cfg = Config(model="cain", depth=2, n_resblocks=1, crop_size=32,
                 outer_lr=1e-4)
    sys1 = SceneAdaptiveInterpolation(cfg)
    # drive the scheduler into a decayed state: 1 improvement + patience+1
    # bad epochs (factor 0.2, patience 5)
    sys1.epoch_end(1.0)
    for _ in range(6):
        sys1.epoch_end(2.0)
    assert abs(sys1.scheduler.lr - 2e-5) < 1e-12
    state = sys1.state_dict()

    sys2 = SceneAdaptiveInterpolation(cfg)
    sys2.load_state_dict(state)
    assert abs(sys2.scheduler.lr - sys1.scheduler.lr) < 1e-12
    assert sys2.scheduler.best == sys1.scheduler.best
    assert sys2.scheduler.bad_epochs == sys1.scheduler.bad_epochs


def test_init_from_keeps_configured_outer_lr():
    """restore_opt=False (the --init_from path) must keep the freshly
    configured outer LR — restoring opt_state whole re-pins the SOURCE
    checkpoint's LR via optax.inject_hyperparams' opt_state.hyperparams
    (VERDICT r4: a 1e-5 migration fine-tune bitwise-reproduced the 1e-4
    run). One train step at 1e-5 must move params ~10x less than 1e-4."""
    import jax.numpy as jnp
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    src_cfg = Config(model="cain", depth=2, n_resblocks=1, crop_size=16,
                     batch_size=1, metasgd=True, outer_lr=1e-4)
    src = SceneAdaptiveInterpolation(src_cfg)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(1, 7, 16, 16, 3), jnp.float32)
    src.run_train_iter(frames, 0)  # opt_state now carries lr=1e-4 + moments
    state = src.state_dict()

    def step_delta(outer_lr, restore_opt):
        cfg = Config(model="cain", depth=2, n_resblocks=1, crop_size=16,
                     batch_size=1, metasgd=True, outer_lr=outer_lr)
        s = SceneAdaptiveInterpolation(cfg)
        s.load_state_dict(state, restore_opt=restore_opt)
        hp = s.opt_state.hyperparams["learning_rate"]
        before = jax.tree.map(np.asarray, s.meta_params["net"])
        s.run_train_iter(frames, 0)
        delta = sum(float(np.abs(np.asarray(a) - b).sum()) for a, b in zip(
            jax.tree.leaves(s.meta_params["net"]), jax.tree.leaves(before)))
        return float(hp), delta

    lr_kept, d_restored = step_delta(1e-5, restore_opt=True)
    lr_fresh, d_fresh = step_delta(1e-5, restore_opt=False)
    # the bug: restore_opt=True silently overrides the configured 1e-5
    # (hyperparams leaves live as float32 on device — compare loosely)
    assert abs(lr_kept - 1e-4) < 1e-9
    assert abs(lr_fresh - 1e-5) < 1e-10
    # ...and the first step actually moves ~10x less. Fresh Adam moments
    # make the very first update ~lr-proportional in both cases; allow
    # slack for the restored-moments difference.
    assert d_fresh < d_restored / 3.0, (d_fresh, d_restored)
