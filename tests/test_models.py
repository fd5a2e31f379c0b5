"""Model zoo forward/grad smoke tests + registry coverage.

Shapes chosen so each model pads minimally (UNet depths need /16-/64
divisibility) while staying CPU-affordable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meta_interpolation_tpu.models import registry


def _frames(h, w, seed=0, batch=1):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.rand(batch, h, w, 3).astype(np.float32)),
            jnp.asarray(rs.rand(batch, h, w, 3).astype(np.float32)))


def test_registry_has_all_backbones():
    names = registry.available()
    for required in ("cain", "rrin", "sepconv", "superslomo", "voxelflow"):
        assert required in names, f"{required} missing from registry"


def test_rrin_forward_and_grad():
    from meta_interpolation_tpu.models import rrin
    p = rrin.init(jax.random.PRNGKey(0))
    f0, f1 = _frames(64, 64)
    out = rrin.apply(p, f0, f1)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # clamp

    g = jax.grad(lambda p: jnp.mean(jnp.abs(rrin.apply(p, f0, f1) - f0)))(p)
    assert all(np.isfinite(float(jnp.sum(jnp.abs(x))))
               for x in jax.tree.leaves(g))

    # reference forward never threads adapted params into the Mask UNet
    # (rrin/model.py:101) — the inner mask excludes it from adaptation
    mask = rrin.inner_mask(p)
    assert float(jax.tree.leaves(mask["Mask"])[0]) == 0.0
    assert float(jax.tree.leaves(mask["Flow_L"])[0]) == 1.0
    assert float(jax.tree.leaves(mask["final"])[0]) == 1.0


def test_superslomo_forward_returns_aux():
    from meta_interpolation_tpu.models import superslomo
    p = superslomo.init(jax.random.PRNGKey(0))
    f0, f1 = _frames(64, 64, seed=1)
    pred, aux = superslomo.apply(p, f0, f1)
    assert pred.shape == (1, 64, 64, 3)
    for key in ("bidirectional_flow", "warped_intermediate_frames",
                "warped_input_frames"):
        assert key in aux
    F01, F10 = aux["bidirectional_flow"]
    assert F01.shape == (1, 64, 64, 2)


def test_superslomo_super_loss_integrates():
    from meta_interpolation_tpu.models import superslomo
    from meta_interpolation_tpu.core.losses import make_loss_fn
    p = superslomo.init(jax.random.PRNGKey(0))
    f0, f1 = _frames(64, 64, seed=2)
    target = (f0 + f1) / 2
    loss_fn = make_loss_fn("1*Super", rng=jax.random.PRNGKey(1))

    def loss(p):
        pred, aux = superslomo.apply(p, f0, f1)
        aux = dict(aux)
        aux["I0"], aux["I1"] = f0, f1
        return loss_fn(pred, target, aux)["total"]

    val, g = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert total > 0


def test_voxelflow_forward_and_bn_freeze():
    from meta_interpolation_tpu.models import voxelflow
    p = voxelflow.init(jax.random.PRNGKey(0))
    f0, f1 = _frames(64, 64, seed=3)
    out = voxelflow.apply(p, f0, f1)
    assert out.shape == (1, 64, 64, 3)
    mask = voxelflow.inner_mask(p)
    # all *_bn leaves masked out
    assert float(jax.tree.leaves(mask["conv1_bn"])[0]) == 0.0
    assert float(jax.tree.leaves(mask["conv1"])[0]) == 1.0


def test_voxelflow_zero_flow_is_blend():
    """With all-zero weights the tanh head gives flow=0, mask=0 →
    output = (frame0 + frame1)/2 (the trilinear blend identity)."""
    from meta_interpolation_tpu.models import voxelflow
    p = voxelflow.init(jax.random.PRNGKey(0))
    p = jax.tree.map(jnp.zeros_like, p)
    p = {**p}
    for k in p:
        if k.endswith("_bn"):
            p[k] = {"scale": jnp.ones_like(p[k]["scale"]),
                    "bias": jnp.zeros_like(p[k]["bias"]),
                    "mean": jnp.zeros_like(p[k]["mean"]),
                    "var": jnp.ones_like(p[k]["var"])}
    f0, f1 = _frames(64, 64, seed=4)
    out = voxelflow.apply(p, f0, f1)
    np.testing.assert_allclose(np.asarray(out), np.asarray((f0 + f1) / 2),
                               atol=1e-5)


def test_sepconv_forward_tiny():
    from meta_interpolation_tpu.models import sepconv as sepconv_model
    p = sepconv_model.init(jax.random.PRNGKey(0))
    f0, f1 = _frames(78, 78, seed=5)  # pads to 128x128
    out = sepconv_model.apply(p, f0, f1, use_pallas=False)
    assert out.shape == (1, 78, 78, 3)
    mask = sepconv_model.inner_mask(p)
    assert float(jax.tree.leaves(mask["moduleVertical1"])[0]) == 0.0
    assert float(jax.tree.leaves(mask["moduleConv1"])[0]) == 1.0


def test_voxelflow_per_step_bn_system_end_to_end():
    """--per_step_bn_statistics on voxelflow: train iterations persist the
    per-step BN running stats (write-back), eval iterations leave them
    untouched (the reference's per-task restore_backup_stats,
    meta_learning_system.py:463-464)."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    cfg = Config(model="voxelflow", batch_size=1, val_batch_size=1,
                 crop_size=32, loss="1*MSE", metasgd=True,
                 number_of_training_steps_per_iter=2,
                 number_of_evaluation_steps_per_iter=2,
                 per_step_bn_statistics=True,
                 enable_inner_loop_optimizable_bn_params=True)
    system = SceneAdaptiveInterpolation(cfg)
    assert "bn_state" in system.meta_params
    st0 = system.meta_params["bn_state"]["conv1_bn"]["running_mean"]
    assert st0.shape == (2, 64)

    rs = np.random.RandomState(7)
    frames = ((rs.rand(1, 7, 32, 32, 3).astype(np.float32) * 255.0
               - 127.5) / 127.5)

    before = np.asarray(st0).copy()
    system.run_train_iter(frames, epoch=0)
    after_train = np.asarray(
        system.meta_params["bn_state"]["conv1_bn"]["running_mean"])
    assert np.abs(after_train - before).max() > 1e-6, \
        "train iteration must update the per-step BN stats"

    snapshot = jax.tree.map(
        lambda x: np.asarray(x).copy(), system.meta_params["bn_state"])
    system.run_validation_iter(frames)
    for a, b in zip(jax.tree.leaves(snapshot),
                    jax.tree.leaves(system.meta_params["bn_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_voxelflow_per_step_bn_affine_end_to_end():
    """--per_step_bn_statistics WITHOUT
    --enable_inner_loop_optimizable_bn_params: BN affine becomes per-step
    (S, C) rows (reference model_utils.py:453-461 self.weight[num_step]),
    outer-trained but never inner-adapted."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    cfg = Config(model="voxelflow", batch_size=1, val_batch_size=1,
                 crop_size=32, loss="1*MSE", metasgd=True,
                 outer_lr=1e-3,
                 number_of_training_steps_per_iter=2,
                 number_of_evaluation_steps_per_iter=2,
                 per_step_bn_statistics=True)
    system = SceneAdaptiveInterpolation(cfg)
    net = system.meta_params["net"]
    assert net["conv1_bn"]["scale"].shape == (2, 64)
    assert net["conv1_bn"]["bias"].shape == (2, 64)
    # running stats stay flat in the net tree (the per-step stats live in
    # meta_params['bn_state'])
    assert net["conv1_bn"]["mean"].shape == (64,)

    rs = np.random.RandomState(9)
    frames = ((rs.rand(1, 7, 32, 32, 3).astype(np.float32) * 255.0
               - 127.5) / 127.5)

    scale_before = np.asarray(net["conv1_bn"]["scale"]).copy()
    stats_before = np.asarray(
        system.meta_params["bn_state"]["conv1_bn"]["running_mean"]).copy()
    system.run_train_iter(frames, epoch=0)
    scale_after = np.asarray(
        system.meta_params["net"]["conv1_bn"]["scale"])
    assert np.abs(scale_after - scale_before).max() > 1e-8, \
        "per-step affine rows are outer-trainable (requires_grad=True)"
    stats_after = np.asarray(
        system.meta_params["bn_state"]["conv1_bn"]["running_mean"])
    assert np.abs(stats_after - stats_before).max() > 1e-6

    # eval must not touch the meta-level per-step stats
    snapshot = jax.tree.map(
        lambda x: np.asarray(x).copy(), system.meta_params["bn_state"])
    system.run_validation_iter(frames)
    for a, b in zip(jax.tree.leaves(snapshot),
                    jax.tree.leaves(system.meta_params["bn_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_step_bn_requires_model_support():
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    with pytest.raises(ValueError, match="per_step_bn_statistics"):
        SceneAdaptiveInterpolation(Config(model="cain", depth=2,
                                          n_resblocks=1, crop_size=32,
                                          per_step_bn_statistics=True))


def test_system_per_group_fuse_patch_trains_and_evals():
    """Per-group fuse_pad lists have no CLI flag; the serving scripts
    patch ``system.model_kwargs['fuse_pad']`` and rebuild
    ``builder.apply_fn`` (scripts/serving_pareto.py, the RZZZZ-native
    preset in scripts/train_synth_ckpt.py). Pin that pattern end-to-end:
    a patched system must train (finite loss, params move) and its
    validation forward must actually use the patched graph (differ from
    the scalar zero-fuse graph on the same weights)."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    def build(fuse_groups=None):
        cfg = Config(model="cain", depth=2, n_resblocks=1, crop_size=32,
                     batch_size=1, val_batch_size=1, loss="1*L1",
                     metasgd=True, optimizer="Adam", inner_lr=1e-5,
                     outer_lr=1e-3, pad_multiple=8, fuse_pad="true")
        system = SceneAdaptiveInterpolation(cfg)
        if fuse_groups is not None:
            system.model_kwargs["fuse_pad"] = fuse_groups
            system.builder.apply_fn = system._apply_fn()
        return system

    rs = np.random.RandomState(11)
    frames = ((rs.rand(1, 7, 32, 32, 3).astype(np.float32) * 255.0
               - 127.5) / 127.5)

    rzzzz = ["reflect"] + [True] * 4
    system = build(rzzzz)
    w_before = np.asarray(
        jax.tree.leaves(system.meta_params["net"])[0]).copy()
    losses, _ = system.run_train_iter(frames, epoch=0)
    assert np.isfinite(losses["loss"])
    w_after = np.asarray(jax.tree.leaves(system.meta_params["net"])[0])
    assert np.abs(w_after - w_before).max() > 0.0

    # same weights, patched vs scalar zero-fuse graph: predictions differ
    # (the first group's reflect borders change the forward), proving the
    # patch reached the episode apply_fn
    plain = build(None)
    plain.load_state_dict(system.state_dict())
    patched = build(rzzzz)
    patched.load_state_dict(system.state_dict())
    _, pred_plain = plain.run_validation_iter(frames)
    _, pred_patched = patched.run_validation_iter(frames)
    assert np.abs(np.asarray(pred_patched, np.float32)
                  - np.asarray(pred_plain, np.float32)).max() > 1e-6
