"""Legacy trainer tests (Reptile / FOMAML parity with hand math)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from meta_interpolation_tpu.legacy import reptile_step, fomaml_step
from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer


def tiny_apply(params, f0, f1):
    return params["w"] * (f0 + f1) / 2.0 + params["b"]


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def _frames(seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(2, 7, 4, 4, 3).astype(np.float32))


def test_reptile_moves_toward_adapted():
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.0)}
    frames = _frames()
    new_params, q_loss = reptile_step(tiny_apply, l1, params, frames,
                                      inner_lr=0.1, outer_lr=0.5,
                                      num_steps=2)
    # θ_new must lie strictly between θ and θ' (ε=0.5)
    opt = InnerOptimizer(rule="Adamax", lr_mode="fixed", num_steps=2)
    from meta_interpolation_tpu.legacy.trainers import _adapt
    adapted = _adapt(tiny_apply, l1, params, frames, 0.1, 2)
    for k in params:
        lo, hi = sorted([float(params[k]), float(adapted[k])])
        assert lo <= float(new_params[k]) <= hi
        np.testing.assert_allclose(
            float(new_params[k]),
            float(params[k]) + 0.5 * (float(adapted[k]) - float(params[k])),
            rtol=1e-6)
    assert np.isfinite(float(q_loss))


def test_fomaml_updates_base_params():
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.0)}
    tx = optax.adamax(1e-2)
    opt_state = tx.init(params)
    frames = _frames(1)
    new_params, opt_state, loss = fomaml_step(
        tiny_apply, l1, params, opt_state, tx, frames, inner_lr=0.05,
        num_steps=1)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(new_params["w"] - params["w"])) > 0


def test_mask_freezes_leaves_in_both_loops():
    """DAIN recipe: masked leaves move in NEITHER the inner nor the outer
    update (both reference optimizers are built over rectifyNet only)."""
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    mask = {"w": jnp.asarray(1.0), "b": jnp.asarray(0.0)}
    tx = optax.adamax(1e-2)
    frames = _frames(2)
    new_params, _, _ = fomaml_step(
        tiny_apply, l1, params, tx.init(params), tx, frames,
        inner_lr=0.05, num_steps=2, mask=mask)
    assert float(new_params["b"]) == float(params["b"])
    assert float(jnp.abs(new_params["w"] - params["w"])) > 0
    rep_params, _ = __import__(
        "meta_interpolation_tpu.legacy.trainers",
        fromlist=["reptile_step"]).reptile_step(
        tiny_apply, l1, params, frames, inner_lr=0.05, outer_lr=0.5,
        num_steps=2, mask=mask)
    assert float(rep_params["b"]) == float(params["b"])


def test_legacy_cli_voxelflow_maml(tmp_path):
    """Drive-able legacy trainer e2e: one tiny epoch of
    `python -m meta_interpolation_tpu.legacy.train_voxelflow` on the
    synthetic dataset (train + val + checkpoint)."""
    import os
    from meta_interpolation_tpu.legacy import train_voxelflow

    params = train_voxelflow.main([
        "--dataset", "synthetic", "--crop_size", "64",
        "--batch_size", "1", "--val_batch_size", "1",
        "--max_epoch", "1", "--train_iter", "2", "--val_iter", "1",
        "--logfreq", "1", "--num_inner_update", "1",
        "--exp_name", "legacy_vf_test",
        "--checkpoint_dir", str(tmp_path)])
    assert params is not None
    assert os.path.exists(os.path.join(str(tmp_path), "legacy_vf_test",
                                       "checkpoint.pkl"))


def test_legacy_cli_reptile_validate_only(tmp_path):
    """`--mode test` branch (validate-only) with the Reptile algorithm
    selected — exercises the reptile jit path too via a 1-batch epoch."""
    from meta_interpolation_tpu.legacy import train_voxelflow

    train_voxelflow.main([
        "--dataset", "synthetic", "--crop_size", "64",
        "--batch_size", "1", "--val_batch_size", "1",
        "--meta_algorithm", "reptile", "--max_epoch", "1",
        "--train_iter", "1", "--val_iter", "1", "--logfreq", "1",
        "--exp_name", "legacy_rep_test",
        "--checkpoint_dir", str(tmp_path)])
