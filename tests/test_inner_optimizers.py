"""Inner-loop optimizer math vs. hand-computed reference semantics.

The expected values re-derive the update equations of
/root/reference/inner_loop_optimizers.py (β1=0.9, β2=0.99, eps=1e-8;
Adam :150-198, Adamax :201-244) in numpy, independently.
"""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.meta.inner_optimizers import (
    InnerOptimizer, BETA1, BETA2, EPS)


def _tree(x):
    return {"w": jnp.asarray(x, jnp.float32)}


def test_sgd_lslr_per_step_lr():
    opt = InnerOptimizer(rule="SGD", lr_mode="lslr", num_steps=2)
    params = _tree([1.0, 2.0])
    lrs = {"w": jnp.asarray([0.1, 0.2, 0.3])}
    grads = _tree([1.0, 1.0])
    state = opt.init_state(params)
    p1, state = opt.update(params, grads, lrs, state, 0)
    np.testing.assert_allclose(np.asarray(p1["w"]), [0.9, 1.9], rtol=1e-6)
    p2, state = opt.update(p1, grads, lrs, state, 1)
    np.testing.assert_allclose(np.asarray(p2["w"]), [0.7, 1.7], rtol=1e-6)


def test_adam_two_steps_matches_hand_math():
    opt = InnerOptimizer(rule="Adam", lr_mode="fixed", num_steps=2)
    w = np.array([1.0], np.float32)
    g1 = np.array([0.5], np.float32)
    g2 = np.array([-0.3], np.float32)
    lr = 0.01

    params = _tree(w)
    lrs = opt.init_lrs(params, lr)
    state = opt.init_state(params)
    p1, state = opt.update(params, _tree(g1), lrs, state, 0)
    p2, state = opt.update(p1, _tree(g2), lrs, state, 1)

    # hand math (reference update_adam :159-196)
    m = (1 - BETA1) * g1
    v = (1 - BETA2) * g1 * g1
    denom = np.sqrt(v) / np.sqrt(1 - BETA2 ** 1) + EPS
    w1 = w - (lr / (1 - BETA1 ** 1)) * m / denom
    m = BETA1 * m + (1 - BETA1) * g2
    v = BETA2 * v + (1 - BETA2) * g2 * g2
    denom = np.sqrt(v) / np.sqrt(1 - BETA2 ** 2) + EPS
    w2 = w1 - (lr / (1 - BETA1 ** 2)) * m / denom

    np.testing.assert_allclose(np.asarray(p1["w"]), w1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["w"]), w2, rtol=1e-6)


def test_adamax_matches_hand_math():
    opt = InnerOptimizer(rule="Adamax", lr_mode="fixed", num_steps=1)
    w = np.array([2.0, -1.0], np.float32)
    g = np.array([0.4, -0.2], np.float32)
    lr = 0.05

    params = _tree(w)
    lrs = opt.init_lrs(params, lr)
    state = opt.init_state(params)
    p1, state = opt.update(params, _tree(g), lrs, state, 0)

    # reference update_adamax :226-242: u = max(beta2*u, |g| + eps)
    m = (1 - BETA1) * g
    u = np.maximum(BETA2 * 0.0, np.abs(g) + EPS)
    w1 = w - (lr / (1 - BETA1 ** 1)) * m / u
    np.testing.assert_allclose(np.asarray(p1["w"]), w1, rtol=1e-6)


def test_metasgd_lr_shapes_match_params():
    opt = InnerOptimizer(rule="SGD", lr_mode="metasgd", num_steps=1)
    params = {"a": jnp.zeros((3, 4)), "b": jnp.zeros((5,))}
    lrs = opt.init_lrs(params, 1e-3)
    assert lrs["a"].shape == (3, 4)
    assert lrs["b"].shape == (5,)
    # per-element lr actually applied
    grads = {"a": jnp.ones((3, 4)), "b": jnp.ones((5,))}
    lrs = {"a": jnp.full((3, 4), 0.1), "b": jnp.full((5,), 0.2)}
    state = opt.init_state(params)
    p, _ = opt.update(params, grads, lrs, state, 0)
    np.testing.assert_allclose(np.asarray(p["a"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["b"]), -0.2, rtol=1e-6)


def test_second_order_gradients_flow_through_sgd():
    """grad-of-grad through the functional inner step must differ from the
    first-order (stop_gradient) path.

    Uses SGD: a *single* Adam step is ≈ lr·sign(g) (denom=|g|+eps at step 1),
    whose derivative w.r.t. params is O(eps) — first- and second-order
    correctly coincide there, so SGD is the discriminating rule.
    """
    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=1)

    x = jnp.asarray([1.0, 2.0])
    y = jnp.asarray([0.5, 1.5])

    def inner_then_outer(w0, second_order):
        params = {"w": w0}
        lrs = opt.init_lrs(params, 0.1)
        state = opt.init_state(params)

        def support_loss(p):
            return jnp.mean((p["w"] * x - y) ** 2)

        grads = jax.grad(support_loss)(params)
        if not second_order:
            grads = jax.lax.stop_gradient(grads)
        p1, _ = opt.update(params, grads, lrs, state, 0)
        return jnp.mean((p1["w"] * y - x) ** 2)

    w0 = jnp.asarray([0.3, -0.2])
    g_so = jax.grad(lambda w: inner_then_outer(w, True))(w0)
    g_fo = jax.grad(lambda w: inner_then_outer(w, False))(w0)
    assert np.all(np.isfinite(np.asarray(g_so)))
    assert not np.allclose(np.asarray(g_so), np.asarray(g_fo))


def test_second_order_adam_finite_at_zero_grad_leaves():
    """Second-order gradients through the inner Adam must stay finite even
    for leaves whose inner gradient is exactly zero (sqrt'(0)=inf without
    the guard — the classic MAML-Adam NaN)."""
    opt = InnerOptimizer(rule="Adam", lr_mode="fixed", num_steps=1)
    x = jnp.asarray([1.0, 2.0])

    def inner_then_outer(w0):
        params = {"w": w0, "unused": jnp.asarray(3.0)}  # zero inner grad
        lrs = opt.init_lrs(params, 0.01)
        state = opt.init_state(params)

        def support_loss(p):
            return jnp.mean((p["w"] * x) ** 2) + 0.0 * p["unused"]

        grads = jax.grad(support_loss)(params)
        p1, _ = opt.update(params, grads, lrs, state, 0)
        return jnp.mean(p1["w"] ** 2) + p1["unused"] ** 2

    g = jax.grad(inner_then_outer)(jnp.asarray([0.5, -0.5]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_voxelflow_outer_adam_policies():
    """VoxelFlow+Adam outer optimizer mirrors get_optim_policies
    (voxel_flow.py:307-350): bias leaves step at 2x lr with no weight
    decay; weight leaves get additive L2 decay; torch-default betas."""
    import optax
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import make_outer_optimizer

    cfg = Config(model="voxelflow", optimizer="Adam", outer_lr=1e-3,
                 weight_decay=0.0)
    tx = make_outer_optimizer(cfg)
    params = {"net": {"conv": {"kernel": jnp.ones((2, 2)),
                               "bias": jnp.ones((2,))}}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    uk = float(updates["net"]["conv"]["kernel"][0, 0])
    ub = float(updates["net"]["conv"]["bias"][0])
    assert abs(ub / uk - 2.0) < 1e-5, (uk, ub)  # bias 2x lr

    # decay hits weights only (equal grads, params=1: weight grad gets +wd)
    cfg2 = Config(model="voxelflow", optimizer="Adam", outer_lr=1e-3,
                  weight_decay=0.5)
    tx2 = make_outer_optimizer(cfg2)
    state2 = tx2.init(params)
    up2, _ = tx2.update(grads, state2, params)
    # with decay the weight's effective grad is 1.5 vs bias 1.0: adam
    # normalizes magnitudes, but the first-step m/sqrt(v) is sign-scaled
    # identically — compare against the no-decay update to see decay only
    # touched the weight leaf
    assert abs(float(up2["net"]["conv"]["bias"][0]) - ub) < 1e-7


def test_voxelflow_bn_policies_and_buffer_freeze():
    """BN affine leaves get [1x lr, decay]; BN running stats are buffers —
    outer-masked so weight decay cannot move them (reference
    get_optim_policies collects only parameters(), :321-329)."""
    import optax
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import make_outer_optimizer
    from meta_interpolation_tpu.models import voxelflow as vf

    cfg = Config(model="voxelflow", optimizer="Adam", outer_lr=1e-3,
                 weight_decay=0.5)
    tx = make_outer_optimizer(cfg)
    params = {"net": {"conv1": {"kernel": jnp.ones((2, 2))},
                      "conv1_bn": {"scale": jnp.ones((2,)),
                                   "bias": jnp.zeros((2,)),
                                   "mean": jnp.full((2,), 3.0),
                                   "var": jnp.ones((2,))}},
              "lrs": {"conv1": {"kernel": jnp.full((2, 2), 1e-5)}}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)  # masked-out grads
    updates, _ = tx.update(grads, state, params)
    bn = updates["net"]["conv1_bn"]
    # decay reaches BN scale (param 1.0, zero grad -> nonzero update)
    assert abs(float(bn["scale"][0])) > 0
    # the outer mask marks buffers False; train_step masks UPDATES with it,
    # so even though add_decayed_weights produced a mean/var update here,
    # the masked update is zero:
    omask = vf.outer_mask(params["net"])
    assert omask["conv1_bn"]["mean"] is False
    assert omask["conv1_bn"]["var"] is False
    assert omask["conv1_bn"]["scale"] is True
    masked_mean = float(bn["mean"][0]) * float(omask["conv1_bn"]["mean"])
    assert masked_mean == 0.0
    # inner LRs: plain policy, no decay (zero grads -> zero update)
    assert abs(float(updates["lrs"]["conv1"]["kernel"][0, 0])) == 0.0
