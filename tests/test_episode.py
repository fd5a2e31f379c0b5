"""Episode engine tests on a tiny linear model.

Checks the scan-based MAML episode against a hand-unrolled python loop
(the structure the reference implements at meta_learning_system.py:366-432),
plus the MSL importance vector math (:186-210) and L2F plumbing (:231-272).
"""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.meta.episode import (
    EpisodeBuilder, EpisodeSpec, per_step_loss_importance, init_attenuator)
from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer


def tiny_apply(params, f0, f1):
    """A 1-parameter 'interpolator': w * (f0+f1)/2 + b."""
    return params["w"] * (f0 + f1) / 2.0 + params["b"]


def tiny_loss(pred, target, aux=None):
    l = jnp.mean((pred - target) ** 2)
    return {"MSE": l, "total": l}


def make_frames(T=7, H=4, W=4, C=3, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(T, H, W, C).astype(np.float32))


def test_msl_vector_matches_reference_math():
    # reference get_per_step_loss_importance_vector, num_steps=3
    n, epochs = 3, 10
    for epoch in range(4):
        w = per_step_loss_importance(n, epoch, epochs)
        decay = 1.0 / n / epochs
        exp = np.ones(n) / n
        for i in range(n - 1):
            exp[i] = max(exp[i] - epoch * decay, 0.03 / n)
        exp[-1] = min(exp[-1] + epoch * (n - 1) * decay, 1.0 - (n - 1) * 0.03 / n)
        np.testing.assert_allclose(w, exp, rtol=1e-6)
    assert per_step_loss_importance(0, 5, 1).tolist() == [1.0]


def _builder(rule="SGD", lr_mode="fixed", num_steps=2):
    opt = InnerOptimizer(rule=rule, lr_mode=lr_mode, num_steps=num_steps)
    return EpisodeBuilder(tiny_apply, tiny_loss, opt), opt


def test_adapt_matches_hand_unrolled_loop():
    builder, opt = _builder(num_steps=2)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.05)
    frames = make_frames()
    spec = EpisodeSpec(num_steps=2, second_order=True)

    adapted, _, _, _ = builder.adapt(params, lrs, frames, spec)

    # hand-unrolled: two SGD steps on support loss
    p = dict(params)
    for _step in range(2):
        def support_loss(p_):
            total = 0.0
            for (i0, it, i1) in spec.support_idxs:
                pred = tiny_apply(p_, frames[i0][None], frames[i1][None])
                total = total + jnp.mean((pred - frames[it][None]) ** 2)
            return total
        g = jax.grad(support_loss)(p)
        p = {k: p[k] - 0.05 * g[k] for k in p}

    np.testing.assert_allclose(float(adapted["w"]), float(p["w"]), rtol=1e-5)
    np.testing.assert_allclose(float(adapted["b"]), float(p["b"]), rtol=1e-5)


def test_zero_steps_is_plain_forward():
    """num_steps=0 (run_rrin.sh fine-tune-free mode) → query on the init."""
    builder, opt = _builder(num_steps=0)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.05)
    frames = make_frames()
    spec = EpisodeSpec(num_steps=0)
    meta = {"net": params, "lrs": lrs}
    loss, pred, q = builder.task_episode(meta, frames, jnp.ones((1,)), spec)
    expected = tiny_apply(params, frames[2][None], frames[4][None])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(expected[0]),
                               rtol=1e-6)


def test_msl_weighting():
    builder, opt = _builder(num_steps=2)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.05)
    frames = make_frames()
    msl_w = jnp.asarray([0.3, 0.7])
    spec = EpisodeSpec(num_steps=2, use_msl=True, second_order=True)
    meta = {"net": params, "lrs": lrs}
    loss, _, _ = builder.task_episode(meta, frames, msl_w, spec, training=True)

    # manual: per-step query losses weighted
    p = dict(params)
    expected = 0.0
    for step in range(2):
        def support_loss(p_):
            total = 0.0
            for (i0, it, i1) in spec.support_idxs:
                pred = tiny_apply(p_, frames[i0][None], frames[i1][None])
                total = total + jnp.mean((pred - frames[it][None]) ** 2)
            return total
        g = jax.grad(support_loss)(p)
        p = {k: p[k] - 0.05 * g[k] for k in p}
        q = jnp.mean((tiny_apply(p, frames[2][None], frames[4][None])
                      - frames[3][None]) ** 2)
        expected = expected + float(msl_w[step]) * float(q)

    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_msl_weighting_all_peel_shapes():
    """MSL's last-step query reuse peels steps differently for n=1 (no
    scan, step-0 query skipped), n=2 (two peels, no scan), n=3 (peel +
    scan + peel) — each must match the hand-unrolled reference formula."""
    for n in (1, 2, 3):
        builder, opt = _builder(num_steps=n)
        params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
        lrs = opt.init_lrs(params, 0.05)
        frames = make_frames()
        msl_w = jnp.linspace(0.2, 0.8, n)
        spec = EpisodeSpec(num_steps=n, use_msl=True, second_order=True)
        meta = {"net": params, "lrs": lrs}
        loss, _, q = builder.task_episode(meta, frames, msl_w, spec,
                                          training=True)

        p = dict(params)
        expected = 0.0
        for step in range(n):
            def support_loss(p_):
                total = 0.0
                for (i0, it, i1) in spec.support_idxs:
                    pred = tiny_apply(p_, frames[i0][None], frames[i1][None])
                    total = total + jnp.mean((pred - frames[it][None]) ** 2)
                return total
            g = jax.grad(support_loss)(p)
            p = {k: p[k] - 0.05 * g[k] for k in p}
            ql = float(jnp.mean((tiny_apply(p, frames[2][None],
                                            frames[4][None])
                                 - frames[3][None]) ** 2))
            expected = expected + float(msl_w[step]) * ql
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5,
                                   err_msg=f"n={n}")
        # the reported query loss is the last step's query
        np.testing.assert_allclose(float(q), ql, rtol=1e-5, err_msg=f"n={n}")


def test_msl_query_preds_match_truncated_episodes():
    """collect_query_preds: the collected per-step MSL query pred for step
    s equals the query forward after s+1 inner steps — exactly what the
    reference's per-step query criterion call sees (and feeds its D update
    from) at meta_learning_system.py:404-412."""
    n = 3
    builder, opt = _builder(num_steps=n)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.05)
    frames = make_frames()
    spec = EpisodeSpec(num_steps=n, use_msl=True,
                       collect_support_preds=True, collect_query_preds=True)
    _, _, sp, qp = builder.adapt(params, lrs, frames, spec, collect_msl=True)
    assert sp.shape[0] == n  # support preds for every step
    assert qp.shape[0] == n - 1  # per-step query preds for steps 0..n-2
    q0, qt, q1 = spec.target_idxs
    for s in range(n - 1):
        trunc = EpisodeSpec(num_steps=s + 1)
        adapted, _, _, _ = builder.adapt(params, lrs, frames, trunc)
        pred = tiny_apply(adapted, frames[q0][None], frames[q1][None])[0]
        np.testing.assert_allclose(np.asarray(qp[s]), np.asarray(pred),
                                   rtol=1e-6, err_msg=f"step {s}")
    # without the collect flag the placeholder stays empty
    spec_off = EpisodeSpec(num_steps=n, use_msl=True,
                           collect_support_preds=True)
    _, _, _, qp_off = builder.adapt(params, lrs, frames, spec_off,
                                    collect_msl=True)
    assert qp_off.shape == (1, 0)


def test_batched_episode_vmaps_over_tasks():
    builder, opt = _builder(num_steps=1)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.05)
    batch = jnp.stack([make_frames(seed=i) for i in range(3)])
    spec = EpisodeSpec(num_steps=1, second_order=True)
    meta = {"net": params, "lrs": lrs}
    loss, aux = builder.batched_episode(meta, batch, jnp.ones((1,)), spec,
                                        training=True, with_metrics=True)
    assert aux["preds"].shape == (3, 4, 4, 3)
    # mean over per-task losses
    per_task = [builder.task_episode(meta, batch[i], jnp.ones((1,)), spec)[0]
                for i in range(3)]
    np.testing.assert_allclose(float(loss), np.mean([float(x) for x in per_task]),
                               rtol=1e-5)
    assert np.isfinite(float(aux["psnr"]))


def test_attenuator_initial_gamma_is_one():
    """gamma_mult starts at 0 → gamma == 1 → init unchanged (ref :117,260)."""
    builder, opt = _builder(num_steps=1)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.0)  # zero lr: adaptation is a no-op
    att = init_attenuator(jax.random.PRNGKey(0), num_layers=2)
    frames = make_frames()
    spec = EpisodeSpec(num_steps=1, attenuate=True)
    meta = {"net": params, "lrs": lrs, "attenuator": att}
    _, pred, _ = builder.task_episode(meta, frames, jnp.ones((1,)), spec)
    expected = tiny_apply(params, frames[2][None], frames[4][None])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(expected[0]),
                               rtol=1e-5)


def test_attenuator_skips_frozen_leaves():
    """L2F embeds/scales only the trainable leaves (the reference's
    names_weights_copy — requires_grad=True params; DAIN: rectify only,
    meta_learning_system.py:96-101): frozen leaves must pass through
    unscaled and the attenuator input must be sized to the live set."""
    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=1)
    builder = EpisodeBuilder(tiny_apply, tiny_loss, opt)
    builder.att_keep = {"w": True, "b": False}
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    att = init_attenuator(jax.random.PRNGKey(0), num_layers=1)
    # force a visible gamma != 1
    att["gamma_mult"] = jnp.asarray(0.7)
    frames = make_frames()
    spec = EpisodeSpec(num_steps=1, attenuate=True)
    scaled = builder._attenuate(params, att, frames, spec)
    np.testing.assert_allclose(float(scaled["b"]), 0.1, rtol=1e-7)
    assert abs(float(scaled["w"]) - 0.8) > 1e-6


def test_inner_mask_freezes_leaves():
    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=1)
    mask = {"w": jnp.asarray(0.0), "b": jnp.asarray(1.0)}
    builder = EpisodeBuilder(tiny_apply, tiny_loss, opt, inner_mask=mask)
    params = {"w": jnp.asarray(0.8), "b": jnp.asarray(0.1)}
    lrs = opt.init_lrs(params, 0.1)
    frames = make_frames()
    spec = EpisodeSpec(num_steps=1, second_order=True)
    adapted, _, _, _ = builder.adapt(params, lrs, frames, spec)
    np.testing.assert_allclose(float(adapted["w"]), 0.8, rtol=1e-7)
    assert abs(float(adapted["b"]) - 0.1) > 1e-6


def test_fast_batched_conv_matches_grouped():
    """The episode's custom-vmap tap-einsum conv path must match the plain
    grouped-conv lowering: same episode loss and same outer gradients."""
    from meta_interpolation_tpu.models import cain, layers as L
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.meta.episode import EpisodeBuilder, EpisodeSpec
    from meta_interpolation_tpu.core.losses import make_loss_fn

    mk = dict(depth=1, n_resgroups=1, n_resblocks=2)
    net = cain.init(jax.random.PRNGKey(0), reduction=4, **mk)
    opt = InnerOptimizer(rule="Adam", lr_mode="metasgd", num_steps=2)
    mp = {"net": net, "lrs": opt.init_lrs(net, 1e-4)}
    builder = EpisodeBuilder(
        apply_fn=lambda p, a, b: cain.apply(p, a, b, pad_multiple=8, **mk),
        loss_fn=make_loss_fn("1*L1"), inner_opt=opt)
    spec = EpisodeSpec(num_steps=2, second_order=False, use_msl=True)
    frames = jax.random.uniform(jax.random.PRNGKey(1), (3, 7, 16, 16, 3))
    msl_w = jnp.asarray([0.4, 0.6])

    def run():
        def outer(mp):
            loss, _ = builder.batched_episode(mp, frames, msl_w, spec,
                                              training=True)
            return loss
        return jax.value_and_grad(outer)(mp)

    l_fast, g_fast = run()
    try:
        L.FAST_BATCHED_CONV_ENABLED = False
        l_slow, g_slow = run()
    finally:
        L.FAST_BATCHED_CONV_ENABLED = True

    np.testing.assert_allclose(float(l_fast), float(l_slow), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_slow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-7)


def test_fast_batched_conv_same_padding():
    """SAME-padding variant of the fast batched-weight conv (flow-model
    UNets): grad-of-vmap equivalence vs the grouped lowering."""
    from meta_interpolation_tpu.models import layers as L

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 2, 8, 8, 4))
    w = {"kernel": jax.random.uniform(rng, (3, 3, 3, 4, 4)) * 0.2,
         "bias": jnp.zeros((3, 4))}

    def net(w, x):
        return jnp.abs(jax.vmap(
            lambda wi, xi: L.conv2d(wi, xi, padding="SAME"))(w, x)).sum()

    with L.episode_fast_conv(True):
        l_fast, g_fast = jax.value_and_grad(net)(w, x)
    l_raw, g_raw = jax.value_and_grad(net)(w, x)
    np.testing.assert_allclose(float(l_fast), float(l_raw), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_raw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_prune_frozen_shrinks_inner_backward():
    """inner_mask-frozen subtrees are pruned from the support-grad backward
    (stop_gradient INSIDE the differentiated lambda), not just zeroed:
    the adapt jaxpr with a frozen heavy branch has fewer equations."""
    import jax.numpy as jnp
    from meta_interpolation_tpu.meta.episode import EpisodeBuilder, EpisodeSpec
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.models import layers as L

    def apply_fn(p, a, b):
        x = (a + b) / 2
        for i in range(4):  # heavy frozen chain
            x = jnp.tanh(L.conv2d(p["frozen"][str(i)], x, padding=1))
        return x + p["live"]["w"] * a

    rng = jax.random.PRNGKey(0)
    params = {"frozen": {str(i): L.conv_init(jax.random.fold_in(rng, i),
                                             3, 3, 3) for i in range(4)},
              "live": {"w": jnp.asarray(0.5)}}
    mask_frozen = {"frozen": jax.tree.map(lambda _: jnp.zeros(()),
                                          params["frozen"]),
                   "live": {"w": jnp.ones(())}}
    loss_fn = __import__("meta_interpolation_tpu.core.losses",
                         fromlist=["make_loss_fn"]).make_loss_fn("1*L1")
    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=1)
    spec = EpisodeSpec(num_steps=1)
    frames = jnp.zeros((7, 8, 8, 3))
    lrs = opt.init_lrs(params, 1e-3)

    def n_eqns(builder):
        jx = jax.make_jaxpr(
            lambda p, fr: builder.adapt(p, lrs, fr, spec))(params, frames)
        return sum(1 for _ in jx.jaxpr.eqns) + len(str(jx))

    masked = EpisodeBuilder(apply_fn, loss_fn, opt, inner_mask=mask_frozen)
    unmasked = EpisodeBuilder(apply_fn, loss_fn, opt)
    assert n_eqns(masked) < n_eqns(unmasked), (n_eqns(masked),
                                               n_eqns(unmasked))


def test_enable_inner_loop_optimizable_bn_params_flag():
    """--enable_inner_loop_optimizable_bn_params unfreezes BN scale/bias
    (not running stats) in the inner mask (reference config.py:53)."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    base = SceneAdaptiveInterpolation(Config(model="voxelflow"))
    assert float(base.inner_mask["conv1_bn"]["scale"]) == 0.0

    on = SceneAdaptiveInterpolation(Config(
        model="voxelflow", enable_inner_loop_optimizable_bn_params=True))
    m = on.inner_mask["conv1_bn"]
    assert float(m["scale"]) == 1.0 and float(m["bias"]) == 1.0
    assert float(m["mean"]) == 0.0 and float(m["var"]) == 0.0
    assert float(on.inner_mask["conv1"]["kernel"]) == 1.0


def test_num_step_threading_to_apply_fn():
    """EpisodeBuilder.passes_num_step: apply_fn receives the inner step
    index (0..k-1) during adaptation and the LAST index for the query —
    the reference MetaBatchNormLayer num_step convention
    (model_utils.py:482-511)."""
    from meta_interpolation_tpu.meta.episode import EpisodeBuilder, EpisodeSpec
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer

    def apply_fn(params, f0, f1, num_step=0):
        # fold num_step into the output so it is observable in the loss
        return params["w"] * (f0 + f1) / 2.0 + 0.01 * num_step

    def loss_fn(pred, target, aux=None):
        return {"total": jnp.mean((pred - target) ** 2)}

    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=3)
    params = {"w": jnp.asarray(1.0)}
    lrs = opt.init_lrs(params, 0.0)  # zero LR: params never move
    builder = EpisodeBuilder(apply_fn, loss_fn, opt)
    builder.passes_num_step = True
    spec = EpisodeSpec(num_steps=3)
    rs = np.random.RandomState(0)
    frames = jnp.asarray(rs.rand(7, 4, 4, 3).astype(np.float32))

    meta = {"net": params, "lrs": lrs}
    _, pred, _ = builder.task_episode(meta, frames, jnp.ones((3,)), spec,
                                      training=False)
    # with zero inner LR the prediction is exactly apply(init, ..., last):
    # mean frame + 0.01 * (num_steps - 1)
    expected = np.asarray((frames[2] + frames[4]) / 2.0 + 0.01 * 2)
    np.testing.assert_allclose(np.asarray(pred), expected, rtol=1e-6)


def test_second_order_einsum_conv_matches_plain():
    """Second-order episodes route inner-grad convs through the pure
    tap-einsum formulation ("einsum" mode) so the double-backward batches
    natively; the episode loss AND outer gradients must match the plain
    lax.conv lowering."""
    from meta_interpolation_tpu.models import cain, layers as L
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.meta.episode import EpisodeBuilder, EpisodeSpec
    from meta_interpolation_tpu.core.losses import make_loss_fn

    mk = dict(depth=1, n_resgroups=1, n_resblocks=1)
    net = cain.init(jax.random.PRNGKey(2), reduction=4, **mk)
    opt = InnerOptimizer(rule="SGD", lr_mode="metasgd", num_steps=2)
    mp = {"net": net, "lrs": opt.init_lrs(net, 1e-3)}
    builder = EpisodeBuilder(
        apply_fn=lambda p, a, b: cain.apply(p, a, b, pad_multiple=8, **mk),
        loss_fn=make_loss_fn("1*L1"), inner_opt=opt)
    spec = EpisodeSpec(num_steps=2, second_order=True,
                       second_order_einsum=True)
    frames = jax.random.uniform(jax.random.PRNGKey(3), (2, 7, 16, 16, 3))
    msl_w = jnp.ones((2,)) / 2

    def run():
        def outer(mp):
            loss, _ = builder.batched_episode(mp, frames, msl_w, spec,
                                              training=True)
            return loss
        return jax.value_and_grad(outer)(mp)

    l_fast, g_fast = run()
    try:
        L.FAST_BATCHED_CONV_ENABLED = False  # forces plain lax.conv paths
        l_slow, g_slow = run()
    finally:
        L.FAST_BATCHED_CONV_ENABLED = True

    np.testing.assert_allclose(float(l_fast), float(l_slow), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_slow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)
