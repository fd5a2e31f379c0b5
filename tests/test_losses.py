"""Loss library tests: spec parsing, individual terms, adversarial state."""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.core import losses as L


def _imgs(seed=0, n=1, h=48, w=48):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.rand(n, h, w, 3).astype(np.float32)),
            jnp.asarray(rs.rand(n, h, w, 3).astype(np.float32)))


def test_spec_parser():
    terms = L.parse_loss_spec("1*L1+0.5*MSE+0.1*VGG22")
    assert [(t.weight, t.loss_type) for t in terms] == [
        (1.0, "L1"), (0.5, "MSE"), (0.1, "VGG22")]


def test_weighted_sum_and_total():
    pred, tgt = _imgs()
    fn = L.make_loss_fn("2*L1+1*MSE")
    out = fn(pred, tgt)
    np.testing.assert_allclose(float(out["total"]),
                               float(out["L1"]) + float(out["MSE"]), rtol=1e-6)
    np.testing.assert_allclose(float(out["L1"]),
                               2 * float(jnp.mean(jnp.abs(pred - tgt))),
                               rtol=1e-6)


def test_ssim_loss_is_dssim():
    pred, tgt = _imgs(1)
    fn = L.make_loss_fn("1*SSIM")
    out = fn(pred, tgt)
    from meta_interpolation_tpu.core import metrics
    s = metrics.ssim(pred, tgt, val_range=1.0)
    np.testing.assert_allclose(float(out["SSIM"]), float((1 - s) / 2),
                               rtol=1e-5)
    same = fn(pred, pred)
    np.testing.assert_allclose(float(same["SSIM"]), 0.0, atol=1e-6)


def test_vgg_loss_runs_and_differentiates():
    pred, tgt = _imgs(2)
    fn = L.make_loss_fn("1*VGG22", rng=jax.random.PRNGKey(0))
    out = fn(pred, tgt)
    assert np.isfinite(float(out["total"]))
    g = jax.grad(lambda p: fn(p, tgt)["total"])(pred)
    assert float(jnp.abs(g).sum()) > 0


def test_vgg19_torch_import_shapes():
    """Converted torchvision-layout VGG19 state dict → our param tree."""
    rs = np.random.RandomState(3)
    sd = {"0.weight": rs.rand(64, 3, 3, 3).astype(np.float32),
          "0.bias": rs.rand(64).astype(np.float32),
          "2.weight": rs.rand(64, 64, 3, 3).astype(np.float32),
          "2.bias": rs.rand(64).astype(np.float32)}
    params = L.load_vgg19_from_torch_state(sd)
    assert params["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["conv_1"]["kernel"].shape == (3, 3, 64, 64)


def test_charbonnier():
    pred, tgt = _imgs(4)
    val = L.charbonnier_loss(pred, tgt, epsilon=1e-6)
    expected = np.mean(np.sqrt((np.asarray(pred) - np.asarray(tgt)) ** 2
                               + 1e-6))
    np.testing.assert_allclose(float(val), expected, rtol=1e-6)


def test_adversarial_state_gan():
    from meta_interpolation_tpu.core.adversarial import AdversarialState
    state = AdversarialState.create(jax.random.PRNGKey(0), "GAN",
                                    patch_size=48)
    fake, real = _imgs(5)
    g_loss = state.generator_loss(fake)
    assert np.isfinite(float(g_loss))
    d_loss = state.update_discriminator(fake, real, jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss))


def test_adversarial_wgan_gp_penalty_runs():
    from meta_interpolation_tpu.core.adversarial import AdversarialState
    state = AdversarialState.create(jax.random.PRNGKey(0), "WGAN_GP",
                                    patch_size=48)
    fake, real = _imgs(6)
    d_loss = state.update_discriminator(fake, real, jax.random.PRNGKey(2))
    assert np.isfinite(float(d_loss))


def test_gan_loss_through_episode_ctx():
    """GAN generator term threads through the episode via
    meta_params['loss_ctx'] (traced, not jit-baked)."""
    import jax.numpy as jnp
    from meta_interpolation_tpu.core.adversarial import init_discriminator
    from meta_interpolation_tpu.meta.episode import EpisodeBuilder, EpisodeSpec
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer

    rs = np.random.RandomState(0)
    frames = jnp.asarray(rs.rand(7, 48, 48, 3).astype(np.float32))

    def tiny_apply(params, f0, f1):
        return params["w"] * (f0 + f1) / 2.0

    loss_fn = L.make_loss_fn("1*L1+0.01*GAN", patch_size=48)
    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=1)
    builder = EpisodeBuilder(tiny_apply, loss_fn, opt, uses_loss_ctx=True)
    disc = init_discriminator(jax.random.PRNGKey(0), patch_size=48)
    meta = {"net": {"w": jnp.asarray(0.9)},
            "lrs": opt.init_lrs({"w": jnp.asarray(0.9)}, 1e-3),
            "loss_ctx": {"disc": disc}}
    spec = EpisodeSpec(num_steps=1, second_order=False)
    loss, pred, q = builder.task_episode(meta, frames, jnp.ones((1,)), spec)
    assert np.isfinite(float(loss))
    # and the outer grad w.r.t. the net flows through the GAN term
    g = jax.grad(lambda mp: builder.task_episode(
        mp, frames, jnp.ones((1,)), spec)[0])(meta)
    assert np.isfinite(float(g["net"]["w"]))


def test_vgg19_torch_state_round_trip(tmp_path, monkeypatch):
    """VERDICT item 9: pin the VGG19 layer-table indexing (loss.py:24-39)
    against a locally-built torch state_dict with torchvision's
    `features` Sequential layout, loaded through the documented weights
    search path ($MIT_VGG_WEIGHTS)."""
    import os
    import torch
    import torch.nn as nn
    from meta_interpolation_tpu.core import losses as L

    # torchvision vgg19().features architecture, same flat indices
    mods = []
    in_ch = 3
    for kind, out_ch in L._VGG19_LAYERS:
        if kind == "conv":
            mods.append(nn.Conv2d(in_ch, out_ch, 3, padding=1))
            in_ch = out_ch
        elif kind == "relu":
            mods.append(nn.ReLU(inplace=False))
        else:
            mods.append(nn.MaxPool2d(2, 2))
    torch.manual_seed(0)
    features = nn.Sequential(*mods)
    torch.save(features.state_dict(), tmp_path / "vgg19_features.pth")

    monkeypatch.setenv(L.VGG_WEIGHTS_ENV, str(tmp_path))
    loss_fn = L.make_loss_fn("1*VGG22")

    rs = np.random.RandomState(0)
    pred = rs.rand(1, 3, 32, 32).astype(np.float32)
    tgt = rs.rand(1, 3, 32, 32).astype(np.float32)

    # torch oracle of the VGG22 term: MSE of features at module cut 8
    # after the MeanShift normalization (loss.py:42-47)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    sub = features[:8]
    with torch.no_grad():
        fp = sub((torch.from_numpy(pred) - mean) / std)
        ft = sub((torch.from_numpy(tgt) - mean) / std)
        expected = torch.nn.functional.mse_loss(fp, ft).item()

    got = loss_fn(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                  jnp.asarray(tgt.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got["VGG22"]), expected, rtol=1e-4)
    np.testing.assert_allclose(float(got["total"]), expected, rtol=1e-4)


def test_vgg_random_init_warns_loudly(capsys):
    """No weights anywhere → the builder must print the loud warning."""
    import os
    from meta_interpolation_tpu.core import losses as L

    old = os.environ.pop(L.VGG_WEIGHTS_ENV, None)
    try:
        L.make_loss_fn("1*VGG22", rng=jax.random.PRNGKey(0))
    finally:
        if old is not None:
            os.environ[L.VGG_WEIGHTS_ENV] = old
    err = capsys.readouterr().err
    assert "RANDOM-INIT features" in err


def test_disc_per_forward_reference_cadence():
    """--disc_per_forward: the episode exposes per-step support preds and
    the system replays B x (steps x pairs + [MSL queries] + 1) single-task
    discriminator updates per outer iteration, tasks SEQUENTIAL in episode
    order — the reference updates D inside every criterion call
    (loss.py:168-213) and the criterion is called inside `for task_id in
    range(batch)` (meta_learning_system.py:366). r5: the replay runs as
    ONE on-device lax.scan (jitted_sequential_update); these checks pin
    the flattened sequence length/shape per cadence."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    rs = np.random.RandomState(0)
    frames = rs.rand(2, 7, 32, 32, 3).astype(np.float32)

    def run_counting(cfg, epoch=0):
        system = SceneAdaptiveInterpolation(cfg)
        seen = []
        real = system.adv_state.jitted_sequential_update()

        def counting(d_params, d_opt, fakes, reals, keys):
            # every row is a single-task batch (reference per-task
            # criterion calls — also pins the D BN batch statistics)
            assert fakes.shape[1] == 1, fakes.shape
            assert reals.shape == fakes.shape
            assert keys.shape[0] == fakes.shape[0]
            seen.append(fakes.shape[0])
            return real(d_params, d_opt, fakes, reals, keys)

        system.adv_state._jit_seq_update = counting
        losses, _ = system.run_train_iter(frames, epoch=epoch)
        assert np.isfinite(losses["loss"])
        assert len(seen) == 1  # ONE dispatch — the point of the scan form
        return system, seen[0]

    cfg = Config(model="cain", depth=2, n_resblocks=1, batch_size=2,
                 crop_size=32, loss="1*L1+0.01*GAN",
                 number_of_training_steps_per_iter=2,
                 disc_per_forward=True)
    # 2 tasks x (2 steps x 2 support pairs + 1 query)
    _sys, n = run_counting(cfg)
    assert n == 10, n

    # MSL active: the reference's per-step query criterion calls also
    # update D (loss.py:168-213 via meta_learning_system.py:404-412) —
    # 3 criterion calls per step (pair A, pair B, step query; the last
    # step's query is the final update) = 3n per task
    cfg_msl = Config(model="cain", depth=2, n_resblocks=1, batch_size=2,
                     crop_size=32, loss="1*L1+0.01*GAN",
                     number_of_training_steps_per_iter=2,
                     use_multi_step_loss_optimization=True,
                     multi_step_loss_num_epochs=5,
                     disc_per_forward=True)
    _sys_msl, n_msl = run_counting(cfg_msl)
    assert n_msl == 12, n_msl
    # once MSL decays out (epoch >= multi_step_loss_num_epochs) the
    # cadence drops back to steps x pairs + 1 per task
    _sys2, n2 = run_counting(cfg_msl, epoch=5)
    assert n2 == 10, n2


def test_disc_replay_sequence_order_and_scan_equivalence():
    """build_replay_sequence flattens in the reference's exact order
    (task-major: per step the support pairs then the MSL query; final
    query last), and the lax.scan sequential update equals a python loop
    of per-item jitted updates with the same keys."""
    import jax
    import jax.numpy as jnp

    from meta_interpolation_tpu.core.adversarial import (
        AdversarialState, build_replay_sequence)

    B, S, P, T = 2, 2, 2, 7
    img = (4, 4, 3)

    def mark(task, kind, step, pair):
        # distinctive constant per slot: t*1000 + kind*100 + step*10 + pair
        return np.full((1,) + img,
                       task * 1000 + kind * 100 + step * 10 + pair,
                       np.float32)[0]

    sp = np.stack([[[mark(b, 1, s, p) for p in range(P)]
                    for s in range(S)] for b in range(B)])
    qp = np.stack([[mark(b, 2, s, 0) for s in range(S - 1)]
                   for b in range(B)])
    final = np.stack([mark(b, 3, 0, 0) for b in range(B)])
    frames = np.stack([[mark(b, 4, t, 0) for t in range(T)]
                       for b in range(B)])
    fakes, reals = build_replay_sequence(
        jnp.asarray(sp), jnp.asarray(qp), jnp.asarray(final),
        jnp.asarray(frames), [2, 4], 3)
    # reference order, task-major
    expect = []
    expect_r = []
    for b in range(B):
        for s in range(S):
            for p, it in enumerate([2, 4]):
                expect.append(1 * 100 + s * 10 + p + b * 1000)
                expect_r.append(4 * 100 + it * 10 + b * 1000)
            if s < S - 1:
                expect.append(2 * 100 + s * 10 + b * 1000)
                expect_r.append(4 * 100 + 3 * 10 + b * 1000)
        expect.append(3 * 100 + b * 1000)
        expect_r.append(4 * 100 + 3 * 10 + b * 1000)
    got = [int(np.asarray(fakes[i]).flat[0]) for i in range(fakes.shape[0])]
    got_r = [int(np.asarray(reals[i]).flat[0]) for i in range(reals.shape[0])]
    assert got == expect, (got, expect)
    assert got_r == expect_r, (got_r, expect_r)

    # scan == host loop with identical keys (GAN; patch smaller than img
    # pads inside discriminator_apply)
    adv = AdversarialState.create(jax.random.PRNGKey(0), "GAN",
                                  patch_size=4)
    rs = np.random.RandomState(1)
    n = 5
    fakes = jnp.asarray(rs.rand(n, 1, 4, 4, 3), jnp.float32)
    reals = jnp.asarray(rs.rand(n, 1, 4, 4, 3), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    p_seq, o_seq, losses = adv.jitted_sequential_update()(
        adv.params, adv.opt_state, fakes, reals, keys)
    p_loop, o_loop = adv.params, adv.opt_state
    upd = adv.jitted_update()
    loop_losses = []
    for i in range(n):
        p_loop, o_loop, li = upd(p_loop, o_loop, fakes[i], reals[i],
                                 keys[i])
        loop_losses.append(float(li))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(loop_losses),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_loop)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_disc_per_forward_single_step_msl():
    """num_inner_steps == 1 + MSL + --disc_per_forward: there are no
    per-step MSL query preds (the only query criterion call is the final
    one), so the episode must NOT attach the degenerate (B, 1, 0)
    query_preds placeholder — previously this fed a rank-2 fake into the
    jitted discriminator update and crashed at trace time (ADVICE r3)."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    rs = np.random.RandomState(0)
    frames = rs.rand(2, 7, 32, 32, 3).astype(np.float32)
    cfg = Config(model="cain", depth=2, n_resblocks=1, batch_size=2,
                 crop_size=32, loss="1*L1+0.01*GAN",
                 number_of_training_steps_per_iter=1,
                 use_multi_step_loss_optimization=True,
                 multi_step_loss_num_epochs=5,
                 disc_per_forward=True)
    system = SceneAdaptiveInterpolation(cfg)
    seen = []
    real = system.adv_state.jitted_sequential_update()
    system.adv_state._jit_seq_update = lambda *a: (seen.append(a[2].shape),
                                                   real(*a))[1]
    losses, _ = system.run_train_iter(frames, epoch=0)
    assert np.isfinite(losses["loss"])
    # per task: 1 step x 2 support pairs + the final query (which IS the
    # step's MSL query) = 3; 2 tasks = 6
    assert seen == [(6, 1, 32, 32, 3)], seen

    # default cadence: exactly one batched update (no replay sequence)
    cfg2 = Config(model="cain", depth=2, n_resblocks=1, batch_size=2,
                  crop_size=32, loss="1*L1+0.01*GAN",
                  number_of_training_steps_per_iter=2)
    system2 = SceneAdaptiveInterpolation(cfg2)
    calls2 = []
    real_upd2 = system2.adv_state.jitted_update()
    system2.adv_state._jit_update = lambda *a: (calls2.append(1),
                                                real_upd2(*a))[1]
    system2.run_train_iter(frames, epoch=0)
    assert len(calls2) == 1, len(calls2)


def test_super_noprcp_is_super_minus_perceptual():
    """SuperNoPrcp == the Super composite with the perceptual term
    dropped: hand-check 204*recn + 102*warp + smoothness on tiny tensors
    (reference loss.py:246-274 minus line :263 — the 0.005*prcp term
    whose VGG16 weights are env-blocked). Must NOT build a VGG16."""
    import jax.numpy as jnp
    import numpy as np

    from meta_interpolation_tpu.core import losses as L

    rs = np.random.RandomState(0)
    shp = (1, 8, 8, 3)
    pred = jnp.asarray(rs.rand(*shp), jnp.float32)
    target = jnp.asarray(rs.rand(*shp), jnp.float32)
    aux = {
        "bidirectional_flow": tuple(
            jnp.asarray(rs.rand(1, 8, 8, 2), jnp.float32) for _ in range(2)),
        "warped_intermediate_frames": tuple(
            jnp.asarray(rs.rand(*shp), jnp.float32) for _ in range(2)),
        "warped_input_frames": tuple(
            jnp.asarray(rs.rand(*shp), jnp.float32) for _ in range(2)),
        "I0": jnp.asarray(rs.rand(*shp), jnp.float32),
        "I1": jnp.asarray(rs.rand(*shp), jnp.float32),
    }
    fn = L.make_loss_fn("1*SuperNoPrcp")
    out = fn(pred, target, aux)

    recn = float(jnp.abs(pred - target).mean())
    I_0_t, I_1_t = aux["warped_intermediate_frames"]
    I_0_1, I_1_0 = aux["warped_input_frames"]
    warp = (float(jnp.abs(I_0_t - target).mean())
            + float(jnp.abs(I_1_t - target).mean())
            + float(jnp.abs(I_0_1 - aux["I1"]).mean())
            + float(jnp.abs(I_1_0 - aux["I0"]).mean()))

    def tv(f):
        return (float(jnp.abs(f[:, :, :-1] - f[:, :, 1:]).mean())
                + float(jnp.abs(f[:, :-1] - f[:, 1:]).mean()))

    F_0_1, F_1_0 = aux["bidirectional_flow"]
    expect = 204.0 * recn + 102.0 * warp + tv(F_1_0) + tv(F_0_1)
    np.testing.assert_allclose(float(out["total"]), expect, rtol=1e-5)

    # and it equals Super evaluated with vgg16_params=None
    direct = L.superslomo_loss(pred, target, aux, None)
    np.testing.assert_allclose(float(out["total"]), float(direct), rtol=1e-6)
