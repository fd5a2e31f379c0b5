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
    the system performs B x (steps x pairs + 1) single-task discriminator
    updates per outer iteration, tasks SEQUENTIAL in episode order — the
    reference updates D inside every criterion call (loss.py:168-213) and
    the criterion is called inside `for task_id in range(batch)`
    (meta_learning_system.py:366), so each update sees one task's pred."""
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation

    rs = np.random.RandomState(0)
    frames = rs.rand(2, 7, 32, 32, 3).astype(np.float32)
    cfg = Config(model="cain", depth=2, n_resblocks=1, batch_size=2,
                 crop_size=32, loss="1*L1+0.01*GAN",
                 number_of_training_steps_per_iter=2,
                 disc_per_forward=True)
    system = SceneAdaptiveInterpolation(cfg)

    calls = []
    real_upd = system.adv_state.jitted_update()

    def counting_upd(*args):
        # every update must be a single-task batch (reference per-task
        # criterion calls — also pins the D BN batch statistics)
        assert args[2].shape[0] == 1, args[2].shape
        calls.append(1)
        return real_upd(*args)

    system.adv_state._jit_update = counting_upd
    losses, _ = system.run_train_iter(frames, epoch=0)
    assert np.isfinite(losses["loss"])
    # 2 tasks x (2 steps x 2 support pairs + 1 query)
    assert len(calls) == 10, len(calls)

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
    system_msl = SceneAdaptiveInterpolation(cfg_msl)
    calls_msl = []
    real_upd_msl = system_msl.adv_state.jitted_update()
    system_msl.adv_state._jit_update = lambda *a: (calls_msl.append(1),
                                                   real_upd_msl(*a))[1]
    losses_msl, _ = system_msl.run_train_iter(frames, epoch=0)
    assert np.isfinite(losses_msl["loss"])
    assert len(calls_msl) == 12, len(calls_msl)
    # once MSL decays out (epoch >= multi_step_loss_num_epochs) the
    # cadence drops back to steps x pairs + 1 per task
    calls_msl.clear()
    system_msl.run_train_iter(frames, epoch=5)
    assert len(calls_msl) == 10, len(calls_msl)


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
    calls = []
    real_upd = system.adv_state.jitted_update()
    system.adv_state._jit_update = lambda *a: (calls.append(1),
                                               real_upd(*a))[1]
    losses, _ = system.run_train_iter(frames, epoch=0)
    assert np.isfinite(losses["loss"])
    # per task: 1 step x 2 support pairs + the final query (which IS the
    # step's MSL query) = 3; 2 tasks = 6
    assert len(calls) == 6, len(calls)

    # default cadence: exactly one update
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
