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
