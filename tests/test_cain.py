"""CAIN model tests (tiny configs so CPU compile stays fast)."""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.models import cain, layers


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    down = layers.pixel_shuffle(x, 0.5)
    assert down.shape == (2, 4, 4, 12)
    up = layers.pixel_shuffle(down, 2.0)
    np.testing.assert_allclose(np.asarray(up), np.asarray(x), rtol=1e-6)


def test_pixel_shuffle_matches_torch_ordering():
    """Our NHWC shuffle must match the reference NCHW pixel_shuffle
    (model_utils.py:202-217) after layout conversion, so converted .pth
    weights stay bit-compatible."""
    import torch

    def torch_pixel_shuffle(t, scale):
        b, c, h, w = t.shape
        if scale >= 1:
            s = int(scale)
            oc = c // (s * s)
            v = t.contiguous().view(b, oc, s, s, h, w)
            return v.permute(0, 1, 4, 2, 5, 3).contiguous().view(b, oc, h * s, w * s)
        bs = int(1 / scale)
        oh, ow = h // bs, w // bs
        v = t.contiguous().view(b, c, oh, bs, ow, bs)
        return v.permute(0, 1, 3, 5, 2, 4).contiguous().view(b, c * bs * bs, oh, ow)

    x = np.random.RandomState(1).rand(1, 12, 4, 6).astype(np.float32)  # NCHW
    for scale in (2.0, 0.5):
        ref = torch_pixel_shuffle(torch.from_numpy(x), scale).numpy()
        ours = layers.pixel_shuffle(
            jnp.asarray(x.transpose(0, 2, 3, 1)), scale)
        np.testing.assert_allclose(
            np.asarray(ours), ref.transpose(0, 2, 3, 1), rtol=1e-6)


def test_tiny_cain_forward_shape_and_grad():
    rng = jax.random.PRNGKey(0)
    p = cain.init(rng, depth=1, n_resgroups=1, n_resblocks=1, reduction=4)
    f0 = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    f1 = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))

    def apply(p, a, b):
        return cain.apply(p, a, b, depth=1, n_resgroups=1, n_resblocks=1)

    out = apply(p, f0, f1)
    assert out.shape == (1, 16, 16, 3)

    g = jax.grad(lambda p: jnp.mean(jnp.abs(apply(p, f0, f1) - f0)))(p)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)


def test_cain_mean_shift_identity_property():
    """With all-zero conv weights the network output reduces to the average
    of the two input means (the mean-shift trick, cain/model.py:70-94)."""
    p = cain.init(jax.random.PRNGKey(0), depth=1, n_resgroups=1, n_resblocks=1, reduction=4)
    p_zero = jax.tree.map(jnp.zeros_like, p)
    f0 = jnp.full((1, 16, 16, 3), 0.25)
    f1 = jnp.full((1, 16, 16, 3), 0.75)
    out = cain.apply(p_zero, f0, f1, depth=1, n_resgroups=1, n_resblocks=1)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_pad_to_multiple_reflect():
    x = jnp.asarray(np.arange(2 * 5 * 7 * 1, dtype=np.float32).reshape(2, 5, 7, 1))
    padded, pads = layers.pad_to_multiple(x, 8)
    assert padded.shape == (2, 8, 8, 1)
    restored = layers.unpad(padded, pads)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x))


def test_param_count_matches_reference_cain():
    """Full-size CAIN must have the reference's 42.8M parameters."""
    p = cain.init(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(p))
    assert n == 42_780_432, n


def test_cain_packed_body_and_pad_multiple():
    """pack() + packed_body must be bitwise-identical to per-call stacking,
    and pad_multiple=8 on /8-divisible inputs must skip padding entirely."""
    mk = dict(depth=1, n_resgroups=2, n_resblocks=2)
    p = cain.init(jax.random.PRNGKey(3), reduction=4, **mk)
    f0 = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 24, 3))
    f1 = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 24, 3))

    base = cain.apply(p, f0, f1, pad_multiple=8, **mk)
    assert base.shape == (1, 16, 24, 3)

    packed = cain.pack(p, n_resgroups=2, n_resblocks=2)
    viapack = cain.apply(p, f0, f1, pad_multiple=8, packed_body=packed, **mk)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(viapack))

    # pad_multiple=128 changes boundary context -> different output
    padded = cain.apply(p, f0, f1, pad_multiple=128, **mk)
    assert float(jnp.abs(padded - base).max()) > 0


def test_cain_mixed_precision_apply():
    """bf16 activations with f32 params (the training system's --dtype
    bfloat16 path) must keep a stable scan carry dtype."""
    mk = dict(depth=1, n_resgroups=1, n_resblocks=1)
    p = cain.init(jax.random.PRNGKey(0), reduction=4, **mk)  # f32 params
    f0 = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3),
                            dtype=jnp.float32).astype(jnp.bfloat16)
    out = cain.apply(p, f0, f0, **mk)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_cain_fuse_pad_serving_mode():
    """fuse_pad replaces the body's reflect pads with conv-fused zero
    padding: same shape, finite, and (documented deviation) different
    boundary context than the reference-exact default."""
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.models import cain

    params = cain.init(jax.random.PRNGKey(0), depth=1, n_resgroups=1,
                       n_resblocks=1, reduction=4)
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.rand(1, 16, 24, 3), jnp.float32)
    f1 = jnp.asarray(rs.rand(1, 16, 24, 3), jnp.float32)
    kw = dict(depth=1, n_resgroups=1, n_resblocks=1, pad_multiple=2)
    base = cain.apply(params, f0, f1, **kw)
    fused = cain.apply(params, f0, f1, fuse_pad=True, **kw)
    assert fused.shape == base.shape
    assert np.all(np.isfinite(np.asarray(fused)))
    assert float(jnp.max(jnp.abs(fused - base))) > 0  # deviation is real


def test_conv2d_reflect3x3_matches_padded_conv():
    """The border-corrected zero-SAME formulation (layers.conv2d_reflect3x3)
    must equal conv(reflect_pad(x)) to fp-reassociation tolerance, on
    general shapes and the degenerate 2x2 frame."""
    from meta_interpolation_tpu.models import layers

    rng = np.random.RandomState(0)
    for (h, w, c, o) in [(8, 12, 5, 7), (2, 2, 3, 3), (9, 3, 4, 2)]:
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        p = {"kernel": jnp.asarray(rng.randn(3, 3, c, o), jnp.float32),
             "bias": jnp.asarray(rng.randn(o), jnp.float32)}
        ref = layers.conv2d(p, layers.reflect_pad(x, 1), padding="VALID")
        got = layers.conv2d_reflect3x3(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_cain_fuse_pad_reflect_is_exact():
    """fuse_pad='reflect' (zero-SAME conv + analytic border corrections)
    is the SAME math as the reference reflect pad — full-model output
    equal to fp tolerance, unlike fuse_pad=True's zero-pad deviation."""
    mk = dict(depth=2, n_resgroups=2, n_resblocks=2)
    p = cain.init(jax.random.PRNGKey(7), **mk)
    rs = np.random.RandomState(3)
    f0 = jnp.asarray(rs.rand(1, 64, 48, 3), jnp.float32)
    f1 = jnp.asarray(rs.rand(1, 64, 48, 3), jnp.float32)
    base = cain.apply(p, f0, f1, pad_multiple=4, **mk)
    fast = cain.apply(p, f0, f1, pad_multiple=4, fuse_pad="reflect", **mk)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_cain_per_group_fuse_pad_and_apron():
    """Per-group fuse_pad list: all-equal list == scalar mode (exact);
    mixed list runs and differs from both extremes. apron=k reflect-pads
    the input before the grid pad and crops after — output shape is
    unchanged and apron=0 is the identity (serving ablation plumbing,
    VERDICT r3 item 1)."""
    mk = dict(depth=2, n_resgroups=3, n_resblocks=2)
    p = cain.init(jax.random.PRNGKey(11), **mk)
    rs = np.random.RandomState(5)
    f0 = jnp.asarray(rs.rand(1, 64, 48, 3), jnp.float32)
    f1 = jnp.asarray(rs.rand(1, 64, 48, 3), jnp.float32)

    scalar_false = cain.apply(p, f0, f1, pad_multiple=4, fuse_pad=False, **mk)
    scalar_true = cain.apply(p, f0, f1, pad_multiple=4, fuse_pad=True, **mk)
    list_false = cain.apply(p, f0, f1, pad_multiple=4,
                            fuse_pad=[False, False, False], **mk)
    list_true = cain.apply(p, f0, f1, pad_multiple=4,
                           fuse_pad=[True, True, True], **mk)
    np.testing.assert_array_equal(np.asarray(list_false),
                                  np.asarray(scalar_false))
    np.testing.assert_array_equal(np.asarray(list_true),
                                  np.asarray(scalar_true))

    mixed = cain.apply(p, f0, f1, pad_multiple=4,
                       fuse_pad=["reflect", True, "reflect"], **mk)
    assert mixed.shape == scalar_false.shape
    assert np.abs(np.asarray(mixed) - np.asarray(scalar_false)).max() > 0
    assert np.abs(np.asarray(mixed) - np.asarray(scalar_true)).max() > 0

    # apron: shape-preserving; 0 == no-op; on an all-reflect body the
    # apron only changes values near the border
    ap = cain.apply(p, f0, f1, pad_multiple=4, apron=4, **mk)
    assert ap.shape == scalar_false.shape
    ap0 = cain.apply(p, f0, f1, pad_multiple=4, apron=0, **mk)
    np.testing.assert_array_equal(np.asarray(ap0), np.asarray(scalar_false))


def test_cain_blockwise_fuse_pad():
    """Sub-group fuse lists: a group entry that is itself a list of
    n_resblocks+1 per-RCAB modes (last = tail conv). All-equal blockwise
    list == the scalar group mode to fp-reassociation tolerance (the
    blockwise group runs outside the group-axis scan, so XLA fuses it
    differently — same math, different summation order); a boundary-fuse
    point (first RCAB reflect, rest zero) runs and differs from both
    extremes."""
    mk = dict(depth=2, n_resgroups=3, n_resblocks=2)
    p = cain.init(jax.random.PRNGKey(13), **mk)
    rs = np.random.RandomState(6)
    f0 = jnp.asarray(rs.rand(1, 64, 48, 3), jnp.float32)
    f1 = jnp.asarray(rs.rand(1, 64, 48, 3), jnp.float32)
    nb = mk["n_resblocks"]

    # all-equal blockwise == scalar group entry to fp-reassociation
    # tolerance (different scan segmentation -> different fusion)
    grp_true = cain.apply(p, f0, f1, pad_multiple=4,
                          fuse_pad=[True, True, True], **mk)
    bw_true = cain.apply(p, f0, f1, pad_multiple=4,
                         fuse_pad=[[True] * (nb + 1), True, True], **mk)
    np.testing.assert_allclose(np.asarray(bw_true), np.asarray(grp_true),
                               rtol=1e-4, atol=1e-5)

    grp_refl = cain.apply(p, f0, f1, pad_multiple=4,
                          fuse_pad=["reflect", True, True], **mk)
    bw_refl = cain.apply(p, f0, f1, pad_multiple=4,
                         fuse_pad=[["reflect"] * (nb + 1), True, True], **mk)
    np.testing.assert_allclose(np.asarray(bw_refl), np.asarray(grp_refl),
                               rtol=1e-4, atol=1e-5)

    # boundary point: first RCAB of the first group (index 0) reflect,
    # everything else zero
    bw1 = cain.apply(p, f0, f1, pad_multiple=4,
                     fuse_pad=[["reflect"] + [True] * nb, True, True], **mk)
    assert bw1.shape == grp_true.shape
    assert np.all(np.isfinite(np.asarray(bw1)))
    assert np.abs(np.asarray(bw1) - np.asarray(grp_true)).max() > 0
    assert np.abs(np.asarray(bw1) - np.asarray(grp_refl)).max() > 0
