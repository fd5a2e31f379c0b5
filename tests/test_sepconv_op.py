"""Adaptive separable convolution op tests.

Numpy brute force re-derives the reference cupy kernel's definition
(sepconv/sepconv_op/sepconv.py:5-30):
    out(y,x,c) = Σ_k Σ_l in(y+k, x+l, c) · kv(y,x,k) · kh(y,x,l)
Small filter sizes keep CPU runtime sane; the op is F-generic.
"""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.ops import sepconv as sc


def _brute_force(inp, kv, kh):
    n, hp, wp, c = inp.shape
    f = kv.shape[-1]
    h, w = hp - f + 1, wp - f + 1
    out = np.zeros((n, h, w, c), np.float32)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                patch = inp[b, y:y + f, x:x + f, :]
                w2d = np.outer(kv[b, y, x], kh[b, y, x])
                out[b, y, x] = np.tensordot(w2d, patch, axes=([0, 1], [0, 1]))
    return out


def _data(n=1, h=6, w=7, c=3, f=5, seed=0):
    rs = np.random.RandomState(seed)
    inp = rs.rand(n, h + f - 1, w + f - 1, c).astype(np.float32)
    kv = rs.rand(n, h, w, f).astype(np.float32)
    kh = rs.rand(n, h, w, f).astype(np.float32)
    return inp, kv, kh


def test_ref_matches_brute_force():
    inp, kv, kh = _data()
    expected = _brute_force(inp, kv, kh)
    got = sc.sepconv_ref(jnp.asarray(inp), jnp.asarray(kv), jnp.asarray(kh))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_custom_vjp_matches_autodiff_of_ref():
    """The hand-written backward (reference's three grad kernels) must equal
    autodiff through the forward reference."""
    inp, kv, kh = _data(h=4, w=5, f=3, seed=1)
    inp, kv, kh = jnp.asarray(inp), jnp.asarray(kv), jnp.asarray(kh)

    def loss_custom(i, v, hh):
        return jnp.sum(sc.sepconv(i, v, hh, False) ** 2)

    def loss_ref(i, v, hh):
        return jnp.sum(sc.sepconv_ref(i, v, hh) ** 2)

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(inp, kv, kh)
    g_auto = jax.grad(loss_ref, argnums=(0, 1, 2))(inp, kv, kh)
    for gc, ga, name in zip(g_custom, g_auto, ["input", "kv", "kh"]):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_pallas_interpret_matches_ref():
    """Pallas kernels in interpreter mode vs the jnp reference."""
    inp, kv, kh = _data(n=2, h=8, w=8, f=5, seed=2)
    inp, kv, kh = jnp.asarray(inp), jnp.asarray(kv), jnp.asarray(kh)
    expected = sc.sepconv_ref(inp, kv, kh)
    got = sc._pallas_forward(inp, kv, kh, f=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_pallas_interpret_grad_kernels_match():
    inp, kv, kh = _data(n=1, h=4, w=4, f=3, seed=3)
    inp, kv, kh = jnp.asarray(inp), jnp.asarray(kv), jnp.asarray(kh)
    g = jnp.asarray(np.random.RandomState(4).rand(1, 4, 4, 3), jnp.float32)

    def loss_ref(i, v, hh):
        return jnp.sum(sc.sepconv_ref(i, v, hh) * g)

    _, g_kv_auto, g_kh_auto = jax.grad(loss_ref, argnums=(0, 1, 2))(inp, kv, kh)
    gkv, gkh = sc._pallas_grad_kernels(inp, g, kv, kh, f=3, interpret=True)
    np.testing.assert_allclose(np.asarray(gkv), np.asarray(g_kv_auto),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gkh), np.asarray(g_kh_auto),
                               rtol=1e-4, atol=1e-6)


def test_grad_input_ref_matches_autodiff():
    inp, kv, kh = _data(n=1, h=4, w=4, f=3, seed=5)
    inp, kv, kh = jnp.asarray(inp), jnp.asarray(kv), jnp.asarray(kh)
    g = jnp.asarray(np.random.RandomState(6).rand(1, 4, 4, 3), jnp.float32)

    def loss_ref(i, v, hh):
        return jnp.sum(sc.sepconv_ref(i, v, hh) * g)

    g_in_auto, _, _ = jax.grad(loss_ref, argnums=(0, 1, 2))(inp, kv, kh)
    gin = sc._grad_input_ref(g, kv, kh, hp=6, wp=6)
    np.testing.assert_allclose(np.asarray(gin), np.asarray(g_in_auto),
                               rtol=1e-4, atol=1e-6)
