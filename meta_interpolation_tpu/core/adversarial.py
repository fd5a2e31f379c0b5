"""Adversarial loss — GAN / WGAN / WGAN_GP with an internal discriminator.

Reference: ``/root/reference/loss.py:82-236``. Discriminator: 8 BasicBlocks
(conv3×3 + BN + LeakyReLU(0.2); strides 2,1 alternating, channels 64→512)
over a center crop of ``patch_size``, then Linear(·,1024) + LeakyReLU +
Linear(1024,1) (:89-134). Optimizers (:144-153): Adam β=(0.9,0.99) lr 1e-4
(GAN/WGAN) or β=(0,0.9) lr 1e-5 (WGAN_GP); WGAN clamps weights to ±1;
WGAN_GP adds a 10× gradient penalty on interpolates (:195-207).

TPU design note: the reference updates the discriminator *inside* the loss
call, every forward (:168-213) — host-side mutable state in the middle of
what is here a jitted episode. We split it: :meth:`generator_loss` is pure
(safe inside the episode), :meth:`update_discriminator` is a separate
jitted step the trainer calls once per outer iteration with (pred, real)
pulled from the episode. BN in the discriminator runs in batch-stats mode
(training) matching the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import layers
from ..models.layers import Params


_CHANNELS = [(3, 64, 1)]
_c = 64
for _i in range(7):
    if _i % 2 == 1:
        _CHANNELS.append((_c, _c * 2, 1))
        _c *= 2
    else:
        _CHANNELS.append((_c, _c, 2))


def init_discriminator(rng: jax.Array, patch_size: int = 96) -> Params:
    params: Params = {"features": {}}
    rngs = jax.random.split(rng, len(_CHANNELS) + 2)
    for i, (ic, oc, _s) in enumerate(_CHANNELS):
        params["features"][str(i)] = {
            "conv": layers.conv_init(rngs[i], ic, oc, 3, bias=False),
            "bn": layers.batch_norm_init(oc),
        }
    # The reference sizes its classifier with floor division
    # (loss.py:117 `patch_size // 2**((depth+1)//2)`), but its stride-2
    # pad-1 convs produce ceil(in/2) per stage — the two only agree when
    # patch_size is a multiple of 16 (the reference always runs 96).
    # Mirror the conv arithmetic so any patch size works.
    feat_patch = patch_size
    for _ic, _oc, s in _CHANNELS:
        if s == 2:
            feat_patch = (feat_patch - 1) // 2 + 1
    flat = _CHANNELS[-1][1] * feat_patch * feat_patch
    params["classifier"] = {
        "0": layers.linear_init(rngs[-2], flat, 1024),
        "2": layers.linear_init(rngs[-1], 1024, 1),
    }
    return params


def _batch_bn(x, p):
    """Training-mode BN (batch statistics) — discriminator always trains."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv * p["scale"] + p["bias"]


def discriminator_apply(params: Params, x: jnp.ndarray,
                        patch_size: int = 96) -> jnp.ndarray:
    """x: (N,H,W,3) → (N,1) logits; center-crops to patch_size (:126-131).

    Pinned to plain convs: discriminator weights are shared across tasks
    (never per-task batched), so the episode's batched-weight fast-conv
    path buys nothing here — and when loss_ctx tangents flow into the
    inner-gradient region of an *un-vmapped* episode, the fast conv's
    custom_vmap cannot be linearized.
    """
    h, w = x.shape[1], x.shape[2]
    if h < patch_size or w < patch_size:
        # inputs smaller than the training patch (a thin eval tile): pad
        # to the classifier's expected extent instead of producing a
        # mis-sized crop (a negative start would Python-wrap the slice)
        x = jnp.pad(x, ((0, 0), (0, max(0, patch_size - h)),
                        (0, max(0, patch_size - w)), (0, 0)))
        h, w = x.shape[1], x.shape[2]
    if h != patch_size or w != patch_size:
        mh, mw = h // 2, w // 2
        p = patch_size // 2
        x = x[:, mh - p:mh - p + patch_size, mw - p:mw - p + patch_size, :]
    with layers.episode_fast_conv(False):
        for i, (_ic, _oc, s) in enumerate(_CHANNELS):
            blk = params["features"][str(i)]
            x = layers.conv2d(blk["conv"], x, stride=s, padding=1)
            x = _batch_bn(x, blk["bn"])
            x = layers.leaky_relu(x, 0.2)
    x = x.reshape(x.shape[0], -1)
    x = layers.leaky_relu(layers.linear(params["classifier"]["0"], x), 0.2)
    return layers.linear(params["classifier"]["2"], x)


def generator_loss(disc_params: Params, fake: jnp.ndarray, gan_type: str,
                   patch_size: int = 96) -> jnp.ndarray:
    """Pure generator adversarial term (reference loss.py:221-230) — safe
    inside the jitted episode; ``disc_params`` must be threaded as a traced
    argument (loss_ctx) so jit never caches stale discriminator weights."""
    d_fake = discriminator_apply(disc_params, fake, patch_size)
    if gan_type == "GAN":
        return jnp.mean(optax.sigmoid_binary_cross_entropy(
            d_fake, jnp.ones_like(d_fake)))
    return -jnp.mean(d_fake)


def build_replay_sequence(sp, qp, final_preds, frames, support_target_idxs,
                          query_target_idx):
    """Flatten the reference's --disc_per_forward criterion-call order
    into (fakes, reals) update sequences of shape (N, 1, H, W, C).

    sp: (B, S, P, H, W, C) per-step support preds; qp: (B, Sq, H, W, C)
    per-step MSL query preds for steps 0..Sq-1 (or None); final_preds:
    (B, H, W, C) the last query pred; frames: (B, T, H, W, C);
    support_target_idxs: the P per-pair target frame indices;
    query_target_idx: the query target frame index.

    N = B * (S*P + Sq + 1), in the reference's exact order (the criterion
    updates D on every call, inside the per-task python loop —
    loss.py:168-213, meta_learning_system.py:366): tasks SEQUENTIAL;
    within a task, per inner step the P support-pair preds then (while
    MSL is active) that step's query pred; after all steps, the final
    query pred. Every row is a single-task batch, which also matches the
    reference discriminator's BN batch statistics.
    """
    B, S, P = sp.shape[:3]
    img = sp.shape[3:]
    sup_t = frames[:, jnp.asarray(support_target_idxs)]       # (B, P, ...)
    sup_t = jnp.broadcast_to(sup_t[:, None], (B, S, P) + img)
    q_t = frames[:, query_target_idx]                          # (B, ...)
    if qp is not None:
        sq = qp.shape[1]
        head_f = jnp.concatenate([sp[:, :sq], qp[:, :, None]], axis=2)
        head_r = jnp.concatenate(
            [sup_t[:, :sq],
             jnp.broadcast_to(q_t[:, None, None], (B, sq, 1) + img)],
            axis=2)
        parts_f = [head_f.reshape(B, sq * (P + 1), *img),
                   sp[:, sq:].reshape(B, (S - sq) * P, *img)]
        parts_r = [head_r.reshape(B, sq * (P + 1), *img),
                   sup_t[:, sq:].reshape(B, (S - sq) * P, *img)]
    else:
        parts_f = [sp.reshape(B, S * P, *img)]
        parts_r = [sup_t.reshape(B, S * P, *img)]
    fakes = jnp.concatenate(parts_f + [final_preds[:, None]], axis=1)
    reals = jnp.concatenate(parts_r + [q_t[:, None]], axis=1)
    n_per = fakes.shape[1]
    return (fakes.reshape(B * n_per, 1, *img),
            reals.reshape(B * n_per, 1, *img))


@dataclasses.dataclass
class AdversarialState:
    gan_type: str
    params: Params
    opt_state: Any
    tx: optax.GradientTransformation
    patch_size: int = 96

    @classmethod
    def create(cls, rng: jax.Array, gan_type: str = "GAN",
               patch_size: int = 96) -> "AdversarialState":
        params = init_discriminator(rng, patch_size)
        if gan_type == "WGAN_GP":
            tx = optax.adam(1e-5, b1=0.0, b2=0.9)
        else:
            tx = optax.adam(1e-4, b1=0.9, b2=0.99)
        return cls(gan_type=gan_type, params=params, opt_state=tx.init(params),
                   tx=tx, patch_size=patch_size)

    # -- pure generator term (jit-safe inside the episode) -----------------
    def generator_loss(self, fake: jnp.ndarray) -> jnp.ndarray:
        """Eager convenience only — delegates to the module-level pure
        function. Inside a jitted episode use that function with the
        discriminator params from loss_ctx (closing over self.params
        here would bake stale weights into the jit cache — the hazard
        the module docstring describes)."""
        return generator_loss(self.params, fake, self.gan_type,
                              self.patch_size)

    # -- discriminator step (outside the episode) --------------------------
    def jitted_update(self):
        """Cached jitted pure update: (params, opt_state, fake, real, rng)
        → (params, opt_state, loss). Use for per-iteration training updates
        (the eager method below dispatches op-by-op)."""
        if not hasattr(self, "_jit_update"):
            tx, gan_type, patch = self.tx, self.gan_type, self.patch_size

            def step(params, opt_state, fake, real, rng):
                tmp = AdversarialState(gan_type=gan_type, params=params,
                                       opt_state=opt_state, tx=tx,
                                       patch_size=patch)
                loss = tmp.update_discriminator(fake, real, rng)
                return tmp.params, tmp.opt_state, loss

            object.__setattr__(self, "_jit_update", jax.jit(step))
        return self._jit_update

    def jitted_sequential_update(self):
        """Cached jitted SEQUENTIAL replay: (params, opt_state, fakes,
        reals, keys) → (params, opt_state, losses) where fakes/reals are
        (N, 1, H, W, C) and keys (N, 2) — N strictly-ordered single-item
        discriminator updates as ONE lax.scan program.

        This is the on-device form of the --disc_per_forward reference
        cadence (loss.py:168-213 inside the per-task loop at
        meta_learning_system.py:366): identical math and order to N
        host-dispatched jitted_update calls (pinned by test), but one
        dispatch instead of N — at bs8 x 3 MSL steps the host loop is
        ~80 dispatches/iteration through a ~700 µs tunnel (VERDICT r4
        item 6)."""
        if not hasattr(self, "_jit_seq_update"):
            tx, gan_type, patch = self.tx, self.gan_type, self.patch_size

            def one(carry, x):
                params, opt_state = carry
                fake, real, key = x
                tmp = AdversarialState(gan_type=gan_type, params=params,
                                       opt_state=opt_state, tx=tx,
                                       patch_size=patch)
                loss = tmp.update_discriminator(fake, real, key)
                return (tmp.params, tmp.opt_state), loss

            def run(params, opt_state, fakes, reals, keys):
                (p, o), losses = jax.lax.scan(
                    one, (params, opt_state), (fakes, reals, keys))
                return p, o, losses

            object.__setattr__(self, "_jit_seq_update", jax.jit(run))
        return self._jit_seq_update

    def update_discriminator(self, fake: jnp.ndarray, real: jnp.ndarray,
                             rng: jax.Array) -> jnp.ndarray:
        fake = jax.lax.stop_gradient(fake)

        def d_loss(params):
            d_fake = discriminator_apply(params, fake, self.patch_size)
            d_real = discriminator_apply(params, real, self.patch_size)
            if self.gan_type == "GAN":
                return (jnp.mean(optax.sigmoid_binary_cross_entropy(
                            d_fake, jnp.zeros_like(d_fake)))
                        + jnp.mean(optax.sigmoid_binary_cross_entropy(
                            d_real, jnp.ones_like(d_real))))
            loss = jnp.mean(d_fake - d_real)
            if self.gan_type == "WGAN_GP":
                eps = jax.random.uniform(rng, (fake.shape[0], 1, 1, 1))
                hat = fake * (1 - eps) + real * eps

                def d_sum(h):
                    return jnp.sum(discriminator_apply(params, h,
                                                       self.patch_size))

                grads = jax.grad(d_sum)(hat)
                gnorm = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
                loss = loss + 10.0 * jnp.mean((gnorm - 1.0) ** 2)
            return loss

        loss, grads = jax.value_and_grad(d_loss)(self.params)
        updates, self.opt_state = self.tx.update(grads, self.opt_state,
                                                 self.params)
        self.params = optax.apply_updates(self.params, updates)
        if self.gan_type == "WGAN":
            self.params = jax.tree.map(lambda p: jnp.clip(p, -1.0, 1.0),
                                       self.params)
        return loss
