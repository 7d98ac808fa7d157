"""Pallas RNN-T lattice kernel vs the XLA anti-diagonal scan (exactness of
loss and gradients, incl. per-example length handling). Runs the kernel in
interpret mode on CPU (tests/conftest.py pins JAX_PLATFORMS=cpu)."""
import numpy as np
import jax
import jax.numpy as jnp

import espnet_slurp_tpu.ops.transducer as tr
from espnet_slurp_tpu.ops.pallas.transducer import rnnt_lattice_pallas

NEG_INF = tr.NEG_INF


def _tables(rng, b, t, u, v):
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)), jnp.int32)
    tlens = jnp.asarray(rng.randint(t // 2, t + 1, size=(b,)), jnp.int32)
    ulens = jnp.asarray(rng.randint(1, u + 1, size=(b,)), jnp.int32)
    return log_probs, labels, tlens, ulens


def _pallas_loss(log_probs, labels, tlens, ulens, blank_id=0):
    """Mirror of the dispatcher's pallas path (ops/transducer.py) — built
    here so it runs in interpret mode on CPU."""
    b, t, u1, v = log_probs.shape
    u = u1 - 1
    blank_lp = log_probs[..., blank_id]
    lbl = jnp.minimum(labels, v - 1).astype(jnp.int32)
    emit_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :], lbl[:, None, :, None], axis=3)[..., 0]
    emit_lp = jnp.pad(emit_lp, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG_INF)
    u_pad = -(-u1 // 128) * 128
    pad = ((0, 0), (0, 0), (0, u_pad - u1))
    return rnnt_lattice_pallas(
        jnp.pad(blank_lp, pad, constant_values=NEG_INF),
        jnp.pad(emit_lp, pad, constant_values=NEG_INF),
        tlens.astype(jnp.int32), ulens.astype(jnp.int32))


def test_pallas_rnnt_matches_scan_loss_and_grads():
    rng = np.random.RandomState(0)
    log_probs, labels, tlens, ulens = _tables(rng, 4, 11, 6, 9)

    loss_ref = tr.rnnt_loss_from_logprobs(log_probs, labels, tlens, ulens)
    loss_pal = _pallas_loss(log_probs, labels, tlens, ulens)
    np.testing.assert_allclose(np.asarray(loss_pal), np.asarray(loss_ref),
                               rtol=1e-4, atol=1e-4)

    w = jnp.asarray(rng.randn(4).astype(np.float32))

    def f_ref(lp):
        return jnp.sum(tr.rnnt_loss_from_logprobs(lp, labels, tlens,
                                                   ulens) * w)

    def f_pal(lp):
        return jnp.sum(_pallas_loss(lp, labels, tlens, ulens) * w)

    g_ref = np.asarray(jax.grad(f_ref)(log_probs))
    g_pal = np.asarray(jax.grad(f_pal)(log_probs))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-3, atol=1e-4)


def test_pallas_rnnt_full_lengths():
    rng = np.random.RandomState(1)
    b, t, u, v = 2, 7, 4, 6
    log_probs, labels, _, _ = _tables(rng, b, t, u, v)
    tlens = jnp.full((b,), t, jnp.int32)
    ulens = jnp.full((b,), u, jnp.int32)
    loss_ref = tr.rnnt_loss_from_logprobs(log_probs, labels, tlens, ulens)
    loss_pal = _pallas_loss(log_probs, labels, tlens, ulens)
    np.testing.assert_allclose(np.asarray(loss_pal), np.asarray(loss_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_rnnt_long_labels_cross_lane_boundary():
    """U+1 > 128 pads to 256 lanes; the doubling scans must stay exact."""
    rng = np.random.RandomState(2)
    b, t, u, v = 2, 20, 140, 6
    log_probs, labels, _, _ = _tables(rng, b, t, u, v)
    tlens = jnp.asarray([20, 15], jnp.int32)
    ulens = jnp.asarray([10, 14], jnp.int32)  # T >= U so paths exist
    loss_ref = tr.rnnt_loss_from_logprobs(log_probs, labels, tlens, ulens)
    loss_pal = _pallas_loss(log_probs, labels, tlens, ulens)
    np.testing.assert_allclose(np.asarray(loss_pal), np.asarray(loss_ref),
                               rtol=1e-4, atol=1e-4)
