"""Fused CTC head (Pallas projection+logsumexp+gather) vs the composed path.

ctc_loss_pallas_head(hs, w, b, ...) must equal
ctc_loss_logits(hs @ w + b, ...) — loss AND gradients wrt hs/w/b — on
ragged lengths. Interpret mode on CPU; the Mosaic lowering shares the
kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_slurp_tpu.ops.ctc import ctc_loss_logits
from espnet_slurp_tpu.ops.pallas.ctc_head import ctc_loss_pallas_head


def _mk(b=3, t=25, d=128, v=77, u=6, seed=0):
    rng = np.random.RandomState(seed)
    hs = jnp.asarray(rng.randn(b, t, d).astype(np.float32)) * 0.3
    w = jnp.asarray(rng.randn(d, v).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(v).astype(np.float32)) * 0.1
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)), jnp.int32)
    tlen = jnp.asarray([t, t - 5, t - 11][:b], jnp.int32)
    ulen = jnp.asarray([u, u - 2, u - 4][:b], jnp.int32)
    return hs, w, bias, labels, tlen, ulen


def test_fused_head_loss_matches():
    hs, w, bias, labels, tlen, ulen = _mk()
    ref = ctc_loss_logits(hs @ w + bias, tlen, labels, ulen)
    got = ctc_loss_pallas_head(hs, w, bias, tlen, labels, ulen)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_grads_match():
    hs, w, bias, labels, tlen, ulen = _mk()

    def loss_ref(hs, w, bias):
        return jnp.sum(ctc_loss_logits(hs @ w + bias, tlen, labels, ulen))

    def loss_fused(hs, w, bias):
        return jnp.sum(ctc_loss_pallas_head(hs, w, bias, tlen, labels, ulen))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(hs, w, bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(hs, w, bias)
    for name, a, b in zip(("dhs", "dw", "db"), g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0,
            atol=2e-4 * max(1.0, float(jnp.abs(b).max())), err_msg=name)


def test_fused_head_nondivisible_vocab_and_t():
    # V not a multiple of 128 AND T not a multiple of the row tile:
    # exercises vocab padding + edge-block row masking in the backward.
    hs, w, bias, labels, tlen, ulen = _mk(b=2, t=133, d=128, v=130, u=4,
                                          seed=3)

    def loss_fused(hs, w, bias):
        return jnp.sum(ctc_loss_pallas_head(hs, w, bias, tlen, labels, ulen))

    def loss_ref(hs, w, bias):
        return jnp.sum(ctc_loss_logits(hs @ w + bias, tlen, labels, ulen))

    np.testing.assert_allclose(np.asarray(loss_fused(hs, w, bias)),
                               np.asarray(loss_ref(hs, w, bias)),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(hs, w, bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(hs, w, bias)
    for name, a, b in zip(("dhs", "dw", "db"), g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0,
            atol=2e-4 * max(1.0, float(jnp.abs(b).max())), err_msg=name)
