"""Pallas CTC kernel vs the lax.scan reference implementation.

Runs in interpret mode on CPU; on TPU the same code compiles via Mosaic.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops.ctc import ctc_loss as ctc_loss_scan
from espnet_slurp_tpu.ops.pallas.ctc import ctc_loss_pallas


def _case(b=3, t=20, v=10, u=6, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)))
    ilens = jnp.asarray([t, t - 5, t - 11])
    olens = jnp.asarray([u, u - 2, 1])
    return lp, ilens, labels, olens


def test_pallas_ctc_matches_scan():
    lp, ilens, labels, olens = _case()
    ours = ctc_loss_pallas(lp, ilens, labels, olens)
    ref = ctc_loss_scan(lp, ilens, labels, olens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_pallas_ctc_repeated_labels():
    rng = np.random.RandomState(1)
    t, v = 12, 6
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(1, t, v), jnp.float32), -1)
    labels = jnp.asarray([[2, 2, 3, 3]])
    ours = ctc_loss_pallas(lp, jnp.array([t]), labels, jnp.array([4]))
    ref = ctc_loss_scan(lp, jnp.array([t]), labels, jnp.array([4]))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_pallas_ctc_grad_matches_scan():
    lp, ilens, labels, olens = _case(seed=2)
    logits = jnp.asarray(np.random.RandomState(3).randn(3, 20, 10),
                         jnp.float32)

    def f_pallas(lg):
        return ctc_loss_pallas(jax.nn.log_softmax(lg, -1), ilens, labels,
                               olens).sum()

    def f_scan(lg):
        return ctc_loss_scan(jax.nn.log_softmax(lg, -1), ilens, labels,
                             olens).sum()

    g1 = jax.grad(f_pallas)(logits)
    g2 = jax.grad(f_scan)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_pallas_ctc_infeasible_zero():
    lp = jax.nn.log_softmax(jnp.zeros((1, 3, 5)), -1)
    loss = ctc_loss_pallas(lp, jnp.array([3]), jnp.asarray([[1, 2, 3, 4]]),
                           jnp.array([4]))
    assert float(loss[0]) == 0.0
