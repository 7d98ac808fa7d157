"""CTC loss tests: vs brute-force enumeration and vs torch.nn.CTCLoss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops import ctc_loss


def brute_force_ctc(log_probs, labels, blank=0):
    """Sum over all alignments by dynamic programming in plain python."""
    import itertools
    t, v = log_probs.shape
    total = -np.inf
    # Enumerate all paths (V^T) — only viable for tiny cases.
    for path in itertools.product(range(v), repeat=t):
        collapsed = []
        prev = None
        for p in path:
            if p != blank and p != prev:
                collapsed.append(p)
            prev = p
        if collapsed == list(labels):
            lp = sum(log_probs[i, p] for i, p in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def test_ctc_vs_brute_force():
    rng = np.random.RandomState(0)
    t, v = 4, 3
    logits = rng.randn(1, t, v).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = np.array([[1, 2]])
    loss = ctc_loss(lp, jnp.array([t]), jnp.asarray(labels), jnp.array([2]))
    ref = brute_force_ctc(np.asarray(lp)[0], [1, 2])
    np.testing.assert_allclose(np.asarray(loss)[0], ref, rtol=1e-4)


def test_ctc_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    b, t, v, u = 3, 20, 10, 6
    logits = rng.randn(b, t, v).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.randint(1, v, size=(b, u))
    ilens = np.array([20, 15, 9])
    olens = np.array([6, 4, 2])
    loss = ctc_loss(lp, jnp.asarray(ilens), jnp.asarray(labels),
                    jnp.asarray(olens))
    tl = torch.nn.CTCLoss(blank=0, reduction="none")(
        torch.from_numpy(np.asarray(lp)).transpose(0, 1),
        torch.from_numpy(labels),
        torch.from_numpy(ilens), torch.from_numpy(olens))
    np.testing.assert_allclose(np.asarray(loss), tl.numpy(), rtol=1e-4)


def test_ctc_infeasible_is_zero():
    lp = jax.nn.log_softmax(jnp.zeros((1, 3, 5)), axis=-1)
    # 4 labels in 3 frames: infeasible -> 0 (zero_infinity semantics).
    loss = ctc_loss(lp, jnp.array([3]), jnp.asarray([[1, 2, 3, 4]]),
                    jnp.array([4]))
    assert float(loss[0]) == 0.0


def test_ctc_grad_finite():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 8, size=(2, 4)))

    def f(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.array([12, 10]), labels,
                        jnp.array([4, 3])).sum()

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    # Padded label/frames of example 2 beyond length 10 get zero grad? —
    # frames past logit_lengths are frozen in the scan, so their grad is 0.
    assert np.abs(np.asarray(g)[1, 10:]).max() == 0.0


def test_ctc_loss_logits_matches_logsoftmax_path():
    """Fused gather+logsumexp emit == log_softmax-then-gather, value + grad."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from espnet_slurp_tpu.ops import ctc as C
    rng = np.random.RandomState(0)
    b, t, v, u = 4, 20, 30, 6
    logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, (b, u)))
    tl = jnp.asarray([20, 15, 10, 20])
    ll = jnp.asarray([6, 4, 2, 0])
    f1 = lambda lg: jnp.sum(C.ctc_loss(jax.nn.log_softmax(lg, -1), tl,
                                       labels, ll))
    f2 = lambda lg: jnp.sum(C.ctc_loss_logits(lg, tl, labels, ll))
    v1, g1 = jax.value_and_grad(f1)(logits)
    v2, g2 = jax.value_and_grad(f2)(logits)
    assert abs(float(v1 - v2)) < 1e-4
    assert float(jnp.max(jnp.abs(g1 - g2))) < 1e-5


def test_ctc_infeasible_repeats_zeroed():
    """T < U + n_repeats is infeasible: loss must be 0, matching torch
    CTCLoss(zero_infinity=True) (reference espnet2/asr/ctc.py:38-41)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from espnet_slurp_tpu.ops import ctc as C
    v, t = 5, 4
    rng = np.random.RandomState(0)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(2, t, v)), -1)
    labels = jnp.asarray([[1, 1, 1], [1, 2, 3]])  # ex0 needs T >= 5
    loss = C.ctc_loss(lp, jnp.asarray([t, t]), labels, jnp.asarray([3, 3]))
    tref = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        torch.tensor(np.asarray(lp)).permute(1, 0, 2),
        torch.tensor([[1, 1, 1], [1, 2, 3]]),
        torch.tensor([t, t]), torch.tensor([3, 3]))
    assert float(loss[0]) == 0.0 and float(tref[0]) == 0.0
    assert abs(float(loss[1]) - float(tref[1])) < 1e-4
