"""RNN-T (transducer) loss — log-space wavefront scan, TPU-native.

Parity target: reference external warp-transducer / warp-rnnt CUDA kernels
(SURVEY.md §2.9; hooked in at espnet2/asr/espnet_model.py:108-116 and
espnet/nets/pytorch_backend/transducer/loss.py:16-95). Nothing like them
exists for TPU, so the alpha recursion is implemented as a lax.scan over
anti-diagonals of the (T, U) lattice: each scan step updates one diagonal
vectorized over [B, U+1] — T+U sequential steps of pure VPU work instead of
T*U, and XLA differentiates the scan for the backward pass.

The fork's KB-aware variant (TCPGen probs mixed inside the loss,
transducer/loss.py:26-90) is supported via the `log_probs` entry point: mix
distributions upstream, then hand the final [B, T, U+1, V] log-probs here.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _lse(a, b):
    m = jnp.maximum(a, b)
    m = jnp.maximum(m, NEG_INF)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def rnnt_loss_from_logprobs(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example negative log-likelihood.

    Args:
      log_probs: [B, T, U+1, V] joint-network log-softmax outputs.
      labels: [B, U] target ids.
      logit_lengths: [B] valid encoder frames T_b.
      label_lengths: [B] valid label counts U_b.
    """
    b, t, u1, v = log_probs.shape
    u = u1 - 1
    blank_lp = log_probs[..., blank_id]  # [B, T, U+1]
    # emit_lp[b, t, u] = log P(y_{u+1} | t, u) for u < U
    lbl = jnp.minimum(labels, v - 1).astype(jnp.int32)  # [B, U]
    emit_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :], lbl[:, None, :, None], axis=3)[..., 0]
    emit_lp = jnp.pad(emit_lp, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG_INF)  # [B, T, U+1]

    if jax.default_backend() == "tpu":
        # Pallas lattice kernel (ops/pallas/transducer.py): the whole
        # (T, U+1) recursion as one Mosaic kernel with log2(U1)-step
        # doubling row scans, vs T+U XLA while-loop dispatches here.
        from .pallas.transducer import rnnt_lattice_pallas
        u_pad = -(-u1 // 128) * 128
        pad = ((0, 0), (0, 0), (0, u_pad - u1))
        loss = rnnt_lattice_pallas(
            jnp.pad(blank_lp, pad, constant_values=NEG_INF),
            jnp.pad(emit_lp, pad, constant_values=NEG_INF),
            logit_lengths.astype(jnp.int32),
            label_lengths.astype(jnp.int32))
        feasible = (label_lengths <= u) & (logit_lengths >= 1)
        return jnp.where(feasible, loss, 0.0)

    n_diag = t + u  # diagonals 1 .. t+u-? we iterate d = 1..t+u-1+? careful
    u_range = jnp.arange(u1)  # [U+1]

    def diag_gather(mat, t_idx):
        """mat [B, T, U+1]; t_idx [U+1] -> out[b, u] = mat[b, t_idx[u], u]
        (t_idx clipped; invalid handled by caller masks)."""
        idx = jnp.clip(t_idx, 0, t - 1)[None, :, None]  # [1, U+1, 1]
        idx = jnp.broadcast_to(idx, (b, u1, 1))
        # mat transposed to [B, U+1, T] for take_along_axis on last axis
        mt = jnp.swapaxes(mat, 1, 2)  # [B, U+1, T]
        return jnp.take_along_axis(mt, idx, axis=2)[..., 0]  # [B, U+1]

    diag0 = jnp.full((b, u1), NEG_INF).at[:, 0].set(0.0)

    def step(prev_diag, d):
        # alpha[t, u] on diagonal d (t = d - u):
        #   from blank: alpha[t-1, u] + blank[t-1, u]   (diag d-1, same u)
        #   from emit : alpha[t, u-1] + emit[t, u-1]    (diag d-1, u-1)
        t_src = d - 1 - u_range  # source frame index on diagonal d-1, per u'
        src_valid = (t_src >= 0) & (t_src < t)  # [U+1]
        blank_diag = diag_gather(blank_lp, t_src)  # blank[t-1, u] at u'=u
        from_blank = jnp.where(src_valid[None, :],
                               prev_diag + blank_diag, NEG_INF)
        # emit[t, u-1] with t = d-u: at source index u' = u-1 this is
        # emit_lp[b, d-1-u', u'] — same t_src gather, shifted one in u.
        emit_diag = diag_gather(emit_lp, t_src)  # [B, U+1] at u'
        emit_path = jnp.where(src_valid[None, :],
                              prev_diag + emit_diag, NEG_INF)
        from_emit = jnp.pad(emit_path, ((0, 0), (1, 0)),
                            constant_values=NEG_INF)[:, :u1]
        new_diag = _lse(from_blank, from_emit)
        new_diag = jnp.maximum(new_diag, NEG_INF)
        return new_diag, new_diag

    ds = jnp.arange(1, t + u1)
    _, diags = lax.scan(step, diag0, ds)  # [T+U, B, U+1]
    all_diags = jnp.concatenate([diag0[None], diags], axis=0)

    # alpha[T_b - 1, U_b] lives on diagonal d = T_b - 1 + U_b at index U_b.
    d_final = logit_lengths - 1 + label_lengths  # [B]
    alpha_final = all_diags[d_final, jnp.arange(b), label_lengths]
    blank_final = jnp.take_along_axis(
        jnp.take_along_axis(blank_lp, (logit_lengths - 1)[:, None, None],
                            axis=1)[:, 0],
        label_lengths[:, None], axis=1)[:, 0]
    ll = alpha_final + blank_final
    feasible = (label_lengths <= u) & (logit_lengths >= 1)
    return jnp.where(feasible, -ll, 0.0)


def rnnt_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """logits: [B, T, U+1, V] raw joint outputs -> per-example NLL."""
    return rnnt_loss_from_logprobs(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
        labels, logit_lengths, label_lengths, blank_id)


def rnnt_loss_mean(logits, labels, logit_lengths, label_lengths,
                   blank_id: int = 0) -> jnp.ndarray:
    per = rnnt_loss(logits, labels, logit_lengths, label_lengths, blank_id)
    return jnp.sum(per) / per.shape[0]
