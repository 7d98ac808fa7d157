"""Pallas TPU kernel: CTC forward-backward with custom VJP.

Replaces the external cuDNN CTCLoss of the reference (espnet2/asr/ctc.py:38-41,
SURVEY.md §2.9 'Pallas log-space forward-backward scan kernel'). One grid
program per batch element; the (T, S) lattice lives in VMEM; the time loop is
a fori_loop inside the kernel, so the whole recursion compiles to a single
Mosaic kernel instead of a T-step XLA while-loop with per-step HLO overhead.

The vocab gather (emit log-probs for the blank-interleaved label sequence)
and its scatter-transpose stay OUTSIDE the kernel in jax — XLA handles those
well and autodiff of take_along_axis gives the scatter for free. The kernel
computes: forward alphas, loss, and (in backward) betas + posterior
gradients w.r.t. the gathered emit matrix.

S (=2U+1) is padded to a lane multiple by the caller; padded states carry
-inf emissions so they never absorb probability mass.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, NEG)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_right(x, k):
    """Shift a [1, S] row right by k states, filling -inf.

    Uses pltpu.roll (lane rotation) + iota mask — Mosaic cannot lower
    cross-tile 1-D concatenates, rolls it can.
    """
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= k, pltpu.roll(x, k, 1), NEG)


def _shift_left(x, k):
    s = x.shape[1]
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # roll only takes non-negative shifts: left-shift k == rotate by s - k.
    return jnp.where(col < s - k, pltpu.roll(x, s - k, 1), NEG)


def _fwd_kernel(emit_ref, skip_ref, tlen_ref, last_ref,
                loss_ref, alpha_ref):
    """One batch element: emit [1, T, S], skip [1, S] (1.0 = skip allowed),
    tlen/last scalars; outputs loss [1, 1] and alpha [1, T, S]."""
    i_b = pl.program_id(0)
    t_max = emit_ref.shape[1]
    s = emit_ref.shape[2]
    skip = skip_ref[0, :, :]  # [1, S]
    tlen = tlen_ref[i_b]
    last = last_ref[i_b]

    col = lax.broadcasted_iota(jnp.int32, (1, s), 1)
    a0 = jnp.where(col < 2, emit_ref[0, 0:1, :], NEG)
    alpha_ref[0, 0:1, :] = a0

    def body(t, alpha):
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(skip > 0, _shift_right(alpha, 2), NEG)
        new = _logaddexp3(alpha, a1, a2) + emit_ref[0, pl.ds(t, 1), :]
        new = jnp.maximum(new, NEG)
        new = jnp.where(t < tlen, new, alpha)  # freeze past valid frames
        alpha_ref[0, pl.ds(t, 1), :] = new
        return new

    alpha = lax.fori_loop(1, t_max, body, a0)
    a_last = jnp.max(jnp.where(col == last, alpha, NEG))
    a_prev = jnp.max(jnp.where(col == jnp.maximum(last - 1, 0), alpha, NEG))
    m = jnp.maximum(jnp.maximum(a_last, a_prev), NEG)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    loss_ref[i_b, 0] = -ll


def _bwd_kernel(emit_ref, skip_ref, tlen_ref, last_ref, alpha_ref, g_ref,
                demit_ref):
    """Beta recursion + posterior gradient.

    d loss / d emit[t, s] = -exp(alpha[t,s] + beta[t,s] - ll) * g
    where beta excludes the emit term at (t, s) (standard CTC posterior).
    """
    i_b = pl.program_id(0)
    t_max = emit_ref.shape[1]
    s = emit_ref.shape[2]
    skip = skip_ref[0, :, :]  # [1, S]
    tlen = tlen_ref[i_b]
    last = last_ref[i_b]
    g = g_ref[i_b]

    col = lax.broadcasted_iota(jnp.int32, (1, s), 1)

    # Recompute ll from alpha at the last valid frame (t = tlen-1 is frozen
    # into alpha[t_max-1] by the forward freeze logic).
    alpha_T = alpha_ref[0, t_max - 1:t_max, :]
    a_last = jnp.max(jnp.where(col == last, alpha_T, NEG))
    a_prev = jnp.max(jnp.where(col == jnp.maximum(last - 1, 0), alpha_T, NEG))
    m = jnp.maximum(jnp.maximum(a_last, a_prev), NEG)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))

    # beta[t, s]: probability of the suffix, WITHOUT emit at (t, s).
    beta_T = jnp.where((col == last) | (col == jnp.maximum(last - 1, 0)),
                       0.0, NEG)  # [1, S]
    skip_shift2 = _shift_left(jnp.where(skip > 0, jnp.zeros((1, s)), NEG), 2)

    def body(i, beta):
        # i runs 0..t_max-2 mapping to t = t_max-2-i; only t < tlen-1 active.
        t = t_max - 2 - i
        # beta[t, s] = lse over successors at t+1 (each including its own
        # emission): stay (s), advance (s+1), skip (s+2 if allowed there).
        emit_n = emit_ref[0, pl.ds(t + 1, 1), :]
        be = beta + emit_n
        b1 = _shift_left(be, 1)
        b2 = _shift_left(be, 2) + skip_shift2
        new = _logaddexp3(be, b1, b2)
        new = jnp.maximum(new, NEG)
        # At t >= tlen-1 beta stays terminal (those frames do not exist).
        new = jnp.where(t < tlen - 1, new, beta)
        post = alpha_ref[0, pl.ds(t, 1), :] + new - ll
        demit_ref[0, pl.ds(t, 1), :] = -jnp.exp(jnp.minimum(post, 0.0)) * g
        return new

    lax.fori_loop(0, t_max - 1, body, beta_T)
    # Top row t = t_max-1: terminal beta (only meaningful when tlen == t_max).
    post_T = alpha_ref[0, t_max - 1:t_max, :] + beta_T - ll
    demit_ref[0, t_max - 1:t_max, :] = -jnp.exp(jnp.minimum(post_T, 0.0)) * g
    # Mask frames past each example's valid length.
    t_col = lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1)
    demit_ref[...] = jnp.where(t_col < tlen, demit_ref[...], 0.0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _ctc_core(emit, skip, tlen, last):
    loss, _ = _ctc_fwd(emit, skip, tlen, last)
    return loss


def _pallas_fwd(emit, skip, tlen, last):
    b, t, s = emit.shape
    grid = (b,)
    kernel = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        ],
        interpret=_interp(),
    )
    return kernel(emit, skip, tlen, last)


def _ctc_fwd(emit, skip, tlen, last):
    loss, alpha = _pallas_fwd_squeeze(emit, skip, tlen, last)
    return loss, (emit, skip, tlen, last, alpha)


def _pallas_fwd_squeeze(emit, skip, tlen, last):
    loss, alpha = _pallas_fwd(emit, skip, tlen, last)
    return loss[:, 0], alpha


def _ctc_bwd(res, g):
    emit, skip, tlen, last, alpha = res
    b, t, s = emit.shape
    kernel = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        interpret=_interp(),
    )
    demit = kernel(emit, skip, tlen, last, alpha,
                   g.reshape(b).astype(jnp.float32))
    return demit, None, None, None


_ctc_core.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_pallas(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Drop-in replacement for ops.ctc.ctc_loss using the Pallas kernel."""
    b, t, v = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1
    s_pad = _round_up(s, 128)
    ext = jnp.full((b, s_pad), blank_id, labels.dtype)
    ext = ext.at[:, 1:s:2].set(jnp.maximum(labels, 0))
    ext_prev2 = jnp.pad(ext[:, :s], ((0, 0), (2, 0)),
                        constant_values=blank_id)[:, :s]
    allow = (ext[:, :s] != blank_id) & (ext[:, :s] != ext_prev2)
    skip = jnp.zeros((b, s_pad), jnp.float32).at[:, :s].set(
        allow.astype(jnp.float32))
    # Gather emissions (outside the kernel; autodiff scatters back).
    emit = jnp.take_along_axis(log_probs, ext[:, None, :].astype(jnp.int32),
                               axis=2).astype(jnp.float32)  # [B, T, S_pad]
    # Mask states beyond the true S and beyond each example's 2U_b+1.
    col = jnp.arange(s_pad)[None, :]
    smax = 2 * label_lengths + 1
    emit = jnp.where((col < smax[:, None])[:, None, :], emit, NEG)
    last = (2 * label_lengths).astype(jnp.int32)
    loss = _ctc_core(emit, skip[:, None, :], logit_lengths.astype(jnp.int32),
                     last)
    # zero_infinity semantics: U > T is one infeasible case, but so is
    # T < U + n_repeats (adjacent repeats need a separating blank); detect
    # the saturated NEG likelihood directly rather than enumerating cases.
    feasible = (label_lengths <= logit_lengths) & (loss < -NEG / 2)
    return jnp.where(feasible, loss, 0.0)


def ctc_loss_pallas_logits(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """CTC straight from projection logits: per-frame logsumexp + S-wide
    gather (never materializes f32 [B,T,V] log-probs) feeding the Pallas
    forward-backward lattice kernel. Deliberately plain-autodiff emit: the
    transpose of take_along_axis is a one-axis scatter XLA lowers well,
    whereas a hand-written 3-index scatter-add measured 6x slower on v5e
    (95 ms vs 16 ms fwd+bwd at B=64/T=468/V=5000). The training hot path
    on TPU (PERF_NOTES.md round-2)."""
    b, t, v = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1
    s_pad = _round_up(s, 128)
    ext = jnp.full((b, s_pad), blank_id, labels.dtype)
    ext = ext.at[:, 1:s:2].set(jnp.maximum(labels, 0))
    ext_prev2 = jnp.pad(ext[:, :s], ((0, 0), (2, 0)),
                        constant_values=blank_id)[:, :s]
    allow = (ext[:, :s] != blank_id) & (ext[:, :s] != ext_prev2)
    skip = jnp.zeros((b, s_pad), jnp.float32).at[:, :s].set(
        allow.astype(jnp.float32))
    z = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)  # [B, T]
    emit = jnp.take_along_axis(
        logits, ext[:, None, :].astype(jnp.int32), axis=2
    ).astype(jnp.float32) - z[..., None]  # [B, T, S_pad]
    col = jnp.arange(s_pad)[None, :]
    smax = 2 * label_lengths + 1
    emit = jnp.where((col < smax[:, None])[:, None, :], emit, NEG)
    last = (2 * label_lengths).astype(jnp.int32)
    loss = _ctc_core(emit, skip[:, None, :], logit_lengths.astype(jnp.int32),
                     last)
    feasible = (label_lengths <= logit_lengths) & (loss < -NEG / 2)
    return jnp.where(feasible, loss, 0.0)
