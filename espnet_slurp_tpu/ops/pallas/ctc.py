"""Pallas TPU kernel: CTC forward-backward with custom VJP.

Replaces the external cuDNN CTCLoss of the reference (espnet2/asr/ctc.py:38-41,
SURVEY.md §2.9 'Pallas log-space forward-backward scan kernel'). The grid
tiles the batch into [BT, S] slabs (BT=8 rows -> one native f32 (8,128)
tile per vector op); the (T, S) lattice lives in VMEM and the time loop is
a fori_loop inside the kernel, so the whole recursion compiles to a single
Mosaic kernel instead of a T-step XLA while-loop with per-step HLO overhead.
Batch-tiling matters: one-row-per-program measured 14.9 ms fwd+bwd at
B=64/T=468; 8-row slabs amortize the per-step loop overhead 8x.

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
    """Shift [BT, S] rows right by k states along lanes, filling -inf.

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
    """One batch slab: emit [BT, T, S], skip [BT, S] (1.0 = skip allowed),
    tlen/last [BT, 1] int32; outputs loss [BT, 1] and alpha [BT, T, S]."""
    bt = emit_ref.shape[0]
    t_max = emit_ref.shape[1]
    s = emit_ref.shape[2]
    skip = skip_ref[...]        # [BT, S]
    tlen = tlen_ref[...]        # [BT, 1]
    last = last_ref[...]        # [BT, 1]

    col = lax.broadcasted_iota(jnp.int32, (bt, s), 1)
    a0 = jnp.where(col < 2, emit_ref[:, 0, :], NEG)
    alpha_ref[:, 0, :] = a0

    def body(t, alpha):
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(skip > 0, _shift_right(alpha, 2), NEG)
        new = _logaddexp3(alpha, a1, a2) + emit_ref[:, t, :]
        new = jnp.maximum(new, NEG)
        new = jnp.where(t < tlen, new, alpha)  # freeze past valid frames
        alpha_ref[:, t, :] = new
        return new

    alpha = lax.fori_loop(1, t_max, body, a0)
    a_last = jnp.max(jnp.where(col == last, alpha, NEG), axis=1,
                     keepdims=True)
    a_prev = jnp.max(jnp.where(col == jnp.maximum(last - 1, 0), alpha, NEG),
                     axis=1, keepdims=True)
    m = jnp.maximum(jnp.maximum(a_last, a_prev), NEG)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    loss_ref[...] = -ll


def _bwd_kernel(emit_ref, skip_ref, tlen_ref, last_ref, alpha_ref, g_ref,
                demit_ref):
    """Beta recursion + posterior gradient over a [BT, T, S] slab.

    d loss / d emit[t, s] = -exp(alpha[t,s] + beta[t,s] - ll) * g
    where beta excludes the emit term at (t, s) (standard CTC posterior).
    """
    bt = emit_ref.shape[0]
    t_max = emit_ref.shape[1]
    s = emit_ref.shape[2]
    skip = skip_ref[...]        # [BT, S]
    tlen = tlen_ref[...]        # [BT, 1]
    last = last_ref[...]        # [BT, 1]
    g = g_ref[...]              # [BT, 1]

    col = lax.broadcasted_iota(jnp.int32, (bt, s), 1)

    # Recompute ll from alpha at the last valid frame (t = tlen-1 is frozen
    # into alpha[t_max-1] by the forward freeze logic).
    alpha_T = alpha_ref[:, t_max - 1, :]
    a_last = jnp.max(jnp.where(col == last, alpha_T, NEG), axis=1,
                     keepdims=True)
    a_prev = jnp.max(jnp.where(col == jnp.maximum(last - 1, 0), alpha_T, NEG),
                     axis=1, keepdims=True)
    m = jnp.maximum(jnp.maximum(a_last, a_prev), NEG)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))  # [BT, 1]

    # beta[t, s]: probability of the suffix, WITHOUT emit at (t, s).
    beta_T = jnp.where((col == last) | (col == jnp.maximum(last - 1, 0)),
                       0.0, NEG)  # [BT, S]
    skip_shift2 = _shift_left(jnp.where(skip > 0, jnp.zeros((bt, s)), NEG), 2)

    def body(i, beta):
        # i runs 0..t_max-2 mapping to t = t_max-2-i; only t < tlen-1 active.
        t = t_max - 2 - i
        # beta[t, s] = lse over successors at t+1 (each including its own
        # emission): stay (s), advance (s+1), skip (s+2 if allowed there).
        emit_n = emit_ref[:, t + 1, :]
        be = beta + emit_n
        b1 = _shift_left(be, 1)
        b2 = _shift_left(be, 2) + skip_shift2
        new = _logaddexp3(be, b1, b2)
        new = jnp.maximum(new, NEG)
        # At t >= tlen-1 beta stays terminal (those frames do not exist).
        new = jnp.where(t < tlen - 1, new, beta)
        post = alpha_ref[:, t, :] + new - ll
        active = t < tlen  # [BT, 1]: frames past the valid length get 0
        demit_ref[:, t, :] = jnp.where(
            active, -jnp.exp(jnp.minimum(post, 0.0)) * g, 0.0)
        return new

    lax.fori_loop(0, t_max - 1, body, beta_T)
    # Top row t = t_max-1: terminal beta (only meaningful when tlen == t_max).
    post_T = alpha_ref[:, t_max - 1, :] + beta_T - ll
    demit_ref[:, t_max - 1, :] = jnp.where(
        t_max - 1 < tlen, -jnp.exp(jnp.minimum(post_T, 0.0)) * g, 0.0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _ctc_core_raw(emit, skip, tlen, last):
    loss, _ = _ctc_fwd(emit, skip, tlen, last)
    return loss


def _ctc_core(emit, skip, tlen, last):
    """Pad the batch to a Mosaic-tileable row count (multiple of 8 unless
    already a single tile): ragged last batches of an epoch (e.g. B=54)
    otherwise force a batch-tile the lowering rejects. Padded rows run a
    1-frame dummy lattice and are sliced off (their grads drop with them).
    """
    b = emit.shape[0]
    # legal without padding: batch tile can be a multiple of 8, or the
    # whole (power-of-two) batch in one tile
    if b % 8 == 0 or b in (1, 2, 4):
        return _ctc_core_raw(emit, skip, tlen, last)
    bp = _round_up(b, 8)
    pad = bp - b
    emit = jnp.pad(emit, ((0, pad), (0, 0), (0, 0)))
    skip = jnp.pad(skip, ((0, pad), (0, 0)))
    tlen = jnp.pad(tlen, ((0, pad),), constant_values=1)
    last = jnp.pad(last, ((0, pad),))
    return _ctc_core_raw(emit, skip, tlen, last)[:b]


def _batch_tile(b: int, t: int, s: int, n_bufs: int) -> int:
    """Rows per slab: prefer 8 (one native f32 (8,128) tile per vector op),
    halving while the slab's VMEM working set (n_bufs [bt,T,S] f32 buffers)
    would exceed ~12 MB or b is not divisible."""
    bt = 16
    while bt > 1 and (b % bt != 0
                      or n_bufs * bt * t * s * 4 > 12 * 1024 * 1024):
        bt //= 2
    return bt


def _pallas_fwd(emit, skip, tlen, last):
    b, t, s = emit.shape
    bt = _batch_tile(b, t, s, 2)
    kernel = pl.pallas_call(
        _fwd_kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        ],
        interpret=_interp(),
    )
    return kernel(emit, skip, tlen[:, None], last[:, None])


def _ctc_fwd(emit, skip, tlen, last):
    loss, alpha = _pallas_fwd_squeeze(emit, skip, tlen, last)
    return loss, (emit, skip, tlen, last, alpha)


def _pallas_fwd_squeeze(emit, skip, tlen, last):
    loss, alpha = _pallas_fwd(emit, skip, tlen, last)
    return loss[:, 0], alpha


def _ctc_bwd(res, g):
    emit, skip, tlen, last, alpha = res
    b, t, s = emit.shape
    bt = _batch_tile(b, t, s, 3)
    kernel = pl.pallas_call(
        _bwd_kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, t, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        interpret=_interp(),
    )
    demit = kernel(emit, skip, tlen[:, None], last[:, None], alpha,
                   g.reshape(b, 1).astype(jnp.float32))
    return demit, None, None, None


_ctc_core_raw.defvjp(_ctc_fwd, _ctc_bwd)


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
    loss = _ctc_core(emit, skip, logit_lengths.astype(jnp.int32),
                     last)
    # zero_infinity semantics: U > T is one infeasible case, but so is
    # T < U + n_repeats (adjacent repeats need a separating blank); detect
    # the saturated NEG likelihood directly rather than enumerating cases.
    feasible = (label_lengths <= logit_lengths) & (loss < -NEG / 2)
    return jnp.where(feasible, loss, 0.0)


@jax.custom_vjp
def _fused_logsumexp(logits):
    """Per-frame logsumexp [B, T, V] -> f32 [B, T] whose BACKWARD stays in
    the logits dtype: the softmax cotangent `exp(logits - z) * g` is one
    elementwise chain in bf16 (two bf16 [B,T,V] passes) instead of XLA's
    default f32 exp/multiply/convert chain (~4 GB extra step traffic at
    B=64/T=512/V=5000). bf16 softmax error is ~0.4% relative — noise next
    to the CTC posterior difference it feeds (tolerance-tested)."""
    m = jnp.max(logits, axis=-1)
    zsum = jnp.sum(jnp.exp((logits - m[..., None]).astype(jnp.float32)),
                   axis=-1)
    return m.astype(jnp.float32) + jnp.log(zsum)


def _fused_logsumexp_fwd(logits):
    z = _fused_logsumexp(logits)
    return z, (logits, z)


def _fused_logsumexp_bwd(res, g):
    logits, z = res
    p = jnp.exp(logits - z.astype(logits.dtype)[..., None])
    return (p * g.astype(logits.dtype)[..., None],)


_fused_logsumexp.defvjp(_fused_logsumexp_fwd, _fused_logsumexp_bwd)


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
    on TPU (PERF_NOTES.md round-2).

    The logsumexp is written so bf16 logits are NEVER upcast to a
    materialized f32 [B,T,V] buffer: the f32 convert feeds straight into
    the exp+sum reduction (XLA fuses it into one bf16-read pass), and the
    backward's softmax term stays an elementwise chain emitting the bf16
    cotangent directly — halves the dominant [B,T,V] HBM traffic vs
    `logsumexp(logits.astype(f32))` (PERF_NOTES.md round-2 follow-up)."""
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
    z = _fused_logsumexp(logits)                               # [B, T] f32
    emit = jnp.take_along_axis(
        logits, ext[:, None, :].astype(jnp.int32), axis=2
    ).astype(jnp.float32) - z[..., None]  # [B, T, S_pad]
    col = jnp.arange(s_pad)[None, :]
    smax = 2 * label_lengths + 1
    emit = jnp.where((col < smax[:, None])[:, None, :], emit, NEG)
    last = (2 * label_lengths).astype(jnp.int32)
    loss = _ctc_core(emit, skip, logit_lengths.astype(jnp.int32),
                     last)
    feasible = (label_lengths <= logit_lengths) & (loss < -NEG / 2)
    return jnp.where(feasible, loss, 0.0)
