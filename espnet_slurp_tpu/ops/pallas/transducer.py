"""Pallas TPU kernel: RNN-T (transducer) forward-backward lattice.

Replaces the external warp-transducer/warp-rnnt CUDA kernels (SURVEY.md
§2.9; espnet2/asr/espnet_model.py:108-116, transducer/loss.py:16-95) on the
training hot path. The XLA fallback (ops/transducer.py) scans T+U
anti-diagonals — hundreds of dispatch steps of tiny [B, U+1] work; here the
whole (T, U+1) lattice lives in VMEM and the time loop runs inside one
Mosaic kernel, batch-tiled into [BT, U1] slabs like the CTC kernel.

The RNN-T row update alpha[t, u] = lse(alpha[t-1, u] + blank[t-1, u],
alpha[t, u-1] + emit[t, u-1]) has a WITHIN-ROW dependency along u. It is a
first-order linear recurrence in log space, so each row is solved in
log2(U1) Hillis-Steele doubling steps over the 128 lanes (operator
composition (m, a) -> x[u] = lse(a[u], x[u-1] + m[u]); pltpu.roll shifts),
instead of a U-step serial loop: T * log2(U1) vector ops total.

Gradients are the standard posteriors:
    d(-ll)/d blank[t, u] = -exp(alpha[t,u] + blank[t,u] + beta[t+1,u] - ll)
    d(-ll)/d emit[t, u]  = -exp(alpha[t,u] + emit[t,u]  + beta[t,u+1] - ll)
with the beta recursion solved by the mirrored (reverse) doubling scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG, _batch_tile, _interp, _shift_left, _shift_right


def _lse2(a, b):
    m = jnp.maximum(jnp.maximum(a, b), NEG)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def _row_scan_fwd(a, m):
    """Solve x[u] = lse(a[u], x[u-1] + m[u]) (x[-1] = -inf) over lanes.

    a, m: [BT, U1]. Hillis-Steele composition: after each doubling step,
    (m, a)[u] represents the affine-in-log operator over a lane range."""
    u1 = a.shape[1]
    o = 1
    while o < u1:
        a_s = _shift_right(a, o)
        m_s = jnp.where(
            lax.broadcasted_iota(jnp.int32, m.shape, 1) >= o,
            pltpu.roll(m, o, 1), NEG)
        a = _lse2(a, jnp.maximum(a_s + m, NEG))
        m = jnp.maximum(m + m_s, NEG)
        o *= 2
    return a


def _row_scan_bwd(a, m):
    """Solve x[u] = lse(a[u], x[u+1] + m[u]) (x[U1] = -inf) over lanes."""
    u1 = a.shape[1]
    o = 1
    while o < u1:
        a_s = _shift_left(a, o)
        col = lax.broadcasted_iota(jnp.int32, m.shape, 1)
        m_s = jnp.where(col < u1 - o, pltpu.roll(m, u1 - o, 1), NEG)
        a = _lse2(a, jnp.maximum(a_s + m, NEG))
        m = jnp.maximum(m + m_s, NEG)
        o *= 2
    return a


def _fwd_kernel(blank_ref, emit_ref, alpha_ref):
    """One slab: blank/emit [BT, T, U1] -> alpha [BT, T, U1].

    alpha[t, u] = log P(reaching lattice node (t, u)); per-example lengths
    are handled OUTSIDE (the caller reads alpha[tlen-1, ulen]; emit is
    NEG-masked at u >= ulen so invalid paths never contribute)."""
    bt, t_max, u1 = blank_ref.shape
    col = lax.broadcasted_iota(jnp.int32, (bt, u1), 1)

    # row 0: pure emit chain; x[u] = lse(a[u], x[u-1] + m[u]) with
    # a = (u == 0 ? 0 : -inf), m[u] = emit[0, u-1].
    m0 = _shift_right(emit_ref[:, 0, :], 1)
    a0 = jnp.where(col == 0, 0.0, NEG)
    row = _row_scan_fwd(a0, m0)
    alpha_ref[:, 0, :] = row

    def body(t, row):
        # from-blank entry per u, then the within-row emit recurrence.
        a = jnp.maximum(row + blank_ref[:, t - 1, :], NEG)
        m = _shift_right(emit_ref[:, t, :], 1)
        new = _row_scan_fwd(a, m)
        alpha_ref[:, t, :] = new
        return new

    lax.fori_loop(1, t_max, body, row)


def _bwd_kernel(blank_ref, emit_ref, tlen_ref, ulen_ref, ll_ref, alpha_ref,
                g_ref, dblank_ref, demit_ref):
    """Beta recursion + posterior gradients over a [BT, T, U1] slab."""
    bt, t_max, u1 = blank_ref.shape
    tlen = tlen_ref[...]     # [BT, 1]
    ulen = ulen_ref[...]     # [BT, 1]
    ll = ll_ref[...]         # [BT, 1]
    g = g_ref[...]           # [BT, 1]
    col = lax.broadcasted_iota(jnp.int32, (bt, u1), 1)
    # virtual beta row at t = tlen: exit state (u == ulen) only.
    beta_virtual = jnp.where(col == ulen, 0.0, NEG)

    def body(i, beta_next):
        t = t_max - 1 - i
        active = t < tlen                          # [BT, 1]
        blank_t = blank_ref[:, t, :]
        emit_t = emit_ref[:, t, :]
        alpha_t = alpha_ref[:, t, :]
        # beta[t, u] = lse(blank[t,u] + beta[t+1,u], emit[t,u] + beta[t,u+1])
        a = jnp.maximum(blank_t + beta_next, NEG)
        beta_row = _row_scan_bwd(a, emit_t)
        post_b = alpha_t + blank_t + beta_next - ll
        post_e = alpha_t + emit_t + _shift_left(beta_row, 1) - ll
        dblank_ref[:, t, :] = jnp.where(
            active, -jnp.exp(jnp.minimum(post_b, 0.0)) * g, 0.0)
        demit_ref[:, t, :] = jnp.where(
            active, -jnp.exp(jnp.minimum(post_e, 0.0)) * g, 0.0)
        return jnp.where(active, beta_row, beta_next)

    lax.fori_loop(0, t_max, body, beta_virtual)


def _pallas_alpha(blank, emit):
    b, t, u1 = blank.shape
    bt = _batch_tile(b, t, u1, 3)
    kernel = pl.pallas_call(
        _fwd_kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, u1), jnp.float32),
        interpret=_interp(),
    )
    return kernel(blank, emit)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def rnnt_lattice_pallas(blank, emit, tlen, ulen):
    """(-ll) per example from blank/emit tables.

    blank, emit: f32 [B, T, U1] (emit NEG-masked at u >= ulen_b and at the
    global u = U); tlen/ulen: int32 [B]. Returns loss [B]."""
    loss, _ = _rnnt_fwd(blank, emit, tlen, ulen)
    return loss


def _ll_from_alpha(alpha, blank, tlen, ulen):
    b = alpha.shape[0]
    rows = jnp.take_along_axis(
        alpha, (tlen - 1)[:, None, None], axis=1)[:, 0]        # [B, U1]
    blank_rows = jnp.take_along_axis(
        blank, (tlen - 1)[:, None, None], axis=1)[:, 0]
    a_fin = jnp.take_along_axis(rows, ulen[:, None], axis=1)[:, 0]
    b_fin = jnp.take_along_axis(blank_rows, ulen[:, None], axis=1)[:, 0]
    return a_fin + b_fin


def _rnnt_fwd(blank, emit, tlen, ulen):
    alpha = _pallas_alpha(blank, emit)
    ll = _ll_from_alpha(alpha, blank, tlen, ulen)
    loss = -ll
    return loss, (blank, emit, tlen, ulen, alpha, ll)


def _rnnt_bwd(res, g):
    blank, emit, tlen, ulen, alpha, ll = res
    b, t, u1 = blank.shape
    bt = _batch_tile(b, t, u1, 5)
    kernel = pl.pallas_call(
        _bwd_kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, u1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, u1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, u1), jnp.float32),
        ],
        interpret=_interp(),
    )
    dblank, demit = kernel(
        blank, emit, tlen[:, None].astype(jnp.int32),
        ulen[:, None].astype(jnp.int32), ll[:, None],
        alpha, g.reshape(b, 1).astype(jnp.float32))
    return dblank, demit, None, None


rnnt_lattice_pallas.defvjp(_rnnt_fwd, _rnnt_bwd)
