"""Pallas TPU kernel: fused CTC head (projection + logsumexp + label gather).

Round-3 byte census (PERF_NOTES.md): after the fused-emit CTC path, the
remaining CTC traffic is the [B, T, V] logits round trips themselves — the
bf16 logits written by the ctc projection Dense and re-read by the emit
forward and backward, plus the [B, T, V] cotangent written by the emit
backward and re-read twice by the Dense backward (~4 GB/step at bench
scale, V=5000).

This kernel never lets the logits exist in HBM. Per (batch row, T-tile):

  forward:  logits = hs @ W + b in VMEM -> per-frame logsumexp z ->
            emit[t, s] = logits[t, ext[s]] - z[t], the gather done as a
            one-hot [V, S] matmul (MXU — TPU lane gathers don't lower well).
            Only hs and the small [B, T, S] emit touch HBM.
  backward: recompute logits/z/softmax from hs, then
            dlogits = scatter(demit) - softmax * rowsum(demit) in VMEM;
            dW/db accumulate into VMEM-resident f32 blocks across the grid
            (sequential TPU grid — same scheme as ops/pallas/ffn.py) while
            dhs streams out per tile.

Output semantics match ops/pallas/ctc.py:ctc_loss_pallas_logits's fused
emit (reference: espnet2/asr/ctc.py:6-127 projection + log_softmax + CTC).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG, _ctc_core, _round_up


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _logits_z(x, w, b):
    lg = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32) + b[0]
    m = jnp.max(lg, axis=-1, keepdims=True)
    z = m + jnp.log(jnp.sum(jnp.exp(lg - m), axis=-1, keepdims=True))
    return lg, z


def _onehot(ext_row, vp, dtype):
    """[1, S] ids -> [Vp, S] one-hot (built on the VPU, consumed by MXU)."""
    sp = ext_row.shape[-1]
    iota_v = lax.broadcasted_iota(jnp.int32, (vp, sp), 0)
    return (iota_v == ext_row).astype(dtype)


def _fwd_kernel(ext_ref, x_ref, w_ref, b_ref, o_ref):
    x = x_ref[0]
    lg, z = _logits_z(x, w_ref[...], b_ref[...])
    onehot = _onehot(ext_ref[0], lg.shape[-1], x.dtype)
    gathered = lax.dot_general(lg.astype(x.dtype), onehot,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[0] = gathered - z


def _bwd_kernel(ext_ref, x_ref, w_ref, b_ref, g_ref,
                dx_ref, dw_ref, db_ref, *, t_total, tt):
    ib = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when((ib == 0) & (it == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[0]
    # Zero edge-block padding rows: their hs/demit contents are undefined
    # (may be NaN in interpret mode) and must not reach the dW accumulator
    # (NaN * 0 = NaN inside a contraction).
    rows = lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) + it * tt
    valid = rows < t_total
    x = jnp.where(valid, x, 0).astype(x.dtype)
    w = w_ref[...]
    lg, z = _logits_z(x, w, b_ref[...])
    soft = jnp.exp(lg - z)  # [TT, Vp]; padded-V columns are exactly 0
    de = g_ref[0]  # [TT, Sp] f32
    de = jnp.where(valid, de, 0.0)
    dsum = jnp.sum(de, axis=-1, keepdims=True)  # [TT, 1]
    onehot = _onehot(ext_ref[0], lg.shape[-1], x.dtype)
    scat = lax.dot_general(de.astype(x.dtype), onehot,
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
    # where (not arithmetic) so NaN softmax on padding rows can't leak in.
    dlg = jnp.where(valid, scat - soft * dsum, 0.0)
    dlgc = dlg.astype(x.dtype)
    dw_ref[...] += lax.dot_general(x, dlgc, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dlg, axis=0, keepdims=True)
    dx = lax.dot_general(dlgc, w, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def fused_ctc_head_emit(hs: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        ext: jnp.ndarray, *, vocab: int,
                        block_rows: int = 128,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """emit[b,t,s] = log_softmax(hs @ w + b)[b,t,ext[b,s]] without HBM logits.

    hs: [B, T, D] (D % 128 == 0), w: [D, V], b: [V], ext: [B, Sp] int32
    (Sp % 128 == 0, entries < V). Returns [B, T, Sp] f32.
    """
    bsz, t, d = hs.shape
    v = w.shape[1]
    sp = ext.shape[1]
    assert w.shape == (d, v) and b.shape == (v,) and ext.shape == (bsz, sp)
    assert d % 128 == 0 and sp % 128 == 0, (d, sp)
    assert v == vocab
    vp = _round_up(v, 128)
    if interpret is None:
        interpret = _interp()
    dtype = hs.dtype
    # Pad the vocab axis: zero weights + NEG bias make the padded columns
    # exact zeros in softmax/logsumexp and unreachable by ext (< V).
    wp = jnp.pad(w.astype(dtype), ((0, 0), (0, vp - v)))
    bp = jnp.pad(b.astype(jnp.float32), ((0, vp - v),),
                 constant_values=NEG).reshape(1, vp)
    tt = min(block_rows, _round_up(t, 8))
    nt = pl.cdiv(t, tt)
    # Carry ext as [B, 1, Sp]: a (1, 1, Sp) block's LAST TWO dims then
    # satisfy Mosaic's (8, 128)-divisible-or-full rule ((1, Sp) on a
    # 2-D [B, Sp] array does not — second-minor 1 != B).
    ext = ext.astype(jnp.int32)[:, None, :]

    cparams = None
    if not interpret:
        vmem = max(100 * 1024 * 1024,
                   d * vp * 6 + 4 * tt * vp * 4 + 8 * 1024 * 1024)
        try:
            cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem)
        except (AttributeError, TypeError):
            cparams = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem)

    grid = (bsz, nt)
    ext_spec = pl.BlockSpec((1, 1, sp), lambda ib, it: (ib, 0, 0),
                            memory_space=pltpu.VMEM)
    hs_spec = pl.BlockSpec((1, tt, d), lambda ib, it: (ib, it, 0),
                           memory_space=pltpu.VMEM)
    emit_spec = pl.BlockSpec((1, tt, sp), lambda ib, it: (ib, it, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d, vp), lambda ib, it: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, vp), lambda ib, it: (0, 0),
                          memory_space=pltpu.VMEM)

    def fwd(ext, hs, wp, bp):
        return pl.pallas_call(
            _fwd_kernel,
            grid=grid,
            in_specs=[ext_spec, hs_spec, w_spec, b_spec],
            out_specs=emit_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, t, sp), jnp.float32),
            interpret=interpret,
            compiler_params=cparams,
        )(ext, hs, wp, bp)

    @jax.custom_vjp
    def core(ext, hs, wp, bp):
        return fwd(ext, hs, wp, bp)

    def core_fwd(ext, hs, wp, bp):
        return fwd(ext, hs, wp, bp), (ext, hs, wp, bp)

    def core_bwd(res, g):
        ext, hs, wp, bp = res
        dhs, dwp, dbp = pl.pallas_call(
            functools.partial(_bwd_kernel, t_total=t, tt=tt),
            grid=grid,
            in_specs=[ext_spec, hs_spec, w_spec, b_spec, emit_spec],
            out_specs=[hs_spec,
                       pl.BlockSpec((d, vp), lambda ib, it: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, vp), lambda ib, it: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, t, d), dtype),
                jax.ShapeDtypeStruct((d, vp), jnp.float32),
                jax.ShapeDtypeStruct((1, vp), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=cparams,
        )(ext, hs, wp, bp, g.astype(jnp.float32))
        f0 = np.zeros(ext.shape, jax.dtypes.float0)
        return (f0, dhs, dwp.astype(wp.dtype), dbp)

    core.defvjp(core_fwd, core_bwd)
    emit = core(ext, hs.astype(dtype), wp, bp)

    # The vocab pad/reshape of w/b happen OUTSIDE core(), in the traced
    # caller graph, so JAX transposes them automatically: padded-column
    # grads route back to the true [D, V]/[V] shapes via the pad's
    # transpose (a slice) with no extra wrapper here.
    return emit


def ctc_head_emit(hs: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  ext: jnp.ndarray, *, interpret: Optional[bool] = None
                  ) -> jnp.ndarray:
    """Differentiable-through-(hs, w, b) fused head emit.

    Wraps fused_ctc_head_emit so the vocab padding of w/b is part of the
    differentiated graph (XLA folds the pad/slice into the kernel's
    prologue; the pad transpose is a slice, costing nothing extra).
    """
    return fused_ctc_head_emit(hs, w, b, ext, vocab=w.shape[1],
                               interpret=interpret)


def ctc_loss_pallas_head(
    hs: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example CTC loss from ENCODER states via the fused head kernel
    feeding the Pallas lattice — the [B, T, V] logits never reach HBM.

    Drop-in, loss-equivalent replacement for
    ``ctc_loss_pallas_logits(hs @ w + b, ...)`` (ops/pallas/ctc.py).
    """
    bsz, t, d = hs.shape
    u = labels.shape[1]
    s = 2 * u + 1
    s_pad = _round_up(s, 128)
    ext = jnp.full((bsz, s_pad), blank_id, jnp.int32)
    ext = ext.at[:, 1:s:2].set(jnp.maximum(labels, 0).astype(jnp.int32))
    ext_prev2 = jnp.pad(ext[:, :s], ((0, 0), (2, 0)),
                        constant_values=blank_id)[:, :s]
    allow = (ext[:, :s] != blank_id) & (ext[:, :s] != ext_prev2)
    skip = jnp.zeros((bsz, s_pad), jnp.float32).at[:, :s].set(
        allow.astype(jnp.float32))
    emit = ctc_head_emit(hs, w, b, ext)  # [B, T, S_pad] f32
    col = jnp.arange(s_pad)[None, :]
    smax = 2 * label_lengths + 1
    emit = jnp.where((col < smax[:, None])[:, None, :], emit, NEG)
    last = (2 * label_lengths).astype(jnp.int32)
    loss = _ctc_core(emit, skip, logit_lengths.astype(jnp.int32), last)
    feasible = (label_lengths <= logit_lengths) & (loss < -NEG / 2)
    return jnp.where(feasible, loss, 0.0)
