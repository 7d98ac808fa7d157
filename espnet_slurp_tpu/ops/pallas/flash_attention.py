"""Pallas TPU kernel: fused relative-position flash attention (fwd + bwd).

The round-2 headline kernel (PERF_NOTES.md): the XLA rel-pos attention path
materializes f32 [B,H,T,T] score/softmax/backward buffers, an f32
[B,H,T,2T-1] bd matrix before rel_shift, and a u32 [B,H,T,T] dropout mask —
together the dominant HBM traffic of the LS-100 Conformer train step. This
kernel computes softmax(ac + rel_shift(bd)) tile-by-tile in VMEM with
in-kernel dropout, so none of those buffers ever exist in HBM.

Semantics match models/attention.py:RelPosMultiHeadAttention (reference
espnet/nets/pytorch_backend/transformer/attention.py:212-308):

  ac[b,h,i,j] = (q[b,h,i] + bias_u[h]) . k[b,h,j]
  bd[b,h,i,j] = (q[b,h,i] + bias_v[h]) . p[h, (T-1) - i + j]
  out = dropout(softmax((ac + bd) * scale + mask)) @ v

Key TPU tricks:
 * The rel-shift never materializes [T, 2T-1]: for a (q-tile i0, k-tile j0)
   pair, the needed p rows form ONE contiguous slab p[c0 : c0+TQ+TK] with
   c0 = T - TQ + j0 - i0 (128-aligned when T, tiles, offsets are). The raw
   tile (q_v @ slab^T) [TQ, TQ+TK] is collapsed to [TQ, TK] by ONE
   hardware strided roll (shift grows +1 per row — _rel_collect); the
   backward's inverse scatter needs the -1 stride Mosaic can't lower, so
   it runs column-REVERSED (exchange-matrix matmul + stride-1 roll) with
   the reversal absorbed by its consumers (_rel_scatter_rev).
 * Dropout uses the in-kernel PRNG seeded per (bh, q-tile, k-tile) so the
   backward kernels regenerate bit-identical masks instead of reloading a
   [B,H,T,T] mask from HBM.
 * Flash backward is the standard two-kernel split (dk/dv with k-tiles
   outer, dq with q-tiles outer); the positional gradient dp accumulates
   into an [H, 2T, Dh] block kept resident in VMEM across the whole grid
   (h is the outermost grid axis), scattered per tile with the inverse
   (right-rotation) of the rel-shift.

Streaming chunk masks (ops/masks.chunk_mask) are reproduced in-kernel from
iota compares, so the streaming encoder needs no [T, T] mask either.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _rel_collect(raw: jnp.ndarray, tq: int, tk: int) -> jnp.ndarray:
    """raw [TQ, TQ+TK] -> out [TQ, TK], out[i, j] = raw[i, (TQ-1) - i + j].

    Per-row left-rotate by (TQ-1-i) == right-rotate by (S-TQ+1) + i — ONE
    hardware strided roll (stride=1 over rows). The log2(TQ) conditional
    whole-array rotations this replaces were ~30% of the attention kernel's
    time (PERF_NOTES round-3); Mosaic only lowers stride 1 reliably, which
    is exactly what the collect direction needs. (The scatter direction
    needs stride -1 == S-1, which Mosaic rejects — _rel_scatter keeps the
    log2 decomposition.)
    """
    s = raw.shape[1]
    return pltpu.roll(raw, s - tq + 1, 1, stride=1, stride_axis=0)[:, :tk]


def _rel_scatter_rev(ds: jnp.ndarray, tq: int, tk: int) -> jnp.ndarray:
    """Column-REVERSED inverse of _rel_collect.

    Returns rawgR [TQ, S] with rawgR[i, z] = rawg[i, S-1-z] where
    rawg[i, (TQ-1-i)+j] = ds[i, j] (zeros elsewhere). The true scatter
    needs a per-row right-rotation by (TQ-1-i) — stride -1, which Mosaic's
    strided roll cannot lower — but the column-reversed form needs
    right-rotation by (i+1): ONE stride-1 roll. The lane reversal of ds is
    an exchange-matrix matmul (J[a,b] = [a+b == TK-1]; Mosaic has no `rev`
    lowering, and a [TK,TK] MXU pass is cheaper than log2(TQ) conditional
    whole-tile rolls). Consumers absorb the reversal: the dp accumulator
    is kept row-reversed and flipped ONCE outside the kernel; dqv
    contracts against the row-reversed p slab.
    """
    s = tq + tk
    a = lax.broadcasted_iota(jnp.int32, (tk, tk), 0)
    b = lax.broadcasted_iota(jnp.int32, (tk, tk), 1)
    exchange = (a + b == tk - 1).astype(ds.dtype)
    dsr = lax.dot_general(ds, exchange, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    x = jnp.pad(dsr, ((0, 0), (0, s - tk)))
    return pltpu.roll(x, 1, 1, stride=1, stride_axis=0)


def _mask_tile(tq, tk, i0, j0, klen, chunk_size, left_chunks):
    """Additive -NEG mask for one (q-tile, k-tile): key padding + chunking."""
    col = lax.broadcasted_iota(jnp.int32, (tq, tk), 1) + j0
    ok = col < klen
    if chunk_size > 0:
        row = lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + i0
        cc = col // chunk_size
        rc = row // chunk_size
        ok = ok & (cc <= rc)
        if left_chunks >= 0:
            ok = ok & (cc >= rc - left_chunks)
    return ok


def _dropout_keep(seed, tile_id, shape, rate):
    """Deterministic per-tile keep mask from the in-kernel PRNG."""
    pltpu.prng_seed(seed + tile_id)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(int(rate * float(2**32)))
    return bits >= thresh


def _recompute_scores(qu, qv, k, p_ref, h_idx, c0, scale, tq, tk):
    """Shared fwd/bwd score tile: returns (scores [TQ,TK], slab [S,Dh]).

    Matmuls run in the inputs' native dtype (bf16 on the fast path) with
    f32 accumulation — casting operands to f32 would force slow f32 MXU
    passes for no accuracy the softmax can use.
    """
    ac = lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    slab = p_ref[0, pl.ds(c0, tq + tk), :]
    raw = lax.dot_general(qv, slab, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    bd = _rel_collect(raw, tq, tk)
    return (ac + bd) * scale, slab


def _fwd_kernel(len_ref, seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref,
                o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                scale, rate, t, tq, tk, nq, nk, chunk_size, left_chunks):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qu = qu_ref[0]
    qv = qv_ref[0]
    k = k_ref[0]
    c0 = pl.multiple_of(t - tq + kj * tk - qi * tq, 128)
    s, _ = _recompute_scores(qu, qv, k, p_ref, bh, c0, scale, tq, tk)
    ok = _mask_tile(tq, tk, qi * tq, kj * tk, len_ref[bh, 0], chunk_size,
                    left_chunks)
    s = jnp.where(ok, s, NEG)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    ptile = jnp.exp(s - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(ptile, axis=1, keepdims=True)
    m_scr[:] = m_new
    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], (bh * nq + qi) * nk + kj,
                             (tq, tk), rate)
        ptile = jnp.where(keep, ptile / (1.0 - rate), 0.0)
    v = v_ref[0]
    pv = lax.dot_general(ptile.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(kj == nk - 1)
    def _():
        l_safe = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:] + jnp.log(l_safe)


def _dkv_kernel(len_ref, seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref,
                do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dp_ref, *,
                scale, rate, t, tq, tk, nq, nk, chunk_size, left_chunks):
    h = pl.program_id(0)
    b = pl.program_id(1)
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    bh = b * pl.num_programs(0) + h

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    @pl.when((b == 0) & (kj == 0) & (qi == 0))
    def _():
        dp_ref[0] = jnp.zeros_like(dp_ref[0])

    qu = qu_ref[0]
    qv = qv_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    c0 = pl.multiple_of(t - tq + kj * tk - qi * tq, 128)
    s, slab = _recompute_scores(qu, qv, k, p_ref, h, c0, scale, tq, tk)
    ok = _mask_tile(tq, tk, qi * tq, kj * tk, len_ref[bh, 0], chunk_size,
                    left_chunks)
    s = jnp.where(ok, s, NEG)
    p_norm = jnp.exp(s - lse_ref[0, 0])  # [TQ, TK], normalized probs

    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], (bh * nq + qi) * nk + kj,
                             (tq, tk), rate)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p_norm * inv, 0.0)
    else:
        pd = p_norm
    dv_ref[0] += lax.dot_general(pd.astype(do.dtype), do,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(dv_ref.dtype)
    dprob = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if rate > 0.0:
        dprob = jnp.where(keep, dprob * inv, 0.0)
    ds = p_norm * (dprob - delta_ref[0, 0]) * scale  # [TQ, TK]
    ds_c = ds.astype(qu.dtype)
    dk_ref[0] += lax.dot_general(ds_c, qu, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(dk_ref.dtype)
    # Column-reversed scatter (ONE strided roll) -> the dp accumulator is
    # kept row-reversed across the whole grid and flipped once outside.
    rawg_r = _rel_scatter_rev(ds, tq, tk).astype(qu.dtype)  # [TQ, S]
    dp_slab_r = lax.dot_general(rawg_r, qv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    c0r = pl.multiple_of(2 * t - (tq + tk) - c0, 128)
    dp_ref[0, pl.ds(c0r, tq + tk), :] += dp_slab_r.astype(dp_ref.dtype)


def _dq_kernel(len_ref, seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref,
               pr_ref, do_ref, lse_ref, delta_ref, dqu_ref, dqv_ref, *,
               scale, rate, t, tq, tk, nq, nk, chunk_size, left_chunks):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _():
        dqu_ref[0] = jnp.zeros_like(dqu_ref[0])
        dqv_ref[0] = jnp.zeros_like(dqv_ref[0])

    qu = qu_ref[0]
    qv = qv_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    c0 = pl.multiple_of(t - tq + kj * tk - qi * tq, 128)
    s, slab = _recompute_scores(qu, qv, k, p_ref, bh, c0, scale, tq, tk)
    ok = _mask_tile(tq, tk, qi * tq, kj * tk, len_ref[bh, 0], chunk_size,
                    left_chunks)
    s = jnp.where(ok, s, NEG)
    p_norm = jnp.exp(s - lse_ref[0, 0])
    dprob = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], (bh * nq + qi) * nk + kj,
                             (tq, tk), rate)
        dprob = jnp.where(keep, dprob / (1.0 - rate), 0.0)
    ds = p_norm * (dprob - delta_ref[0, 0]) * scale
    ds_c = ds.astype(k.dtype)
    dqu_ref[0] += lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(dqu_ref.dtype)
    # dqv = scatter(ds) @ slab == revscatter(ds) @ row-reversed slab
    rawg_r = _rel_scatter_rev(ds, tq, tk).astype(k.dtype)
    c0r = pl.multiple_of(2 * t - (tq + tk) - c0, 128)
    slab_r = pr_ref[0, pl.ds(c0r, tq + tk), :]
    dqv_ref[0] += lax.dot_general(rawg_r, slab_r, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(dqv_ref.dtype)


def rel_flash_attention(
    q_u: jnp.ndarray, q_v: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    p: jnp.ndarray, lengths: jnp.ndarray, seed=None, *,
    scale: float, dropout_rate: float = 0.0,
    chunk_size: int = 0, left_chunks: int = -1,
    block_q: int = 512, block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused rel-pos attention. q_u/q_v/k/v: [B, H, T, Dh] (T % block == 0),
    p: [H, 2T, Dh] (row 2T-1 unused/zero), lengths: [B] valid key counts.
    Returns out [B, H, T, Dh] (padded query rows are garbage; mask outside).
    """
    bsz, h, t, dh = q_u.shape
    assert p.shape == (h, 2 * t, dh), (p.shape, (h, 2 * t, dh))

    def pick(blk):
        # Largest 128-multiple tile <= blk dividing t: fewer, fatter grid
        # programs (per-program overhead dominated the 128-tile variant).
        for cand in (blk, 256, 128):
            if cand <= blk and t % cand == 0:
                return min(cand, t)
        raise ValueError(f"T={t} must be a multiple of 128")
    tq = pick(min(block_q, t))
    tk = pick(min(block_k, t))
    assert t % tq == 0 and t % tk == 0, (t, tq, tk)
    nq, nk = t // tq, t // tk
    bh = bsz * h
    if interpret is None:
        interpret = _interp()
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    lengths_bh = jnp.repeat(lengths.astype(jnp.int32), h).reshape(bh, 1)
    shp = lambda x: x.reshape(bh, t, dh)
    dtype = q_u.dtype
    kw = dict(scale=float(scale), rate=float(dropout_rate), t=t, tq=tq,
              tk=tk, nq=nq, nk=nk, chunk_size=int(chunk_size),
              left_chunks=int(left_chunks))

    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def q_spec():
        return pl.BlockSpec((1, tq, dh), lambda i, j, kk: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def kv_spec():
        return pl.BlockSpec((1, tk, dh), lambda i, j, kk: (i, kk, 0),
                            memory_space=pltpu.VMEM)

    p_spec = pl.BlockSpec((1, 2 * t, dh), lambda i, j, kk: (i % h, 0, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, tq, 1), lambda i, j, kk: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def fwd(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r):
        out, lse = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(bh, nq, nk),
            in_specs=[len_spec, seed_spec, q_spec(), q_spec(), kv_spec(),
                      kv_spec(), p_spec],
            out_specs=[
                pl.BlockSpec((1, tq, dh), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM),
                lse_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, t, dh), dtype),
                jax.ShapeDtypeStruct((bh, nq, tq, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tq, 1), jnp.float32),
                pltpu.VMEM((tq, 1), jnp.float32),
                pltpu.VMEM((tq, dh), jnp.float32),
            ],
            interpret=interpret,
        )(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r)
        return out, lse

    # lengths/seed ride as explicit custom_vjp args (float0 cotangents):
    # closure-captured tracers leak across flax remat's double trace
    # (UnexpectedTracerError under jax.checkpoint).
    @jax.custom_vjp
    def core(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r):
        return fwd(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r)[0]

    def core_fwd(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r):
        out, lse = fwd(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r)
        return out, (lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r, out, lse)

    def core_bwd(res, g):
        lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r, out, lse = res
        g = g.astype(jnp.float32)
        delta = jnp.sum(g * out.astype(jnp.float32), axis=-1)  # [BH, T]
        delta = delta.reshape(bh, nq, tq, 1)

        # dk/dv/dp: h outermost so the dp block stays VMEM-resident.
        def m4(f):
            return lambda hh, b, kk, j: f(b * h + hh, j, kk)
        dk, dv, dp = pl.pallas_call(
            functools.partial(_dkv_kernel, **kw),
            grid=(h, bsz, nk, nq),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tq, dh), m4(lambda i, j, kk: (i, j, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, dh), m4(lambda i, j, kk: (i, j, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tk, dh), m4(lambda i, j, kk: (i, kk, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tk, dh), m4(lambda i, j, kk: (i, kk, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * t, dh), lambda hh, b, kk, j: (hh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, dh), m4(lambda i, j, kk: (i, j, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tq, 1), m4(lambda i, j, kk: (i, j, 0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tq, 1), m4(lambda i, j, kk: (i, j, 0, 0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tk, dh), m4(lambda i, j, kk: (i, kk, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tk, dh), m4(lambda i, j, kk: (i, kk, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * t, dh), lambda hh, b, kk, j: (hh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
                jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
                jax.ShapeDtypeStruct((h, 2 * t, dh), jnp.float32),
            ],
            interpret=interpret,
        )(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r, g.astype(dtype),
          lse, delta)
        # the in-kernel accumulator is row-reversed (see _rel_scatter_rev)
        dp = jnp.flip(dp, axis=1)

        dqu, dqv = pl.pallas_call(
            functools.partial(_dq_kernel, **kw),
            grid=(bh, nq, nk),
            in_specs=[len_spec, seed_spec, q_spec(), q_spec(), kv_spec(),
                      kv_spec(), p_spec, p_spec,
                      q_spec(), lse_spec, lse_spec],
            out_specs=[
                pl.BlockSpec((1, tq, dh), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, dh), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
                jax.ShapeDtypeStruct((bh, t, dh), jnp.float32),
            ],
            interpret=interpret,
        )(lengths_bh, seed, qu_r, qv_r, k_r, v_r, p_r,
          jnp.flip(p_r, axis=1), g.astype(dtype), lse, delta)
        cast = lambda x, ref: x.astype(ref.dtype)
        f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return (f0(lengths_bh), f0(seed),
                cast(dqu, qu_r), cast(dqv, qv_r), cast(dk, k_r),
                cast(dv, v_r), cast(dp, p_r))

    core.defvjp(core_fwd, core_bwd)
    out = core(lengths_bh, seed, shp(q_u), shp(q_v), shp(k), shp(v), p)
    return out.reshape(bsz, h, t, dh)
