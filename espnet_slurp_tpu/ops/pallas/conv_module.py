"""Pallas TPU kernel: fused conformer convolution module (fwd + bwd).

Round-3 byte census (PERF_NOTES.md): after flash attention + fused FFN, the
conv module is the largest remaining killable HBM traffic (~8.5 GB/step at
the 17x512 large config): each of the N blocks materializes the bf16
[B, T, 2D] GLU hidden, the [B, T, D] GLU output, the depthwise-conv output,
the norm output and the swish output — every one written in the forward and
re-read in the backward.

This kernel computes the whole chain

    pointwise1(x) -> GLU -> pad-mask -> depthwise-conv(k) -> LayerNorm
                  -> swish -> pointwise2

for one batch row per grid program, entirely in VMEM: only x and the output
(and in the backward, dx) touch HBM; every intermediate lives (and is
recomputed in the backward) on-chip in f32. Weight grads accumulate into
VMEM-resident f32 blocks across the grid (TPU grid programs run
sequentially, so `+=` into a constant-index output block is safe — same
scheme as ops/pallas/ffn.py).

Semantics match models/conformer.py:ConvModule with norm_type="layer"
(reference: espnet/nets/pytorch_backend/conformer/convolution.py:12-79 with
the TPU-standard LayerNorm-for-BatchNorm swap). The depthwise convolution is
zero-padded SAME (odd k) or causal (left k-1), identical to flax nn.Conv
with feature_group_count=D; padding frames are zeroed before the conv so no
content leaks across the length boundary.
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


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _forward_core(x, length, w1, b1, wdw, bdw, gamma, beta, *,
                  k, pad_left, pad_right, eps):
    """Shared fwd recompute: returns every intermediate the bwd needs.

    x: [T, D] (input dtype), weights f32. All math in f32.
    """
    t, d = x.shape
    u = lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b1[0]
    a = u[:, :d]
    gate = u[:, d:]
    sig_g = jax.nn.sigmoid(gate)
    g = a * sig_g  # GLU
    rows = lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    m = (rows < length).astype(jnp.float32)  # prefix pad mask [T, 1]
    g = g * m
    # Depthwise conv as k shifted multiply-adds over the zero-padded buffer
    # (VPU work; the conv FLOPs are negligible next to the pointwise
    # matmuls, so no MXU formulation is needed).
    gp = jnp.pad(g, ((pad_left, pad_right), (0, 0)))
    c = jnp.broadcast_to(bdw[0], (t, d)).astype(jnp.float32)
    for j in range(k):
        c = c + wdw[j] * gp[j:j + t]
    mu = jnp.mean(c, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(c - mu), axis=-1, keepdims=True)
    rstd = lax.rsqrt(var + eps)
    chat = (c - mu) * rstd
    nrm = chat * gamma[0] + beta[0]
    sig_n = jax.nn.sigmoid(nrm)
    sw = nrm * sig_n
    return u, a, gate, sig_g, g, gp, m, rstd, chat, nrm, sig_n, sw


def _fwd_kernel(len_ref, x_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                gamma_ref, beta_ref, w2_ref, b2_ref, o_ref, *,
                k, pad_left, pad_right, eps):
    b = pl.program_id(0)
    x = x_ref[0]
    *_, sw = _forward_core(
        x, len_ref[b], w1_ref[...], b1_ref[...], wdw_ref[...], bdw_ref[...],
        gamma_ref[...], beta_ref[...],
        k=k, pad_left=pad_left, pad_right=pad_right, eps=eps)
    out = lax.dot_general(sw.astype(x.dtype), w2_ref[...],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32) + b2_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(len_ref, x_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                gamma_ref, beta_ref, w2_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dwdw_ref, dbdw_ref,
                dgamma_ref, dbeta_ref, dw2_ref, db2_ref, *,
                k, pad_left, pad_right, eps):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for r in (dw1_ref, db1_ref, dwdw_ref, dbdw_ref, dgamma_ref,
                  dbeta_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    x = x_ref[0]
    t, d = x.shape
    w1 = w1_ref[...]
    wdw = wdw_ref[...]
    (u, a, gate, sig_g, g, gp, m, rstd, chat, nrm, sig_n,
     sw) = _forward_core(
        x, len_ref[b], w1, b1_ref[...], wdw, bdw_ref[...],
        gamma_ref[...], beta_ref[...],
        k=k, pad_left=pad_left, pad_right=pad_right, eps=eps)
    go = g_ref[0].astype(jnp.float32)
    swc = sw.astype(x.dtype)
    dw2_ref[...] += lax.dot_general(swc, go.astype(x.dtype),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(go, axis=0, keepdims=True)
    dsw = lax.dot_general(go.astype(x.dtype), w2_ref[...],
                          (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    # swish'(n) = sigmoid(n) * (1 + n * (1 - sigmoid(n)))
    dn = dsw * (sig_n * (1.0 + nrm * (1.0 - sig_n)))
    dgamma_ref[...] += jnp.sum(dn * chat, axis=0, keepdims=True)
    dbeta_ref[...] += jnp.sum(dn, axis=0, keepdims=True)
    dchat = dn * gamma_ref[0]
    mean_d = jnp.mean(dchat, axis=-1, keepdims=True)
    mean_dc = jnp.mean(dchat * chat, axis=-1, keepdims=True)
    dc = rstd * (dchat - mean_d - chat * mean_dc)
    dbdw_ref[...] += jnp.sum(dc, axis=0, keepdims=True)
    # dwdw[j] = sum_t dc[t] * gp[t + j]
    for j in range(k):
        dwdw_ref[j, :] += jnp.sum(dc * gp[j:j + t], axis=0)
    # dg[s] = sum_j wdw[j] * dc[s - j + pad_left] (transposed conv)
    dcp = jnp.pad(dc, ((pad_right, pad_left), (0, 0)))
    dg = jnp.zeros((t, d), jnp.float32)
    for j in range(k):
        dg = dg + wdw[j] * dcp[k - 1 - j:k - 1 - j + t]
    dg = dg * m
    da = dg * sig_g
    dgate = dg * a * sig_g * (1.0 - sig_g)
    du = jnp.concatenate([da, dgate], axis=1)
    duc = du.astype(x.dtype)
    dw1_ref[...] += lax.dot_general(x, duc, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dx = lax.dot_general(duc, w1, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def fused_conv_module(x: jnp.ndarray, lengths: Optional[jnp.ndarray],
                      w1: jnp.ndarray, b1: jnp.ndarray,
                      wdw: jnp.ndarray, bdw: jnp.ndarray,
                      gamma: jnp.ndarray, beta: jnp.ndarray,
                      w2: jnp.ndarray, b2: jnp.ndarray, *,
                      kernel_size: int, causal: bool = False,
                      eps: float = 1e-6,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused conformer conv module. x: [B, T, D]; returns [B, T, D].

    lengths: [B] int32 valid lengths (None = all T valid). w1: [D, 2D],
    wdw: [k, D] depthwise taps, gamma/beta: LayerNorm, w2: [D, D].
    Requires odd kernel_size (unless causal) and D % 128 == 0.
    """
    bsz, t, d = x.shape
    k = int(kernel_size)
    if causal:
        pad_left, pad_right = k - 1, 0
    else:
        assert k % 2 == 1, "SAME depthwise fusion requires odd kernel"
        pad_left = pad_right = k // 2
    assert w1.shape == (d, 2 * d) and w2.shape == (d, d)
    assert wdw.shape == (k, d), wdw.shape
    if lengths is None:
        lengths = jnp.full((bsz,), t, jnp.int32)
    lengths = lengths.astype(jnp.int32)
    if interpret is None:
        interpret = _interp()
    dtype = x.dtype
    f32 = jnp.float32
    b1r = b1.reshape(1, 2 * d).astype(f32)
    bdwr = bdw.reshape(1, d).astype(f32)
    gammar = gamma.reshape(1, d).astype(f32)
    betar = beta.reshape(1, d).astype(f32)
    b2r = b2.reshape(1, d).astype(f32)
    w1c = w1.astype(dtype)
    wdwc = wdw.astype(f32)
    w2c = w2.astype(dtype)
    kw = dict(k=k, pad_left=pad_left, pad_right=pad_right, eps=float(eps))

    cparams = None
    if not interpret:
        # f32 accumulators (3 D*D-class blocks) + ~10 [T, 2D]-class f32
        # temporaries per program.
        vmem = max(96 * 1024 * 1024,
                   3 * d * d * 4 + 12 * t * 2 * d * 4 + 8 * 1024 * 1024)
        try:
            cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem)
        except (AttributeError, TypeError):
            cparams = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem)

    grid = (bsz,)
    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)

    def fwd(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c, b2r):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=grid,
            in_specs=[len_spec, row_spec, full(d, 2 * d), full(1, 2 * d),
                      full(k, d), full(1, d), full(1, d), full(1, d),
                      full(d, d), full(1, d)],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, t, d), dtype),
            interpret=interpret,
            compiler_params=cparams,
        )(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c, b2r)

    @jax.custom_vjp
    def core(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c, b2r):
        return fwd(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c, b2r)

    def core_fwd(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c, b2r):
        out = fwd(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c, b2r)
        return out, (lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c)

    def core_bwd(res, g):
        lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c = res
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=grid,
            in_specs=[len_spec, row_spec, full(d, 2 * d), full(1, 2 * d),
                      full(k, d), full(1, d), full(1, d), full(1, d),
                      full(d, d), row_spec],
            out_specs=[row_spec, full(d, 2 * d), full(1, 2 * d),
                       full(k, d), full(1, d), full(1, d), full(1, d),
                       full(d, d), full(1, d)],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, t, d), dtype),
                jax.ShapeDtypeStruct((d, 2 * d), f32),
                jax.ShapeDtypeStruct((1, 2 * d), f32),
                jax.ShapeDtypeStruct((k, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
            ],
            interpret=interpret,
            compiler_params=cparams,
        )(lengths, x, w1c, b1r, wdwc, bdwr, gammar, betar, w2c,
          g.astype(dtype))
        dx, dw1, db1, dwdw, dbdw, dgamma, dbeta, dw2, db2 = outs
        f0 = np.zeros(lengths.shape, jax.dtypes.float0)
        return (f0, dx, dw1.astype(w1c.dtype), db1, dwdw, dbdw,
                dgamma, dbeta, dw2.astype(w2c.dtype), db2)

    core.defvjp(core_fwd, core_bwd)
    return core(lengths, x.astype(dtype), w1c, b1r, wdwc, bdwr,
                gammar, betar, w2c, b2r)
