"""Pallas TPU kernel: fused position-wise feed-forward (fwd + bwd).

After the fused rel-pos flash attention and fused CTC softmax landed, the
TPU HLO byte census of the LS-100 Conformer train step (tools/hlo_census.py
--tpu) is dominated by the FFN hidden activations: 24 macaron FFN sites
(12 blocks x 2) each materialize a bf16 [B, T', d_ff] hidden (67 MB at
bench scale), a u32 [B, T', d_ff] dropout bit buffer and a pred mask, plus
f32 swish intermediates — together the largest remaining killable HBM
traffic (census: 147 GB cumulative bf16[64,512,1024] + 22.5 GB u32 +
21.5 GB pred).

This kernel computes dropout(swish(x @ W1 + b1)) @ W2 + b2 tile-by-tile in
VMEM, so the hidden never exists in HBM:
 * forward: per row-tile, both matmuls back to back with the swish +
   in-kernel PRNG dropout between them; only x and out touch HBM.
 * backward: standard recompute — the hidden and the dropout mask are
   regenerated from x and the per-tile PRNG seed, then dW1/db1/dW2/db2
   accumulate into VMEM-resident f32 blocks across the whole grid while
   dx streams out per tile.

Semantics match models/conformer.py:FeedForward (reference
espnet/nets/pytorch_backend/transformer/positionwise_feed_forward.py with
swish activation and interior dropout, conformer/encoder_layer.py:70-90).
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


def _keep_mask(seed, tile_id, shape, rate, interp=False):
    """Deterministic per-tile keep mask from the in-kernel PRNG (same
    scheme as flash_attention._dropout_keep, so bwd regenerates bits
    identical to fwd instead of reloading a mask from HBM).

    Interpret mode (CPU tests) has no Mosaic PRNG lowering; a threefry
    draw keyed on (seed + tile_id) emulates it — different bits than the
    hardware PRNG, but equally deterministic and identical between the
    forward and backward kernels, which is what the tests pin."""
    if interp:
        key = jax.random.key(jnp.uint32(seed + tile_id))
        bits = jax.random.bits(key, shape, jnp.uint32)
    else:
        pltpu.prng_seed(seed + tile_id)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(int(rate * float(2**32)))
    return bits >= thresh


def _hidden(x, w1, b1):
    """s = x @ W1 + b1 (f32), swish pieces. Returns (s, sigmoid(s))."""
    s = lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    s = s + b1[0]
    return s, jax.nn.sigmoid(s)


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                rate, interp=False):
    i = pl.program_id(0)
    x = x_ref[...]
    s, sig = _hidden(x, w1_ref[...], b1_ref)
    h = s * sig  # swish
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0, 0], i, h.shape, rate, interp)
        h = jnp.where(keep, h / (1.0 - rate), 0.0)
    hd = h.astype(x.dtype)
    out = lax.dot_general(hd, w2_ref[...], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[0]).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, rate,
                interp=False):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    g = g_ref[...]
    w1 = w1_ref[...]
    s, sig = _hidden(x, w1, b1_ref)
    h = s * sig
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0, 0], i, h.shape, rate, interp)
        inv = 1.0 / (1.0 - rate)
        hd32 = jnp.where(keep, h * inv, 0.0)
    else:
        hd32 = h
    hd = hd32.astype(x.dtype)
    dw2_ref[...] += lax.dot_general(hd, g, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    dhd = lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    if rate > 0.0:
        dh = jnp.where(keep, dhd * inv, 0.0)
    else:
        dh = dhd
    # swish'(s) = sigmoid(s) * (1 + s * (1 - sigmoid(s)))
    ds = dh * (sig * (1.0 + s * (1.0 - sig)))
    ds_c = ds.astype(x.dtype)
    dw1_ref[...] += lax.dot_general(x, ds_c, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(ds, axis=0, keepdims=True)
    dx = lax.dot_general(ds_c, w1, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def fused_ffn(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray, seed=None, *,
              dropout_rate: float = 0.0, block_rows: int = 512,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """dropout(swish(x @ w1 + b1)) @ w2 + b2 without HBM hiddens.

    x: [..., N?, D] (any leading batch dims; their product must divide by
    128), w1: [D, F], b1: [F], w2: [F, D2], b2: [D2]. D, F, D2 must be
    multiples of 128 (lane width). Returns [..., D2] in x.dtype.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    n = int(np.prod(lead))
    f = w1.shape[1]
    d2 = w2.shape[1]
    assert w1.shape == (d, f) and w2.shape == (f, d2), (w1.shape, w2.shape)

    tn = block_rows
    # Large layers (d_model 512 x d_ff 2048, conformer-large class): the
    # bwd kernel keeps dW1/dW2 f32 accumulators VMEM-resident (16 MB at
    # that size) — shrink the row tile and raise the Mosaic scoped-vmem
    # limit below so hidden-tile temporaries fit next to them.
    if d * f >= 512 * 2048:
        tn = min(tn, 256)
    while tn > 128 and n % tn != 0:
        tn //= 2
    if n % tn != 0 or d % 128 or f % 128 or d2 % 128:
        raise ValueError(f"fused_ffn shape not tileable: N={n} D={d} F={f}")
    grid = (n // tn,)
    if interpret is None:
        interpret = _interp()
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    dtype = x.dtype
    x2 = x.reshape(n, d)
    b1r = b1.reshape(1, f).astype(jnp.float32)
    b2r = b2.reshape(1, d2).astype(jnp.float32)
    kw = dict(rate=float(dropout_rate), interp=bool(interpret))
    # f32 dW accumulators alone are 2*d*f*4 bytes; the default 16 MB scoped
    # vmem limit trips at conformer-large sizes.
    cparams = None
    if not interpret:
        vmem = max(64 * 1024 * 1024,
                   2 * d * f * 4 + (d + f + d2) * tn * 8 + 8 * 1024 * 1024)
        try:
            cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem)
        except (AttributeError, TypeError):  # older jax naming
            cparams = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem)

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_spec = lambda width: pl.BlockSpec((tn, width), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
    # Constant index_map: weights stay VMEM-resident across the whole grid.
    full_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)

    def fwd(seed, x2, w1, b1r, w2, b2r):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=grid,
            in_specs=[seed_spec, row_spec(d), full_spec(d, f),
                      full_spec(1, f), full_spec(f, d2), full_spec(1, d2)],
            out_specs=row_spec(d2),
            out_shape=jax.ShapeDtypeStruct((n, d2), dtype),
            interpret=interpret,
            compiler_params=cparams,
        )(seed, x2, w1, b1r, w2, b2r)

    @jax.custom_vjp
    def core(seed, x2, w1, b1r, w2, b2r):
        return fwd(seed, x2, w1, b1r, w2, b2r)

    def core_fwd(seed, x2, w1, b1r, w2, b2r):
        return fwd(seed, x2, w1, b1r, w2, b2r), (seed, x2, w1, b1r, w2)

    def core_bwd(res, g):
        seed, x2, w1, b1r, w2 = res
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=grid,
            in_specs=[seed_spec, row_spec(d), full_spec(d, f),
                      full_spec(1, f), full_spec(f, d2), row_spec(d2)],
            out_specs=[row_spec(d), full_spec(d, f), full_spec(1, f),
                       full_spec(f, d2), full_spec(1, d2)],
            out_shape=[
                jax.ShapeDtypeStruct((n, d), dtype),
                jax.ShapeDtypeStruct((d, f), jnp.float32),
                jax.ShapeDtypeStruct((1, f), jnp.float32),
                jax.ShapeDtypeStruct((f, d2), jnp.float32),
                jax.ShapeDtypeStruct((1, d2), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=cparams,
        )(seed, x2, w1, b1r, w2, g.astype(dtype))
        f0 = np.zeros(seed.shape, jax.dtypes.float0)
        return (f0, dx, dw1.astype(w1.dtype), db1.astype(b1r.dtype),
                dw2.astype(w2.dtype), db2.astype(b2r.dtype))

    core.defvjp(core_fwd, core_bwd)
    out = core(seed, x2, w1, b1r, w2, b2r)
    return out.reshape(*lead, d2)
