"""Length/attention mask utilities (jit-friendly, static shapes).

TPU-native replacement for the reference's pad-mask helpers
(espnet/nets/pytorch_backend/nets_utils.py make_pad_mask / make_non_pad_mask).
All functions take static maximum lengths and dynamic per-example lengths, and
return boolean masks usable inside jit without shape dynamism.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask, True at valid positions."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return pos < lengths[:, None].astype(jnp.int32)


def causal_mask(size: int) -> jnp.ndarray:
    """[size, size] bool, True where attention is allowed (lower triangular).

    Mirrors subsequent_mask (reference espnet/nets/pytorch_backend/transformer/
    mask.py:1-30) but built with iota for TPU friendliness.
    """
    row = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return col <= row


def attention_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean mask -> additive bias (0 where allowed, large-negative where not).

    Uses a finite large-negative instead of -inf so fully-masked rows produce
    uniform attention rather than NaN (matters for padded batch rows).
    """
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), -1e9, dtype))


def band_mask(size: int, window: int) -> jnp.ndarray:
    """[size, size] bool sliding-window (banded) attention mask.

    Frame i attends to frames j with |i - j| <= window — the symmetric
    sliding-window attention of the Longformer encoder (reference
    espnet2/asr/encoder/longformer_encoder.py attention_window). The
    restriction lives in an additive mask over one dense attention; XLA
    still tiles the masked matmul onto the MXU, and O(T*W) kernels only
    pay off at sequence lengths far beyond post-subsampling speech T'.
    """
    row = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return jnp.abs(row - col) <= window


def chunk_mask(size: int, chunk_size: int, left_chunks: int = -1
               ) -> jnp.ndarray:
    """[size, size] bool chunk-wise streaming attention mask.

    Frame i may attend to frames in its own chunk and up to ``left_chunks``
    previous chunks (-1 = unlimited left context). TPU-native analogue of
    the reference's contextual-block/streaming encoders
    (espnet2/asr/encoder/contextual_block_conformer_encoder.py): the
    restriction lives in the mask, so training simulates streaming exactly
    while staying one dense fused attention.
    """
    row = lax.broadcasted_iota(jnp.int32, (size, size), 0) // chunk_size
    col = lax.broadcasted_iota(jnp.int32, (size, size), 1) // chunk_size
    ok = col <= row
    if left_chunks >= 0:
        ok = ok & (col >= row - left_chunks)
    return ok
