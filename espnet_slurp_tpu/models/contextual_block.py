"""Contextual-block streaming Conformer encoder.

Parity target: reference espnet2/asr/encoder/contextual_block_conformer_encoder.py
(Tsunoo et al. block processing: block_size/hop_size/look_ahead geometry with a
context embedding carried across blocks). TPU redesign notes:

- The reference builds overlapping blocks with python slicing and runs one big
  attention whose mask encodes block membership. Here blocks are materialized
  once with a static gather into [B, NB, L+2, D] (L = block_size) and every
  layer is ONE batched attention over B*NB block sequences — all matmuls stay
  large and static-shaped for the MXU.
- Context inheritance is the paper's parallel scheme: the context token
  emitted by block b at layer l feeds block b+1 at layer l+1, so there is no
  sequential scan over blocks — the carry is a roll along the block axis
  between layers. Information still flows arbitrarily far left-to-right
  (one block per layer), and never right-to-left beyond the in-block
  look-ahead, which keeps the encoder streamable.
- Each kept frame sees ``block_size - hop_size - look_ahead`` past frames,
  its own hop, and ``look_ahead`` future frames, plus the carried context.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias, length_mask
from .conformer import ConformerBlock
from .embedding import Conv2dSubsampling, rel_positional_embedding


class ContextualBlockConformerEncoder(nn.Module):
    """Conv2d x4 subsampling + N conformer blocks over contextual blocks.

    __call__: (feats [B,T,F], feat_lengths [B]) -> (hs [B,T',D], h_lengths,
    [] interCTC taps) — same interface as ConformerEncoder.
    """
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 2048
    num_blocks: int = 12
    kernel_size: int = 31
    dropout_rate: float = 0.0
    # Geometry in post-subsampling frames. Left context per block =
    # block_size - hop_size - look_ahead (must be >= 0).
    block_size: int = 40
    hop_size: int = 16
    look_ahead: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        left = self.block_size - self.hop_size - self.look_ahead
        assert left >= 0, "block_size must cover hop_size + look_ahead"
        x = Conv2dSubsampling(self.d_model, self.dtype, name="embed")(feats)
        olens = Conv2dSubsampling.out_length(feat_lengths)
        b, t, d = x.shape
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))

        nb = -(-t // self.hop_size)                      # blocks
        l_blk = self.block_size
        # Pad so every block gather is in-bounds: ``left`` on the left,
        # enough on the right for the last block's tail.
        pad_r = left + (nb - 1) * self.hop_size + l_blk - (t + left)
        xp = jnp.pad(x, ((0, 0), (left, max(pad_r, 0)), (0, 0)))
        # Absolute post-pad position of token l of block bidx is
        # bidx*hop + l; original-frame index = that - left.
        idx = (jnp.arange(nb)[:, None] * self.hop_size
               + jnp.arange(l_blk)[None, :])             # [NB, L]
        blocks = xp[:, idx]                              # [B, NB, L, D]
        orig = idx - left                                # original frame ids
        valid = (orig >= 0)[None] & (orig[None] < olens[:, None, None])
        blocks = jnp.where(valid[..., None], blocks, 0.0)

        # Initial context embedding = masked mean of each block's frames.
        denom = jnp.maximum(valid.sum(-1, keepdims=True), 1)
        ctx = (blocks.sum(2) / denom.astype(blocks.dtype))   # [B, NB, D]
        prev_ctx = jnp.pad(ctx, ((0, 0), (1, 0), (0, 0)))[:, :nb]

        # Token layout per block: [prev_ctx, frames..., ctx].
        seq_len = l_blk + 2
        pos_emb = rel_positional_embedding(seq_len, self.d_model, self.dtype)
        tok_valid = jnp.concatenate(
            [jnp.ones((b, nb, 1), bool), valid, jnp.ones((b, nb, 1), bool)],
            axis=2).reshape(b * nb, seq_len)
        bias = attention_bias(tok_valid[:, None, None, :])

        frames = blocks
        for i in range(self.num_blocks):
            tok = jnp.concatenate(
                [prev_ctx[:, :, None], frames, ctx[:, :, None]], axis=2)
            tok = tok.reshape(b * nb, seq_len, d)
            y = ConformerBlock(
                self.d_model, self.n_head, self.d_ff, self.kernel_size,
                self.dropout_rate, self.dtype,
                name=f"block_{i}")(tok, pos_emb, bias, tok_valid,
                                   deterministic)
            y = y.reshape(b, nb, seq_len, d)
            frames = y[:, :, 1:-1]
            new_ctx = y[:, :, -1]
            # Parallel context inheritance: block b's context reaches
            # block b+1 at the NEXT layer.
            prev_ctx = jnp.pad(new_ctx, ((0, 0), (1, 0), (0, 0)))[:, :nb]
            ctx = new_ctx

        # Keep each block's central hop: in-block positions
        # [left, left + hop) = original frames [b*hop, (b+1)*hop).
        kept = frames[:, :, left:left + self.hop_size]   # [B, NB, hop, D]
        out = kept.reshape(b, nb * self.hop_size, d)[:, :t]
        pad = length_mask(olens, t)
        out = jnp.where(pad[..., None], out, 0.0)
        return out, olens, []
