"""Branchformer / E-Branchformer encoders.

Parity targets: reference espnet2/asr/encoder/branchformer_encoder.py
(parallel attention + cgMLP branches with learned merge) and
e_branchformer_encoder.py (adds macaron FFNs and depthwise-conv merge) —
the reference's strongest LS-100 encoder (BASELINE.md: 6.3/17.0 WER).

cgMLP (convolutional gating MLP): channel proj -> split -> depthwise conv on
one half as gate -> elementwise product -> proj back.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masks import attention_bias, chunk_mask, length_mask
from .attention import RelPosMultiHeadAttention
from .conformer import FeedForward
from .embedding import Conv2dSubsampling, rel_positional_embedding


class CgMLP(nn.Module):
    """Convolutional gating MLP branch (branchformer cgmlp)."""
    d_model: int
    d_hidden: int
    kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None):
        h = nn.Dense(self.d_hidden, dtype=self.dtype, name="channel_proj1")(x)
        h = nn.gelu(h)
        a, b = jnp.split(h, 2, axis=-1)
        b = nn.LayerNorm(dtype=self.dtype, name="gate_norm")(b)
        if pad_mask is not None:
            b = jnp.where(pad_mask[..., None], b, 0.0)
        b = nn.Conv(self.d_hidden // 2, (self.kernel_size,), padding="SAME",
                    feature_group_count=self.d_hidden // 2, dtype=self.dtype,
                    name="gate_conv")(b)
        h = a * b
        return nn.Dense(self.d_model, dtype=self.dtype,
                        name="channel_proj2")(h)


class EBranchformerBlock(nn.Module):
    d_model: int
    n_head: int
    d_ff: int
    cgmlp_hidden: int
    kernel_size: int = 31
    merge_kernel: int = 3
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask_bias, pad_mask, deterministic=True):
        # Macaron FFN half 1.
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        x = x + 0.5 * FeedForward(self.d_model, self.d_ff, self.dropout_rate,
                                  self.dtype, name="ff1")(h, deterministic)
        # Two parallel branches on the same normalized input.
        h_attn_in = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        attn = RelPosMultiHeadAttention(
            self.n_head, self.d_model, self.dropout_rate, self.dtype,
            name="self_attn")(h_attn_in, pos_emb, mask_bias, deterministic)
        h_mlp_in = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        mlp = CgMLP(self.d_model, self.cgmlp_hidden, self.kernel_size,
                    self.dtype, name="cgmlp")(h_mlp_in, pad_mask)
        # Merge: concat -> depthwise conv residual -> linear (e-branchformer).
        cat = jnp.concatenate([attn, mlp], axis=-1)
        conv = nn.Conv(2 * self.d_model, (self.merge_kernel,),
                       padding="SAME", feature_group_count=2 * self.d_model,
                       dtype=self.dtype, name="merge_conv")(cat)
        x = x + nn.Dense(self.d_model, dtype=self.dtype,
                         name="merge_proj")(cat + conv)
        # Macaron FFN half 2.
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        x = x + 0.5 * FeedForward(self.d_model, self.d_ff, self.dropout_rate,
                                  self.dtype, name="ff2")(h, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)


class EBranchformerEncoder(nn.Module):
    """Conv2d x4 subsampling + N E-Branchformer blocks (same interface as
    ConformerEncoder)."""
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 1024
    num_blocks: int = 12
    cgmlp_hidden: int = 2048
    kernel_size: int = 31
    dropout_rate: float = 0.0
    interctc_layers: Sequence[int] = ()
    chunk_size: int = 0
    left_chunks: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        x = Conv2dSubsampling(self.d_model, self.dtype, name="embed")(feats)
        olens = Conv2dSubsampling.out_length(feat_lengths)
        t = x.shape[1]
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        pos_emb = rel_positional_embedding(t, self.d_model, self.dtype)
        pad = length_mask(olens, t)
        att_mask = pad[:, None, None, :]
        if self.chunk_size > 0:
            att_mask = att_mask & chunk_mask(
                t, self.chunk_size, self.left_chunks)[None, None]
        bias = attention_bias(att_mask)
        inter = []
        for i in range(self.num_blocks):
            x = EBranchformerBlock(
                self.d_model, self.n_head, self.d_ff, self.cgmlp_hidden,
                self.kernel_size, dropout_rate=self.dropout_rate,
                dtype=self.dtype, name=f"block_{i}")(
                    x, pos_emb, bias, pad, deterministic)
            if (i + 1) in self.interctc_layers:
                inter.append((i + 1, x))
        x = jnp.where(pad[..., None], x, 0.0)
        return x, olens, inter
