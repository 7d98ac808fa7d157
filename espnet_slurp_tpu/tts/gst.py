"""Global Style Tokens (GST) style encoder.

Parity target: reference espnet2/tts/gst/style_encoder.py (StyleEncoder =
ReferenceEncoder conv+GRU stack -> StyleTokenLayer multi-head attention
over learned token embeddings, per "Style Tokens", arXiv:1803.09017).
Used by Tacotron2/FastSpeech2 (`use_gst`): the style embedding conditions
the text-encoder memory additively, as in the reference's
``hs = hs + style_embs.unsqueeze(1)``.

TPU notes: the reference conv stack runs 2-D strided convs channel-first
with BatchNorm; here it is channel-last NHWC (flax native) with LayerNorm —
batch-independent normalization jits cleanly and keeps eval semantics
identical to train (the reference's BN in eval mode is also a per-channel
affine). The GRU over the downsampled frames is one ``nn.RNN`` scan.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ReferenceEncoder(nn.Module):
    """Mel [B, T, n_mels] -> utterance embedding [B, gru_units]."""
    conv_chans: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)
    kernel: int = 3
    stride: int = 2
    gru_units: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        h = mel[..., None].astype(self.dtype)    # [B, T, F, 1]
        for i, ch in enumerate(self.conv_chans):
            h = nn.Conv(ch, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(h)
            h = nn.relu(h)
        b, t, f, c = h.shape
        h = h.reshape(b, t, f * c)
        out = nn.RNN(nn.GRUCell(self.gru_units, dtype=self.dtype),
                     name="gru")(h)
        return out[:, -1]                         # last hidden state


class StyleTokenLayer(nn.Module):
    """Reference embedding [B, D] -> style embedding [B, gst_token_dim]
    via multi-head attention over ``gst_tokens`` learned keys/values."""
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_emb):
        h, dk = self.gst_heads, self.gst_token_dim // self.gst_heads
        tokens = self.param("gst_embs", nn.initializers.normal(1.0),
                            (self.gst_tokens, dk))
        keys = jnp.tanh(tokens)                   # reference applies tanh
        # per-head projections (reference MultiHeadedAttention q/k/v dims)
        q = nn.Dense(self.gst_token_dim, use_bias=False, dtype=self.dtype,
                     name="q")(ref_emb).reshape(-1, h, dk)
        k = nn.Dense(self.gst_token_dim, use_bias=False, dtype=self.dtype,
                     name="k")(keys.astype(self.dtype))
        k = k.reshape(self.gst_tokens, h, dk)
        v = nn.Dense(self.gst_token_dim, use_bias=False, dtype=self.dtype,
                     name="v")(keys.astype(self.dtype))
        v = v.reshape(self.gst_tokens, h, dk)
        scores = jnp.einsum("bhd,thd->bht", q, k) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32))
        att = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bht,thd->bhd", att, v)
        return out.reshape(-1, self.gst_token_dim)


class StyleEncoder(nn.Module):
    """Mel [B, T, n_mels] -> style embedding [B, gst_token_dim]."""
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    conv_chans: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)
    kernel: int = 3
    stride: int = 2
    gru_units: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        ref = ReferenceEncoder(self.conv_chans, self.kernel, self.stride,
                               self.gru_units, self.dtype,
                               name="ref_enc")(mel)
        return StyleTokenLayer(self.gst_tokens, self.gst_token_dim,
                               self.gst_heads, self.dtype, name="stl")(ref)
