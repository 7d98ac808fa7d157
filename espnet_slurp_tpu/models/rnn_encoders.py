"""RNN / VGG-RNN encoders (the espnet1 classic encoder family).

Parity targets: reference espnet2/asr/encoder/rnn_encoder.py and
vgg_rnn_encoder.py (espnet1 blocks: espnet/nets/pytorch_backend/rnn/
encoders.py — VGG2L conv front + RNNP: stacked (B)LSTM with per-layer
projection and optional frame subsampling).

TPU notes: LSTMs run as flax nn.RNN scans (one fused lax.scan per
layer/direction — no per-step Python); bidirectionality is a reversed scan
with ``seq_lengths`` so each example's backward pass starts at its true
end; per-layer subsampling is a strided slice (static shapes). The VGG
front uses ceil-mode 2x2 max-pools exactly like VGG2L so output lengths
are ceil(ceil(T/2)/2).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class VGG2L(nn.Module):
    """Two VGG conv blocks (64/128 ch, 2x2 ceil max-pools): x4 time
    reduction. [B, T, F] -> [B, ceil(T/4), 128 * ceil(F/4)]."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, f = x.shape
        h = x[..., None]
        for i, ch in enumerate((64, 128)):
            h = nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"conv{i}_1")(h))
            h = nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"conv{i}_2")(h))
            h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        bt, t4, f4, c = h.shape
        return h.reshape(bt, t4, f4 * c)

    @staticmethod
    def out_length(lengths: jnp.ndarray) -> jnp.ndarray:
        out = -(-lengths // 2)
        return -(-out // 2)


class RNNPEncoder(nn.Module):
    """Stacked (B)LSTM with per-layer projection + optional subsampling.

    rnn/encoders.py RNNP analogue: each layer = LSTM (both directions when
    bidirectional) -> Dense projection to d_model -> tanh; between layers,
    frames are subsampled by the per-layer factor.
    """
    d_model: int = 320
    units: int = 320
    num_layers: int = 4
    bidirectional: bool = True
    subsample: Sequence[int] = ()
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.units, dtype=self.dtype),
                         name=f"l{layer}_fwd")(x, seq_lengths=lengths)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.units, dtype=self.dtype),
                    name=f"l{layer}_bwd", reverse=True,
                    keep_order=True)(x, seq_lengths=lengths)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            x = jnp.tanh(nn.Dense(self.d_model, dtype=self.dtype,
                                  name=f"l{layer}_proj")(h))
            if self.dropout_rate > 0.0 and not deterministic \
                    and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=False)
            s = self.subsample[layer] if layer < len(self.subsample) else 1
            if s > 1:
                x = x[:, ::s]
                lengths = -(-lengths // s)
        return x, lengths


class RNNEncoder(nn.Module):
    """`encoder: rnn` — RNNP over frontend features.

    __call__ matches the shared encoder interface:
    (feats [B,T,F], lengths [B]) -> (hs [B,T',D], h_lengths, inter=[]).
    """
    d_model: int = 320
    units: int = 320
    num_layers: int = 4
    bidirectional: bool = True
    subsample: Sequence[int] = (1, 2, 2, 1)
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        hs, olens = RNNPEncoder(
            self.d_model, self.units, self.num_layers, self.bidirectional,
            self.subsample, self.dropout_rate, self.dtype,
            name="rnnp")(feats, feat_lengths, deterministic)
        return hs, olens, []


class VGGRNNEncoder(nn.Module):
    """`encoder: vgg_rnn` — VGG2L front (x4 time reduction) + RNNP."""
    d_model: int = 320
    units: int = 320
    num_layers: int = 4
    bidirectional: bool = True
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        x = VGG2L(dtype=self.dtype, name="vgg")(feats)
        olens = VGG2L.out_length(feat_lengths)
        hs, olens = RNNPEncoder(
            self.d_model, self.units, self.num_layers, self.bidirectional,
            (), self.dropout_rate, self.dtype,
            name="rnnp")(x, olens, deterministic)
        return hs, olens, []
