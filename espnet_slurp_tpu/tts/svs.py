"""Singing voice synthesis: XiaoiceSing-style score-to-mel.

Parity targets: reference espnet2/svs/xiaoice/XiaoiceSing.py:36-696
(FastSpeech-style encoder over summed phone/midi/tempo embeddings,
duration predictor + length regulator, decoder, postnet, L1 + duration
loss) and espnet2/svs/naive_rnn/naive_rnn_dp.py:26-420 (the RNN
encoder/decoder variant, selectable here via ``encoder_type='rnn'``).

TPU redesign notes:
- Reuses the FastSpeech2 FFT blocks / variance predictor / searchsorted
  length regulator (tts/fastspeech2.py) — the score conditioning is just
  three summed embedding tables in front of the same machinery.
- The RNN variant runs as flax nn.RNN bidirectional scans, keeping the
  whole model one jittable graph with static [B, T] / [B, F] shapes.
- Training is teacher-forced on ground-truth phone durations (the
  reference's `ds` stream); inference rounds the predicted log-durations
  exactly like FastSpeech2.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.embedding import abs_positional_encoding
from ..ops.frontend import FrontendConfig, default_frontend
from ..ops.masks import attention_bias, length_mask
from ..ops.normalize import utterance_mvn
from .fastspeech2 import FFTBlock, VariancePredictor, length_regulate


@dataclasses.dataclass(frozen=True)
class SVSConfig:
    vocab_size: int = 100       # phone labels
    midi_dim: int = 129         # XiaoiceSing.py midi_dim default
    tempo_dim: int = 500        # tempo/beat vocabulary
    d_model: int = 256
    n_head: int = 2
    d_ff: int = 1024
    enc_blocks: int = 4
    dec_blocks: int = 4
    conv_kernel: int = 9
    var_kernel: int = 3
    var_channels: int = 256
    var_layers: int = 2
    encoder_type: str = "transformer"   # transformer | rnn (naive_rnn_dp)
    rnn_hidden: int = 256
    rnn_layers: int = 1
    postnet_layers: int = 3
    postnet_channels: int = 256
    postnet_kernel: int = 5
    dropout_rate: float = 0.1
    max_frames: int = 1000
    frontend: FrontendConfig = FrontendConfig()
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def n_mels(self) -> int:
        return self.frontend.n_mels


class _Postnet(nn.Module):
    """Conv residual refiner (tacotron2 Postnet analogue, XiaoiceSing.py
    postnet_* args)."""
    layers: int
    channels: int
    kernel: int
    n_mels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = mel.astype(self.dtype)
        for i in range(self.layers - 1):
            x = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = jnp.tanh(nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(x))
        out = nn.Conv(self.n_mels, (self.kernel,), padding="SAME",
                      dtype=self.dtype, name="conv_out")(x)
        return out.astype(jnp.float32)


class _BiRNNStack(nn.Module):
    """Bidirectional LSTM stack (naive_rnn_dp encoder/decoder analogue)."""
    hidden: int
    out: int
    layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"fwd_{i}")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"bwd_{i}", reverse=True, keep_order=True)(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out, dtype=self.dtype, name="proj")(x)


class XiaoiceSing(nn.Module):
    """Score (phone/midi/tempo) -> mel, teacher-forced on durations."""
    cfg: SVSConfig

    def setup(self):
        c = self.cfg
        self.label_embed = nn.Embed(c.vocab_size, c.d_model,
                                    dtype=c.jax_dtype)
        self.midi_embed = nn.Embed(c.midi_dim, c.d_model, dtype=c.jax_dtype)
        self.tempo_embed = nn.Embed(c.tempo_dim, c.d_model,
                                    dtype=c.jax_dtype)
        if c.encoder_type == "rnn":
            self.encoder = _BiRNNStack(c.rnn_hidden, c.d_model, c.rnn_layers,
                                       c.jax_dtype, name="encoder")
            self.decoder = _BiRNNStack(c.rnn_hidden, c.d_model, c.rnn_layers,
                                       c.jax_dtype, name="decoder")
        else:
            self.enc_blocks_ = [FFTBlock(c.d_model, c.n_head, c.d_ff,
                                         c.conv_kernel, c.jax_dtype,
                                         name=f"enc_{i}")
                                for i in range(c.enc_blocks)]
            self.dec_blocks_ = [FFTBlock(c.d_model, c.n_head, c.d_ff,
                                         c.conv_kernel, c.jax_dtype,
                                         name=f"dec_{i}")
                                for i in range(c.dec_blocks)]
        self.duration_predictor = VariancePredictor(
            c.var_channels, c.var_kernel, c.var_layers, c.jax_dtype,
            name="duration_predictor")
        self.feat_out = nn.Dense(c.n_mels, dtype=c.jax_dtype)
        self.postnet = _Postnet(c.postnet_layers, c.postnet_channels,
                                c.postnet_kernel, c.n_mels, c.jax_dtype,
                                name="postnet")

    def _embed_score(self, label, midi, tempo):
        # XiaoiceSing.py:461-464: input = label + midi + tempo embeddings
        return self.label_embed(label) + self.midi_embed(midi) + \
            self.tempo_embed(tempo)

    def encode(self, label, midi, tempo, lengths, deterministic=True):
        c = self.cfg
        x = self._embed_score(label, midi, tempo)
        mask = length_mask(lengths, label.shape[1])
        if c.encoder_type == "rnn":
            x = self.encoder(x) * mask[..., None]
        else:
            x = abs_positional_encoding(x, scale=True)
            bias = attention_bias(mask[:, None, None, :])
            for blk in self.enc_blocks_:
                x = blk(x, bias, mask, deterministic)
        return x, mask

    def decode(self, frames, frame_lengths, deterministic=True):
        c = self.cfg
        mask = length_mask(frame_lengths, frames.shape[1])
        if c.encoder_type == "rnn":
            x = self.decoder(frames) * mask[..., None]
        else:
            x = abs_positional_encoding(frames, scale=False)
            bias = attention_bias(mask[:, None, None, :])
            for blk in self.dec_blocks_:
                x = blk(x, bias, mask, deterministic)
        before = self.feat_out(x).astype(jnp.float32)
        after = before + self.postnet(before)
        return before, after, mask

    def __call__(self, label, label_lengths, midi, tempo, durations,
                 speech, speech_lengths, *, train=False):
        """Teacher-forced forward (XiaoiceSing.py:384-536).

        label/midi/tempo/durations: [B, L] score streams; speech: [B, N]
        singing waveform (mel targets are extracted in-model, matching the
        on-the-fly-target TTS/diar design). Loss = L1(before) + L1(after)
        + MSE(log-dur).
        """
        c = self.cfg
        feats, feats_lengths = default_frontend(speech, speech_lengths,
                                                c.frontend)
        feats = utterance_mvn(feats, feats_lengths).astype(jnp.float32)
        x, tmask = self.encode(label, midi, tempo, label_lengths,
                               deterministic=not train)
        d_pred = self.duration_predictor(x, tmask)
        frames, total = length_regulate(x, durations, feats.shape[1])
        flens = jnp.minimum(jnp.minimum(total, feats_lengths),
                            feats.shape[1])
        before, after, fmask = self.decode(frames, flens,
                                           deterministic=not train)
        fm = fmask[..., None]
        denom = jnp.maximum(jnp.sum(fm), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(before - feats) * fm) +
              jnp.sum(jnp.abs(after - feats) * fm)) / denom
        tdenom = jnp.maximum(jnp.sum(tmask), 1.0)
        d_tgt = jnp.log1p(durations.astype(jnp.float32))
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - d_tgt) ** 2, 0.0)) \
            / tdenom
        loss = l1 + dur_loss
        stats: Dict[str, jnp.ndarray] = {
            "l1_loss": l1, "duration_loss": dur_loss, "loss": loss}
        return loss, stats

    def inference(self, label, label_lengths, midi, tempo,
                  speed: float = 1.0):
        """Score -> (mel [B, max_frames, n_mels], frame lengths).

        Durations come from the predictor (XiaoiceSing.py:543-696)."""
        c = self.cfg
        x, tmask = self.encode(label, midi, tempo, label_lengths)
        d_pred = self.duration_predictor(x, tmask)
        durations = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(tmask, jnp.maximum(durations, 1), 0)
        frames, total = length_regulate(x, durations, c.max_frames)
        total = jnp.minimum(total, c.max_frames)
        _, after, _ = self.decode(frames, total)
        return after, total
