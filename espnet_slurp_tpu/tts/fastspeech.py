"""FastSpeech (1): non-autoregressive text-to-mel from teacher durations.

Parity target: reference espnet2/tts/fastspeech/fastspeech.py:34-702.
FastSpeech predicts mel directly from length-regulated encoder states —
no pitch/energy variance adaptor (that is FastSpeech2) — with an optional
tacotron-style postnet refining the decoder output and an L1 loss on both
the before- and after-postnet spectrograms plus the log-duration MSE
(reference fastspeech.py:529-548 via FastSpeechLoss).

TPU notes: shares the FFT blocks, variance predictor, and the
searchsorted-gather length regulator with tts/fastspeech2.py (the
reference's repeat_interleave loop is not jittable); static max_frames.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import attention_bias, length_mask
from ..models.embedding import abs_positional_encoding
from .fastspeech2 import FFTBlock, VariancePredictor, length_regulate


@dataclasses.dataclass(frozen=True)
class FastSpeechConfig:
    vocab_size: int = 100
    n_mels: int = 80
    d_model: int = 256
    n_head: int = 2
    d_ff: int = 1024
    enc_blocks: int = 4
    dec_blocks: int = 4
    conv_kernel: int = 9
    var_kernel: int = 3
    var_channels: int = 256
    var_layers: int = 2
    postnet_layers: int = 5
    postnet_channels: int = 256
    postnet_kernel: int = 5
    dropout_rate: float = 0.1
    max_frames: int = 1000
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class _Postnet(nn.Module):
    """Residual conv refiner (reference uses the tacotron2 Postnet,
    fastspeech.py:268-277)."""
    layers: int
    channels: int
    kernel: int
    n_mels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = mel
        for i in range(self.layers - 1):
            x = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = jnp.tanh(nn.LayerNorm(dtype=self.dtype,
                                      name=f"norm_{i}")(x))
        return nn.Conv(self.n_mels, (self.kernel,), padding="SAME",
                       dtype=self.dtype, name="conv_out")(x)


class FastSpeech(nn.Module):
    """FastSpeech1 text->mel (fastspeech.py:407-473 _forward)."""
    cfg: FastSpeechConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.jax_dtype)
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
        self.mel_out = nn.Dense(c.n_mels, dtype=c.jax_dtype)
        self.postnet = _Postnet(c.postnet_layers, c.postnet_channels,
                                c.postnet_kernel, c.n_mels, c.jax_dtype,
                                name="postnet")
        if c.use_gst:
            from .gst import StyleEncoder
            self.gst = StyleEncoder(gst_tokens=c.gst_tokens,
                                    gst_token_dim=c.d_model,
                                    gst_heads=c.gst_heads,
                                    dtype=c.jax_dtype, name="gst")

    def encode(self, text, text_lengths, deterministic=True):
        x = abs_positional_encoding(self.embed(text), scale=True)
        mask = length_mask(text_lengths, text.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.enc_blocks_:
            x = blk(x, bias, mask, deterministic)
        return x, mask

    def decode(self, frames, frame_lengths, deterministic=True):
        x = abs_positional_encoding(frames, scale=False)
        mask = length_mask(frame_lengths, frames.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.dec_blocks_:
            x = blk(x, bias, mask, deterministic)
        before = self.mel_out(x)
        after = before + self.postnet(before)
        return before, after, mask

    def __call__(self, text, text_lengths, mel, mel_lengths, durations,
                 *, train=False):
        """Teacher-forced training forward -> (loss, stats).

        durations: [B, L] teacher frames per token (fastspeech.py:474-571).
        """
        c = self.cfg
        x, tmask = self.encode(text, text_lengths, deterministic=not train)
        if c.use_gst:
            x = x + self.gst(mel)[:, None]
        d_pred = self.duration_predictor(x, tmask)  # log(1+dur) domain
        frames, total = length_regulate(x, durations, mel.shape[1])
        before, after, fmask = self.decode(
            frames, jnp.minimum(total, mel.shape[1]),
            deterministic=not train)
        fm = fmask[..., None]
        denom = jnp.maximum(jnp.sum(fm), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(before - mel) * fm)
              + jnp.sum(jnp.abs(after - mel) * fm)) / denom
        tdenom = jnp.maximum(jnp.sum(tmask), 1.0)
        d_tgt = jnp.log1p(durations.astype(jnp.float32))
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - d_tgt) ** 2, 0.0)) \
            / tdenom
        loss = l1 + dur_loss
        return loss, {"loss": loss, "l1_loss": l1,
                      "duration_loss": dur_loss}

    def inference(self, text, text_lengths, speed: float = 1.0):
        """Predicted durations -> mel (after-postnet). Returns
        (mel [B, max_frames, n_mels], frame_lengths)."""
        c = self.cfg
        x, tmask = self.encode(text, text_lengths)
        if c.use_gst:
            x = x + self.gst(jnp.zeros((text.shape[0], 256, c.n_mels),
                                       x.dtype))[:, None]
        d_pred = self.duration_predictor(x, tmask)
        durations = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(tmask, jnp.maximum(durations, 1), 0)
        frames, total = length_regulate(x, durations, c.max_frames)
        total = jnp.minimum(total, c.max_frames)
        _, after, _ = self.decode(frames, total)
        return after, total
