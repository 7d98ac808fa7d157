"""FastSpeech2: non-autoregressive text-to-mel with variance adaptor.

Parity target: reference espnet2/tts/fastspeech2/fastspeech2.py (835 LoC) +
variance_predictor.py / length_regulator.py. Encoder/decoder are Transformer
(FFT) blocks; the variance adaptor predicts log-duration, pitch, energy;
the length regulator is a searchsorted GATHER (frame i takes the token whose
cumulative duration covers i) — static output length, no dynamic shapes,
instead of the reference's per-example repeat_interleave loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.attention import MultiHeadAttention
from ..models.embedding import abs_positional_encoding
from ..ops.masks import attention_bias, length_mask


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
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
    pitch_embed_kernel: int = 9
    dropout_rate: float = 0.1
    max_frames: int = 1000
    # GST (tts/gst.py): style embedding from the target mel added to the
    # encoder output (reference espnet2/tts/fastspeech2.py use_gst).
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class FFTBlock(nn.Module):
    """Transformer block with conv1d FFN (fastspeech flavor)."""
    d_model: int
    n_head: int
    d_ff: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias, pad_mask, deterministic=True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(self.n_head, self.d_model,
                                   dtype=self.dtype, name="attn")(
                                       h, h, h, bias, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Conv(self.d_ff, (self.kernel,), padding="SAME",
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel,), padding="SAME",
                    dtype=self.dtype, name="conv2")(h)
        x = x + h
        return jnp.where(pad_mask[..., None], x, 0.0)


class VariancePredictor(nn.Module):
    """Conv stack -> scalar per position (variance_predictor.py)."""
    channels: int
    kernel: int
    layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        for i in range(self.layers):
            x = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(x))
        out = nn.Dense(1, dtype=self.dtype, name="out")(x)[..., 0]
        return jnp.where(pad_mask, out, 0.0)


def length_regulate(x: jnp.ndarray, durations: jnp.ndarray,
                    max_frames: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand tokens by durations via searchsorted gather.

    x: [B, L, D]; durations: [B, L] int frames per token.
    Returns (frames [B, max_frames, D], frame_lengths [B]).
    """
    cum = jnp.cumsum(durations, axis=1)  # [B, L]
    total = cum[:, -1]
    pos = jnp.arange(max_frames)[None, :]  # [1, F]
    # token index for frame i: first j with cum[j] > i
    idx = jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="right"))(
        cum, jnp.broadcast_to(pos, (x.shape[0], max_frames)))
    idx = jnp.minimum(idx, x.shape[1] - 1)
    frames = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = pos < total[:, None]
    return jnp.where(valid[..., None], frames, 0.0), total


class FastSpeech2(nn.Module):
    cfg: FastSpeech2Config

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
        vp = lambda name: VariancePredictor(c.var_channels, c.var_kernel,
                                            c.var_layers, c.jax_dtype,
                                            name=name)
        self.duration_predictor = vp("duration_predictor")
        self.pitch_predictor = vp("pitch_predictor")
        self.energy_predictor = vp("energy_predictor")
        self.pitch_embed = nn.Conv(c.d_model, (c.pitch_embed_kernel,),
                                   padding="SAME", dtype=c.jax_dtype,
                                   name="pitch_embed")
        self.energy_embed = nn.Conv(c.d_model, (c.pitch_embed_kernel,),
                                    padding="SAME", dtype=c.jax_dtype,
                                    name="energy_embed")
        self.mel_out = nn.Dense(c.n_mels, dtype=c.jax_dtype)
        if c.use_gst:
            from .gst import StyleEncoder
            self.gst = StyleEncoder(gst_tokens=c.gst_tokens,
                                    gst_token_dim=c.d_model,
                                    gst_heads=c.gst_heads,
                                    dtype=c.jax_dtype, name="gst")

    def encode(self, text, text_lengths, deterministic=True):
        c = self.cfg
        x = abs_positional_encoding(self.embed(text), scale=True)
        mask = length_mask(text_lengths, text.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.enc_blocks_:
            x = blk(x, bias, mask, deterministic)
        return x, mask

    def decode(self, frames, frame_lengths, deterministic=True):
        c = self.cfg
        x = abs_positional_encoding(frames, scale=False)
        mask = length_mask(frame_lengths, frames.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.dec_blocks_:
            x = blk(x, bias, mask, deterministic)
        return self.mel_out(x), mask

    def __call__(self, text, text_lengths, mel, mel_lengths, durations,
                 pitch=None, energy=None, *, train=False):
        """Teacher-forced (GT durations/pitch/energy) -> (loss, stats).

        durations: [B, L] frames per token; pitch/energy: [B, L]
        token-averaged scalars (optional).
        """
        c = self.cfg
        x, tmask = self.encode(text, text_lengths, deterministic=not train)
        if c.use_gst:
            x = x + self.gst(mel)[:, None]
        d_pred = self.duration_predictor(x, tmask)  # predicts log(1+dur)
        p_pred = self.pitch_predictor(x, tmask)
        e_pred = self.energy_predictor(x, tmask)
        # Teacher-forced variances when given; otherwise feed the (detached)
        # predictions so the embed layers always participate.
        p_in = pitch if pitch is not None else jax.lax.stop_gradient(p_pred)
        e_in = energy if energy is not None else jax.lax.stop_gradient(e_pred)
        x = x + self.pitch_embed(p_in[..., None].astype(x.dtype))
        x = x + self.energy_embed(e_in[..., None].astype(x.dtype))
        max_frames = mel.shape[1]
        frames, total = length_regulate(x, durations, max_frames)
        mel_pred, fmask = self.decode(frames, jnp.minimum(total, max_frames),
                                      deterministic=not train)
        fm = fmask[..., None]
        denom = jnp.maximum(jnp.sum(fm), 1.0) * c.n_mels
        l1 = jnp.sum(jnp.abs(mel_pred - mel) * fm) / denom
        tdenom = jnp.maximum(jnp.sum(tmask), 1.0)
        d_tgt = jnp.log1p(durations.astype(jnp.float32))
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - d_tgt) ** 2, 0.0)) \
            / tdenom
        loss = l1 + dur_loss
        stats = {"l1_loss": l1, "duration_loss": dur_loss}
        if pitch is not None:
            pl = jnp.sum(jnp.where(tmask, (p_pred - pitch) ** 2, 0.0)) \
                / tdenom
            stats["pitch_loss"] = pl
            loss = loss + pl
        if energy is not None:
            el = jnp.sum(jnp.where(tmask, (e_pred - energy) ** 2, 0.0)) \
                / tdenom
            stats["energy_loss"] = el
            loss = loss + el
        stats["loss"] = loss
        return loss, stats

    def inference(self, text, text_lengths, speed: float = 1.0,
                  ref_mel=None):
        """Predict variances -> mel. Returns (mel [B, max_frames, n_mels],
        frame_lengths). With use_gst, ``ref_mel`` supplies the style
        reference; None conditions on the zero reference."""
        c = self.cfg
        x, tmask = self.encode(text, text_lengths)
        if c.use_gst:
            if ref_mel is None:
                ref_mel = jnp.zeros((text.shape[0], 256, c.n_mels), x.dtype)
            x = x + self.gst(ref_mel)[:, None]
        d_pred = self.duration_predictor(x, tmask)
        durations = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(tmask, jnp.maximum(durations, 1), 0)
        p_pred = self.pitch_predictor(x, tmask)
        e_pred = self.energy_predictor(x, tmask)
        x = x + self.pitch_embed(p_pred[..., None].astype(x.dtype))
        x = x + self.energy_embed(e_pred[..., None].astype(x.dtype))
        frames, total = length_regulate(x, durations, c.max_frames)
        total = jnp.minimum(total, c.max_frames)
        mel, _ = self.decode(frames, total)
        return mel, total
