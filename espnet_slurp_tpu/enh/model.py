"""TF-masking speech enhancement/separation model.

Parity target: reference espnet2/enh/ (STFT encoder -> separator -> masks ->
iSTFT decoder; SURVEY.md §2.7 lists 18 separators — this provides the
TF-masking family with BLSTM ('rnn') and transformer separators, SI-SNR/PIT
training, which is the reference's default recipe configuration).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import attention_bias, length_mask
from ..ops.stft import stft, stft_out_lengths
from ..tts.vocoder import istft
from .losses import pit_wrapper, si_snr_loss


@dataclasses.dataclass(frozen=True)
class EnhConfig:
    n_spk: int = 2
    n_fft: int = 512
    hop_length: int = 128
    separator: str = "blstm"   # blstm | transformer
    hidden: int = 256
    num_layers: int = 3
    n_head: int = 4
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class EnhModel(nn.Module):
    """mix waveform -> n_spk waveforms via magnitude masking."""
    cfg: EnhConfig

    @nn.compact
    def separate(self, speech_mix, speech_lengths):
        """[B, N] -> (est wavs [B, n_spk, N'], frame_lengths)."""
        c = self.cfg
        spec = stft(speech_mix, n_fft=c.n_fft, hop_length=c.hop_length)
        re, im = spec[..., 0], spec[..., 1]  # [B, T, F]
        mag = jnp.sqrt(re**2 + im**2 + 1e-8)
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        x = jnp.log(mag + 1e-8).astype(c.jax_dtype)
        if c.separator == "blstm":
            for i in range(c.num_layers):
                fwd = nn.RNN(nn.OptimizedLSTMCell(c.hidden,
                                                  dtype=c.jax_dtype),
                             name=f"fwd_{i}")
                bwd = nn.RNN(nn.OptimizedLSTMCell(c.hidden,
                                                  dtype=c.jax_dtype),
                             name=f"bwd_{i}", reverse=True, keep_order=True)
                x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        else:
            from ..models.attention import MultiHeadAttention
            d = c.hidden
            x = nn.Dense(d, dtype=c.jax_dtype, name="in_proj")(x)
            mask_b = length_mask(flens, x.shape[1])
            bias = attention_bias(mask_b[:, None, None, :])
            for i in range(c.num_layers):
                h = nn.LayerNorm(dtype=c.jax_dtype, name=f"n1_{i}")(x)
                x = x + MultiHeadAttention(c.n_head, d, dtype=c.jax_dtype,
                                           name=f"attn_{i}")(h, h, h, bias)
                h = nn.LayerNorm(dtype=c.jax_dtype, name=f"n2_{i}")(x)
                h = nn.Dense(4 * d, dtype=c.jax_dtype, name=f"f1_{i}")(h)
                x = x + nn.Dense(d, dtype=c.jax_dtype,
                                 name=f"f2_{i}")(nn.relu(h))
        n_bins = mag.shape[-1]
        masks = nn.Dense(c.n_spk * n_bins, dtype=c.jax_dtype,
                         name="mask_out")(x)
        masks = nn.sigmoid(masks.astype(jnp.float32))
        masks = masks.reshape(*mag.shape[:2], c.n_spk, n_bins)
        masks = jnp.moveaxis(masks, 2, 1)  # [B, n_spk, T, F]
        est_re = masks * re[:, None]
        est_im = masks * im[:, None]
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        est = est.reshape(b, s, -1)
        return est, flens

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref, *,
                 train=False):
        """speech_ref: [B, n_spk, N]. Returns (loss, stats) with PIT SI-SNR."""
        est, _ = self.separate(speech_mix, speech_mix_lengths)
        n = min(est.shape[-1], speech_ref.shape[-1])
        lengths = jnp.minimum(speech_mix_lengths, n)
        loss_b, perm = pit_wrapper(
            lambda e, r: si_snr_loss(e, r, lengths),
            est[..., :n], speech_ref[..., :n])
        loss = jnp.mean(loss_b)
        return loss, {"loss": loss, "si_snr": -loss}
