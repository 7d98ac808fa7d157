"""DCCRN: deep complex convolution recurrent network separator.

Parity targets: reference espnet2/enh/separator/dccrn_separator.py:23-377
and espnet2/enh/layers/complexnn.py (NavieComplexLSTM, ComplexConv2d,
ComplexConvTranspose2d). Estimates a complex ratio mask over the STFT via
a complex conv U-Net with a complex-LSTM bottleneck; mask applied in "E"
mode (tanh-compressed magnitude, additive phase).

TPU redesign notes:
- Complex ops are pairs of real tensors (re, im); each complex conv is two
  flax convolutions combined as (ar-bi, ai+br) — four MXU matmuls fused by
  XLA, no complex dtype (TPU convolutions are real-valued).
- Channel-last [B, T, F, C] layout so the frequency axis (the strided one)
  is a spatial conv dim and the channel axis feeds the MXU directly.
- Convs are causal along time (kernel 2, left pad) exactly like the
  reference's lookahead-free configuration; the complex LSTM bottleneck is
  a pair of nn.RNN scans.
- LayerNorm replaces complex BatchNorm (use_cbn=False default in the
  reference); batch-stat-free, so the jitted step has no cross-batch state.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ComplexConv(nn.Module):
    """Complex conv2d over [B, T, F, C] pairs (complexnn.py:82-168).

    Causal in time (left-pad kernel_t-1), stride 2 on frequency.
    """
    features: int
    kernel: Tuple[int, int] = (2, 5)     # (time, freq)
    stride: Tuple[int, int] = (1, 2)
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, re, im):
        kt, kf = self.kernel
        if self.transpose:
            conv_r = nn.ConvTranspose(self.features, (kt, kf),
                                      strides=self.stride, padding="VALID",
                                      dtype=self.dtype, name="r")
            conv_i = nn.ConvTranspose(self.features, (kt, kf),
                                      strides=self.stride, padding="VALID",
                                      dtype=self.dtype, name="i")
            rr, ri = conv_r(re), conv_r(im)
            ir, ii = conv_i(re), conv_i(im)
            # ConvTranspose VALID grows T by kt-1 and F by kf-2 (stride 2):
            # trim the time tail (causal) and the frequency overhang.
            out_re = (rr - ii)[:, : re.shape[1] * self.stride[0]]
            out_im = (ri + ir)[:, : re.shape[1] * self.stride[0]]
            f_out = re.shape[2] * self.stride[1]
            return out_re[:, :, :f_out], out_im[:, :, :f_out]
        pad = [(kt - 1, 0), ((kf - 1) // 2, kf // 2)]
        conv_r = nn.Conv(self.features, (kt, kf), strides=self.stride,
                         padding=pad, dtype=self.dtype, name="r")
        conv_i = nn.Conv(self.features, (kt, kf), strides=self.stride,
                         padding=pad, dtype=self.dtype, name="i")
        rr, ri = conv_r(re), conv_r(im)
        ir, ii = conv_i(re), conv_i(im)
        return rr - ii, ri + ir


class ComplexLSTM(nn.Module):
    """Naive complex LSTM: (Lr + i·Li)(re + i·im) (complexnn.py:6-79)."""
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, re, im):
        lstm_r = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                        name="lstm_r")
        lstm_i = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                        name="lstm_i")
        out_re = lstm_r(re) - lstm_i(im)
        out_im = lstm_r(im) + lstm_i(re)
        dense_r = nn.Dense(self.out, dtype=self.dtype, name="proj_r")
        dense_i = nn.Dense(self.out, dtype=self.dtype, name="proj_i")
        return (dense_r(out_re) - dense_i(out_im),
                dense_r(out_im) + dense_i(out_re))


class DCCRNSeparator(nn.Module):
    """Complex U-Net + complex LSTM estimating complex masks.

    Input: STFT (re, im) [B, T, F] with F = n_fft//2 + 1. The DC bin is
    carried through unmasked (the reference drops it before the net,
    dccrn_separator.py:186) so the strided frequency axis is a power of 2.
    Returns per-speaker masked complex spectra [B, n_spk, T, F].
    """
    n_spk: int = 1
    kernel_num: Sequence[int] = (32, 64, 128)
    rnn_units: int = 128
    rnn_layers: int = 2
    masking_mode: str = "E"    # E | C | R (dccrn_separator.py:307-360)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spec_re, spec_im):
        mix_re, mix_im = spec_re, spec_im
        # Drop DC bin; channel-last with 1 input channel.
        re = spec_re[:, :, 1:, None].astype(self.dtype)
        im = spec_im[:, :, 1:, None].astype(self.dtype)
        skips = []
        for li, ch in enumerate(self.kernel_num):
            re, im = ComplexConv(ch, dtype=self.dtype,
                                 name=f"enc_{li}")(re, im)
            re = nn.PReLU()(nn.LayerNorm(dtype=self.dtype,
                                         name=f"enc_nr_{li}")(re))
            im = nn.PReLU()(nn.LayerNorm(dtype=self.dtype,
                                         name=f"enc_ni_{li}")(im))
            skips.append((re, im))
        b, t, f_ds, c = re.shape
        hre = re.reshape(b, t, f_ds * c)
        him = im.reshape(b, t, f_ds * c)
        for li in range(self.rnn_layers):
            hre, him = ComplexLSTM(self.rnn_units, f_ds * c, self.dtype,
                                   name=f"clstm_{li}")(hre, him)
        re = hre.reshape(b, t, f_ds, c)
        im = him.reshape(b, t, f_ds, c)
        out_ch = 2 * self.n_spk  # complex mask per speaker
        for li, ch in enumerate(reversed(self.kernel_num[:-1])):
            sre, sim = skips.pop()
            re = jnp.concatenate([re, sre], axis=-1)
            im = jnp.concatenate([im, sim], axis=-1)
            re, im = ComplexConv(ch, transpose=True, dtype=self.dtype,
                                 name=f"dec_{li}")(re, im)
            re = nn.PReLU()(nn.LayerNorm(dtype=self.dtype,
                                         name=f"dec_nr_{li}")(re))
            im = nn.PReLU()(nn.LayerNorm(dtype=self.dtype,
                                         name=f"dec_ni_{li}")(im))
        sre, sim = skips.pop()
        re = jnp.concatenate([re, sre], axis=-1)
        im = jnp.concatenate([im, sim], axis=-1)
        re, im = ComplexConv(out_ch, transpose=True, dtype=self.dtype,
                             name="dec_out")(re, im)
        # [B, T, F-1, n_spk] complex masks.
        m_re = re.astype(jnp.float32).reshape(*re.shape[:3], self.n_spk, 2)
        m_im = im.astype(jnp.float32).reshape(*im.shape[:3], self.n_spk, 2)
        mask_re = jnp.moveaxis(m_re[..., 0] - m_im[..., 1], 3, 1)
        mask_im = jnp.moveaxis(m_re[..., 1] + m_im[..., 0], 3, 1)
        return self._apply(mix_re, mix_im, mask_re, mask_im)

    def _apply(self, mix_re, mix_im, mask_re, mask_im):
        """Masking mode E: est_mag = tanh(|M|)·|X|, est_phase = ∠X + ∠M
        (dccrn_separator.py:323-346); C = complex product; R = real."""
        x_re = mix_re[:, None, :, 1:]
        x_im = mix_im[:, None, :, 1:]
        if self.masking_mode == "R":
            est_re, est_im = mask_re * x_re, mask_im * x_im
        elif self.masking_mode == "C":
            est_re = mask_re * x_re - mask_im * x_im
            est_im = mask_re * x_im + mask_im * x_re
        else:
            mask_mag = jnp.tanh(
                jnp.sqrt(mask_re**2 + mask_im**2 + 1e-8))
            phase = jnp.arctan2(mask_im, mask_re + 1e-8)
            x_mag = jnp.sqrt(x_re**2 + x_im**2 + 1e-8)
            x_phase = jnp.arctan2(x_im, x_re + 1e-8)
            est_mag = mask_mag * x_mag
            est_re = est_mag * jnp.cos(x_phase + phase)
            est_im = est_mag * jnp.sin(x_phase + phase)
        # Re-attach the untouched DC bin.
        dc_re = jnp.broadcast_to(mix_re[:, None, :, :1], est_re[..., :1].shape)
        dc_im = jnp.broadcast_to(mix_im[:, None, :, :1], est_im[..., :1].shape)
        return (jnp.concatenate([dc_re, est_re], axis=-1),
                jnp.concatenate([dc_im, est_im], axis=-1))
