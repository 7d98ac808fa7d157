"""Pre-encoder family: raw-audio Sinc convolutions + linear projection.

Parity targets:
- reference espnet2/asr/preencoder/sinc.py (LightweightSincConvs, Kürzinger
  et al. 2020) + espnet2/layers/sinc_conv.py (SincConv, Mel/Bark banks,
  LogCompression): parametrized band-pass filters learned on raw
  sliding-window frames, followed by depthwise-separable conv blocks.
- reference espnet2/asr/preencoder/linear.py (projection preencoder).

TPU notes: the reference loops frames through torch Conv1d as a [B*T, C, D]
batch; here the whole thing is one lax.conv_general_dilated program over the
flattened frame batch (static shapes, MXU-friendly pointwise convs).
Filters are recomputed from the learned cutoff params each step — a [C, K]
elementwise build, negligible next to the convs. BatchNorm1d becomes
LayerNorm (the repo-wide TPU normalization choice, see conformer.py
ConvModule) — per-frame normalization with no cross-step running stats.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Filter-bank initialization scales (host-side numpy; layers/sinc_conv.py
# MelScale/BarkScale .bank()).
# ---------------------------------------------------------------------------

def mel_bank(channels: int, fs: float) -> np.ndarray:
    """[C, 2] (f1, f2) band edges, mel-spaced over [30 Hz, fs/2]."""
    def to_mel(f):
        return 1125.0 * np.log(f / 700.0 + 1.0)

    def from_mel(m):
        return 700.0 * (np.exp(m / 1125.0) - 1.0)

    freqs = from_mel(np.linspace(to_mel(30.0), to_mel(fs * 0.5),
                                 channels + 2))
    return np.stack([freqs[:-2], freqs[2:]], axis=1)


def bark_bank(channels: int, fs: float) -> np.ndarray:
    """[C, 2] band edges on the Bark critical-bandwidth scale."""
    def to_bark(f):
        return ((f / 1000.0) ** 2 * 1.4 + 1.0) ** 0.69 * 75.0 + 25.0

    def invert(b):
        f = (b - 25.0) / 75.0
        f = f ** (1.0 / 0.69)
        f = (f - 1.0) / 1.4
        return np.sqrt(np.maximum(f, 0.0)) * 1000.0

    centers = invert(np.linspace(to_bark(70.0), to_bark(fs * 0.45),
                                 channels))
    half_bw = to_bark(centers) / 2.0
    return np.stack([centers - half_bw, centers + half_bw], axis=1)


class SincConv(nn.Module):
    """Learnable band-pass filter convolution over raw samples.

    Input [N, D] single-channel frames -> [N, D_out, C] feature maps.
    The only parameters are the [C, 2] normalized band edges; the [C, K]
    kernel is rebuilt from them inside the step (sinc_conv.py
    _create_filters).
    """
    out_channels: int
    kernel_size: int = 101
    stride: int = 1
    fs: float = 16000.0
    window: str = "hamming"   # hamming | none
    scale: str = "mel"        # mel | bark

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.kernel_size % 2 == 1, "SincConv kernel must be odd"
        half = self.kernel_size // 2
        bank_fn = {"mel": mel_bank, "bark": bark_bank}[self.scale]
        f0 = bank_fn(self.out_channels, self.fs) / self.fs
        f = self.param("f", lambda rng: jnp.asarray(f0, jnp.float32))
        n = jnp.arange(1, half + 1, dtype=jnp.float32)
        xn = 2.0 * math.pi * n
        if self.window == "hamming":
            # L = 2*half + 1, evaluated on the flipped grid (sinc_conv.py
            # hamming_window).
            w = 0.54 - 0.46 * jnp.cos(2.0 * math.pi * n[::-1]
                                      / (2 * half + 1))
        else:
            w = jnp.ones_like(n)
        f_min = jnp.abs(f[:, 0])
        f_max = f_min + jnp.abs(f[:, 1] - f[:, 0])
        right = (jnp.sin(f_max[:, None] * xn) - jnp.sin(f_min[:, None] * xn)
                 ) / (0.5 * xn) * w
        center = 2.0 * (f_max - f_min)[:, None]
        filters = jnp.concatenate([right[:, ::-1], center, right], axis=1)
        kernel = filters.T[:, None, :]  # [K, 1, C] (WIO)
        return jax.lax.conv_general_dilated(
            x[..., None], kernel.astype(x.dtype),
            window_strides=(self.stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


class LightweightSincConvs(nn.Module):
    """Sinc preencoder over sliding-window frames (preencoder/sinc.py).

    [B, T, D_win] raw frames -> [B, T, out_channels * D_out] features.
    Block structure mirrors the reference: SincConv(128) + log compression
    + norm + avg-pool 2; a strided depthwise block; three depthwise-
    separable blocks; a final depthwise coupling block.
    """
    out_channels: int = 256
    fs: float = 16000.0
    window: str = "hamming"
    scale: str = "mel"
    dropout_rate: float = 0.15

    def _block(self, x, in_c: int, out_c: int, k: int, stride: int,
               pointwise: bool, avgpool: bool, dropout: float,
               deterministic: bool, name: str):
        groups = _gcd(in_c, out_c)
        x = nn.Conv(out_c, kernel_size=(k,), strides=(stride,),
                    padding="VALID", feature_group_count=groups,
                    name=f"{name}_dw")(x)
        if pointwise:
            x = nn.Conv(out_c, kernel_size=(1,), name=f"{name}_pw")(x)
        x = nn.leaky_relu(x)
        x = nn.LayerNorm(name=f"{name}_ln")(x)
        if avgpool:
            x = nn.avg_pool(x, window_shape=(2,), strides=(2,))
        x = nn.Dropout(dropout, deterministic=deterministic)(x)
        return x

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        b, t, d = feats.shape
        x = feats.reshape(b * t, d)
        # SincConvBlock: filters + log compression + norm + pool.
        x = SincConv(128, fs=self.fs, window=self.window, scale=self.scale,
                     name="sinc")(x)                     # [BT, D', 128]
        x = jnp.log(jnp.abs(x) + 1.0)                    # LogCompression
        x = nn.LayerNorm(name="sinc_ln")(x)
        x = nn.avg_pool(x, window_shape=(2,), strides=(2,))
        # DConvBlock1: strided depthwise + pool (k25 s2).
        x = self._block(x, 128, 128, 25, 2, pointwise=False, avgpool=True,
                        dropout=0.1, deterministic=deterministic,
                        name="dconv1")
        # DConvBlock2-4: depthwise-separable k9.
        in_c = 128
        for i in (2, 3, 4):
            x = self._block(x, in_c, self.out_channels, 9, 1,
                            pointwise=True, avgpool=False,
                            dropout=self.dropout_rate,
                            deterministic=deterministic, name=f"dconv{i}")
            in_c = self.out_channels
        # DConvBlock5: depthwise coupling k7.
        x = self._block(x, in_c, self.out_channels, 7, 1, pointwise=False,
                        avgpool=False, dropout=self.dropout_rate,
                        deterministic=deterministic, name="dconv5")
        return x.reshape(b, t, -1)


class LinearPreencoder(nn.Module):
    """Projection preencoder (espnet2/asr/preencoder/linear.py)."""
    output_size: int = 80

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        return nn.Dense(self.output_size, name="proj")(feats)
