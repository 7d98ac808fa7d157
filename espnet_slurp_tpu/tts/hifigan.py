"""HiFiGAN vocoder: generator + multi-period/multi-scale discriminators.

Parity target: reference espnet2/gan_tts/hifigan/ (generator with
transposed-conv upsampling + multi-receptive-field fusion residual stacks;
HiFiGANMultiPeriodDiscriminator / MultiScaleDiscriminator; LSGAN adversarial
+ feature-matching + mel-spectrogram losses — SURVEY.md §2.7 gan_tts).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    in_channels: int = 80          # mel bins
    base_channels: int = 128
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)   # prod = hop length
    upsample_kernels: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    scales: int = 3
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class ResBlock(nn.Module):
    channels: int
    kernel: int
    dilations: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.channels, (self.kernel,), kernel_dilation=(d,),
                        padding="SAME", dtype=self.dtype,
                        name=f"conv1_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name=f"conv2_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """[B, T, n_mels] -> [B, T * prod(rates)] waveform."""
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = nn.Conv(c.base_channels, (7,), padding="SAME",
                    dtype=c.jax_dtype, name="pre")(mel)
        ch = c.base_channels
        for i, (r, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernels)):
            ch //= 2
            x = nn.leaky_relu(x, 0.1)
            x = nn.ConvTranspose(ch, (k,), strides=(r,), padding="SAME",
                                 dtype=c.jax_dtype, name=f"up_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernels,
                                             c.resblock_dilations)):
                h = ResBlock(ch, rk, rd, c.jax_dtype,
                             name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(c.resblock_kernels)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(1, (7,), padding="SAME", dtype=c.jax_dtype,
                    name="post")(x)
        return jnp.tanh(x)[..., 0]


class PeriodDiscriminator(nn.Module):
    period: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """[B, N] -> (score [B, *], feature maps list)."""
        b, n = wav.shape
        pad = (-n) % self.period
        x = jnp.pad(wav, ((0, 0), (0, pad)))
        x = x.reshape(b, -1, self.period, 1)  # [B, N/p, p, 1]
        feats = []
        ch = 32
        for i in range(4):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            feats.append(x)
            ch = min(ch * 4, 512)
        x = nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype,
                    name="out")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        x = wav[..., None]
        feats = []
        ch = 32
        for i, (k, s, g) in enumerate([(15, 1, 1), (41, 4, 4), (41, 4, 16),
                                       (41, 4, 16), (5, 1, 1)]):
            x = nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                        feature_group_count=g if ch % g == 0 else 1,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            feats.append(x)
            ch = min(ch * 2, 512)
        x = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype, name="out")(x)
        feats.append(x)
        return x[..., 0], feats


class HiFiGANDiscriminator(nn.Module):
    """Multi-period + multi-scale ensemble."""
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, wav):
        outs = []
        for p in self.cfg.periods:
            outs.append(PeriodDiscriminator(p, self.cfg.jax_dtype,
                                            name=f"mpd_{p}")(wav))
        x = wav
        for s in range(self.cfg.scales):
            outs.append(ScaleDiscriminator(self.cfg.jax_dtype,
                                           name=f"msd_{s}")(x))
            # average-pool downsample for the next scale
            if s + 1 < self.cfg.scales:
                n = x.shape[-1] // 2 * 2
                x = x[..., :n].reshape(x.shape[0], -1, 2).mean(-1)
        return outs


def generator_adv_loss(disc_outs) -> jnp.ndarray:
    """LSGAN generator loss: mean (D(fake) - 1)^2."""
    return sum(jnp.mean((score - 1.0) ** 2)
               for score, _ in disc_outs) / len(disc_outs)


def discriminator_adv_loss(real_outs, fake_outs) -> jnp.ndarray:
    """LSGAN: mean (D(real)-1)^2 + D(fake)^2."""
    loss = 0.0
    for (r, _), (f, _) in zip(real_outs, fake_outs):
        loss = loss + jnp.mean((r - 1.0) ** 2) + jnp.mean(f ** 2)
    return loss / len(real_outs)


def feature_matching_loss(real_outs, fake_outs) -> jnp.ndarray:
    loss = 0.0
    n = 0
    for (_, rf), (_, ff) in zip(real_outs, fake_outs):
        for r, f in zip(rf, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
            n += 1
    return loss / max(n, 1)


def mel_l1_loss(wav_fake, wav_real, n_fft=1024, hop=256, n_mels=80,
                fs=16000) -> jnp.ndarray:
    from ..ops.stft import stft
    from ..ops.mel import logmel
    n = min(wav_fake.shape[-1], wav_real.shape[-1])

    def to_mel(w):
        s = stft(w[..., :n], n_fft=n_fft, hop_length=hop)
        power = s[..., 0] ** 2 + s[..., 1] ** 2
        return logmel(power, None, fs=fs, n_fft=n_fft, n_mels=n_mels)

    return jnp.mean(jnp.abs(to_mel(wav_fake) - to_mel(wav_real)))
