"""MelGAN and StyleMelGAN vocoders + multi-resolution STFT loss.

Parity target: reference espnet2/gan_tts/melgan/ (MelGANGenerator with
dilated residual stacks, MelGANMultiScaleDiscriminator),
espnet2/gan_tts/style_melgan/ (TADE-conditioned noise-to-waveform generator,
random-window discriminator ensemble) and
espnet2/gan_tts/parallel_wavegan/stft_loss.py (MultiResolutionSTFTLoss used
by the whole MelGAN family).

TPU redesign notes:
 * All convs are NWC so XLA tiles them on the MXU directly.
 * StyleMelGAN's random discriminator windows use static window sizes +
   lax.dynamic_slice at rng-drawn offsets, keeping shapes compile-constant.
 * The reference's weight-norm parametrization is dropped (bf16/XLA prefers
   plain convs + spectral behavior from the adversarial objective), matching
   the HiFiGAN port's convention in tts/hifigan.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- MelGAN

@dataclasses.dataclass(frozen=True)
class MelGANConfig:
    in_channels: int = 80
    base_channels: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)  # prod = hop length
    stack_kernel: int = 3
    stacks: int = 3                                 # dilations 3^i
    scales: int = 3                                 # discriminator scales
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class _ResidualStack(nn.Module):
    """melgan.py ResidualStack: leaky -> dilated conv -> leaky -> 1x1."""
    channels: int
    kernel: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        h = nn.Conv(self.channels, (self.kernel,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype, name="dilated")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.channels, (1,), dtype=self.dtype, name="proj")(h)
        skip = nn.Conv(self.channels, (1,), dtype=self.dtype,
                       name="skip")(x)
        return h + skip


class MelGANGenerator(nn.Module):
    """[B, T, n_mels] -> [B, T * prod(rates)] waveform."""
    cfg: MelGANConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = nn.Conv(c.base_channels, (7,), padding="SAME",
                    dtype=c.jax_dtype, name="pre")(mel)
        ch = c.base_channels
        for i, r in enumerate(c.upsample_rates):
            ch //= 2
            x = nn.leaky_relu(x, 0.2)
            x = nn.ConvTranspose(ch, (r * 2,), strides=(r,), padding="SAME",
                                 dtype=c.jax_dtype, name=f"up_{i}")(x)
            for j in range(c.stacks):
                x = _ResidualStack(ch, c.stack_kernel, c.stack_kernel ** j,
                                   c.jax_dtype, name=f"stack_{i}_{j}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (7,), padding="SAME", dtype=c.jax_dtype,
                    name="post")(x)
        return jnp.tanh(x)[..., 0]


class _MelGANScaleDiscriminator(nn.Module):
    """melgan.py MelGANDiscriminator: one scale."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        x = wav[..., None]
        feats = []
        x = nn.Conv(16, (15,), padding="SAME", dtype=self.dtype,
                    name="pre")(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        ch = 16
        for i in range(4):
            ch = min(ch * 4, 512)
            g = max(1, ch // 64)
            x = nn.Conv(ch, (41,), strides=(4,), padding="SAME",
                        feature_group_count=g if ch % g == 0 else 1,
                        dtype=self.dtype, name=f"down_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        x = nn.Conv(ch, (5,), padding="SAME", dtype=self.dtype,
                    name="post1")(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        x = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype, name="out")(x)
        feats.append(x)
        return x[..., 0], feats


class MelGANDiscriminator(nn.Module):
    """Multi-scale ensemble (MelGANMultiScaleDiscriminator)."""
    cfg: MelGANConfig

    @nn.compact
    def __call__(self, wav):
        outs = []
        x = wav
        for s in range(self.cfg.scales):
            outs.append(_MelGANScaleDiscriminator(
                self.cfg.jax_dtype, name=f"scale_{s}")(x))
            if s + 1 < self.cfg.scales:
                n = x.shape[-1] // 2 * 2
                x = x[..., :n].reshape(x.shape[0], -1, 2).mean(-1)
        return outs


# ----------------------------------------------------------- StyleMelGAN

@dataclasses.dataclass(frozen=True)
class StyleMelGANConfig:
    in_channels: int = 80
    noise_dim: int = 64
    channels: int = 64
    # Upsample factors applied across TADE blocks; prod = hop length.
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    kernel: int = 9
    # Random-window discriminator: (window_samples, n_windows) pairs.
    windows: Tuple[int, ...] = (512, 1024, 2048)
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class TADELayer(nn.Module):
    """Temporal adaptive denormalization (style_melgan/tade_res_block.py).

    Instance-normalizes x over time, then modulates with scale/shift convs
    computed from the (upsampled) mel conditioning.
    """
    channels: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        c = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                    dtype=self.dtype, name="cond")(cond)
        c = nn.leaky_relu(c, 0.2)
        gamma = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name="gamma")(c)
        beta = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                       dtype=self.dtype, name="beta")(c)
        return xn * gamma + beta


class TADEResBlock(nn.Module):
    """TADE -> gated (tanh*sigmoid softmax-gate) conv, twice, + upsample."""
    channels: int
    kernel: int
    upsample: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        h = TADELayer(self.channels, self.kernel, self.dtype,
                      name="tade1")(x, cond)
        h = nn.Conv(2 * self.channels, (self.kernel,), padding="SAME",
                    dtype=self.dtype, name="conv1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(a) * jax.nn.softmax(b, axis=-1)
        h = TADELayer(self.channels, self.kernel, self.dtype,
                      name="tade2")(h + x, cond)
        h = nn.Conv(2 * self.channels, (self.kernel,),
                    kernel_dilation=(2,), padding="SAME",
                    dtype=self.dtype, name="conv2")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(a) * jax.nn.softmax(b, axis=-1)
        out = x + h
        if self.upsample > 1:
            out = jnp.repeat(out, self.upsample, axis=1)
        return out


class StyleMelGANGenerator(nn.Module):
    """(noise [B, Tn, noise_dim], mel [B, T, n_mels]) -> [B, T*hop] wav.

    Tn = T // prod(rates) rounded up; the noise is progressively upsampled
    through TADE blocks, each conditioned on the mel repeated to its rate.
    """
    cfg: StyleMelGANConfig

    @nn.compact
    def __call__(self, mel, noise=None, rng=None):
        c = self.cfg
        t = mel.shape[1]
        hop = 1
        for r in c.upsample_rates:
            hop *= r
        if noise is None:
            key = rng if rng is not None else self.make_rng("noise")
            noise = jax.random.normal(
                key, (mel.shape[0], t, c.noise_dim), jnp.float32)
        x = nn.Conv(c.channels, (7,), padding="SAME", dtype=c.jax_dtype,
                    name="pre")(noise.astype(c.jax_dtype))
        up = 1
        for i, r in enumerate(c.upsample_rates):
            cond = jnp.repeat(mel, up, axis=1) if up > 1 else mel
            x = TADEResBlock(c.channels, c.kernel, r, c.jax_dtype,
                             name=f"block_{i}")(x, cond.astype(c.jax_dtype))
            up *= r
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (7,), padding="SAME", dtype=c.jax_dtype,
                    name="post")(x)
        return jnp.tanh(x)[..., 0]


class StyleMelGANDiscriminator(nn.Module):
    """Random-window ensemble: for each window size, slice a random window
    (static size, rng offset) and score it with a MelGAN scale
    discriminator (style_melgan.py StyleMelGANDiscriminator).
    """
    cfg: StyleMelGANConfig

    @nn.compact
    def __call__(self, wav, rng=None):
        key = rng if rng is not None else self.make_rng("windows")
        outs = []
        for i, w in enumerate(self.cfg.windows):
            n = wav.shape[-1]
            if n <= w:
                win = wav
            else:
                off = jax.random.randint(jax.random.fold_in(key, i), (),
                                         0, n - w)
                win = jax.lax.dynamic_slice_in_dim(wav, off, w, axis=-1)
            outs.append(_MelGANScaleDiscriminator(
                self.cfg.jax_dtype, name=f"win_{i}")(win))
        return outs


# -------------------------------------------- multi-resolution STFT loss

def stft_magnitude(x, n_fft, hop):
    from ..ops.stft import stft
    s = stft(x, n_fft=n_fft, hop_length=hop)
    return jnp.sqrt(jnp.maximum(s[..., 0] ** 2 + s[..., 1] ** 2, 1e-7))


def multi_resolution_stft_loss(
    wav_fake: jnp.ndarray, wav_real: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int]] = ((1024, 120), (2048, 240),
                                              (512, 50)),
) -> jnp.ndarray:
    """Spectral-convergence + log-magnitude L1 over several STFT configs
    (parallel_wavegan/stft_loss.py MultiResolutionSTFTLoss)."""
    n = min(wav_fake.shape[-1], wav_real.shape[-1])
    loss = 0.0
    for n_fft, hop in resolutions:
        mf = stft_magnitude(wav_fake[..., :n], n_fft, hop)
        mr = stft_magnitude(wav_real[..., :n], n_fft, hop)
        sc = jnp.linalg.norm(mr - mf) / jnp.maximum(jnp.linalg.norm(mr),
                                                    1e-7)
        mag = jnp.mean(jnp.abs(jnp.log(mr) - jnp.log(mf)))
        loss = loss + sc + mag
    return loss / len(resolutions)


# -------------------------------------------------------- ParallelWaveGAN

@dataclasses.dataclass(frozen=True)
class ParallelWaveGANConfig:
    in_channels: int = 80              # aux (mel) channels
    layers: int = 18                   # residual blocks (reference: 30)
    stacks: int = 3                    # dilation cycles (2^(l % L/S))
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)  # prod = hop length
    disc_layers: int = 10
    disc_channels: int = 64
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class _WaveNetBlock(nn.Module):
    """Gated residual block with mel conditioning
    (parallel_wavegan.py ResidualBlock via wavenet/residual_block.py).
    """
    residual_channels: int
    gate_channels: int
    skip_channels: int
    kernel: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        h = nn.Conv(self.gate_channels, (self.kernel,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        c = nn.Conv(self.gate_channels, (1,), dtype=self.dtype,
                    name="cond")(cond)
        a, b = jnp.split(h + c, 2, axis=-1)
        z = jnp.tanh(a) * nn.sigmoid(b)
        skip = nn.Conv(self.skip_channels, (1,), dtype=self.dtype,
                       name="skip")(z)
        res = nn.Conv(self.residual_channels, (1,), dtype=self.dtype,
                      name="res")(z)
        return (x + res) * (0.5 ** 0.5), skip


class ParallelWaveGANGenerator(nn.Module):
    """mel [B, T, n_mels] (+ noise) -> [B, T*hop] waveform.

    Non-autoregressive WaveNet (parallel_wavegan.py:21-243): white noise at
    waveform rate is shaped by a stack of dilated gated conv blocks, each
    conditioned on the nearest-neighbor-upsampled mel. One fused XLA graph:
    every conv is NWC on the MXU; the noise draw uses flax's rng plumbing so
    jit sees a pure function.
    """
    cfg: ParallelWaveGANConfig

    @nn.compact
    def __call__(self, mel, noise=None, rng=None):
        c = self.cfg
        hop = 1
        for r in c.upsample_rates:
            hop *= r
        b, t, _ = mel.shape
        cond = jnp.repeat(mel, hop, axis=1).astype(c.jax_dtype)
        if noise is None:
            key = rng if rng is not None else self.make_rng("noise")
            noise = jax.random.normal(key, (b, t * hop, 1), jnp.float32)
        x = nn.Conv(c.residual_channels, (1,), dtype=c.jax_dtype,
                    name="first")(noise.astype(c.jax_dtype))
        layers_per_stack = c.layers // c.stacks
        skips = 0.0
        for li in range(c.layers):
            x, s = _WaveNetBlock(
                c.residual_channels, c.gate_channels, c.skip_channels,
                c.kernel_size, 2 ** (li % layers_per_stack), c.jax_dtype,
                name=f"block_{li}")(x, cond)
            skips = skips + s
        h = nn.relu(skips * (1.0 / c.layers) ** 0.5)
        h = nn.relu(nn.Conv(c.skip_channels, (1,), dtype=c.jax_dtype,
                            name="post1")(h))
        h = nn.Conv(1, (1,), dtype=c.jax_dtype, name="post2")(h)
        return jnp.tanh(h)[..., 0]


class ParallelWaveGANDiscriminator(nn.Module):
    """Dilated non-conditional conv stack (parallel_wavegan.py:245-337).

    Returns [(score, feats)] matching the melgan/hifigan discriminator
    interface so the GAN loss stack is shared.
    """
    cfg: ParallelWaveGANConfig

    @nn.compact
    def __call__(self, wav):
        c = self.cfg
        x = wav[..., None].astype(c.jax_dtype)
        feats = []
        for li in range(c.disc_layers - 1):
            x = nn.Conv(c.disc_channels, (3,), kernel_dilation=(li + 1,),
                        padding="SAME", dtype=c.jax_dtype,
                        name=f"conv_{li}")(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        x = nn.Conv(1, (3,), padding="SAME", dtype=c.jax_dtype,
                    name="out")(x)
        feats.append(x)
        return [(x[..., 0], feats)]
