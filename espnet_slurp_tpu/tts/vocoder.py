"""Griffin-Lim vocoder + inverse STFT (mel -> waveform).

Parity target: the reference delegates waveform synthesis to external
parallel_wavegan vocoders or Griffin-Lim (espnet2/bin/tts_inference.py
--vocoder_tag / griffin_lim). This is the in-framework Griffin-Lim: mel ->
linear magnitude via filterbank pseudo-inverse -> iterative phase recovery
with jnp FFTs (inference-side, jittable).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.mel import mel_filterbank


def istft(spec: jnp.ndarray, n_fft: int = 512, hop: int = 128,
          center: bool = True) -> jnp.ndarray:
    """[B, T, n_bins] complex -> [B, N] via hann overlap-add (torch.istft
    compatible normalization)."""
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    wj = jnp.asarray(w, jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * wj  # [B, T, n_fft]
    b, t, _ = frames.shape
    n = (t - 1) * hop + n_fft
    # Vectorized overlap-add via one scatter-add:
    idx = (jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
           ).reshape(-1)  # [T*n_fft]
    out = jnp.zeros((b, n)).at[:, idx].add(frames.reshape(b, -1))
    win_sq = jnp.zeros((n,)).at[idx].add(
        jnp.tile(wj**2, (t,)))
    out = out / jnp.maximum(win_sq, 1e-8)
    if center:
        out = out[:, n_fft // 2: n - n_fft // 2]
    return out


def _stft_complex(x, n_fft=512, hop=128):
    from ..ops.stft import stft as stft_fn
    s = stft_fn(x, n_fft=n_fft, hop_length=hop)
    return s[..., 0] + 1j * s[..., 1]


def griffin_lim(
    logmel: jnp.ndarray,
    n_iter: int = 32,
    fs: int = 16000,
    n_fft: int = 512,
    hop: int = 128,
    n_mels: int = 80,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """[B, T, n_mels] log-mel -> [B, N] waveform."""
    mat = jnp.asarray(mel_filterbank(fs, n_fft, n_mels))  # (bins, mels)
    pinv = jnp.asarray(np.linalg.pinv(np.asarray(mat)))   # (mels, bins)
    mag = jnp.sqrt(jnp.maximum(jnp.exp(logmel) @ pinv, 1e-10))  # power->mag
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, mag.shape, minval=-np.pi, maxval=np.pi)
    spec = mag * jnp.exp(1j * phase)
    for _ in range(n_iter):
        wav = istft(spec, n_fft, hop)
        re = _stft_complex(wav, n_fft, hop)[:, :mag.shape[1]]
        spec = mag * re / jnp.maximum(jnp.abs(re), 1e-8)
    return istft(spec, n_fft, hop)
