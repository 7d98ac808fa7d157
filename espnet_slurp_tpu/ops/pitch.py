"""Frame-level F0 (pitch) extraction, in-jit.

Parity target: reference espnet2/tts/feats_extract/dio.py (pyworld DIO +
stonemask on the host, per-utterance numpy). TPU redesign: a batched
autocorrelation pitch tracker — frames are one strided gather, the
autocorrelation of every frame is computed with one rFFT round trip
(Wiener-Khinchin), and the lag search is an argmax over the valid lag
band. Everything is [B, T]-shaped, jittable, and differentiable-free
(pitch is a conditioning input, not a learned path).

Output convention matches the reference's downstream use: log-F0 with
unvoiced frames at 0.0 (dio.py returns f0; FastSpeech2/JETS consume
token-averaged log-f0 where unvoiced contributes nothing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, N] -> [B, T, frame_length] strided frames (centered padding)."""
    pad = frame_length // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n = x.shape[1]
    t = max(1 + (n - frame_length) // hop, 1)
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[:, idx]


def autocorr_f0(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    fs: int = 16000,
    frame_length: int = 1024,
    hop: int = 128,
    f0min: float = 70.0,
    f0max: float = 400.0,
    voicing_threshold: float = 0.3,
) -> jnp.ndarray:
    """[B, N] waveform -> [B, T] log-F0 (0 where unvoiced / padded).

    T = frames at ``hop`` (matches stft_out_lengths conventions for
    center-padded frontends when frame_length == n_fft).
    """
    frames = frame_signal(wav, frame_length, hop)            # [B, T, W]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # Autocorrelation via power spectrum (zero-pad 2x to avoid wrap).
    spec = jnp.fft.rfft(frames, n=2 * frame_length, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), axis=-1)[..., :frame_length]
    energy = jnp.maximum(ac[..., 0], 1e-8)
    ac = ac / energy[..., None]                              # normalized
    lag_min = int(fs / f0max)
    lag_max = min(int(fs / f0min), frame_length - 1)
    lags = jnp.arange(frame_length)
    band = (lags >= lag_min) & (lags <= lag_max)
    ac_band = jnp.where(band[None, None, :], ac, -1.0)
    best = jnp.argmax(ac_band, axis=-1)                      # [B, T]
    peak = jnp.take_along_axis(ac_band, best[..., None], -1)[..., 0]
    # Parabolic interpolation around the peak for sub-lag precision.
    take = lambda i: jnp.take_along_axis(
        ac, jnp.clip(i, 0, frame_length - 1)[..., None], -1)[..., 0]
    y0, y1, y2 = take(best - 1), take(best), take(best + 1)
    denom = y0 - 2.0 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-8,
                      0.5 * (y0 - y2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = jnp.maximum(best.astype(jnp.float32) + delta, 1.0)
    f0 = fs / lag
    voiced = peak > voicing_threshold
    t = frames.shape[1]
    valid = jnp.arange(t)[None, :] < (wav_lengths[:, None] // hop + 1)
    return jnp.where(voiced & valid, jnp.log(f0), 0.0)
