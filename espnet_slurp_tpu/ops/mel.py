"""Mel filterbank (Slaney-style, librosa-compatible) + log-mel transform.

Parity target: reference espnet2/layers/log_mel.py:9-84 (librosa.filters.mel
matrix, clamp at 1e-10, natural log, pad-mask zeroing). The filterbank matrix
is built host-side in numpy (no librosa dependency) and applied as one matmul,
which XLA fuses with the power-spectrum stage.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from .masks import length_mask


def _hz_to_mel(f: np.ndarray, htk: bool = False) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m: np.ndarray, htk: bool = False) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
) -> np.ndarray:
    """(n_bins, n_mels) triangular mel filterbank, Slaney-normalized.

    Numerically equivalent to librosa.filters.mel(...).T as used by the
    reference LogMel layer.
    """
    if fmax is None:
        fmax = fs / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, fs / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin), htk),
                          _hz_to_mel(np.array(fmax), htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)  # (n_mels+2,)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_bins)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_bins)
    # Slaney area normalization.
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_bins, n_mels)


def logmel(
    power_spec: jnp.ndarray,
    ilens: jnp.ndarray | None = None,
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
) -> jnp.ndarray:
    """[B, T, n_bins] power spectrum -> [B, T, n_mels] log-mel features.

    Clamps at 1e-10 and takes natural log, matching log_mel.py:66-75; zeroes
    padded frames when ``ilens`` is given.
    """
    mat = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax, htk))
    mel = jnp.maximum(power_spec @ mat, 1e-10)
    out = jnp.log(mel)
    if ilens is not None:
        mask = length_mask(ilens, out.shape[-2])
        out = jnp.where(mask[..., None], out, 0.0)
    return out
