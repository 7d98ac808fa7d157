"""Speed perturbation / resampling.

Parity target: reference stage-2 speed perturb via sox (asr.sh:448-468,
scripts/utils/perturb_data_dir_speed.sh — x0.9/1.0/1.1 copies) and the v1
numpy perturb transforms (espnet/transform/perturb.py). Implemented as
windowed-sinc polyphase resampling in numpy (host-side data prep) plus a
jittable linear-interp variant for on-device augmentation.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def resample_sinc(x: np.ndarray, factor: float, num_zeros: int = 16
                  ) -> np.ndarray:
    """Resample by ``factor`` (speed: output length = len(x)/factor).

    Windowed-sinc interpolation at fractional positions; equivalent role to
    sox speed (which resamples + adjusts rate).
    """
    n_out = int(round(len(x) / factor))
    pos = np.arange(n_out) * factor
    left = np.floor(pos).astype(np.int64)
    taps = np.arange(-num_zeros + 1, num_zeros + 1)
    idx = left[:, None] + taps[None, :]
    frac = (pos - left)[:, None]
    k = taps[None, :] - frac
    kern = np.sinc(k) * _hann_window(k, num_zeros)
    idx = np.clip(idx, 0, len(x) - 1)
    return (x[idx] * kern).sum(axis=1).astype(x.dtype)


def _hann_window(k: np.ndarray, num_zeros: int) -> np.ndarray:
    w = 0.5 + 0.5 * np.cos(np.pi * np.clip(k / num_zeros, -1, 1))
    return w


def speed_perturb(x: np.ndarray, factor: float) -> np.ndarray:
    """sox speed analogue: playback-rate change (pitch shifts too)."""
    if factor == 1.0:
        return x
    return resample_sinc(x, factor)


def resample_linear_device(x: jnp.ndarray, factor: float,
                           n_out: int) -> jnp.ndarray:
    """Jittable linear-interp resample to a STATIC output length n_out
    (for on-device augmentation inside the train step)."""
    pos = jnp.arange(n_out) * factor
    left = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[-1] - 2)
    frac = pos - left
    return x[..., left] * (1 - frac) + x[..., left + 1] * frac
