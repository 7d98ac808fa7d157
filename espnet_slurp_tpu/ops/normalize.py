"""Feature normalization: GlobalMVN (precomputed stats) and UtteranceMVN.

Parity targets: reference espnet2/layers/global_mvn.py (stats npz with
count/sum/sum_square from the collect-stats pass) and utterance_mvn.py.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .masks import length_mask


def global_mvn_params(stats: dict | str, eps: float = 1.0e-20
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Load (mean, inv_std) from a collect-stats npz (keys: count, sum, sum_square).

    Accepts either a path to .npz or an in-memory dict. Matches
    global_mvn.py:37-74 math.
    """
    if isinstance(stats, str):
        stats = dict(np.load(stats))
    count = np.asarray(stats["count"], dtype=np.float64)
    mean = np.asarray(stats["sum"], dtype=np.float64) / count
    var = np.asarray(stats["sum_square"], dtype=np.float64) / count - mean**2
    std = np.sqrt(np.maximum(var, eps))
    return mean.astype(np.float32), (1.0 / std).astype(np.float32)


def global_mvn(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    norm_means: bool = True,
    norm_vars: bool = True,
) -> jnp.ndarray:
    """[B, T, F] -> normalized, padding zeroed (global_mvn.py:76-111)."""
    if norm_means:
        x = x - mean
    if norm_vars:
        x = x * inv_std
    return jnp.where(length_mask(lengths, x.shape[1])[..., None], x, 0.0)


def utterance_mvn(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    norm_means: bool = True,
    norm_vars: bool = False,
    eps: float = 1.0e-20,
) -> jnp.ndarray:
    """Per-utterance MVN over valid frames (utterance_mvn.py:8-88)."""
    mask = length_mask(lengths, x.shape[1])[..., None]  # (B, T, 1)
    denom = jnp.maximum(lengths.astype(x.dtype), 1.0)[:, None, None]
    mean = jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True) / denom
    if norm_means:
        x = jnp.where(mask, x - mean, 0.0)
        if norm_vars:
            var = jnp.sum(jnp.where(mask, x**2, 0.0), axis=1, keepdims=True) / denom
            x = x / jnp.sqrt(jnp.maximum(var, eps))
            x = jnp.where(mask, x, 0.0)
        return x
    else:
        if norm_vars:
            var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0),
                          axis=1, keepdims=True) / denom
            x = x / jnp.sqrt(jnp.maximum(var, eps))
        return jnp.where(mask, x, 0.0)
