"""SpecAugment as pure jittable masking — no dynamic shapes, no host RNG.

Parity target: reference espnet2/asr/specaug/specaug.py:9-96 (time warp ->
freq mask -> time mask) and espnet2/layers/mask_along_axis.py /
time_warp.py. The reference draws mask positions with torch RNG per batch;
here every draw comes from a jax PRNG key so the whole augmentation lives
inside the jitted train step (augmentation on-device, overlapping with
compute, instead of in DataLoader workers).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .masks import length_mask


@dataclasses.dataclass(frozen=True)
class SpecAugConfig:
    apply_time_warp: bool = True
    time_warp_window: int = 5
    apply_freq_mask: bool = True
    freq_mask_width_range: Tuple[int, int] = (0, 20)
    num_freq_mask: int = 2
    apply_time_mask: bool = True
    time_mask_width_range: Tuple[int, int] = (0, 40)
    num_time_mask: int = 2


def _mask_along_axis(
    key: jax.Array,
    x: jnp.ndarray,
    axis_len: int,
    width_range: Tuple[int, int],
    num_mask: int,
    axis: int,
) -> jnp.ndarray:
    """Zero ``num_mask`` random bands of random width along ``axis``.

    Vectorized over batch: draws (B, num_mask) widths/starts, builds one
    boolean mask via iota comparisons (mask_along_axis.py:14-79 semantics).
    """
    b = x.shape[0]
    kw, ks = jax.random.split(key)
    # Width ~ U[w0, w1) and position ~ U[0, max(1, L - max_drawn_width)) —
    # the exact draw law of mask_along_axis.py:32-43 (the position bound is
    # data-dependent on the batch's max width, so it is emulated with a
    # floor(uniform * bound) rather than randint).
    widths = jax.random.randint(
        kw, (b, num_mask, 1), width_range[0], max(width_range[1], 1))
    bound = jnp.maximum(1, axis_len - jnp.max(widths)).astype(jnp.float32)
    u = jax.random.uniform(ks, (b, num_mask, 1))
    starts = jnp.floor(u * bound).astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, (1, 1, axis_len), 2)
    band = (pos >= starts) & (pos < starts + widths)  # (B, num_mask, L)
    masked = jnp.any(band, axis=1)  # (B, L)
    shape = [b, 1, 1]
    shape[axis] = axis_len
    return jnp.where(masked.reshape(shape), 0.0, x)


def _time_warp_one(x: jnp.ndarray, center: jnp.ndarray, offset: jnp.ndarray,
                   valid_len: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear time warp of one [T, F] example via interpolated gather.

    Maps source position ``center`` to ``center + offset`` (time_warp.py:9-60
    semantics, linear instead of bicubic interpolation — the warp is a data
    augmentation, interpolation order is immaterial to training).
    """
    t = x.shape[0]
    dst = jnp.arange(t, dtype=jnp.float32)
    c = center.astype(jnp.float32)
    d = offset.astype(jnp.float32)
    warped_c = c + d
    # Destination -> source mapping, piecewise linear around warped center.
    left = dst * c / jnp.maximum(warped_c, 1.0)
    vl = valid_len.astype(jnp.float32)
    right = c + (dst - warped_c) * (vl - c) / jnp.maximum(vl - warped_c, 1.0)
    src = jnp.where(dst < warped_c, left, right)
    src = jnp.clip(src, 0.0, vl - 1.0)
    # Only warp inside the valid region; keep padding frames untouched.
    src = jnp.where(dst < vl, src, dst)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo.astype(jnp.float32))[:, None]
    return x[lo] * (1.0 - frac) + x[hi] * frac


def specaug(
    key: jax.Array,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: SpecAugConfig = SpecAugConfig(),
) -> jnp.ndarray:
    """[B, T, F] features -> augmented features (same shape)."""
    b, t, f = x.shape
    k_warp, k_freq, k_time = jax.random.split(key, 3)
    if cfg.apply_time_warp and t > 2 * cfg.time_warp_window:
        kc, ko = jax.random.split(k_warp)
        w = cfg.time_warp_window
        centers = jax.random.randint(kc, (b,), w, jnp.maximum(t - w, w + 1))
        centers = jnp.minimum(centers, jnp.maximum(lengths - w - 1, w))
        offsets = jax.random.randint(ko, (b,), -w, w + 1)
        x = jax.vmap(_time_warp_one)(x, centers, offsets, lengths)
    if cfg.apply_freq_mask:
        x = _mask_along_axis(
            k_freq, x, f, cfg.freq_mask_width_range, cfg.num_freq_mask, axis=2)
    if cfg.apply_time_mask:
        x = _mask_along_axis(
            k_time, x, t, cfg.time_mask_width_range, cfg.num_time_mask, axis=1)
        x = jnp.where(length_mask(lengths, t)[..., None], x, 0.0)
    return x
