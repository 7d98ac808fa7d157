"""Enhancement losses: SI-SNR and permutation-invariant training (PIT).

Parity target: reference espnet2/enh/ losses (si_snr, PIT solver — SURVEY.md
§2.7). PIT enumerates permutations statically (n_spk <= 4 in practice), so
the whole loss is one fused jit region — no Hungarian solver needed.
"""
from __future__ import annotations

import itertools
from typing import Callable, Tuple

import jax.numpy as jnp

from ..ops.masks import length_mask


def si_snr_loss(est: jnp.ndarray, ref: jnp.ndarray,
                lengths: jnp.ndarray | None = None,
                eps: float = 1e-8) -> jnp.ndarray:
    """Negative scale-invariant SNR, per example.

    est/ref: [..., N] waveforms. Returns [...] loss = -SI-SNR in dB.
    """
    if lengths is not None:
        mask = length_mask(lengths, est.shape[-1])
        shape = (mask.shape[0],) + (1,) * (est.ndim - 2) + (mask.shape[-1],)
        mask = mask.reshape(shape)
        n = jnp.maximum(lengths.astype(est.dtype), 1.0)
        n = n.reshape((n.shape[0],) + (1,) * (est.ndim - 1))
        est = jnp.where(mask, est, 0.0)
        ref = jnp.where(mask, ref, 0.0)
        est = jnp.where(mask, est - jnp.sum(est, -1, keepdims=True) / n, 0.0)
        ref = jnp.where(mask, ref - jnp.sum(ref, -1, keepdims=True) / n, 0.0)
    else:
        est = est - jnp.mean(est, -1, keepdims=True)
        ref = ref - jnp.mean(ref, -1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True) + eps
    proj = dot / energy * ref
    noise = est - proj
    ratio = (jnp.sum(proj**2, -1) + eps) / (jnp.sum(noise**2, -1) + eps)
    return -10.0 * jnp.log10(ratio)


def pit_wrapper(loss_fn: Callable, est: jnp.ndarray, ref: jnp.ndarray,
                *args) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant loss over the speaker axis.

    est/ref: [B, n_spk, ...]. Returns (per-example best loss [B],
    best permutation index [B]).
    """
    n_spk = est.shape[1]
    perms = list(itertools.permutations(range(n_spk)))
    losses = []
    for perm in perms:
        l = jnp.stack([loss_fn(est[:, i], ref[:, p], *args)
                       for i, p in enumerate(perm)], axis=1).mean(axis=1)
        losses.append(l)
    losses = jnp.stack(losses, axis=1)  # [B, n_perms]
    best = jnp.argmin(losses, axis=1)
    return jnp.min(losses, axis=1), best


def dpcl_loss(emb, ref_mags, valid):
    """Deep-clustering affinity loss (tf_domain.py:282-381, loss_type=dpcl).

    emb: [B, T, F, D] TF-bin embeddings; ref_mags: [B, S, T, F] reference
    magnitudes; valid: [B, T] frame validity. The dominant speaker per bin
    gives the one-hot label Y; loss = ||V^T V||^2 + ||Y^T Y||^2
    - 2 ||V^T Y||^2 per example, normalized by the valid bin count."""
    import jax
    b, t, f, d = emb.shape
    s = ref_mags.shape[1]
    lab = jnp.argmax(ref_mags, axis=1)                    # [B, T, F]
    y = jax.nn.one_hot(lab, s).reshape(b, t * f, s)
    v = emb.reshape(b, t * f, d)
    w = jnp.repeat(valid, f, axis=1).astype(jnp.float32)[..., None]
    v = v * w
    y = y * w
    vv = jnp.einsum("bnd,bne->bde", v, v)
    yy = jnp.einsum("bns,bnt->bst", y, y)
    vy = jnp.einsum("bnd,bns->bds", v, y)
    loss = (jnp.sum(vv ** 2, (1, 2)) + jnp.sum(yy ** 2, (1, 2))
            - 2.0 * jnp.sum(vy ** 2, (1, 2)))
    n_valid = jnp.maximum(jnp.sum(w[..., 0], 1), 1.0)
    return loss / (n_valid ** 2)
