"""WPE dereverberation (weighted prediction error) in the STFT domain.

Parity target: reference frontend enhancement
espnet/nets/pytorch_backend/frontends/dnn_wpe.py + pytorch_wpe (nara-wpe
style), hooked into DefaultFrontend via ``use_wpe``
(espnet2/asr/frontend/default.py WPE/MVDR stage, SURVEY.md §2.3).

Classic blocked WPE iteration, per frequency bin:
    lambda[t]   = mean_c |X[c, t]|^2                (PSD estimate)
    Ytilde[t]   = stacked taps X[:, t-D-K+1 : t-D]  (delayed context)
    G           = (Ytilde^H diag(1/lambda) Ytilde)^-1
                  (Ytilde^H diag(1/lambda) X)
    X_derev     = X - G^H Ytilde

TPU design: every frequency is independent -> ONE batched einsum/solve
over [B*F] systems of size [C*K, C*K] (MXU-friendly), no python loop over
bins; the tap stacking is a static gather. Complex arithmetic is kept in
native complex64 (XLA lowers it to planar f32 pairs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _stack_taps(x: jnp.ndarray, taps: int, delay: int) -> jnp.ndarray:
    """x: [..., C, T, F] -> [..., C*taps, T, F]; tap k holds
    x[t - delay - k] (zero before t=0)."""
    outs = []
    t = x.shape[-2]
    for k in range(taps):
        shift = delay + k
        pad = jnp.zeros_like(x[..., :shift, :])
        outs.append(jnp.concatenate([pad, x[..., :t - shift, :]], axis=-2))
    return jnp.concatenate(outs, axis=-3)


def wpe_dereverb(spec: jnp.ndarray, taps: int = 5, delay: int = 3,
                 iters: int = 3, eps: float = 1e-6) -> jnp.ndarray:
    """Dereverberate a multichannel STFT.

    spec: complex [B, C, T, F]; returns the dereverberated [B, C, T, F].
    """
    b, c, t, f = spec.shape
    y = _stack_taps(spec, taps, delay)              # [B, C*K, T, F]
    # frequency-major layout for the batched solves: [B, F, T, C]
    x_f = jnp.moveaxis(spec, (1, 2, 3), (3, 2, 1))  # [B, F, T, C]
    y_f = jnp.moveaxis(y, (1, 2, 3), (3, 2, 1))     # [B, F, T, C*K]
    d = spec
    for _ in range(iters):
        lam = jnp.mean(jnp.abs(d) ** 2, axis=1)     # [B, T, F]
        lam = jnp.moveaxis(lam, 1, 2)               # [B, F, T]
        # Relative PSD floor: with overlapping analysis windows the
        # prediction can collapse |d|^2 toward 0 in a few bins, and raw
        # 1/lambda weights then explode across iterations (nara-wpe
        # stabilizes the same way). Floor at 1e-3 of the bin's mean power.
        floor = 1e-3 * jnp.mean(lam, axis=-1, keepdims=True)
        w = 1.0 / jnp.maximum(lam, jnp.maximum(floor, eps))
        yw = y_f * w[..., None]                     # [B, F, T, C*K]
        r = jnp.einsum("bfti,bftj->bfij", jnp.conj(yw), y_f)
        p = jnp.einsum("bfti,bftj->bfij", jnp.conj(yw), x_f)
        # scale-aware Tikhonov ridge (trace-normalized)
        tr = jnp.real(jnp.trace(r, axis1=-2, axis2=-1))[..., None, None]
        ridge = (1e-4 * tr / (c * taps) + eps)
        r = r + ridge * jnp.eye(c * taps, dtype=r.dtype)
        g = jnp.linalg.solve(r, p)                  # [B, F, C*K, C]
        pred = jnp.einsum("bfti,bfij->bftj", y_f, g)
        d_f = x_f - pred                            # [B, F, T, C]
        d = jnp.moveaxis(d_f, (1, 2, 3), (3, 2, 1))
    return d
