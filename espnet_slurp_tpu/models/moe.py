"""Mixture-of-Experts feed-forward with expert parallelism.

New capability beyond the reference (SURVEY.md §2.10 lists tensor/pipeline/
sequence parallelism as north-star goals; expert parallelism completes the
set): a Switch-style routed FFN whose expert weights shard over an
``expert`` mesh axis.

TPU design: capacity-based dense dispatch — tokens are routed to their
top-1 expert with a fixed per-expert capacity C, the dispatch is a one-hot
[S, E, C] einsum (MXU work, no dynamic shapes, no sorting), expert FFNs run
as one batched einsum over the expert dim ([E, C, D] x [E, D, F]), and the
combine is the transposed dispatch weighted by the router gate. Overflowing
tokens are dropped (their combine weight is 0 — the residual connection
carries them), the standard Switch behavior. The auxiliary load-balance
loss is E * sum_e (fraction_e * mean_gate_e) (Switch Transformer eq. 4).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEFeedForward(nn.Module):
    """[B, T, D] -> ([B, T, D], aux_loss scalar)."""
    d_model: int
    d_ff: int
    num_experts: int = 4
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 pad_mask: jnp.ndarray = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pad_mask: [B, T] bool, True at valid frames. Padded frames take
        no routing decision — they claim no expert capacity (bucketed
        batches would otherwise evict real tokens with identical pad
        activations) and are excluded from the load-balance statistics."""
        b, t, d = x.shape
        e = self.num_experts
        s = b * t
        cap = max(int(s / e * self.capacity_factor), 1)
        xf = x.reshape(s, d)
        valid = jnp.ones((s,), jnp.float32) if pad_mask is None \
            else pad_mask.reshape(s).astype(jnp.float32)

        # Router (fp32 for a stable softmax).
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            xf.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)           # [S, E]
        expert_idx = jnp.argmax(gates, axis=-1)           # [S]
        onehot = jax.nn.one_hot(expert_idx, e,
                                dtype=jnp.float32) * valid[:, None]
        gate = jnp.sum(gates * onehot, axis=-1)           # [S] top-1 gate

        # Load-balance aux loss (Switch eq. 4) over VALID tokens only:
        # fraction of tokens per expert x mean router prob per expert.
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        density = jnp.sum(onehot, axis=0) / n_valid       # [E]
        density_proxy = jnp.sum(gates * valid[:, None],
                                axis=0) / n_valid         # [E]
        aux = e * jnp.sum(density * density_proxy)

        # Position of each token within its expert's buffer; tokens past
        # capacity get weight 0 (dropped -> residual carries them).
        pos = jnp.cumsum(onehot, axis=0) * onehot         # [S, E], 1-based
        pos_idx = jnp.sum(pos, axis=-1).astype(jnp.int32) - 1  # [S]
        keep = (pos_idx >= 0) & (pos_idx < cap)
        cap_onehot = jax.nn.one_hot(jnp.where(keep, pos_idx, cap), cap,
                                    dtype=jnp.float32)    # [S, C]
        dispatch = onehot[:, :, None] * cap_onehot[:, None, :]  # [S, E, C]

        # Expert buffers and batched expert FFNs.
        buf = jnp.einsum("sec,sd->ecd", dispatch,
                         xf.astype(jnp.float32)).astype(self.dtype)
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, self.d_ff), jnp.float32).astype(self.dtype)
        b1 = self.param("b1", nn.initializers.zeros,
                        (e, self.d_ff), jnp.float32).astype(self.dtype)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, self.d_ff, d), jnp.float32).astype(self.dtype)
        b2 = self.param("b2", nn.initializers.zeros,
                        (e, d), jnp.float32).astype(self.dtype)
        h = jnp.einsum("ecd,edf->ecf", buf, w1) + b1[:, None]
        h = nn.swish(h)
        out = jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None]

        # Combine: gate-weighted gather back to token order.
        combine = dispatch * gate[:, None, None]          # [S, E, C]
        y = jnp.einsum("sec,ecd->sd", combine,
                       out.astype(jnp.float32))
        return y.reshape(b, t, d).astype(x.dtype), aux
