"""Multi-head attention variants (absolute and relative-position).

Parity targets: reference espnet/nets/pytorch_backend/transformer/attention.py
(MultiHeadedAttention at :17-120, RelPositionMultiHeadedAttention at :212-308
with rel_shift at :240). TPU-first shape discipline: all projections are one
fused [D, 3D] or per-head matmuls kept batched; softmax in fp32; additive mask
bias instead of masked_fill so the whole layer is one fusable XLA region.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    """Abs-pos MHA with optional cross-attention (q from x, k/v from memory)."""
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, mask_bias=None, deterministic=True):
        h, d = self.n_head, self.n_feat
        dh = d // h
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("linear_q")(query).reshape(*query.shape[:-1], h, dh)
        k = dense("linear_k")(key).reshape(*key.shape[:-1], h, dh)
        v = dense("linear_v")(value).reshape(*value.shape[:-1], h, dh)
        q = jnp.swapaxes(q, -3, -2)  # (B, H, Tq, Dh)
        k = jnp.swapaxes(k, -3, -2)
        v = jnp.swapaxes(v, -3, -2)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        if mask_bias is not None:
            scores = scores + mask_bias
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        if self.dropout_rate > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.swapaxes(out, -3, -2).reshape(*query.shape[:-1], d)
        out = nn.Dense(d, dtype=self.dtype, name="linear_out")(out)
        self.sow("intermediates", "attn", attn)
        return out


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (attention.py:240-260 semantics).

    x: [B, H, Tq, 2*Tq-1] scores against positions (Tq-1 ... -(Tq-1));
    returns [B, H, Tq, Tq] where out[:, :, i, j] = x[:, :, i, (Tq-1) - i + j].
    """
    b, h, t, p = x.shape
    # Standard pad-reshape trick; static shapes throughout.
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B,H,T,P+1)
    x = x.reshape(b, h, p + 1, t)
    x = x[:, :, 1:, :].reshape(b, h, t, p)
    return x[:, :, :, :t]


class RelPosMultiHeadAttention(nn.Module):
    """Relative-position MHA (Transformer-XL style) as used by Conformer.

    Matches RelPositionMultiHeadedAttention (attention.py:212-308): learned
    per-head biases pos_bias_u/v, separate linear_pos on the positional
    embedding matrix, rel-shift to align positions.

    With ``use_flash`` (and ``lengths`` provided, T % 128 == 0), the whole
    score/softmax/dropout/value pipeline runs in the fused Pallas kernel
    (ops/pallas/flash_attention.py) — no [B,H,T,T] or [B,H,T,2T-1] HBM
    buffers. Padding and chunk restrictions are applied inside the kernel,
    so ``mask_bias`` must carry no information beyond (lengths, chunk_size,
    left_chunks) on that path.
    """
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, pos_emb, mask_bias=None, deterministic=True,
                 lengths=None, chunk_size=0, left_chunks=-1):
        h, d = self.n_head, self.n_feat
        dh = d // h
        b, t, _ = x.shape
        q = nn.Dense(d, dtype=self.dtype, name="linear_q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="linear_k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="linear_v")(x)
        p = nn.Dense(d, use_bias=False, dtype=self.dtype, name="linear_pos")(
            pos_emb)  # (1, 2T-1, D)
        pos_bias_u = self.param("pos_bias_u", nn.initializers.zeros, (h, dh),
                                self.dtype)
        pos_bias_v = self.param("pos_bias_v", nn.initializers.zeros, (h, dh),
                                self.dtype)
        q = q.reshape(b, t, h, dh)
        scale = 1.0 / float(dh) ** 0.5

        if self.use_flash and lengths is not None and t % 128 == 0:
            from ..ops.pallas.flash_attention import rel_flash_attention
            q_u = jnp.swapaxes(q + pos_bias_u[None, None], 1, 2)
            q_v = jnp.swapaxes(q + pos_bias_v[None, None], 1, 2)
            k4 = jnp.swapaxes(k.reshape(b, t, h, dh), 1, 2)
            v4 = jnp.swapaxes(v.reshape(b, t, h, dh), 1, 2)
            # p rows: (1, 2T-1, D) -> [H, 2T, Dh] with a trailing zero row
            # (kernel slabs may touch index 2T-1, never used in valid cols).
            p4 = jnp.swapaxes(p.reshape(2 * t - 1, h, dh), 0, 1)
            p4 = jnp.pad(p4, ((0, 0), (0, 1), (0, 0)))
            rate = self.dropout_rate if not deterministic else 0.0
            seed = None
            if rate > 0.0:
                rng = self.make_rng("dropout")
                seed = jax.random.randint(rng, (1,), 0, 2**31 - 1,
                                          dtype=jnp.int32)
            out = rel_flash_attention(
                q_u, q_v, k4, v4, p4, lengths, seed, scale=scale,
                dropout_rate=rate, chunk_size=chunk_size,
                left_chunks=left_chunks)
            out = jnp.swapaxes(out, 1, 2).reshape(b, t, d).astype(self.dtype)
            return nn.Dense(d, dtype=self.dtype, name="linear_out")(out)

        k = jnp.swapaxes(k.reshape(b, t, h, dh), 1, 2)
        v = jnp.swapaxes(v.reshape(b, t, h, dh), 1, 2)
        p = jnp.swapaxes(p.reshape(p.shape[0], -1, h, dh), 1, 2)  # (1,H,P,Dh)

        q_u = jnp.swapaxes(q + pos_bias_u[None, None], 1, 2)  # (B,H,T,Dh)
        q_v = jnp.swapaxes(q + pos_bias_v[None, None], 1, 2)
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, p,
                        preferred_element_type=jnp.float32)
        bd = rel_shift(bd)
        scores = (ac + bd) * scale
        if mask_bias is not None:
            scores = scores + mask_bias
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        # Diagnostics harvest (calculate_all_attentions analogue). The
        # flash path above cannot sow — its probabilities never leave VMEM
        # by design — so attention plots use this materialized path.
        self.sow("intermediates", "attn", attn)
        if self.dropout_rate > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="linear_out")(out)
