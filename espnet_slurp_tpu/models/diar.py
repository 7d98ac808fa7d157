"""EEND-style speaker diarization.

Parity target: reference espnet2/diar/ (SURVEY.md §2.7: EEND model with
attractors, 1058 LoC). This implements the core EEND-SA path: frontend ->
transformer encoder -> per-frame per-speaker sigmoid activity with PIT-BCE
loss (attractor decoding is a follow-up).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.attention import MultiHeadAttention
from ..models.embedding import abs_positional_encoding
from ..ops.frontend import FrontendConfig, default_frontend
from ..ops.masks import attention_bias, length_mask
from ..ops.normalize import utterance_mvn


@dataclasses.dataclass(frozen=True)
class DiarConfig:
    n_spk: int = 2
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 1024
    num_blocks: int = 4
    frontend: FrontendConfig = FrontendConfig()
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


def _bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


class DiarModel(nn.Module):
    cfg: DiarConfig

    @nn.compact
    def activity(self, speech, speech_lengths, deterministic=True):
        """[B, N] -> (per-frame logits [B, T, n_spk], frame lengths)."""
        c = self.cfg
        feats, flens = default_frontend(speech, speech_lengths, c.frontend)
        feats = utterance_mvn(feats, flens).astype(c.jax_dtype)
        x = nn.Dense(c.d_model, dtype=c.jax_dtype, name="in_proj")(feats)
        x = abs_positional_encoding(x, scale=False)
        mask = length_mask(flens, x.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for i in range(c.num_blocks):
            h = nn.LayerNorm(dtype=c.jax_dtype, name=f"n1_{i}")(x)
            x = x + MultiHeadAttention(c.n_head, c.d_model,
                                       dtype=c.jax_dtype,
                                       name=f"attn_{i}")(h, h, h, bias,
                                                         deterministic)
            h = nn.LayerNorm(dtype=c.jax_dtype, name=f"n2_{i}")(x)
            h = nn.Dense(c.d_ff, dtype=c.jax_dtype, name=f"f1_{i}")(h)
            x = x + nn.Dense(c.d_model, dtype=c.jax_dtype,
                             name=f"f2_{i}")(nn.relu(h))
        logits = nn.Dense(c.n_spk, dtype=c.jax_dtype, name="out")(x)
        return logits.astype(jnp.float32), flens

    def __call__(self, speech, speech_lengths, spk_labels, *, train=False):
        """spk_labels: [B, T, n_spk] 0/1 frame activity. PIT-BCE loss."""
        logits, flens = self.activity(speech, speech_lengths,
                                      deterministic=not train)
        t = min(logits.shape[1], spk_labels.shape[1])
        logits = logits[:, :t]
        labels = spk_labels[:, :t].astype(jnp.float32)
        mask = length_mask(jnp.minimum(flens, t), t)[..., None]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        perms = list(itertools.permutations(range(self.cfg.n_spk)))
        losses = []
        for perm in perms:
            l = _bce(logits, labels[..., list(perm)])
            losses.append(jnp.sum(l * mask, axis=(1, 2)))
        losses = jnp.stack(losses, 1)  # [B, P]
        loss = jnp.mean(jnp.min(losses, axis=1)) / denom * logits.shape[0]
        # Frame-level diarization error proxy (best permutation).
        best = jnp.argmin(losses, axis=1)
        stats: Dict[str, jnp.ndarray] = {"loss": loss}
        return loss, stats
