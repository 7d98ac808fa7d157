"""HuBERT-style masked-prediction SSL pretraining.

Parity target: reference espnet2/hubert/ (fairseq-bridged HuBERT pretrain,
SURVEY.md §2.7). In-framework version: frontend features -> span masking
with a learned mask embedding -> conformer encoder -> CE against frame-level
pseudo-labels (k-means cluster ids supplied as a data stream), evaluated at
masked frames (HuBERT's masked-only loss).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.frontend import FrontendConfig, default_frontend
from ..ops.masks import length_mask
from ..ops.normalize import utterance_mvn
from .conformer import ConformerEncoder


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    n_clusters: int = 100
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 1024
    num_blocks: int = 6
    kernel_size: int = 15
    mask_prob: float = 0.08       # per-frame span-start probability
    mask_span: int = 10
    frontend: FrontendConfig = FrontendConfig()
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class HubertModel(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, speech, speech_lengths, cluster_ids, *, train=True,
                 mask_rng=None):
        """cluster_ids: [B, T'] frame-level pseudo-labels at the ENCODER
        frame rate (x4-subsampled). Returns (loss, stats)."""
        c = self.cfg
        feats, flens = default_frontend(speech, speech_lengths, c.frontend)
        feats = utterance_mvn(feats, flens).astype(c.jax_dtype)
        # Span masking on the feature sequence (pre-encoder, HuBERT-style).
        if mask_rng is None:
            mask_rng = jax.random.PRNGKey(0)
        b, t, f = feats.shape
        starts = jax.random.uniform(mask_rng, (b, t)) < c.mask_prob
        # dilate starts into spans with a max-pool over a window
        span = jnp.asarray(starts, jnp.float32)
        kernel = jnp.ones((c.mask_span,))
        masked = jax.vmap(
            lambda s: jnp.convolve(s, kernel, mode="same"))(span) > 0
        masked = masked & length_mask(flens, t)
        mask_emb = self.param("mask_emb", nn.initializers.normal(0.02),
                              (f,), c.jax_dtype)
        x = jnp.where(masked[..., None], mask_emb, feats)
        enc = ConformerEncoder(c.d_model, c.n_head, c.d_ff, c.num_blocks,
                               c.kernel_size, dtype=c.jax_dtype,
                               name="encoder")
        hs, h_lengths, _ = enc(x, flens, deterministic=not train)
        logits = nn.Dense(c.n_clusters, dtype=c.jax_dtype,
                          name="pred")(hs).astype(jnp.float32)
        # Targets are at the subsampled frame rate; masked-ness per encoder
        # frame = any masked input frame in its x4 receptive window.
        t_enc = hs.shape[1]
        m4 = masked[:, : t_enc * 4]
        pad = t_enc * 4 - m4.shape[1]
        if pad > 0:
            m4 = jnp.pad(m4, ((0, 0), (0, pad)))
        masked_enc = m4.reshape(b, t_enc, 4).any(-1)
        # pseudo-label streams may be a few frames short of the encoder
        # length (k-means ran on a slightly different frame count) — pad
        # with -1 so those frames fall out of `valid`.
        if cluster_ids.shape[1] < t_enc:
            cluster_ids = jnp.pad(
                cluster_ids, ((0, 0), (0, t_enc - cluster_ids.shape[1])),
                constant_values=-1)
        tgt = jnp.clip(cluster_ids[:, :t_enc], 0, c.n_clusters - 1)
        valid = masked_enc & length_mask(h_lengths, t_enc) & \
            (cluster_ids[:, :t_enc] >= 0)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / denom
        acc = jnp.sum((jnp.argmax(logits, -1) == tgt) & valid) / denom
        stats: Dict[str, jnp.ndarray] = {
            "loss": loss, "acc_masked": acc,
            "mask_ratio": jnp.mean(masked.astype(jnp.float32))}
        return loss, stats
