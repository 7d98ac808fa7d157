"""EEND-style speaker diarization: SA-EEND and EEND-EDA.

Parity target: reference espnet2/diar/ (SURVEY.md §2.7: EEND model with
attractors, 1058 LoC): espnet_model.py (PIT-BCE + attractor loss),
attractor/rnn_attractor.py (LSTM encoder-decoder attractor).

TPU redesign notes:
- The attractor encoder emulates pack_padded_sequence with a masked
  lax.scan (carry frozen past each example's length) instead of host-side
  packing; the decoder is a fixed (n_spk+1)-step scan over zero inputs.
- The reference's train-time chronological shuffle (espnet_model.py:112-118,
  a python loop of torch.randperm per example) is one in-jit argsort of
  uniform keys with padding offset — valid frames permute among themselves,
  padding stays at the tail, batched over B.
- Speaker activity is an einsum of encoder frames against the attractors
  (rides the MXU) rather than bmm-with-permute.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, Optional, Tuple

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
    use_attractor: bool = False     # False: SA-EEND, True: EEND-EDA
    attractor_weight: float = 1.0   # espnet_model.py:154
    diar_weight: float = 1.0
    frontend: FrontendConfig = FrontendConfig()
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


def _bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


class EDAAttractor(nn.Module):
    """LSTM encoder-decoder attractor (rnn_attractor.py:6-64 analogue).

    Attractor dimension equals the encoder dimension so the activity
    logits are a direct frame x attractor einsum.
    """
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, enc_lengths, n_attractors: int):
        """enc [B, T, D], lengths [B] -> (attractors [B, A, D],
        existence logits [B, A])."""
        b = enc.shape[0]
        # nn.RNN lifts the cell through the time scan; seq_lengths freezes
        # the carry past each example's length (pack_padded analogue).
        enc_rnn = nn.RNN(
            nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype),
            return_carry=True, name="enc_rnn")
        final, _ = enc_rnn(enc, seq_lengths=enc_lengths)

        dec_rnn = nn.RNN(
            nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype),
            name="dec_rnn")
        zeros = jnp.zeros((b, n_attractors, self.d_model), enc.dtype)
        attractors = dec_rnn(zeros, initial_carry=final)     # [B, A, D]
        logits = nn.Dense(1, dtype=self.dtype, name="proj")(attractors)
        return attractors, logits[..., 0]


def shuffle_valid_frames(rng, x, lengths):
    """Randomly permute each example's first `lengths` frames in-jit.

    espnet_model.py:112-118 analogue: uniform sort keys, padding offset +10
    keeps pad frames at the tail, so valid frames shuffle among themselves.
    """
    b, t = x.shape[:2]
    keys = jax.random.uniform(rng, (b, t))
    keys = keys + jnp.where(length_mask(lengths, t), 0.0, 10.0)
    order = jnp.argsort(keys, axis=1)                        # [B, T]
    return jnp.take_along_axis(x, order[..., None], axis=1)


class DiarModel(nn.Module):
    cfg: DiarConfig

    @nn.compact
    def activity(self, speech, speech_lengths, deterministic=True,
                 shuffle_rng=None):
        """[B, N] -> (frame logits [B, T, n_spk], frame lengths,
        attractor-existence logits [B, n_spk+1] or None)."""
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
        if not c.use_attractor:
            logits = nn.Dense(c.n_spk, dtype=c.jax_dtype, name="out")(x)
            return logits.astype(jnp.float32), flens, None
        enc = x
        if shuffle_rng is not None:
            enc_in = shuffle_valid_frames(shuffle_rng, enc, flens)
        else:
            enc_in = enc
        attractors, att_logits = EDAAttractor(
            c.d_model, c.jax_dtype, name="attractor")(
                enc_in, flens, c.n_spk + 1)
        # drop the terminating attractor; activity = frames x attractors
        logits = jnp.einsum("btd,bsd->bts", enc,
                            attractors[:, :c.n_spk]).astype(jnp.float32)
        return logits, flens, att_logits.astype(jnp.float32)

    def __call__(self, speech, speech_lengths, spk_labels, *, train=False):
        """spk_labels: [B, T, n_spk] 0/1 frame activity. PIT-BCE loss
        (+ attractor existence BCE for EEND-EDA)."""
        c = self.cfg
        shuffle_rng = None
        if train and c.use_attractor:
            shuffle_rng = self.make_rng("shuffle")
        logits, flens, att_logits = self.activity(
            speech, speech_lengths, deterministic=not train,
            shuffle_rng=shuffle_rng)
        t = min(logits.shape[1], spk_labels.shape[1])
        logits = logits[:, :t]
        labels = spk_labels[:, :t].astype(jnp.float32)
        mask = length_mask(jnp.minimum(flens, t), t)[..., None]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        perms = list(itertools.permutations(range(c.n_spk)))
        losses = []
        for perm in perms:
            l = _bce(logits, labels[..., list(perm)])
            losses.append(jnp.sum(l * mask, axis=(1, 2)))
        losses = jnp.stack(losses, 1)  # [B, P]
        loss_pit = jnp.mean(jnp.min(losses, axis=1)) / denom \
            * logits.shape[0]
        stats: Dict[str, jnp.ndarray] = {"pit_loss": loss_pit}
        if att_logits is not None:
            # existence labels [1, ..., 1, 0] (espnet_model.py:328-338)
            att_label = jnp.concatenate(
                [jnp.ones((logits.shape[0], c.n_spk)),
                 jnp.zeros((logits.shape[0], 1))], axis=1)
            loss_att = jnp.mean(_bce(att_logits, att_label))
            loss = c.diar_weight * loss_pit + c.attractor_weight * loss_att
            stats["attractor_loss"] = loss_att
        else:
            loss = loss_pit
        stats["loss"] = loss
        return loss, stats

    def estimate_activity(self, speech, speech_lengths,
                          threshold: float = 0.5):
        """Inference: (posteriors [B, T, n_spk], flens, n_spk estimate [B]).

        With EDA, speakers whose existence probability falls below the
        threshold are zeroed (variable-speaker-count decoding with static
        shapes; the first sub-threshold attractor truncates the count).
        """
        logits, flens, att_logits = self.activity(speech, speech_lengths)
        probs = jax.nn.sigmoid(logits)
        if att_logits is None:
            n_est = jnp.full((logits.shape[0],), self.cfg.n_spk, jnp.int32)
            return probs, flens, n_est
        exist = jax.nn.sigmoid(att_logits)[:, : self.cfg.n_spk]  # [B, S]
        alive = jnp.cumprod((exist >= threshold).astype(jnp.int32), axis=1)
        n_est = jnp.sum(alive, axis=1)
        return probs * alive[:, None, :].astype(probs.dtype), flens, n_est
