"""Language models: Transformer LM and recurrent (LSTM) LM.

Parity targets: reference espnet2/lm/transformer_lm.py:12, seq_rnn_lm.py:11,
espnet_model.py:13 (nll/ppl). Both expose a stateful `step` for shallow
fusion inside the batched beam search (scorer pytree, SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.masks import attention_bias, causal_mask, length_mask
from .embedding import abs_positional_encoding, sinusoid_table
from .transformer import CachedAttention, FeedForward


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 5000
    arch: str = "transformer"  # transformer | lstm
    d_model: int = 512
    n_head: int = 8
    d_ff: int = 2048
    num_blocks: int = 16
    num_layers: int = 2       # lstm
    dropout_rate: float = 0.0
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class TransformerLM(nn.Module):
    cfg: LMConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.jax_dtype)
        self.attn = [CachedAttention(c.n_head, c.d_model, c.dropout_rate,
                                     c.jax_dtype, name=f"attn_{i}")
                     for i in range(c.num_blocks)]
        self.norm1 = [nn.LayerNorm(dtype=c.jax_dtype, name=f"norm1_{i}")
                      for i in range(c.num_blocks)]
        self.norm2 = [nn.LayerNorm(dtype=c.jax_dtype, name=f"norm2_{i}")
                      for i in range(c.num_blocks)]
        self.ff = [FeedForward(c.d_model, c.d_ff, c.dropout_rate, c.jax_dtype,
                               name=f"ff_{i}") for i in range(c.num_blocks)]
        self.after_norm = nn.LayerNorm(dtype=c.jax_dtype)
        self.output = nn.Dense(c.vocab_size, dtype=c.jax_dtype)

    def __call__(self, ys, ys_lengths):
        """[B, L] -> [B, L, V] next-token logits."""
        l = ys.shape[1]
        x = abs_positional_encoding(self.embed(ys), scale=True)
        bias = attention_bias(causal_mask(l)[None, None]
                              & length_mask(ys_lengths, l)[:, None, None, :])
        for i in range(self.cfg.num_blocks):
            h = self.norm1[i](x)
            x = x + self.attn[i](h, h, bias)
            x = x + self.ff[i](self.norm2[i](x))
        return self.output(self.after_norm(x))

    def init_cache(self, batch: int, max_len: int):
        c = self.cfg
        dh = c.d_model // c.n_head
        z = lambda: jnp.zeros((batch, max_len, c.n_head, dh), c.jax_dtype)
        return {"pos": jnp.zeros((batch,), jnp.int32),
                **{f"layer_{i}": {"k": z(), "v": z()}
                   for i in range(c.num_blocks)}}

    def step(self, y_t, cache):
        """One token: [B] -> ([B, V] logits, cache). Position from cache."""
        c = self.cfg
        max_len = cache["layer_0"]["k"].shape[1]
        pos = cache["pos"][0]  # scalar; all hyps advance in lockstep
        emb = self.embed(y_t[:, None]) * jnp.sqrt(
            jnp.asarray(c.d_model, c.jax_dtype))
        pe = jnp.asarray(sinusoid_table(max_len, c.d_model))
        x = emb + lax.dynamic_slice_in_dim(pe, pos, 1, 0)[None].astype(
            emb.dtype)
        poss = lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
        bias = jnp.where(poss <= pos, 0.0, -1e9).astype(jnp.float32)
        new_cache = {"pos": cache["pos"] + 1}
        for i in range(c.num_blocks):
            h = self.norm1[i](x)
            k_t, v_t = self.attn[i].project_kv(h)
            ck = lax.dynamic_update_slice_in_dim(
                cache[f"layer_{i}"]["k"], k_t, pos, 1)
            cv = lax.dynamic_update_slice_in_dim(
                cache[f"layer_{i}"]["v"], v_t, pos, 1)
            x = x + self.attn[i].attend(h, ck, cv, bias)
            x = x + self.ff[i](self.norm2[i](x))
            new_cache[f"layer_{i}"] = {"k": ck, "v": cv}
        return self.output(self.after_norm(x))[:, 0], new_cache


class LSTMLM(nn.Module):
    """SequentialRNNLM analogue (espnet2/lm/seq_rnn_lm.py:11)."""
    cfg: LMConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.jax_dtype)
        self.rnns = [nn.RNN(nn.OptimizedLSTMCell(c.d_model, dtype=c.jax_dtype),
                            name=f"rnn_{i}")
                     for i in range(c.num_layers)]
        self.output = nn.Dense(c.vocab_size, dtype=c.jax_dtype)

    def init_carry(self, batch: int):
        c = self.cfg
        z = lambda: jnp.zeros((batch, c.d_model), c.jax_dtype)
        return [(z(), z()) for _ in range(c.num_layers)]

    def step(self, y_t, carry):
        x = self.embed(y_t)
        new_carry = []
        for rnn, cr in zip(self.rnns, carry):
            cr, x = rnn.cell(cr, x)
            new_carry.append(cr)
        return self.output(x), new_carry

    def __call__(self, ys, ys_lengths):
        # nn.RNN handles the time scan with linen functionalization; `step`
        # reuses the same cells (rnn.cell) for incremental decoding.
        x = self.embed(ys)
        for rnn in self.rnns:
            x = rnn(x)
        return self.output(x)


def lm_loss(logits, targets, lengths):
    """Next-token NLL, mean over valid tokens; returns (loss, ppl, ntokens)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    mask = length_mask(lengths, targets.shape[1])
    total = jnp.sum(jnp.where(mask, nll, 0.0))
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = total / n
    return mean, jnp.exp(mean), n
