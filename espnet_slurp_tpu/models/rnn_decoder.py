"""RNN (LAS) decoder with location-aware attention.

Parity target: reference espnet2/asr/decoder/rnn_decoder.py:1-333 (espnet2
port of the fork's KA2G decoder, espnet/nets/pytorch_backend/rnn/
decoders.py:55-195) with AttLoc location-aware attention
(rnn/attentions.py): per step, attention weights are refined by a 1-D conv
over the PREVIOUS step's weights; LSTM input is [embed(y); context].

TPU design: teacher forcing is a lax.scan over label positions (the
recurrence is inherent); decode exposes the same
``precompute_memory``/``step`` interface as the TransformerDecoder so the
batched beam search and greedy loops work unchanged — the per-step cache is
a batch-first pytree {layer hidden/cell states, previous attention
weights, previous context} that the beam gathers like any other state.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import length_mask


class LocationAttention(nn.Module):
    """AttLoc (rnn/attentions.py): e = g·tanh(W_enc h + W_dec z + W_f f),
    f = conv1d(att_prev)."""
    d_att: int = 320
    conv_chans: int = 10
    conv_filts: int = 100
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def setup(self):
        self.loc_conv = nn.Conv(self.conv_chans,
                                (2 * self.conv_filts + 1,), padding="SAME",
                                use_bias=False, dtype=self.dtype)
        self.mlp_att = nn.Dense(self.d_att, use_bias=False,
                                dtype=self.dtype)
        self.mlp_dec = nn.Dense(self.d_att, dtype=self.dtype)
        self.mlp_enc = nn.Dense(self.d_att, use_bias=False,
                                dtype=self.dtype)
        self.gvec = nn.Dense(1, use_bias=False, dtype=self.dtype)

    def __call__(self, enc, enc_proj, enc_mask, dec_z, att_prev):
        """enc [B,T,De]; enc_proj [B,T,Da]; enc_mask [B,T] bool;
        dec_z [B,Dd]; att_prev [B,T] -> (ctx [B,De], w [B,T])."""
        f = self.mlp_att(self.loc_conv(att_prev[..., None]))  # [B,T,Da]
        z = self.mlp_dec(dec_z)
        e = self.gvec(nn.tanh(enc_proj + f + z[:, None, :]))[..., 0]
        e = jnp.where(enc_mask, e.astype(jnp.float32), -1e30)
        w = jax.nn.softmax(self.scaling * e, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", w.astype(enc.dtype), enc)
        return ctx, w

    def precompute(self, enc):
        return self.mlp_enc(enc)


class RNNDecoder(nn.Module):
    """LAS decoder: embed -> [L x LSTMCell] with location-aware attention."""
    vocab_size: int
    d_enc: int
    units: int = 320
    num_layers: int = 1
    emb_dim: int = 0          # 0 -> units
    d_att: int = 320
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        d_emb = self.emb_dim or self.units
        self.embed = nn.Embed(self.vocab_size, d_emb, dtype=self.dtype)
        self.cells = [nn.OptimizedLSTMCell(self.units, dtype=self.dtype,
                                           name=f"lstm_{i}")
                      for i in range(self.num_layers)]
        self.att = LocationAttention(self.d_att, dtype=self.dtype,
                                     name="att")
        self.output = nn.Dense(self.vocab_size, dtype=self.dtype,
                               name="output")

    # ---- shared per-step core ----

    def _cell_step(self, y_emb, ctx, cache):
        x = jnp.concatenate([y_emb, ctx], axis=-1)
        new_cache = dict(cache)
        for i, cell in enumerate(self.cells):
            st = cache[f"layer_{i}"]
            (c, h), out = cell((st["c"], st["h"]), x)
            new_cache[f"layer_{i}"] = {"c": c, "h": h}
            x = out
        return x, new_cache  # x = top-layer hidden

    def _attend(self, enc, enc_proj, enc_mask, cache):
        dec_z = cache["layer_0"]["h"]
        ctx, w = self.att(enc, enc_proj, enc_mask, dec_z,
                          cache["att_prev"])
        return ctx, w

    # ---- TransformerDecoder-compatible interface ----

    def precompute_memory(self, memory):
        return {"enc": memory, "proj": self.att.precompute(memory)}

    def init_cache(self, batch: int, t_enc: int,
                   memory_lengths=None) -> Dict[str, Any]:
        z = lambda: jnp.zeros((batch, self.units), self.dtype)
        cache = {f"layer_{i}": {"c": z(), "h": z()}
                 for i in range(self.num_layers)}
        if memory_lengths is not None:
            m = length_mask(memory_lengths, t_enc)
            cache["att_prev"] = (m / jnp.maximum(
                jnp.sum(m, -1, keepdims=True), 1)).astype(jnp.float32)
        else:
            cache["att_prev"] = jnp.full((batch, t_enc), 1.0 / t_enc,
                                         jnp.float32)
        return cache

    def step(self, y_t, step_idx, cache, mem_kv, memory_lengths, max_len,
             memory_mask=None, return_hidden=False):
        """One decode step, same contract as TransformerDecoder.step."""
        enc = mem_kv["enc"]
        enc_proj = mem_kv["proj"]
        mask = length_mask(memory_lengths, enc.shape[1]) \
            if memory_mask is None else memory_mask
        ctx, w = self._attend(enc, enc_proj, mask, cache)
        h, new_cache = self._cell_step(self.embed(y_t), ctx, cache)
        new_cache["att_prev"] = w
        logits = self.output(jnp.concatenate([h, ctx], axis=-1))
        if return_hidden:
            return logits, new_cache, h
        return logits, new_cache

    def __call__(self, ys_in, ys_lengths, memory, memory_lengths,
                 deterministic=True, causal=True, memory_mask=None,
                 return_hidden=False):
        """Teacher-forced forward: [B, U] -> [B, U, V] logits (lax.scan)."""
        b, u = ys_in.shape
        t_enc = enc_t = memory.shape[1]
        mem_kv = self.precompute_memory(memory)
        mask = length_mask(memory_lengths, enc_t) if memory_mask is None \
            else memory_mask
        cache0 = self.init_cache(b, enc_t, memory_lengths)
        embs = self.embed(ys_in)  # [B, U, De]

        def scan_step(cache, y_emb_t):
            ctx, w = self._attend(mem_kv["enc"], mem_kv["proj"], mask,
                                  cache)
            h, new_cache = self._cell_step(y_emb_t, ctx, cache)
            new_cache["att_prev"] = w
            logits = self.output(jnp.concatenate([h, ctx], axis=-1))
            if return_hidden:
                return new_cache, (logits, h)
            return new_cache, logits

        if self.is_initializing():
            # avoid scan-of-init parameter shape ambiguity
            cache, out = scan_step(cache0, embs[:, 0])
            if return_hidden:
                logits = jnp.repeat(out[0][:, None], u, 1)
                return logits, jnp.repeat(out[1][:, None], u, 1)
            return jnp.repeat(out[:, None], u, 1)

        # The module is bound inside __call__, so a plain lax.scan over the
        # closure works (parameters are constants of the traced function).
        _, outs = jax.lax.scan(scan_step, cache0, jnp.swapaxes(embs, 0, 1))
        if return_hidden:
            logits, hidden = outs
            return (jnp.swapaxes(logits, 0, 1),
                    jnp.swapaxes(hidden, 0, 1))
        return jnp.swapaxes(outs, 0, 1)
