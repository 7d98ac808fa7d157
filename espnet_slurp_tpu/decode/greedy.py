"""Batched greedy decoding (attention and CTC) as lax.while_loop.

Parity target: beam-size-1 path of the reference's BeamSearch
(espnet/nets/beam_search.py) and CTC argmax decoding (espnet2/asr/ctc.py
argmax). The attention decode runs the cached decoder step inside a
while_loop with fully static shapes — [B] hypotheses advance in lockstep,
finished ones freeze at eos.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.asr_model import ASRModel


def init_decoder_cache(cfg, batch: int, max_len: int, t_enc: int = 0,
                       memory_lengths=None):
    if getattr(cfg, "decoder", "transformer") == "rnn":
        # LAS decoder: LSTM states + previous attention weights/context.
        z = lambda: jnp.zeros((batch, cfg.rnn_decoder_units), cfg.jax_dtype)
        cache = {f"layer_{i}": {"c": z(), "h": z()}
                 for i in range(cfg.rnn_decoder_layers)}
        if memory_lengths is not None:
            from ..ops.masks import length_mask
            m = length_mask(memory_lengths, t_enc)
            cache["att_prev"] = (m / jnp.maximum(
                jnp.sum(m, -1, keepdims=True), 1)).astype(jnp.float32)
        else:
            cache["att_prev"] = jnp.full((batch, t_enc),
                                         1.0 / max(t_enc, 1), jnp.float32)
        return cache
    if getattr(cfg, "decoder", "transformer") in (
            "lightweight_conv", "lightweight_conv2d", "dynamic_conv",
            "dynamic_conv2d"):
        # Conv-attention decoders: GLU ring buffer instead of a KV cache
        # (models/lightconv.py step); "v" is a structural dummy.
        pad = cfg.decoder_conv_kernel // 2
        return {f"layer_{i}": {
            "k": jnp.zeros((batch, max_len + pad, cfg.d_model),
                           cfg.jax_dtype),
            "v": jnp.zeros((batch, 0), cfg.jax_dtype)}
            for i in range(cfg.num_decoder_blocks)}
    dh = cfg.d_model // cfg.n_head
    z = lambda: jnp.zeros((batch, max_len, cfg.n_head, dh), cfg.jax_dtype)
    return {f"layer_{i}": {"k": z(), "v": z()}
            for i in range(cfg.num_decoder_blocks)}


def attention_greedy_decode(
    model: ASRModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    max_len: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode -> (tokens [B, max_len] (eos-padded), lengths [B]).

    Lengths exclude sos/eos. Jit-safe for fixed (hs.shape, max_len).
    """
    cfg = model.cfg
    b = hs.shape[0]
    sos, eos = cfg.sos_id, cfg.eos_id

    mem_kv = model.apply({"params": params}, hs,
                         method=lambda m, x: m.decoder.precompute_memory(x))
    cache = init_decoder_cache(cfg, b, max_len,
                               t_enc=hs.shape[1],
                               memory_lengths=h_lengths)

    def step_fn(mdl, y_t, idx, cache, mem_kv, h_lengths):
        return mdl.decoder.step(y_t, idx, cache, mem_kv, h_lengths, max_len)

    tokens0 = jnp.full((b, max_len), eos, jnp.int32)
    state = (jnp.zeros((), jnp.int32), jnp.full((b,), sos, jnp.int32),
             tokens0, jnp.zeros((b,), bool), cache)

    def cond(state):
        i, _, _, ended, _ = state
        return (i < max_len) & ~jnp.all(ended)

    def body(state):
        i, y_prev, tokens, ended, cache = state
        logits, cache = model.apply(
            {"params": params}, y_prev, i, cache, mem_kv, h_lengths,
            method=step_fn)
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        y = jnp.where(ended, eos, y)
        tokens = lax.dynamic_update_slice_in_dim(tokens, y[:, None], i, 1)
        ended = ended | (y == eos)
        return (i + 1, y, tokens, ended, cache)

    _, _, tokens, _, _ = lax.while_loop(cond, body, state)
    lengths = jnp.sum(jnp.cumprod((tokens != eos).astype(jnp.int32), axis=1),
                      axis=1)
    return tokens, lengths


def ctc_greedy_decode(model: ASRModel, params, hs, h_lengths):
    """CTC best-path: [B, T'] ids (blanks/repeats included)."""
    lp = model.apply({"params": params}, hs,
                     method=lambda m, x: m.ctc_logprobs(x))
    from ..ops.ctc import greedy_decode
    return greedy_decode(lp, h_lengths, model.cfg.blank_id)
