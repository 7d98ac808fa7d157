"""Transformer encoder/decoder with explicit KV caches for incremental decode.

Parity targets: reference espnet2/asr/decoder/transformer_decoder.py:28-528
(masked self-attn + cross-attn pre-norm blocks, forward_one_step with cache,
BatchScorerInterface) and espnet2/asr/encoder/transformer_encoder.py.

TPU-first decode design: instead of per-hypothesis Python objects with growing
cache lists, the cache is a fixed-shape pytree ([B, Lmax, H, Dh] per layer,
written with dynamic_update_slice at the current step) so the whole beam
search can run inside one lax.while_loop with static shapes.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.masks import attention_bias, causal_mask, length_mask
from .attention import MultiHeadAttention
from .embedding import abs_positional_encoding, sinusoid_table


class CachedAttention(nn.Module):
    """MHA whose K/V projections can be precomputed and cached.

    Used for decoder self-attention (cache grows by one step at a time) and
    cross-attention (memory K/V computed once per utterance).
    """
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.n_feat
        self.wq = nn.Dense(d, dtype=self.dtype, name="linear_q")
        self.wk = nn.Dense(d, dtype=self.dtype, name="linear_k")
        self.wv = nn.Dense(d, dtype=self.dtype, name="linear_v")
        self.wo = nn.Dense(d, dtype=self.dtype, name="linear_out")

    def _split(self, x):
        return x.reshape(*x.shape[:-1], self.n_head, self.n_feat // self.n_head)

    def project_kv(self, kv_in):
        """[B, Tk, D] -> (k, v) each [B, Tk, H, Dh]."""
        return self._split(self.wk(kv_in)), self._split(self.wv(kv_in))

    def attend(self, q_in, k, v, mask_bias=None, return_probs=False):
        """q_in: [B, Tq, D]; k, v: [B, Tk, H, Dh] -> [B, Tq, D].

        return_probs=True also returns the [B, H, Tq, Tk] attention
        probabilities (guided-attention losses, Transformer-TTS)."""
        dh = self.n_feat // self.n_head
        q = self._split(self.wq(q_in))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        if mask_bias is not None:
            scores = scores + mask_bias
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        # Diagnostics harvest (calculate_all_attentions analogue) — gives
        # the decoder self/cross heat-maps the reference plots per epoch.
        self.sow("intermediates", "attn", attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = self.wo(out.reshape(*q_in.shape[:-1], self.n_feat))
        if return_probs:
            return out, attn
        return out

    def __call__(self, q_in, kv_in, mask_bias=None):
        k, v = self.project_kv(kv_in)
        return self.attend(q_in, k, v, mask_bias)


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.w1 = nn.Dense(self.d_ff, dtype=self.dtype)
        self.w2 = nn.Dense(self.d_model, dtype=self.dtype)

    def __call__(self, x, deterministic=True):
        return self.w2(nn.relu(self.w1(x)))


class DecoderLayer(nn.Module):
    d_model: int
    n_head: int
    d_ff: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Self-attention replacement (transformer_decoder.py:283-528 variants):
    # "selfattn" | "lightconv" | "lightconv2d" | "dynamicconv" |
    # "dynamicconv2d" (models/lightconv.py).
    selfattn_type: str = "selfattn"
    conv_wshare: int = 4
    conv_kernel: int = 11
    conv_usebias: bool = False

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        if self.selfattn_type == "selfattn":
            self.self_attn = CachedAttention(self.n_head, self.d_model,
                                             self.dropout_rate, self.dtype)
        else:
            from .lightconv import LightweightConvolution
            self.self_attn = LightweightConvolution(
                wshare=self.conv_wshare, n_feat=self.d_model,
                kernel_size=self.conv_kernel,
                dropout_rate=self.dropout_rate, use_kernel_mask=True,
                use_bias=self.conv_usebias,
                two_dim=self.selfattn_type.endswith("2d"),
                dynamic=self.selfattn_type.startswith("dynamic"),
                dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.src_attn = CachedAttention(self.n_head, self.d_model,
                                        self.dropout_rate, self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout_rate,
                              self.dtype)

    def __call__(self, x, self_bias, memory, mem_bias, deterministic=True,
                 return_cross_probs=False):
        if self.selfattn_type == "selfattn":
            x = x + self.self_attn(self.norm1(x), self.norm1(x), self_bias)
        else:
            # Causal conv (use_kernel_mask) already enforces the
            # autoregressive mask; padded tails only pollute padded rows.
            x = x + self.self_attn(self.norm1(x))
        k, v = self.src_attn.project_kv(memory)
        if return_cross_probs:
            out, probs = self.src_attn.attend(self.norm2(x), k, v, mem_bias,
                                              return_probs=True)
            x = x + out
            x = x + self.ff(self.norm3(x), deterministic)
            return x, probs
        x = x + self.src_attn.attend(self.norm2(x), k, v, mem_bias)
        x = x + self.ff(self.norm3(x), deterministic)
        return x

    def step(self, x_t, cache_k, cache_v, step_idx, self_bias,
             mem_k, mem_v, mem_bias):
        """One decode step. x_t: [B, 1, D]; cache_k/v: [B, Lmax, H, Dh]
        (selfattn) or a GLU ring buffer in cache_k with cache_v unused
        (conv variants).

        Returns (y_t, new_cache_k, new_cache_v).
        """
        h = self.norm1(x_t)
        if self.selfattn_type == "selfattn":
            k_t, v_t = self.self_attn.project_kv(h)
            cache_k = lax.dynamic_update_slice_in_dim(cache_k, k_t,
                                                      step_idx, 1)
            cache_v = lax.dynamic_update_slice_in_dim(cache_v, v_t,
                                                      step_idx, 1)
            x_t = x_t + self.self_attn.attend(h, cache_k, cache_v, self_bias)
        else:
            y, cache_k = self.self_attn.step(h, cache_k, step_idx)
            x_t = x_t + y
        x_t = x_t + self.src_attn.attend(self.norm2(x_t), mem_k, mem_v,
                                         mem_bias)
        x_t = x_t + self.ff(self.norm3(x_t))
        return x_t, cache_k, cache_v


class TransformerDecoder(nn.Module):
    """Pre-norm Transformer decoder with embedding+abs-PE input layer."""
    vocab_size: int
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # "selfattn" or a lightconv/dynamicconv variant replacing decoder
    # self-attention (transformer_decoder.py:283-528).
    selfattn_type: str = "selfattn"
    conv_wshare: int = 4
    conv_kernel: int = 11
    conv_usebias: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)
        self.layers = [
            DecoderLayer(self.d_model, self.n_head, self.d_ff,
                         self.dropout_rate, self.dtype,
                         selfattn_type=self.selfattn_type,
                         conv_wshare=self.conv_wshare,
                         conv_kernel=self.conv_kernel,
                         conv_usebias=self.conv_usebias, name=f"layer_{i}")
            for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm(dtype=self.dtype)
        self.output = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, ys, ys_lengths, memory, memory_lengths,
                 deterministic=True, memory_mask=None, return_hidden=False,
                 causal=True):
        """Training/scoring forward: [B, L] ids -> [B, L, V] logits.

        memory_mask: optional [B, Tk] bool overriding the contiguous
        length_mask (used by SLU fused acoustic+text memories).
        causal=False gives a bidirectional (MLM) decoder — used by MaskCTC.
        """
        b, l = ys.shape
        x = abs_positional_encoding(self.embed(ys), scale=True)
        self_mask = length_mask(ys_lengths, l)[:, None, None, :]
        if causal:
            self_mask = self_mask & causal_mask(l)[None, None]
        self_bias = attention_bias(self_mask)
        if memory_mask is None:
            memory_mask = length_mask(memory_lengths, memory.shape[1])
        mem_bias = attention_bias(memory_mask[:, None, None, :])
        for layer in self.layers:
            x = layer(x, self_bias, memory, mem_bias, deterministic)
        hidden = self.after_norm(x)
        if return_hidden:
            return self.output(hidden), hidden
        return self.output(hidden)

    # ---- incremental decoding -------------------------------------------

    def init_cache(self, batch: int, max_len: int) -> Dict[str, Any]:
        if self.selfattn_type != "selfattn":
            # GLU-output ring buffer per layer; "v" is a zero-size dummy so
            # the cache pytree structure matches the selfattn layout.
            pad = self.conv_kernel // 2
            return {f"layer_{i}": {
                "k": jnp.zeros((batch, max_len + pad, self.d_model),
                               self.dtype),
                "v": jnp.zeros((batch, 0), self.dtype)}
                for i in range(self.num_blocks)}
        dh = self.d_model // self.n_head
        z = lambda: jnp.zeros((batch, max_len, self.n_head, dh), self.dtype)
        return {f"layer_{i}": {"k": z(), "v": z()}
                for i in range(self.num_blocks)}

    def precompute_memory(self, memory):
        """Project encoder output to per-layer cross-attention K/V once."""
        return {f"layer_{i}": dict(zip(("k", "v"),
                                       layer.src_attn.project_kv(memory)))
                for i, layer in enumerate(self.layers)}

    def step(self, y_t, step_idx, cache, mem_kv, memory_lengths, max_len,
             memory_mask=None, return_hidden=False):
        """One step: y_t [B] token ids at position step_idx.

        Returns ([B, V] log-probs-unnormalized logits, new cache).
        """
        b = y_t.shape[0]
        emb = self.embed(y_t[:, None])  # (B, 1, D)
        emb = emb * jnp.sqrt(jnp.asarray(self.d_model, emb.dtype))
        pe = jnp.asarray(sinusoid_table(max_len, self.d_model))
        emb = emb + lax.dynamic_slice_in_dim(pe, step_idx, 1, 0)[None].astype(
            emb.dtype)
        # Self-attn bias: positions <= step_idx are visible.
        pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
        self_bias = jnp.where(pos <= step_idx, 0.0, -1e9).astype(jnp.float32)
        mem_len = mem_kv["layer_0"]["k"].shape[1]
        if memory_mask is None:
            memory_mask = length_mask(memory_lengths, mem_len)
        mem_bias = attention_bias(memory_mask[:, None, None, :])
        x = emb
        new_cache = {}
        for i, layer in enumerate(self.layers):
            c = cache[f"layer_{i}"]
            m = mem_kv[f"layer_{i}"]
            x, ck, cv = layer.step(x, c["k"], c["v"], step_idx, self_bias,
                                   m["k"], m["v"], mem_bias)
            new_cache[f"layer_{i}"] = {"k": ck, "v": cv}
        hidden = self.after_norm(x)[:, 0]
        logits = self.output(hidden)
        if return_hidden:
            return logits, new_cache, hidden
        return logits, new_cache


class TransformerEncoder(nn.Module):
    """Abs-pos Transformer encoder (espnet2/asr/encoder/transformer_encoder.py)."""
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 2048
    num_blocks: int = 12
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        from .embedding import Conv2dSubsampling
        x = Conv2dSubsampling(self.d_model, self.dtype, name="embed")(feats)
        olens = Conv2dSubsampling.out_length(feat_lengths)
        x = abs_positional_encoding(x, scale=True)
        pad = length_mask(olens, x.shape[1])
        bias = attention_bias(pad[:, None, None, :])
        for i in range(self.num_blocks):
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(x)
            x = x + MultiHeadAttention(
                self.n_head, self.d_model, self.dropout_rate, self.dtype,
                name=f"self_attn_{i}")(h, h, h, bias, deterministic)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(x)
            h = nn.Dense(self.d_ff, dtype=self.dtype, name=f"ff1_{i}")(h)
            h = nn.relu(h)
            x = x + nn.Dense(self.d_model, dtype=self.dtype,
                             name=f"ff2_{i}")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        x = jnp.where(pad[..., None], x, 0.0)
        return x, olens, []
