"""SLU model: hybrid CTC/attention over intent+entity token targets, with
optional two-pass transcript fusion.

Parity target: reference espnet2/slu/espnet_model.py (ESPnetSLUModel:
ASR model + postencoder + postdecoder(BERT over transcript) + concat of
acoustic and text memories + deliberation encoder + shared decoder;
encode at :324-440). The BERT postdecoder is replaced by an in-framework
Transformer text encoder over the transcript token stream (same role:
contextual word representations for the second pass; a HF checkpoint can be
distilled in later — the fusion interface is identical).

TPU design notes: the reference compacts the concatenated [acoustic; text]
memory per example with a Python loop (espnet_model.py:408-421); here the
memories are concatenated *padded* and a combined boolean memory mask feeds
the decoder/deliberation attention — no data movement, no dynamic shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.asr_model import (ASRConfig, add_sos_eos, label_smoothing_loss)
from ..models.conformer import ConformerBlock
from ..models.embedding import abs_positional_encoding, rel_positional_embedding
from ..models.transformer import TransformerDecoder
from ..ops import ctc as ctc_ops
from ..ops.masks import attention_bias, length_mask
from ..models.asr_model import ASRModel


@dataclasses.dataclass(frozen=True)
class SLUConfig:
    asr: ASRConfig = ASRConfig()
    two_pass: bool = False
    transcript_vocab_size: int = 0          # set by the task from vocab
    text_encoder_blocks: int = 4
    text_encoder_d_ff: int = 1024
    deliberation_blocks: int = 0            # conformer blocks over fused memory
    deliberation_d_ff: int = 1024
    # Postdecoder family (reference tasks/slu.py postdecoder choice):
    # "transformer" = in-framework text encoder trained from scratch;
    # "bert" = HF-architecture BERT (models/hf_transformer.py) whose weights
    # can be imported from a local HF checkpoint dir (postdecoder_hf_dir) —
    # the published 86.8 SLURP intent accuracy rests on this pretrained
    # path (hugging_face_transformers_postdecoder.py:1-106).
    postdecoder: str = "transformer"
    postdecoder_hf_dir: Optional[str] = None


class TextEncoder(nn.Module):
    """Transformer encoder over transcript tokens (BERT-postdecoder analogue,
    reference espnet2/slu/postdecoder/hugging_face_transformers_postdecoder.py).
    """
    vocab_size: int
    d_model: int
    n_head: int
    d_ff: int
    num_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, lengths, deterministic=True):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="embed")(tokens)
        x = abs_positional_encoding(x, scale=True)
        mask = length_mask(lengths, tokens.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        from ..models.attention import MultiHeadAttention
        for i in range(self.num_blocks):
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(x)
            x = x + MultiHeadAttention(self.n_head, self.d_model,
                                       dtype=self.dtype,
                                       name=f"attn_{i}")(h, h, h, bias)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(x)
            h = nn.Dense(self.d_ff, dtype=self.dtype, name=f"ff1_{i}")(h)
            x = x + nn.Dense(self.d_model, dtype=self.dtype,
                             name=f"ff2_{i}")(nn.gelu(h))
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return jnp.where(mask[..., None], x, 0.0), mask


class BertPostdecoder(nn.Module):
    """HF-architecture BERT over the transcript + linear projection to
    d_model (hugging_face_transformers_postdecoder.py: model(**encoded) ->
    linear_out). Weights import via SLUTask.load_postdecoder_weights."""
    vocab_size: int
    d_model: int
    hf_dir: Optional[str] = None
    n_head: int = 4
    d_ff: int = 1024
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, lengths, deterministic=True):
        from ..models.hf_transformer import BertConfig, BertModel
        if self.hf_dir:
            import json
            from pathlib import Path
            hf = json.loads((Path(self.hf_dir) / "config.json").read_text())
            bcfg = BertConfig(
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                intermediate_size=hf["intermediate_size"],
                max_position_embeddings=hf["max_position_embeddings"],
                type_vocab_size=hf.get("type_vocab_size", 2),
                layer_norm_eps=hf.get("layer_norm_eps", 1e-12))
        else:
            bcfg = BertConfig(
                vocab_size=self.vocab_size, hidden_size=self.d_model,
                num_hidden_layers=self.num_blocks,
                num_attention_heads=self.n_head,
                intermediate_size=self.d_ff, max_position_embeddings=512)
        mask = length_mask(lengths, tokens.shape[1])
        hs = BertModel(bcfg, dtype=self.dtype, name="bert")(
            tokens, mask.astype(jnp.int32))
        hs = nn.Dense(self.d_model, dtype=self.dtype, name="linear_out")(hs)
        return jnp.where(mask[..., None], hs, 0.0), mask


class DeliberationEncoder(nn.Module):
    """Conformer blocks over the fused memory (reference deliberationencoder
    choice, tasks/slu.py:233-239)."""
    d_model: int
    n_head: int
    d_ff: int
    num_blocks: int
    kernel_size: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        t = x.shape[1]
        pos_emb = rel_positional_embedding(t, self.d_model, self.dtype)
        bias = attention_bias(mask[:, None, None, :])
        for i in range(self.num_blocks):
            x = ConformerBlock(self.d_model, self.n_head, self.d_ff,
                               self.kernel_size, 0.0, self.dtype,
                               name=f"block_{i}")(
                                   x, pos_emb, bias, mask, deterministic)
        return jnp.where(mask[..., None], x, 0.0)


class SLUModel(nn.Module):
    """Speech -> intent+entity token sequence, optionally fused with a
    transcript second stream (two-pass)."""
    cfg: SLUConfig

    def setup(self):
        c = self.cfg
        self.asr = ASRModel(c.asr, name="asr")
        if c.two_pass:
            if c.postdecoder == "bert":
                self.text_encoder = BertPostdecoder(
                    c.transcript_vocab_size, c.asr.d_model,
                    hf_dir=c.postdecoder_hf_dir, n_head=c.asr.n_head,
                    d_ff=c.text_encoder_d_ff,
                    num_blocks=c.text_encoder_blocks,
                    dtype=c.asr.jax_dtype, name="text_encoder")
            else:
                self.text_encoder = TextEncoder(
                    c.transcript_vocab_size, c.asr.d_model, c.asr.n_head,
                    c.text_encoder_d_ff, c.text_encoder_blocks,
                    dtype=c.asr.jax_dtype, name="text_encoder")
            if c.deliberation_blocks > 0:
                self.deliberation = DeliberationEncoder(
                    c.asr.d_model, c.asr.n_head, c.deliberation_d_ff,
                    c.deliberation_blocks, dtype=c.asr.jax_dtype,
                    name="deliberation")

    def encode(self, speech, speech_lengths, transcript=None,
               transcript_lengths=None, *, train=False, specaug_rng=None,
               mvn_stats=None):
        """Returns (memory, memory_mask) — mask-based, not length-based."""
        c = self.cfg
        hs, h_lengths, _ = self.asr.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        a_mask = length_mask(h_lengths, hs.shape[1])
        if not c.two_pass or transcript is None:
            return hs, a_mask
        ts, t_mask = self.text_encoder(jnp.maximum(transcript, 0),
                                       transcript_lengths,
                                       deterministic=not train)
        memory = jnp.concatenate([hs, ts], axis=1)
        mask = jnp.concatenate([a_mask, t_mask], axis=1)
        if c.deliberation_blocks > 0:
            memory = self.deliberation(memory, mask, deterministic=not train)
        return memory, mask

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 transcript=None, transcript_lengths=None, *,
                 train=False, specaug_rng=None, mvn_stats=None):
        """Loss forward. `text` = intent+entity token targets."""
        c = self.cfg.asr
        hs, h_lengths, _ = self.asr.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        a_mask = length_mask(h_lengths, hs.shape[1])
        if self.cfg.two_pass and transcript is not None:
            ts, t_mask = self.text_encoder(jnp.maximum(transcript, 0),
                                           transcript_lengths,
                                           deterministic=not train)
            memory = jnp.concatenate([hs, ts], axis=1)
            mem_mask = jnp.concatenate([a_mask, t_mask], axis=1)
            if self.cfg.deliberation_blocks > 0:
                memory = self.deliberation(memory, mem_mask,
                                           deterministic=not train)
        else:
            memory, mem_mask = hs, a_mask
        stats: Dict[str, jnp.ndarray] = {}
        loss = 0.0
        if c.ctc_weight > 0.0:
            # CTC attaches to the acoustic encoder output only (pre-fusion),
            # matching the reference loss path (espnet2/slu/espnet_model.py).
            loss_ctc = ctc_ops.ctc_loss_mean_logits(
                self.asr.ctc_proj(hs), h_lengths, jnp.maximum(text, 0),
                text_lengths, c.blank_id)
            stats["loss_ctc"] = loss_ctc
            loss = loss + c.ctc_weight * loss_ctc
        if c.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(jnp.maximum(text, 0), text_lengths,
                                        c.sos_id, c.eos_id)
            logits = self.asr.decoder(ys_in, text_lengths + 1, memory,
                                      None, deterministic=not train,
                                      memory_mask=mem_mask)
            loss_att, acc = label_smoothing_loss(logits, ys_out, c.lsm_weight)
            stats["loss_att"] = loss_att
            stats["acc"] = acc
            loss = loss + (1.0 - c.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats
