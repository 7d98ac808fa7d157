"""Speech translation (ST) and text machine translation (MT) models.

Parity target: reference espnet2/st/ and espnet2/mt/ (SURVEY.md §2.7:
ASR-like models with src+tgt tokenizers; ST adds an auxiliary ASR-CTC branch
on the source transcript). Both reuse the shared encoder/decoder blocks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ctc as ctc_ops
from ..ops.masks import attention_bias, length_mask
from ..slu.model import TextEncoder
from .asr_model import (ASRConfig, ASRModel, add_sos_eos,
                        label_smoothing_loss)
from .transformer import TransformerDecoder


class STModel(nn.Module):
    """Speech -> target-language text; aux CTC on the source transcript.

    forward(speech, speech_lengths, text (tgt), text_lengths,
            src_text, src_text_lengths).
    """
    cfg: ASRConfig                 # vocab_size = TARGET vocab
    src_vocab_size: int = 0        # source transcript vocab (CTC aux)
    asr_ctc_weight: float = 0.3

    def setup(self):
        assert self.cfg.moe_experts == 0, \
            "moe_experts > 0 is only supported by the plain ASR model " \
            "(the Switch aux loss is not wired into the ST loss)"
        self.asr = ASRModel(self.cfg, name="asr")
        if self.asr_ctc_weight > 0 and self.src_vocab_size > 0:
            self.src_ctc = nn.Dense(self.src_vocab_size,
                                    dtype=self.cfg.jax_dtype,
                                    name="src_ctc")

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 src_text=None, src_text_lengths=None, *, train=False,
                 specaug_rng=None, mvn_stats=None):
        c = self.cfg
        hs, h_lengths, _ = self.asr.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        stats: Dict[str, jnp.ndarray] = {}
        ys_in, ys_out = add_sos_eos(jnp.maximum(text, 0), text_lengths,
                                    c.sos_id, c.eos_id)
        logits = self.asr.decoder(ys_in, text_lengths + 1, hs, h_lengths,
                                  deterministic=not train)
        loss_att, acc = label_smoothing_loss(logits, ys_out, c.lsm_weight)
        stats["loss_att"] = loss_att
        stats["acc"] = acc
        loss = loss_att
        if self.asr_ctc_weight > 0 and self.src_vocab_size > 0 \
                and src_text is not None:
            loss_ctc = ctc_ops.ctc_loss_mean_logits(
                self.src_ctc(hs), h_lengths, jnp.maximum(src_text, 0),
                src_text_lengths, c.blank_id)
            stats["loss_asr_ctc"] = loss_ctc
            loss = (1.0 - self.asr_ctc_weight) * loss \
                + self.asr_ctc_weight * loss_ctc
        stats["loss"] = loss
        return loss, stats


@dataclasses.dataclass(frozen=True)
class MTConfig:
    src_vocab_size: int = 1000
    vocab_size: int = 1000
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 2048
    num_encoder_blocks: int = 6
    num_decoder_blocks: int = 6
    lsm_weight: float = 0.1
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def sos_id(self):
        return self.vocab_size - 1

    @property
    def eos_id(self):
        return self.vocab_size - 1


class MTModel(nn.Module):
    """Text -> text transformer (espnet2/mt/espnet_model.py analogue)."""
    cfg: MTConfig

    def setup(self):
        c = self.cfg
        self.encoder = TextEncoder(c.src_vocab_size, c.d_model, c.n_head,
                                   c.d_ff, c.num_encoder_blocks,
                                   dtype=c.jax_dtype, name="encoder")
        self.decoder = TransformerDecoder(
            c.vocab_size, c.d_model, c.n_head, c.d_ff,
            c.num_decoder_blocks, dtype=c.jax_dtype, name="decoder")

    def __call__(self, src_text, src_text_lengths, text, text_lengths, *,
                 train=False):
        c = self.cfg
        memory, mem_mask = self.encoder(jnp.maximum(src_text, 0),
                                        src_text_lengths,
                                        deterministic=not train)
        ys_in, ys_out = add_sos_eos(jnp.maximum(text, 0), text_lengths,
                                    c.sos_id, c.eos_id)
        logits = self.decoder(ys_in, text_lengths + 1, memory, None,
                              deterministic=not train, memory_mask=mem_mask)
        loss, acc = label_smoothing_loss(logits, ys_out, c.lsm_weight)
        return loss, {"loss": loss, "acc": acc}
