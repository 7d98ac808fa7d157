"""HF-transformers post-encoder over acoustic encoder states.

Parity target: reference espnet2/asr/postencoder/
hugging_face_transformers_postencoder.py — a pretrained transformer encoder
(BERT-family) applied on top of the speech encoder via inputs_embeds, with
an optional strided-conv length adaptor (x2 per layer) and a linear-in
projection to the transformer's hidden size.

TPU notes: the transformer body is the in-framework flax BertModel
(models/hf_transformer.py) fed continuous inputs_embeds — weights import
from a local HF checkpoint dir via the same graft path the SLU postdecoder
uses (bert_params_from_torch). A linear-out returns to the ASR d_model so
downstream consumers (decoder cross-attention, CTC head, TCPGen) keep
their width.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .hf_transformer import BertConfig, BertModel


def bert_config_from_dir(hf_dir: str) -> BertConfig:
    hf = json.loads((Path(hf_dir) / "config.json").read_text())
    return BertConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12))


class HFTransformersPostencoder(nn.Module):
    """[B, T, D] encoder states -> [B, T/2^n, D] contextualized states."""
    d_model: int                       # ASR width (in and out)
    hidden_size: int = 256             # transformer hidden (from-scratch)
    num_layers: int = 2
    num_heads: int = 4
    intermediate_size: int = 1024
    length_adaptor_n_layers: int = 0   # x2 subsampling per layer
    hf_dir: Optional[str] = None       # local HF checkpoint dir (geometry)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.hf_dir:
            cfg = bert_config_from_dir(self.hf_dir)
        else:
            cfg = BertConfig(
                vocab_size=1, hidden_size=self.hidden_size,
                num_hidden_layers=self.num_layers,
                num_attention_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                max_position_embeddings=4096)
        self._bert_cfg = cfg
        self.bert = BertModel(cfg, dtype=self.dtype, name="bert")
        self.linear_in = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="linear_in")
        self.linear_out = nn.Dense(self.d_model, dtype=self.dtype,
                                   name="linear_out")
        self.adaptors = [
            nn.Conv(self.d_model, kernel_size=(3,), strides=(2,),
                    padding="SAME", dtype=self.dtype, name=f"adaptor_{i}")
            for i in range(self.length_adaptor_n_layers)]

    def __call__(self, hs: jnp.ndarray, h_lengths: jnp.ndarray):
        for conv in self.adaptors:
            hs = nn.relu(conv(hs))
            h_lengths = -(-h_lengths // 2)
        x = self.linear_in(hs)
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :] < h_lengths[:, None]).astype(
            jnp.int32)
        # inputs_embeds path: word embedding bypassed, position/type added
        # inside (the reference deletes embed_tokens and feeds embeds).
        x = self.bert(None, attention_mask=mask, inputs_embeds=x)
        return self.linear_out(x), h_lengths
