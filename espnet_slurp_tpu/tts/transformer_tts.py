"""Transformer-TTS: encoder-decoder transformer text-to-mel.

Parity target: reference espnet2/tts/transformer/transformer.py
("Neural Speech Synthesis with Transformer Network", Li et al. 2019):
embedding encoder + masked-self/cross-attention decoder over mel prenet
frames, L1+L2 mel loss + weighted stop BCE + guided-attention loss over
the cross-attention heads (espnet2/tts/transformer uses
GuidedMultiHeadAttentionLoss).

TPU redesign: the teacher-forced decoder is one PARALLEL pass (causal
mask), not the reference's step loop — the whole training forward is dense
matmuls. Inference reuses the ASR stack's cached incremental
DecoderLayer.step (models/transformer.py) inside a ``lax.while_loop`` with
fixed [B, max_frames] buffers, the same machinery the batched beam search
runs on.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..models.attention import MultiHeadAttention
from ..models.embedding import abs_positional_encoding, sinusoid_table
from ..models.transformer import DecoderLayer, FeedForward
from ..ops.masks import attention_bias, causal_mask, length_mask


@dataclasses.dataclass(frozen=True)
class TransformerTTSConfig:
    vocab_size: int = 100
    n_mels: int = 80
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 1024
    enc_blocks: int = 6
    dec_blocks: int = 6
    prenet_layers: int = 2
    prenet_units: int = 128
    postnet_layers: int = 5
    postnet_channels: int = 256
    postnet_kernel: int = 5
    reduction_factor: int = 1
    dropout_rate: float = 0.1
    bce_pos_weight: float = 5.0     # reference transformer.py bce_pos_weight
    # Guided attention (attention should be near-diagonal): weight 0
    # disables; applied to every decoder layer's cross-attention heads.
    guided_attn_weight: float = 1.0
    guided_attn_sigma: float = 0.4
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


def guided_attention_weight(t_dec: int, t_enc: int, dec_lens, enc_lens,
                            sigma: float):
    """[B, t_dec, t_enc] penalty  1 - exp(-(s/S - t/T)^2 / 2σ²), zero on
    padding (guided_attn_loss.py _make_guided_attention_mask analogue)."""
    t = jnp.arange(t_dec)[None, :, None]
    s = jnp.arange(t_enc)[None, None, :]
    tl = jnp.maximum(dec_lens, 1)[:, None, None].astype(jnp.float32)
    sl = jnp.maximum(enc_lens, 1)[:, None, None].astype(jnp.float32)
    w = 1.0 - jnp.exp(-((s / sl - t / tl) ** 2) / (2.0 * sigma ** 2))
    valid = (t < tl) & (s < sl)
    return jnp.where(valid, w, 0.0), valid


class TTSEncoderBlock(nn.Module):
    d_model: int
    n_head: int
    d_ff: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic=True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(self.n_head, self.d_model,
                                   dtype=self.dtype, name="attn")(
                                       h, h, h, bias, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + FeedForward(self.d_model, self.d_ff, self.dropout_rate,
                            self.dtype, name="ff")(h, deterministic)
        return x


class TransformerTTS(nn.Module):
    """__call__ = teacher-forced training forward -> (loss, stats)."""
    cfg: TransformerTTSConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.jax_dtype)
        self.enc_blocks_ = [
            TTSEncoderBlock(c.d_model, c.n_head, c.d_ff, c.dropout_rate,
                            c.jax_dtype, name=f"enc_{i}")
            for i in range(c.enc_blocks)]
        self.enc_norm = nn.LayerNorm(dtype=c.jax_dtype)
        self.prenet = [nn.Dense(c.prenet_units, dtype=c.jax_dtype,
                                name=f"prenet_{i}")
                       for i in range(c.prenet_layers)]
        self.dec_in = nn.Dense(c.d_model, dtype=c.jax_dtype)
        self.dec_layers = [
            DecoderLayer(c.d_model, c.n_head, c.d_ff, c.dropout_rate,
                         c.jax_dtype, name=f"dec_{i}")
            for i in range(c.dec_blocks)]
        self.dec_norm = nn.LayerNorm(dtype=c.jax_dtype)
        self.feat_out = nn.Dense(c.n_mels * c.reduction_factor,
                                 dtype=c.jax_dtype)
        self.stop_out = nn.Dense(c.reduction_factor, dtype=c.jax_dtype)
        self.postnet_convs = [
            nn.Conv(c.postnet_channels if i < c.postnet_layers - 1
                    else c.n_mels, (c.postnet_kernel,), padding="SAME",
                    dtype=c.jax_dtype, name=f"postnet_{i}")
            for i in range(c.postnet_layers)]
        self.postnet_norms = [
            nn.LayerNorm(dtype=c.jax_dtype, name=f"postnet_norm_{i}")
            for i in range(c.postnet_layers - 1)]
        if c.use_gst:
            from .gst import StyleEncoder
            self.gst = StyleEncoder(gst_tokens=c.gst_tokens,
                                    gst_token_dim=c.d_model,
                                    gst_heads=c.gst_heads,
                                    dtype=c.jax_dtype, name="gst")

    def encode(self, text, text_lengths, deterministic=True):
        x = abs_positional_encoding(self.embed(text), scale=True)
        mask = length_mask(text_lengths, text.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.enc_blocks_:
            x = blk(x, bias, deterministic)
        return self.enc_norm(x), mask

    def _prenet(self, x):
        for fc in self.prenet:
            x = nn.relu(fc(x))
        return x

    def _postnet(self, mel):
        x = mel
        for i, conv in enumerate(self.postnet_convs[:-1]):
            x = jnp.tanh(self.postnet_norms[i](conv(x)))
        return self.postnet_convs[-1](x)

    def __call__(self, text, text_lengths, mel, mel_lengths, *,
                 train=False):
        c = self.cfg
        r = c.reduction_factor
        det = not train
        memory, enc_mask = self.encode(text, text_lengths, det)
        if c.use_gst:
            memory = memory + self.gst(mel)[:, None]
        b, t_mel, _ = mel.shape
        t_red = t_mel // r
        # Teacher-forcing inputs: previous group's last frame (shifted).
        prev = jnp.concatenate(
            [jnp.zeros((b, 1, c.n_mels), mel.dtype),
             mel[:, r - 1:t_red * r - 1:r]], axis=1)[:, :t_red]
        x = self.dec_in(self._prenet(prev.astype(c.jax_dtype)))
        x = abs_positional_encoding(x, scale=True)
        dec_lens = jnp.minimum(jnp.maximum(mel_lengths // r, 1), t_red)
        self_mask = (length_mask(dec_lens, t_red)[:, None, None, :]
                     & causal_mask(t_red)[None, None])
        self_bias = attention_bias(self_mask)
        mem_bias = attention_bias(enc_mask[:, None, None, :])
        ga_loss = 0.0
        for layer in self.dec_layers:
            x, probs = layer(x, self_bias, memory, mem_bias, det,
                             return_cross_probs=True)
            if c.guided_attn_weight > 0:
                w, valid = guided_attention_weight(
                    t_red, memory.shape[1], dec_lens, text_lengths,
                    c.guided_attn_sigma)
                pen = probs.astype(jnp.float32) * w[:, None]
                ga_loss = ga_loss + jnp.sum(pen) / jnp.maximum(
                    jnp.sum(valid) * probs.shape[1], 1.0)
        h = self.dec_norm(x)
        mel_before = self.feat_out(h).reshape(b, t_red * r, c.n_mels)
        stop_logits = self.stop_out(h).reshape(b, t_red * r)
        mel_after = mel_before + self._postnet(mel_before)

        tgt = mel[:, :t_red * r]
        mask = length_mask(jnp.minimum(mel_lengths, t_red * r), t_red * r)
        fmask = mask[..., None]
        denom = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(mel_before - tgt) * fmask)
              + jnp.sum(jnp.abs(mel_after - tgt) * fmask)) / denom
        l2 = (jnp.sum((mel_before - tgt) ** 2 * fmask)
              + jnp.sum((mel_after - tgt) ** 2 * fmask)) / denom
        pos = jnp.arange(t_red * r)[None, :]
        stop_tgt = (pos >= (mel_lengths - 1)[:, None]).astype(jnp.float32)
        # weighted BCE: positive (stop) frames are rare; reference
        # bce_pos_weight=5.0 rebalances them.
        logp = jax.nn.log_sigmoid(stop_logits)
        logq = jax.nn.log_sigmoid(-stop_logits)
        bce = -(c.bce_pos_weight * stop_tgt * logp + (1 - stop_tgt) * logq)
        bce = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        loss = l1 + l2 + bce + c.guided_attn_weight * ga_loss
        stats = {"loss": loss, "l1_loss": l1, "mse_loss": l2,
                 "bce_loss": bce}
        if c.guided_attn_weight > 0:
            stats["guided_attn_loss"] = ga_loss
        return loss, stats

    def inference(self, text, text_lengths, max_frames: int = 500,
                  stop_threshold: float = 0.5, ref_mel=None):
        """Autoregressive generation with per-layer KV caches ->
        (mel [B, max_frames, n_mels], frame_lengths [B])."""
        c = self.cfg
        r = c.reduction_factor
        memory, enc_mask = self.encode(text, text_lengths)
        if c.use_gst:
            if ref_mel is None:
                ref_mel = jnp.zeros((text.shape[0], 256, c.n_mels),
                                    memory.dtype)
            memory = memory + self.gst(ref_mel)[:, None]
        b = memory.shape[0]
        t_red = max_frames // r
        dh = c.d_model // c.n_head
        mem_bias = attention_bias(enc_mask[:, None, None, :])
        mem_kv = [layer.src_attn.project_kv(memory)
                  for layer in self.dec_layers]
        pe = jnp.asarray(sinusoid_table(t_red, c.d_model))
        caches = tuple(
            (jnp.zeros((b, t_red, c.n_head, dh), c.jax_dtype),
             jnp.zeros((b, t_red, c.n_head, dh), c.jax_dtype))
            for _ in self.dec_layers)
        state = (
            jnp.zeros((), jnp.int32),
            caches,
            jnp.zeros((b, c.n_mels), memory.dtype),       # prev frame
            jnp.zeros((b, t_red, r * c.n_mels), memory.dtype),
            jnp.zeros((b,), bool),
            jnp.full((b,), t_red, jnp.int32),
        )

        def cond(st):
            i, _, _, _, stopped, _ = st
            return (i < t_red) & ~jnp.all(stopped)

        def body(st):
            i, caches, prev, mels, stopped, out_lens = st
            x_t = self.dec_in(self._prenet(prev[:, None].astype(c.jax_dtype)))
            x_t = x_t * jnp.sqrt(jnp.asarray(c.d_model, x_t.dtype))
            x_t = x_t + lax.dynamic_slice_in_dim(pe, i, 1, 0)[None].astype(
                x_t.dtype)
            pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, t_red), 3)
            self_bias = jnp.where(pos <= i, 0.0, -1e9).astype(jnp.float32)
            new_caches = []
            for layer, (ck, cv), (mk, mv) in zip(self.dec_layers, caches,
                                                 mem_kv):
                x_t, ck, cv = layer.step(x_t, ck, cv, i, self_bias, mk, mv,
                                         mem_bias)
                new_caches.append((ck, cv))
            h = self.dec_norm(x_t)
            mel_t = self.feat_out(h)[:, 0]                # [B, r*n_mels]
            stop_t = nn.sigmoid(self.stop_out(h)[:, 0])   # [B, r]
            mels = lax.dynamic_update_slice_in_dim(
                mels, mel_t[:, None].astype(mels.dtype), i, 1)
            hit = jnp.any(stop_t > stop_threshold, axis=-1) & ~stopped
            out_lens = jnp.where(hit, i + 1, out_lens)
            stopped = stopped | hit
            prev = mel_t[:, (r - 1) * c.n_mels:]
            return (i + 1, tuple(new_caches), prev, mels, stopped, out_lens)

        _, _, _, mels, _, out_lens = lax.while_loop(cond, body, state)
        mel_before = mels.reshape(b, t_red * r, c.n_mels)
        mel_after = mel_before + self._postnet(mel_before)
        return mel_after, out_lens * r
