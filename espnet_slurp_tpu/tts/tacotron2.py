"""Tacotron2: attention-based autoregressive text-to-mel.

Parity target: reference espnet2/tts/tacotron2/tacotron2.py (527 LoC) and
its espnet1 blocks (espnet/nets/pytorch_backend/tacotron2/{encoder,decoder}.py):
conv+BiLSTM text encoder, location-sensitive attention, prenet/postnet LSTM
decoder with stop-token head; loss = masked L1/MSE(before+after postnet) +
BCE(stop). Teacher-forced training runs the frame loop as ONE lax.scan; XLA
unrolls nothing and keeps the whole step fused on-device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.masks import length_mask


@dataclasses.dataclass(frozen=True)
class Tacotron2Config:
    vocab_size: int = 100
    n_mels: int = 80
    embed_dim: int = 256
    enc_conv_layers: int = 3
    enc_conv_channels: int = 256
    enc_conv_kernel: int = 5
    enc_lstm_units: int = 256      # per direction
    prenet_layers: int = 2
    prenet_units: int = 128
    dec_lstm_units: int = 512
    dec_lstm_layers: int = 2
    att_dim: int = 128
    att_conv_channels: int = 32
    att_conv_kernel: int = 31
    postnet_layers: int = 5
    postnet_channels: int = 256
    postnet_kernel: int = 5
    reduction_factor: int = 1
    dropout_rate: float = 0.5
    # GST (tts/gst.py, style_encoder.py analogue): style embedding from the
    # target mel added to the encoder memory (reference espnet2/tts/
    # tacotron2.py use_gst: hs = hs + style_embs.unsqueeze(1)).
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    # Voice conversion (espnet1 espnet/vc Tacotron2-VC analogue): the
    # encoder consumes source MEL FRAMES (f32 [B, T, n_mels]) instead of
    # token ids — everything after the embedding layer is shared.
    input_type: str = "text"  # text | mel
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class Tacotron2Encoder(nn.Module):
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, text, text_lengths, deterministic=True):
        c = self.cfg
        if c.input_type == "mel":
            # VC: source mel frames -> linear "embedding" (vc Taco2 encoder)
            x = nn.Dense(c.embed_dim, dtype=c.jax_dtype,
                         name="embed_mel")(text.astype(c.jax_dtype))
        else:
            x = nn.Embed(c.vocab_size, c.embed_dim, dtype=c.jax_dtype,
                         name="embed")(text)
        for i in range(c.enc_conv_layers):
            x = nn.Conv(c.enc_conv_channels, (c.enc_conv_kernel,),
                        padding="SAME", dtype=c.jax_dtype,
                        name=f"conv_{i}")(x)
            x = nn.relu(nn.LayerNorm(dtype=c.jax_dtype,
                                     name=f"norm_{i}")(x))
        # BiLSTM over tokens.
        fwd = nn.RNN(nn.OptimizedLSTMCell(c.enc_lstm_units,
                                          dtype=c.jax_dtype), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(c.enc_lstm_units,
                                          dtype=c.jax_dtype), name="bwd",
                     reverse=True, keep_order=True)
        x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        mask = length_mask(text_lengths, text.shape[1])
        return jnp.where(mask[..., None], x, 0.0), mask


class Prenet(nn.Module):
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, x, dropout_rng=None):
        c = self.cfg
        # NOTE: tacotron prenet applies dropout at inference too (reference
        # behavior); pass dropout_rng to enable, None -> deterministic.
        for i in range(c.prenet_layers):
            x = nn.relu(nn.Dense(c.prenet_units, dtype=c.jax_dtype,
                                 name=f"fc_{i}")(x))
            if dropout_rng is not None:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 1 - c.dropout_rate, x.shape)
                x = jnp.where(keep, x / (1 - c.dropout_rate), 0.0)
        return x


class Postnet(nn.Module):
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = mel
        for i in range(c.postnet_layers - 1):
            x = nn.Conv(c.postnet_channels, (c.postnet_kernel,),
                        padding="SAME", dtype=c.jax_dtype,
                        name=f"conv_{i}")(x)
            x = jnp.tanh(nn.LayerNorm(dtype=c.jax_dtype,
                                      name=f"norm_{i}")(x))
        return nn.Conv(c.n_mels, (c.postnet_kernel,), padding="SAME",
                       dtype=c.jax_dtype, name="conv_out")(x)


class Tacotron2(nn.Module):
    """Full model. __call__ = teacher-forced training forward -> loss."""
    cfg: Tacotron2Config

    def setup(self):
        c = self.cfg
        self.encoder = Tacotron2Encoder(c, name="encoder")
        if c.use_gst:
            from .gst import StyleEncoder
            # token dim must match the memory width (bi-LSTM output)
            self.gst = StyleEncoder(gst_tokens=c.gst_tokens,
                                    gst_token_dim=2 * c.enc_lstm_units,
                                    gst_heads=c.gst_heads,
                                    dtype=c.jax_dtype, name="gst")
        self.prenet = Prenet(c, name="prenet")
        self.att_query = nn.Dense(c.att_dim, use_bias=False,
                                  dtype=c.jax_dtype)
        self.att_memory = nn.Dense(c.att_dim, use_bias=False,
                                   dtype=c.jax_dtype)
        self.att_loc_conv = nn.Conv(c.att_conv_channels,
                                    (c.att_conv_kernel,), padding="SAME",
                                    use_bias=False, dtype=c.jax_dtype)
        self.att_loc_proj = nn.Dense(c.att_dim, use_bias=False,
                                     dtype=c.jax_dtype)
        self.att_v = nn.Dense(1, use_bias=False, dtype=c.jax_dtype)
        self.dec_cells = [nn.OptimizedLSTMCell(c.dec_lstm_units,
                                               dtype=c.jax_dtype,
                                               name=f"dec_lstm_{i}")
                          for i in range(c.dec_lstm_layers)]
        self.feat_out = nn.Dense(c.n_mels * c.reduction_factor,
                                 dtype=c.jax_dtype)
        self.stop_out = nn.Dense(c.reduction_factor, dtype=c.jax_dtype)
        self.postnet = Postnet(c, name="postnet")

    def _attend(self, query, memory_proj, memory, prev_att, enc_mask):
        """Location-sensitive attention (tacotron2/decoder.py AttLoc)."""
        loc = self.att_loc_proj(self.att_loc_conv(prev_att[..., None]))
        e = self.att_v(jnp.tanh(
            self.att_query(query)[:, None] + memory_proj + loc))[..., 0]
        e = jnp.where(enc_mask, e, -1e9)
        att = jax.nn.softmax(e, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", att, memory)
        return ctx, att

    def _decoder_scan(self, memory, enc_mask, prenet_in, dropout_rng=None):
        """Run the frame loop. prenet_in: [B, Tdec, n_mels] previous-frame
        inputs (teacher forcing). Returns (mel_before, stop_logits, atts)."""
        c = self.cfg
        b, t_enc = enc_mask.shape
        memory_proj = self.att_memory(memory)
        carries = [cell.initialize_carry(jax.random.PRNGKey(0),
                                         (b, c.dec_lstm_units))
                   for cell in self.dec_cells]
        att0 = jnp.zeros((b, t_enc), memory.dtype)
        ctx0 = jnp.zeros((b, memory.shape[-1]), memory.dtype)

        def step(carry, x_t):
            carries, prev_att, prev_ctx = carry
            pre = self.prenet(x_t, None)
            inp = jnp.concatenate([pre, prev_ctx], axis=-1)
            new_carries = []
            h = inp
            for cell, cr in zip(self.dec_cells, carries):
                cr, h = cell(cr, h)
                new_carries.append(cr)
            ctx, att = self._attend(h, memory_proj, memory, prev_att,
                                    enc_mask)
            out = jnp.concatenate([h, ctx], axis=-1)
            mel_t = self.feat_out(out)
            stop_t = self.stop_out(out)
            return (new_carries, att, ctx), (mel_t, stop_t, att)

        xs = jnp.swapaxes(prenet_in, 0, 1)  # [Tdec, B, n_mels]
        if self.is_initializing():
            # Create all step params once outside the scan (linen cannot
            # create params inside lax.scan).
            step((carries, att0, ctx0), xs[0])
        _, (mels, stops, atts) = lax.scan(step, (carries, att0, ctx0), xs)
        mels = jnp.swapaxes(mels, 0, 1)    # [B, Tdec, n_mels*r]
        stops = jnp.swapaxes(stops, 0, 1)  # [B, Tdec, r]
        atts = jnp.swapaxes(atts, 0, 1)
        return mels, stops, atts

    def __call__(self, text, text_lengths, mel, mel_lengths, *, train=False):
        """Teacher-forced forward -> (loss, stats)."""
        c = self.cfg
        r = c.reduction_factor
        memory, enc_mask = self.encoder(text, text_lengths,
                                        deterministic=not train)
        if c.use_gst:
            memory = memory + self.gst(mel)[:, None]
        b, t_mel, _ = mel.shape
        # Group frames by reduction factor.
        t_red = t_mel // r
        mel_r = mel[:, :t_red * r].reshape(b, t_red, r * c.n_mels)
        # Teacher-forcing input: previous frame group's LAST frame.
        prev = jnp.concatenate(
            [jnp.zeros((b, 1, c.n_mels), mel.dtype),
             mel[:, r - 1:t_red * r - 1:r]], axis=1)[:, :t_red]
        mel_before_r, stop_logits, atts = self._decoder_scan(
            memory, enc_mask, prev)
        mel_before = mel_before_r.reshape(b, t_red * r, c.n_mels)
        mel_after = mel_before + self.postnet(mel_before)
        stop_logits = stop_logits.reshape(b, t_red * r)

        tgt = mel[:, :t_red * r]
        mask = length_mask(jnp.minimum(mel_lengths, t_red * r), t_red * r)
        fmask = mask[..., None]
        denom = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(mel_before - tgt) * fmask)
              + jnp.sum(jnp.abs(mel_after - tgt) * fmask)) / denom
        l2 = (jnp.sum((mel_before - tgt) ** 2 * fmask)
              + jnp.sum((mel_after - tgt) ** 2 * fmask)) / denom
        # Stop targets: 1 at the final valid frame group onwards.
        pos = jnp.arange(t_red * r)[None, :]
        stop_tgt = (pos >= (mel_lengths - 1)[:, None]).astype(jnp.float32)
        bce = optax_sigmoid_bce(stop_logits, stop_tgt)
        bce = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        loss = l1 + l2 + bce
        stats = {"loss": loss, "l1_loss": l1, "mse_loss": l2,
                 "bce_loss": bce}
        return loss, stats

    def inference(self, text, text_lengths, max_frames: int = 500,
                  stop_threshold: float = 0.5, ref_mel=None):
        """Autoregressive generation -> (mel [B, max_frames, n_mels],
        frame_lengths [B]). With use_gst, ``ref_mel`` [B, T, n_mels]
        supplies the style reference (tts_inference.py passes `speech`);
        None conditions on the zero reference."""
        c = self.cfg
        r = c.reduction_factor
        memory, enc_mask = self.encoder(text, text_lengths)
        if c.use_gst:
            if ref_mel is None:
                ref_mel = jnp.zeros(
                    (text.shape[0], 4 * (2 ** 6), c.n_mels), memory.dtype)
            memory = memory + self.gst(ref_mel)[:, None]
        b, t_enc = enc_mask.shape
        memory_proj = self.att_memory(memory)
        carries = [cell.initialize_carry(jax.random.PRNGKey(0),
                                         (b, c.dec_lstm_units))
                   for cell in self.dec_cells]
        t_red = max_frames // r
        state = (
            jnp.zeros((), jnp.int32),
            tuple(carries),
            jnp.zeros((b, t_enc), memory.dtype),
            jnp.zeros((b, memory.shape[-1]), memory.dtype),
            jnp.zeros((b, c.n_mels), memory.dtype),
            jnp.zeros((b, t_red, r * c.n_mels), memory.dtype),
            jnp.zeros((b,), bool),
            jnp.full((b,), t_red, jnp.int32),
        )

        def cond(st):
            i, _, _, _, _, _, stopped, _ = st
            return (i < t_red) & ~jnp.all(stopped)

        def body(st):
            i, carries, prev_att, prev_ctx, prev_mel, mels, stopped, stop_at \
                = st
            pre = self.prenet(prev_mel, None)
            inp = jnp.concatenate([pre, prev_ctx], axis=-1)
            h = inp
            new_carries = []
            for cell, cr in zip(self.dec_cells, carries):
                cr, h = cell(cr, h)
                new_carries.append(cr)
            ctx, att = self._attend(h, memory_proj, memory, prev_att,
                                    enc_mask)
            out = jnp.concatenate([h, ctx], axis=-1)
            mel_t = self.feat_out(out)  # [B, r*n_mels]
            stop_t = nn.sigmoid(self.stop_out(out))[:, -1]
            mels = lax.dynamic_update_slice_in_dim(mels, mel_t[:, None], i,
                                                   axis=1)
            newly = (stop_t > stop_threshold) & ~stopped
            stop_at = jnp.where(newly, i + 1, stop_at)
            stopped = stopped | (stop_t > stop_threshold)
            prev_mel = mel_t.reshape(b, r, c.n_mels)[:, -1]
            return (i + 1, tuple(new_carries), att, ctx, prev_mel, mels,
                    stopped, stop_at)

        _, _, _, _, _, mels, _, stop_at = lax.while_loop(cond, body, state)
        mel = mels.reshape(b, t_red * r, c.n_mels)
        mel = mel + self.postnet(mel)
        return mel, stop_at * r


def optax_sigmoid_bce(logits, targets):
    """Elementwise sigmoid BCE (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
