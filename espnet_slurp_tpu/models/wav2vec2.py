"""wav2vec 2.0: raw-waveform SSL encoder + contrastive pretraining.

Parity targets: reference espnet2/asr/encoder/wav2vec2_encoder.py
(FairSeqWav2Vec2Encoder — a fairseq wrapper; SURVEY.md §2.4 'other
encoders'), and the fairseq wav2vec 2.0 objective it fine-tunes from.
The reference delegates to fairseq/torch; here the whole model is
in-framework so it can (a) serve as a raw-waveform ASR encoder choice and
(b) pretrain with the contrastive + diversity objective on TPU.

TPU redesign notes:
- The conv feature extractor and the grouped conv positional embedding
  are channel-last flax convs (MXU-tiled); no torch permutes.
- Masked-span selection and negative (distractor) sampling are in-jit:
  spans from a dilated Bernoulli (shared with HuBERT), distractors drawn
  with jax.random.categorical over the mask indicator — no host-side
  numpy index juggling, fully batched.
- The contrastive logits are one cosine-similarity einsum over
  [B, T, K+1] candidates.
- HF `transformers` Wav2Vec2Model weights import via
  wav2vec2_params_from_torch (weight-norm on the positional conv is
  folded into a plain kernel), so released checkpoints drop in.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import attention_bias, length_mask


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    d_model: int = 768
    n_head: int = 12
    d_ff: int = 3072
    num_blocks: int = 12
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    dropout_rate: float = 0.1
    # pretraining
    mask_prob: float = 0.065
    mask_span: int = 10
    n_negatives: int = 100
    quantizer_groups: int = 2
    quantizer_entries: int = 320
    vq_dim: int = 256
    final_dim: int = 256
    gumbel_temp: float = 2.0
    logit_temp: float = 0.1
    diversity_weight: float = 0.1
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


def conv_out_lengths(lengths, kernels, strides):
    for k, s in zip(kernels, strides):
        lengths = (lengths - k) // s + 1
    return jnp.maximum(lengths, 0)


class ConvFeatureExtractor(nn.Module):
    """Raw wav [B, N] -> latent [B, T, conv_dim[-1]] (HF feature_extractor:
    first layer group-normed, gelu throughout)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav):
        c = self.cfg
        x = wav[..., None].astype(c.jax_dtype)
        for i, (d, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel,
                                          c.conv_stride)):
            x = nn.Conv(d, (k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=c.jax_dtype,
                        name=f"conv_{i}")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=d, dtype=c.jax_dtype,
                                 name="gn")(x)
            x = nn.gelu(x, approximate=False)
        return x


class Wav2Vec2Encoder(nn.Module):
    """Feature extractor + projection + conv-pos transformer encoder.

    API matches the in-framework ASR encoders: (speech, lengths) ->
    (hs, h_lengths, interctc-intermediates tuple).
    """
    cfg: Wav2Vec2Config

    def setup(self):
        c = self.cfg
        self.feature_extractor = ConvFeatureExtractor(
            c, name="feature_extractor")
        self.fp_norm = nn.LayerNorm(epsilon=1e-5, dtype=c.jax_dtype,
                                 name="fp_norm")
        self.fp_proj = nn.Dense(c.d_model, dtype=c.jax_dtype,
                                name="fp_proj")
        self.pos_conv = nn.Conv(
            c.d_model, (c.pos_conv_kernel,),
            padding=[(c.pos_conv_kernel // 2, c.pos_conv_kernel // 2)],
            feature_group_count=c.pos_conv_groups, dtype=c.jax_dtype,
            name="pos_conv")

    def extract(self, speech, speech_lengths):
        """Latents pre-transformer: ([B,T,C_conv] raw latents,
        [B,T,D] projected, [B] lengths)."""
        c = self.cfg
        z = self.feature_extractor(speech)
        lens = conv_out_lengths(speech_lengths, c.conv_kernel, c.conv_stride)
        x = self.fp_proj(self.fp_norm(z))
        return z, x, lens

    @nn.compact
    def contextualize(self, x, lengths, deterministic=True,
                      collect_layers=False):
        """Projected latents -> transformer states (HF post-LN blocks).

        collect_layers=True additionally returns the per-layer hidden
        states stacked as [B, T, num_blocks + 1, D] (block inputs + final)
        — the s3prl "hidden_states" surface used by multilayer SSL
        frontends (s3prl.py S3prlFrontend multilayer_feature)."""
        c = self.cfg
        t = x.shape[1]
        pos = self.pos_conv(x)
        if c.pos_conv_kernel % 2 == 0:
            # HF trims the trailing sample of the even-kernel SAME conv
            pos = pos[:, :t]
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.jax_dtype, name="enc_norm")(x)
        mask = length_mask(lengths, t)
        bias = attention_bias(mask[:, None, None, :])
        from .attention import MultiHeadAttention
        layers = [x]
        for i in range(c.num_blocks):
            h = MultiHeadAttention(c.n_head, c.d_model, c.dropout_rate,
                                   c.jax_dtype, name=f"attn_{i}")(
                x, x, x, bias, deterministic)
            x = nn.LayerNorm(epsilon=1e-5, dtype=c.jax_dtype,
                             name=f"norm1_{i}")(x + h)
            h = nn.Dense(c.d_ff, dtype=c.jax_dtype, name=f"ff1_{i}")(x)
            h = nn.Dense(c.d_model, dtype=c.jax_dtype,
                         name=f"ff2_{i}")(nn.gelu(h, approximate=False))
            x = nn.LayerNorm(epsilon=1e-5, dtype=c.jax_dtype,
                             name=f"norm2_{i}")(x + h)
            layers.append(x)
        out = jnp.where(mask[..., None], x, 0.0)
        if collect_layers:
            stacked = jnp.stack(layers, axis=2)  # [B, T, L+1, D]
            return out, jnp.where(mask[..., None, None], stacked, 0.0)
        return out

    def __call__(self, speech, speech_lengths, deterministic=True):
        _, x, lens = self.extract(speech, speech_lengths)
        hs = self.contextualize(x, lens, deterministic)
        return hs, lens, ()

    def layer_states(self, speech, speech_lengths):
        """Raw waveform -> ([B, T, L, D] all-layer hiddens, [B] lengths):
        the SSL feature-dump surface (bin/ssl_dump.py)."""
        _, x, lens = self.extract(speech, speech_lengths)
        _, stacked = self.contextualize(x, lens, True, collect_layers=True)
        return stacked, lens


def span_mask(rng, b, t, lengths, mask_prob, mask_span):
    """Dilated-Bernoulli span mask [B, T] (shared scheme with HuBERT)."""
    starts = jax.random.uniform(rng, (b, t)) < mask_prob
    kernel = jnp.ones((mask_span,))
    spans = jax.vmap(
        lambda s: jnp.convolve(s.astype(jnp.float32), kernel,
                               mode="same"))(starts) > 0
    return spans & length_mask(lengths, t)


class GumbelQuantizer(nn.Module):
    """Product-codebook gumbel-softmax quantizer (fairseq
    GumbelVectorQuantizer semantics: G groups x V entries)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, z, rng, hard=True):
        """z [B, T, C] -> (q [B, T, vq_dim], mean soft probs [G, V])."""
        c = self.cfg
        g, v = c.quantizer_groups, c.quantizer_entries
        logits = nn.Dense(g * v, dtype=jnp.float32, name="proj")(
            z.astype(jnp.float32))
        logits = logits.reshape(*z.shape[:2], g, v)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape, minval=1e-6,
                               maxval=1.0 - 1e-6)))
        y_soft = jax.nn.softmax((logits + gumbel) / c.gumbel_temp, axis=-1)
        if hard:
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, v, dtype=y_soft.dtype)
            y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            y = y_soft
        codebook = self.param("codebook", nn.initializers.normal(0.02),
                              (g, v, c.vq_dim // g), jnp.float32)
        q = jnp.einsum("btgv,gvd->btgd", y, codebook)
        q = q.reshape(*z.shape[:2], c.vq_dim)
        probs = jnp.mean(jax.nn.softmax(logits, axis=-1), axis=(0, 1))
        return nn.Dense(c.final_dim, dtype=jnp.float32, name="out")(q), probs


class Wav2Vec2PretrainModel(nn.Module):
    """Contrastive pretraining (wav2vec 2.0 objective)."""
    cfg: Wav2Vec2Config

    def setup(self):
        c = self.cfg
        self.encoder = Wav2Vec2Encoder(c, name="encoder")
        self.quantizer = GumbelQuantizer(c, name="quantizer")
        self.final_proj = nn.Dense(c.final_dim, dtype=jnp.float32,
                                   name="final_proj")
        self.mask_emb = self.param("mask_emb",
                                   nn.initializers.normal(0.02),
                                   (c.d_model,), c.jax_dtype)

    def __call__(self, speech, speech_lengths, *, train=True,
                 mask_rng=None):
        c = self.cfg
        if mask_rng is None:
            mask_rng = jax.random.PRNGKey(0)
        m_rng, q_rng, n_rng = jax.random.split(mask_rng, 3)
        z, x, lens = self.encoder.extract(speech, speech_lengths)
        b, t, _ = x.shape
        masked = span_mask(m_rng, b, t, lens, c.mask_prob, c.mask_span)
        x_masked = jnp.where(masked[..., None], self.mask_emb, x)
        hs = self.encoder.contextualize(x_masked, lens,
                                        deterministic=not train)
        ct = self.final_proj(hs.astype(jnp.float32))         # [B, T, F]
        # targets from the UNMASKED latents
        q, probs = self.quantizer(z, q_rng)

        # in-jit distractor sampling from this utterance's masked frames
        k = c.n_negatives
        logits_mask = jnp.where(masked, 0.0, -1e30)          # [B, T]
        neg_idx = jax.random.categorical(
            n_rng, logits_mask[:, None, :], axis=-1,
            shape=(b, t * k)).reshape(b, t, k)
        # avoid the positive itself: shift collisions by one frame
        collide = neg_idx == jnp.arange(t)[None, :, None]
        neg_idx = jnp.where(collide, (neg_idx + 1) % t, neg_idx)
        negs = jax.vmap(lambda qb, ib: qb[ib])(q, neg_idx)   # [B, T, K, F]
        cand = jnp.concatenate([q[:, :, None], negs], axis=2)  # [B,T,K+1,F]

        def cos(a, bb):
            # sqrt(sum^2 + eps): finite gradient at zero (padded frames)
            a = a * jax.lax.rsqrt(
                jnp.sum(a ** 2, -1, keepdims=True) + 1e-8)
            bb = bb * jax.lax.rsqrt(
                jnp.sum(bb ** 2, -1, keepdims=True) + 1e-8)
            return jnp.einsum("btf,btkf->btk", a, bb)

        sim = cos(ct, cand) / c.logit_temp                   # [B, T, K+1]
        logp = jax.nn.log_softmax(sim, axis=-1)
        nll = -logp[..., 0]
        denom = jnp.maximum(jnp.sum(masked), 1)
        contrastive = jnp.sum(jnp.where(masked, nll, 0.0)) / denom
        # diversity: encourage uniform codebook usage
        g, v = c.quantizer_groups, c.quantizer_entries
        entropy = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)
        diversity = (g * v - jnp.sum(jnp.exp(entropy))) / (g * v)
        loss = contrastive + c.diversity_weight * diversity
        acc = jnp.sum((jnp.argmax(sim, -1) == 0) & masked) / denom
        stats: Dict[str, jnp.ndarray] = {
            "loss": loss, "contrastive_loss": contrastive,
            "diversity_loss": diversity, "acc_masked": acc,
            "mask_ratio": jnp.mean(masked.astype(jnp.float32))}
        return loss, stats


# ---------------------------------------------------------------------------
# HF transformers weight import (Wav2Vec2Model, feat_extract_norm="group")
# ---------------------------------------------------------------------------

def _t(x):
    import numpy as np
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def wav2vec2_params_from_torch(state_dict, cfg: Wav2Vec2Config):
    """HF Wav2Vec2Model state dict -> Wav2Vec2Encoder flax params."""
    import numpy as np
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {"feature_extractor": {}}
    fe = p["feature_extractor"]
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        fe[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    fe["gn"] = {"scale": sd["feature_extractor.conv_layers.0."
                            "layer_norm.weight"],
                "bias": sd["feature_extractor.conv_layers.0."
                           "layer_norm.bias"]}
    p["fp_norm"] = {"scale": sd["feature_projection.layer_norm.weight"],
                    "bias": sd["feature_projection.layer_norm.bias"]}
    p["fp_proj"] = {"kernel": sd["feature_projection.projection.weight"].T,
                    "bias": sd["feature_projection.projection.bias"]}
    # weight-normed positional conv -> plain kernel
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True)) + 1e-12
        w = g / norm * v if g.ndim == 3 else g.reshape(1, 1, -1) / norm * v
    else:  # torch >= 2.1 parametrized weight_norm
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight."
               "original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight."
               "original1"]
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True)) + 1e-12
        w = g / norm * v
    # torch conv weight [out, in/groups, k] -> flax [k, in/groups, out]
    p["pos_conv"] = {"kernel": np.transpose(w, (2, 1, 0)),
                     "bias": sd["encoder.pos_conv_embed.conv.bias"]}
    p["enc_norm"] = {"scale": sd["encoder.layer_norm.weight"],
                     "bias": sd["encoder.layer_norm.bias"]}

    def lin(key):
        return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}

    for i in range(cfg.num_blocks):
        base = f"encoder.layers.{i}"
        att = f"{base}.attention"
        p[f"attn_{i}"] = {
            "linear_q": lin(f"{att}.q_proj"),
            "linear_k": lin(f"{att}.k_proj"),
            "linear_v": lin(f"{att}.v_proj"),
            "linear_out": lin(f"{att}.out_proj")}
        p[f"norm1_{i}"] = {"scale": sd[f"{base}.layer_norm.weight"],
                           "bias": sd[f"{base}.layer_norm.bias"]}
        p[f"ff1_{i}"] = lin(f"{base}.feed_forward.intermediate_dense")
        p[f"ff2_{i}"] = lin(f"{base}.feed_forward.output_dense")
        p[f"norm2_{i}"] = {"scale": sd[f"{base}.final_layer_norm.weight"],
                           "bias": sd[f"{base}.final_layer_norm.bias"]}
    return p
