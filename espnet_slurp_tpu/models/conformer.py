"""Conformer encoder, TPU-first.

Parity target: reference espnet2/asr/encoder/conformer_encoder.py:47-368 and
its building blocks (conformer/encoder_layer.py, conformer/convolution.py,
transformer/attention.py RelPositionMultiHeadedAttention). Macaron FF halves,
rel-pos MHSA, depthwise conv module with GLU + (batch->group)norm + swish,
conv2d x4 subsampling, optional interCTC taps.

TPU notes: depthwise conv uses feature_group_count so XLA maps it to the VPU;
everything keeps [B, T, D] layout with D a multiple of 128; masks are additive
biases computed once per forward.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masks import attention_bias, band_mask, chunk_mask, length_mask
from .attention import RelPosMultiHeadAttention
from .embedding import Conv2dSubsampling, rel_positional_embedding


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Fused Pallas path (ops/pallas/ffn.py): both matmuls + swish +
    # in-kernel dropout tile-by-tile in VMEM, so the [B, T, d_ff] hidden,
    # its u32 dropout bits, and the f32 swish intermediates never reach
    # HBM — the dominant remaining train-step traffic after flash
    # attention (see the kernel's docstring for the byte census).
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        lead = int(np.prod(x.shape[:-1]))
        if (self.use_flash and x.shape[-1] % 128 == 0
                and self.d_ff % 128 == 0 and self.d_model % 128 == 0
                and lead % 128 == 0):
            from ..ops.pallas.ffn import fused_ffn
            d1 = nn.Dense(self.d_ff, dtype=self.dtype, name="w1")
            d2 = nn.Dense(self.d_model, dtype=self.dtype, name="w2")
            _ = d2(nn.swish(d1(x[..., :0, :])))  # params only (empty slice)
            p1 = d1.variables["params"]
            p2 = d2.variables["params"]
            rate = 0.0 if deterministic else self.dropout_rate
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                          2**31 - 1, jnp.int32)
            return fused_ffn(
                x.astype(self.dtype), p1["kernel"].astype(self.dtype),
                p1["bias"], p2["kernel"].astype(self.dtype), p2["bias"],
                seed, dropout_rate=rate)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="w1")(x)
        h = nn.swish(h)
        if self.dropout_rate > 0.0 and not deterministic:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=False)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="w2")(h)
        return h


class ConvModule(nn.Module):
    """Pointwise(2D)+GLU -> depthwise(k) -> norm -> swish -> pointwise(D).

    Matches conformer/convolution.py:12-79. Uses LayerNorm over channels in
    place of BatchNorm (batch-stat-free → no cross-device sync, no train/eval
    divergence; standard practice for TPU conformers).
    """
    d_model: int
    kernel_size: int = 31
    causal: bool = False  # streaming: no future leakage through the conv
    dtype: jnp.dtype = jnp.float32
    # "layer" (TPU default, batch-stat-free) or "batch": BatchNorm matching
    # the reference's nn.BatchNorm1d — used for numerical parity against
    # reference checkpoints/modules. bn_train_stats=False normalizes by the
    # FROZEN running stats (torch eval mode); True normalizes by the batch's
    # own statistics (torch train mode; apply with mutable=["batch_stats"]).
    norm_type: str = "layer"
    bn_train_stats: bool = False
    # Fused Pallas path (ops/pallas/conv_module.py): the whole
    # GLU→depthwise→norm→swish chain tile-by-tile in VMEM so none of the
    # five per-block intermediates reach HBM (~8.5 GB/step at the 17x512
    # config — PERF_NOTES round-3 census).
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, pad_mask=None):
        pw1 = nn.Dense(2 * self.d_model, dtype=self.dtype, name="pointwise1")
        pad = [(self.kernel_size - 1, 0)] if self.causal else "SAME"
        dw = nn.Conv(self.d_model, (self.kernel_size,), padding=pad,
                     feature_group_count=self.d_model, dtype=self.dtype,
                     name="depthwise")
        if self.norm_type == "batch":
            norm = nn.BatchNorm(
                use_running_average=not self.bn_train_stats, epsilon=1e-5,
                dtype=self.dtype, name="norm")
        else:
            norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        pw2 = nn.Dense(self.d_model, dtype=self.dtype, name="pointwise2")
        import os
        fusable = (self.use_flash and self.norm_type == "layer"
                   and x.ndim == 3 and x.shape[-1] % 128 == 0
                   and (self.causal or self.kernel_size % 2 == 1)
                   # A/B kill switch for perf attribution (tools/)
                   and os.environ.get("ESPNET_TPU_NO_FUSED_CONV") != "1")
        if fusable:
            from ..ops.pallas.conv_module import fused_conv_module
            # Materialize params via a 1-row slice (compute-free at trace
            # time beyond a [B,1,D] chain) — same scheme as FeedForward.
            h0 = pw1(x[:, :1, :])
            a0, b0 = jnp.split(h0, 2, axis=-1)
            _ = pw2(norm(dw(a0 * nn.sigmoid(b0))))
            lengths = (None if pad_mask is None
                       else pad_mask.astype(jnp.int32).sum(axis=-1))
            p1 = pw1.variables["params"]
            pd = dw.variables["params"]
            pn = norm.variables["params"]
            p2 = pw2.variables["params"]
            return fused_conv_module(
                x.astype(self.dtype), lengths,
                p1["kernel"], p1["bias"],
                pd["kernel"].reshape(self.kernel_size, self.d_model),
                pd["bias"], pn["scale"], pn["bias"],
                p2["kernel"], p2["bias"],
                kernel_size=self.kernel_size, causal=self.causal)
        h = pw1(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        if pad_mask is not None:
            h = jnp.where(pad_mask[..., None], h, 0.0)
        h = dw(h)
        h = norm(h)
        h = nn.swish(h)
        return pw2(h)


class ConformerBlock(nn.Module):
    d_model: int
    n_head: int
    d_ff: int
    kernel_size: int = 31
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    causal_conv: bool = False
    use_flash: bool = False
    chunk_size: int = 0
    left_chunks: int = -1
    # > 0: the second macaron FFN becomes a routed mixture-of-experts
    # (models/moe.py, expert-parallel capable) and __call__ returns
    # (x, aux_load_balance_loss) instead of x.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # Stochastic depth (conformer/encoder_layer.py stochastic_depth_rate):
    # when the layer survives, every residual branch is scaled by
    # 1/(1-rate); the survive/skip draw lives in the encoder loop.
    residual_coeff: float = 1.0
    conv_norm: str = "layer"  # see ConvModule.norm_type
    conv_bn_train_stats: bool = False  # see ConvModule.bn_train_stats

    @nn.compact
    def __call__(self, x, pos_emb, mask_bias, pad_mask, deterministic=True,
                 lengths=None):
        cf = self.residual_coeff
        # Macaron FF half 1 (encoder_layer.py:70-90).
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        x = x + cf * 0.5 * FeedForward(self.d_model, self.d_ff,
                                       self.dropout_rate,
                                       self.dtype, use_flash=self.use_flash,
                                       name="ff1")(h, deterministic)
        # Self-attention.
        h = nn.LayerNorm(dtype=self.dtype, name="norm_mha")(x)
        x = x + cf * RelPosMultiHeadAttention(
            self.n_head, self.d_model, self.dropout_rate, self.dtype,
            use_flash=self.use_flash,
            name="self_attn")(h, pos_emb, mask_bias, deterministic,
                              lengths=lengths, chunk_size=self.chunk_size,
                              left_chunks=self.left_chunks)
        # Convolution module. The fused Pallas path is OPT-IN here
        # (ESPNET_TPU_FUSED_CONV=1): measured at the 17x512 config the
        # fusion's backward recompute + VMEM pressure cost ~3% step time
        # against the ~8.5 GB byte saving (PERF_NOTES round-4 A/B), so
        # the production default keeps XLA's own fusion.
        import os
        fuse_conv = (self.use_flash and
                     os.environ.get("ESPNET_TPU_FUSED_CONV") == "1")
        h = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        x = x + cf * ConvModule(self.d_model, self.kernel_size,
                                self.causal_conv,
                                self.dtype, norm_type=self.conv_norm,
                                bn_train_stats=self.conv_bn_train_stats,
                                use_flash=fuse_conv,
                                name="conv")(h, pad_mask)
        # Macaron FF half 2 (routed MoE when moe_experts > 0).
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        if self.moe_experts > 0:
            from .moe import MoEFeedForward
            y, aux = MoEFeedForward(self.d_model, self.d_ff,
                                    self.moe_experts,
                                    self.moe_capacity_factor,
                                    self.dtype, name="moe")(
                h, deterministic, pad_mask=pad_mask)
            x = x + cf * 0.5 * y
            return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x), aux
        x = x + cf * 0.5 * FeedForward(self.d_model, self.d_ff,
                                       self.dropout_rate,
                                       self.dtype, use_flash=self.use_flash,
                                       name="ff2")(h, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)


class ConformerEncoder(nn.Module):
    """Conv2d x4 subsampling + N Conformer blocks.

    __call__: (feats [B,T,F], feat_lengths [B]) -> (hs [B,T',D], h_lengths,
    intermediate list for interCTC).
    """
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 2048
    num_blocks: int = 12
    kernel_size: int = 31
    dropout_rate: float = 0.0
    interctc_layers: Sequence[int] = ()
    # Streaming: restrict attention to chunks of ``chunk_size`` frames with
    # ``left_chunks`` past chunks of context (0 disables; -1 left = all).
    chunk_size: int = 0
    left_chunks: int = -1
    # Longformer-style symmetric sliding-window attention: frame i attends
    # to |i-j| <= attention_window (0 disables). Mutually exclusive with
    # chunk_size; forces the masked-bias attention path.
    attention_window: int = 0
    # Rematerialize blocks in backward: recompute instead of storing the
    # large per-block intermediates (attention probs, FF hiddens) — a
    # bandwidth win on TPU where the step is HBM-bound (PERF_NOTES.md).
    remat: bool = False
    # Fused rel-pos flash attention (ops/pallas/flash_attention.py):
    # "auto" = on TPU backends, "on"/"off" force. Pads T' to a 128 multiple.
    flash: str = "auto"
    # Routed mixture-of-experts FFNs (models/moe.py): every moe_every-th
    # block's second macaron FFN becomes a num-expert Switch layer.
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    # Input layer (conformer_encoder.py:114-186 input_layer choices):
    # "conv2d" = Conv2dSubsampling at ``subsampling_factor`` in {2,4,6,8};
    # "linear" = Dense + LayerNorm, no time reduction.
    input_layer: str = "conv2d"
    subsampling_factor: int = 4
    # Stochastic depth (conformer_encoder.py stochastic_depth_rate): each
    # block is skipped whole-batch with this probability at train time;
    # surviving blocks scale their residual branches by 1/(1-rate). Draws
    # come from the "dropout" rng stream.
    stochastic_depth_rate: float = 0.0
    # ConvModule normalization: "layer" (default) or "batch" (frozen-stats
    # BatchNorm for reference parity; see ConvModule.norm_type).
    conv_norm: str = "layer"
    # InterCTC self-conditioning (conformer_encoder.py:336-358
    # interctc_use_conditioning): > 0 gives the encoder its own shared CTC
    # head; at each interctc tap the softmax is projected back into the
    # stream, and the tap entries carry the LOGITS [B,T',V] (consumed
    # directly by the model's intermediate CTC loss — one shared
    # projection for conditioning and loss, as in the reference).
    self_cond_vocab: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        import jax
        use_flash = self.flash == "on" or (
            self.flash == "auto" and jax.default_backend() == "tpu")
        if self.attention_window > 0:
            use_flash = False  # band restriction lives in the mask bias
        if self.input_layer == "linear":
            x = nn.Dense(self.d_model, dtype=self.dtype, name="embed")(
                feats.astype(self.dtype))
            x = nn.LayerNorm(dtype=self.dtype, name="embed_norm")(x)
            olens = feat_lengths
        else:
            x = Conv2dSubsampling(self.d_model, self.dtype,
                                  factor=self.subsampling_factor,
                                  name="embed")(feats)
            olens = Conv2dSubsampling.out_length(
                feat_lengths, self.subsampling_factor)
        t = x.shape[1]
        if use_flash and t % 256 != 0:
            # Flash tiles want fat 256/512-aligned blocks (per-program
            # overhead dominates at 128); pad frames are masked by olens
            # everywhere downstream, so shapes stay static per bucket.
            t_pad = ((t + 255) // 256) * 256
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
            t = t_pad
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))  # xscale
        pos_emb = rel_positional_embedding(t, self.d_model, self.dtype)
        pad = length_mask(olens, t)  # (B, T')
        if use_flash:
            bias = None  # padding + chunking applied inside the kernel
        else:
            att_mask = pad[:, None, None, :]
            if self.chunk_size > 0:
                att_mask = att_mask & chunk_mask(
                    t, self.chunk_size, self.left_chunks)[None, None]
            if self.attention_window > 0:
                att_mask = att_mask & band_mask(
                    t, self.attention_window)[None, None]
            bias = attention_bias(att_mask)  # (B,1,1|T',T')
        inter = []
        block_cls = nn.remat(ConformerBlock, static_argnums=(5,)) \
            if self.remat else ConformerBlock
        # Sequence parallelism: no-op unless tracing inside an
        # activation_sharding(mesh) context (parallel/seq.py) — then every
        # block boundary pins [B, T, D] to P(data, seq, None) and XLA
        # gathers only around attention.
        from ..parallel.seq import constrain_acts
        x = constrain_acts(x)
        moe_aux = 0.0
        sd_rate = self.stochastic_depth_rate if not deterministic else 0.0
        sd_coeff = 1.0 / (1.0 - sd_rate) if sd_rate > 0.0 else 1.0
        # Encoder-level output norm (conformer_encoder.py:280-281,362-363
        # normalize_before after_norm) — applied to the final output AND to
        # every interCTC tap, on top of each block's norm_final.
        after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        if self.self_cond_vocab > 0 and self.interctc_layers:
            # Shared across taps: one CTC head for conditioning AND for the
            # model's intermediate CTC loss (reference shares model.ctc).
            sc_ctc = nn.Dense(self.self_cond_vocab, dtype=self.dtype,
                              name="sc_ctc")
            sc_proj = nn.Dense(self.d_model, dtype=self.dtype, name="sc_cond")
        for i in range(self.num_blocks):
            # Routed-MoE FFN on every moe_every-th block (interleaved
            # dense/sparse, the common MoE-transformer layout).
            moe_e = self.moe_experts if (
                self.moe_experts > 0
                and (i + 1) % max(self.moe_every, 1) == 0) else 0
            out = block_cls(
                self.d_model, self.n_head, self.d_ff, self.kernel_size,
                self.dropout_rate, self.dtype, causal_conv=self.chunk_size > 0,
                use_flash=use_flash, chunk_size=self.chunk_size,
                left_chunks=self.left_chunks, moe_experts=moe_e,
                moe_capacity_factor=self.moe_capacity_factor,
                residual_coeff=sd_coeff, conv_norm=self.conv_norm,
                name=f"block_{i}")(
                    x, pos_emb, bias, pad, deterministic, lengths=olens)
            if moe_e > 0:
                y, aux = out
            else:
                y, aux = out, None
            if sd_rate > 0.0:
                # Whole-batch layer drop (encoder_layer.py skip_layer): the
                # block still computes (static graph), the skip is a select.
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - sd_rate)
                y = jnp.where(keep, y, x)
                if aux is not None:
                    aux = jnp.where(keep, aux, 0.0)
            x = y
            if aux is not None:
                moe_aux = moe_aux + aux
            x = constrain_acts(x)
            if (i + 1) in self.interctc_layers:
                if self.self_cond_vocab > 0:
                    logits = sc_ctc(after_norm(x))
                    inter.append((i + 1, logits))
                    x = x + sc_proj(
                        jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                        .astype(self.dtype))
                else:
                    inter.append((i + 1, after_norm(x)))
        x = after_norm(x)
        x = jnp.where(pad[..., None], x, 0.0)
        if self.moe_experts > 0:
            # Tagged entry consumed by ASRModel's loss (filtered out of the
            # interCTC taps).
            inter.append(("moe_aux", moe_aux))
        return x, olens, inter
