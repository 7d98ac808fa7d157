"""Separator family: TCN (Conv-TasNet), DPRNN, and learned conv filterbank.

Parity targets: reference espnet2/enh/layers/tcn.py:18-310 (TemporalConvNet),
espnet2/enh/layers/dprnn.py:74-171 + split/merge_feature,
espnet2/enh/separator/{tcn,dprnn}_separator.py, and
espnet2/enh/{encoder/conv_encoder.py,decoder/conv_decoder.py}.

TPU redesign notes:
- Everything is channel-last: flax convs consume [B, T, C] directly, no
  permute/contiguous dance; the dilated depthwise stacks lower to MXU/VPU
  convolutions that XLA fuses with the pointwise PReLU/norm tails.
- DPRNN's split/merge use static-shape reshapes (two half-offset strided
  views concatenated), so the dual-path LSTMs run as two batched
  `nn.RNN` scans over [B*K, seg] and [B*seg, K] — the segment count is a
  compile-time constant per bucket, no ragged segmentation.
- Global layer norm (gLN) is a single fused mean/var over all non-batch
  axes with per-channel affine, matching torch GroupNorm(1, C).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over every non-batch axis, per-channel affine.

    torch GroupNorm(1, C) on [B, C, *spatial] analogue (tcn.py:choose_norm).
    """
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=axes, keepdims=True)
        gamma = self.param("scale", nn.initializers.ones, (self.dim,))
        beta = self.param("bias", nn.initializers.zeros, (self.dim,))
        y = (x - mu) / jnp.sqrt(var + 1e-8)
        return (y * gamma + beta).astype(self.dtype)


class ConvEncoder(nn.Module):
    """TasNet learned filterbank: [B, N] wav -> [B, K, channel] feature.

    conv_encoder.py:9-47 analogue (stride/kernel, relu, bias-free).
    """
    channel: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav, ilens):
        feats = nn.Conv(self.channel, (self.kernel_size,),
                        strides=(self.stride,), padding="VALID",
                        use_bias=False, dtype=self.dtype,
                        name="conv")(wav[..., None].astype(self.dtype))
        flens = (ilens - self.kernel_size) // self.stride + 1
        return nn.relu(feats), flens


class ConvDecoder(nn.Module):
    """[B, K, channel] feature -> [B, N'] wav (conv_decoder.py:9-33)."""
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        wav = nn.ConvTranspose(1, (self.kernel_size,),
                               strides=(self.stride,), padding="VALID",
                               use_bias=False, dtype=self.dtype,
                               name="deconv")(feats.astype(self.dtype))
        return wav[..., 0].astype(jnp.float32)


class TemporalBlock(nn.Module):
    """1x1-conv -> PReLU -> gLN -> depthwise dilated conv -> PReLU -> gLN
    -> 1x1-conv, residual (tcn.py:99-207 TemporalBlock+DepthwiseSeparable).
    """
    bottleneck: int     # B
    hidden: int         # H
    kernel: int         # P
    dilation: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="in1x1")(x)
        h = nn.PReLU()(h)
        h = GlobalLayerNorm(self.hidden, self.dtype, name="n1")(h)
        pad = (self.kernel - 1) * self.dilation
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        h = nn.Conv(self.hidden, (self.kernel,),
                    kernel_dilation=(self.dilation,), padding=padding,
                    feature_group_count=self.hidden, use_bias=False,
                    dtype=self.dtype, name="dwconv")(h)
        h = nn.PReLU()(h)
        h = GlobalLayerNorm(self.hidden, self.dtype, name="n2")(h)
        h = nn.Dense(self.bottleneck, use_bias=False, dtype=self.dtype,
                     name="out1x1")(h)
        return x + h


class TCNSeparator(nn.Module):
    """Conv-TasNet TemporalConvNet (tcn.py:18-96, tcn_separator.py:15-119).

    [B, K, N] feature -> [B, n_out, K, N] masks. All convolutions; no
    recurrence — the whole stack is one fused XLA graph on TPU.
    """
    input_dim: int      # N
    n_outputs: int      # num_spk (+1 if predict_noise)
    bottleneck: int = 128    # B
    hidden: int = 256        # H
    kernel: int = 3          # P
    n_blocks: int = 4        # X (dilations 1,2,4,...)
    n_repeats: int = 2       # R
    causal: bool = False
    mask_nonlinear: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = GlobalLayerNorm(self.input_dim, self.dtype, name="ln")(
            feats.astype(self.dtype))
        x = nn.Dense(self.bottleneck, use_bias=False, dtype=self.dtype,
                     name="bottleneck")(x)
        for r in range(self.n_repeats):
            for i in range(self.n_blocks):
                x = TemporalBlock(self.bottleneck, self.hidden, self.kernel,
                                  2 ** i, self.causal, self.dtype,
                                  name=f"block_{r}_{i}")(x)
        score = nn.Dense(self.n_outputs * self.input_dim, use_bias=False,
                         dtype=self.dtype, name="mask1x1")(x)
        b, k, _ = score.shape
        score = score.reshape(b, k, self.n_outputs, self.input_dim)
        score = jnp.moveaxis(score, 2, 1).astype(jnp.float32)
        return _mask_nonlinear(score, self.mask_nonlinear)


def _mask_nonlinear(score, kind: str):
    if kind == "relu":
        return nn.relu(score)
    if kind == "sigmoid":
        return nn.sigmoid(score)
    if kind == "tanh":
        return nn.tanh(score)
    if kind == "softmax":
        return nn.softmax(score, axis=1)
    raise ValueError(f"unsupported mask nonlinear {kind}")


def split_segments(x, segment: int) -> Tuple[jnp.ndarray, int]:
    """[B, K, N] -> [B, S, segment, N] half-overlapping segments.

    dprnn.py split_feature analogue: pad so the two half-offset strided
    views tile K exactly, then interleave them — static shapes throughout.
    """
    b, k, n = x.shape
    stride = segment // 2
    rest = segment - (stride + k % segment) % segment
    pad = jnp.pad(x, ((0, 0), (stride, rest + stride), (0, 0)))
    kp = pad.shape[1]
    seg1 = pad[:, : kp - stride].reshape(b, -1, segment, n)
    seg2 = pad[:, stride:].reshape(b, -1, segment, n)
    segs = jnp.concatenate([seg1[:, :, None], seg2[:, :, None]], axis=2)
    return segs.reshape(b, -1, segment, n), rest


def merge_segments(segs, rest: int) -> jnp.ndarray:
    """Inverse of split_segments: [B, S, segment, N] -> [B, K, N]
    overlap-add of the two interleaved views (dprnn.py merge_feature)."""
    b, s, segment, n = segs.shape
    stride = segment // 2
    segs = segs.reshape(b, -1, 2, segment, n)
    first = segs[:, :, 0].reshape(b, -1, n)[:, stride:]
    second = segs[:, :, 1].reshape(b, -1, n)[:, :-stride]
    out = first + second
    if rest > 0:
        out = out[:, :-rest]
    return out / 2.0


class BiRNNProj(nn.Module):
    """Bidirectional LSTM + linear back to input width (dprnn SingleRNN)."""
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                     name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                     name="bwd", reverse=True, keep_order=True)(x)
        return nn.Dense(self.out, dtype=self.dtype, name="proj")(
            jnp.concatenate([fwd, bwd], axis=-1))


class DPRNNSeparator(nn.Module):
    """Dual-path RNN separator (dprnn.py:74-171, dprnn_separator.py:15-131).

    [B, K, N] feature -> [B, n_out, K, N] masks. Intra-segment and
    inter-segment BLSTMs run as batched scans over the folded axes.
    """
    input_dim: int
    n_outputs: int
    hidden: int = 128
    n_layers: int = 3
    segment_size: int = 20
    mask_nonlinear: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats.astype(self.dtype)
        segs, rest = split_segments(x, self.segment_size)   # [B,S,seg,N]
        b, s, seg, n = segs.shape
        for i in range(self.n_layers):
            intra = BiRNNProj(self.hidden, n, self.dtype,
                              name=f"intra_{i}")(
                segs.reshape(b * s, seg, n)).reshape(b, s, seg, n)
            segs = segs + GlobalLayerNorm(n, self.dtype,
                                          name=f"intra_n_{i}")(intra)
            inter_in = jnp.swapaxes(segs, 1, 2).reshape(b * seg, s, n)
            inter = BiRNNProj(self.hidden, n, self.dtype,
                              name=f"inter_{i}")(inter_in)
            inter = jnp.swapaxes(inter.reshape(b, seg, s, n), 1, 2)
            segs = segs + GlobalLayerNorm(n, self.dtype,
                                          name=f"inter_n_{i}")(inter)
        segs = nn.PReLU()(segs)
        segs = nn.Dense(self.n_outputs * n, dtype=self.dtype,
                        name="out")(segs)
        segs = segs.reshape(b, s, seg, self.n_outputs, n)
        score = merge_segments(
            segs.reshape(b, s, seg, self.n_outputs * n), rest)
        score = score.reshape(b, -1, self.n_outputs, n)
        score = jnp.moveaxis(score, 2, 1).astype(jnp.float32)
        return _mask_nonlinear(score, self.mask_nonlinear)


class ImprovedTransformerLayer(nn.Module):
    """DPTNet block: MHSA + RNN-augmented feed-forward (dptnet.py:15-89).

    The FFN is a BLSTM -> activation -> linear instead of two dense layers
    (the paper's "improved transformer"). Both sublayers close with gLN.
    On TPU the attention runs over a compile-time-constant segment length,
    so every head lands on the MXU with no masking.
    """
    n_head: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..models.attention import MultiHeadAttention
        n = x.shape[-1]
        h = MultiHeadAttention(self.n_head, n, dtype=self.dtype,
                               name="attn")(x, x, x, None)
        x = GlobalLayerNorm(n, self.dtype, name="n_attn")(x + h)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                     name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                     name="bwd", reverse=True, keep_order=True)(x)
        h = nn.relu(jnp.concatenate([fwd, bwd], axis=-1))
        h = nn.Dense(n, dtype=self.dtype, name="ff")(h)
        return GlobalLayerNorm(n, self.dtype, name="n_ff")(x + h)


class DPTNetSeparator(nn.Module):
    """Dual-path transformer separator (dptnet.py:91-180,
    dptnet_separator.py:17-139).

    Same half-overlap segmentation as DPRNN; each layer applies an
    ImprovedTransformerLayer along the intra-segment axis then the
    inter-segment axis, batched via static reshapes.
    """
    input_dim: int
    n_outputs: int
    n_head: int = 4
    hidden: int = 128
    n_layers: int = 2
    segment_size: int = 20
    mask_nonlinear: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats.astype(self.dtype)
        segs, rest = split_segments(x, self.segment_size)   # [B,S,seg,N]
        b, s, seg, n = segs.shape
        for i in range(self.n_layers):
            intra = ImprovedTransformerLayer(
                self.n_head, self.hidden, self.dtype, name=f"intra_{i}")(
                segs.reshape(b * s, seg, n))
            segs = intra.reshape(b, s, seg, n)
            inter_in = jnp.swapaxes(segs, 1, 2).reshape(b * seg, s, n)
            inter = ImprovedTransformerLayer(
                self.n_head, self.hidden, self.dtype, name=f"inter_{i}")(
                inter_in)
            segs = jnp.swapaxes(inter.reshape(b, seg, s, n), 1, 2)
        segs = nn.PReLU()(segs)
        segs = nn.Dense(self.n_outputs * n, dtype=self.dtype,
                        name="out")(segs)
        score = merge_segments(
            segs.reshape(b, s, seg, self.n_outputs * n), rest)
        score = score.reshape(b, -1, self.n_outputs, n)
        score = jnp.moveaxis(score, 2, 1).astype(jnp.float32)
        return _mask_nonlinear(score, self.mask_nonlinear)


class SegLSTM(nn.Module):
    """Per-segment LSTM seeded by an external memory carry (skim.py:116-172).

    Runs batched over [B*S, seg, N] with `initial_carry` = the MemLSTM
    output, so all segments advance in one scan. Causal mode uses cLN
    (per-step channel LayerNorm, skim.py norm_type='cLN') so no future
    frame leaks through the normalization statistics.
    """
    hidden: int
    causal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, carry):
        n = x.shape[-1]
        carry, out = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
            name="lstm")(x, initial_carry=carry, return_carry=True)
        out = nn.Dense(n, dtype=self.dtype, name="proj")(out)
        if self.causal:
            out = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        else:
            out = GlobalLayerNorm(n, self.dtype, name="norm")(out)
        return x + out, carry


class MemLSTM(nn.Module):
    """Memory LSTM across segments (skim.py:13-113, mem_type='hc').

    Takes the per-segment final (c, h) states [B, S, H], refines each with
    its own LSTM+proj+gLN residual, and (causal mode) right-shifts by one
    segment so segment s is seeded by memory of segments < s.
    """
    hidden: int
    causal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c, h):
        def refine(x, name):
            y = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                       name=f"{name}_lstm")(x)
            y = nn.Dense(self.hidden, dtype=self.dtype,
                         name=f"{name}_proj")(y)
            if self.causal:  # cLN: no cross-segment normalization leakage
                return x + nn.LayerNorm(dtype=self.dtype,
                                        name=f"{name}_norm")(y)
            return x + GlobalLayerNorm(self.hidden, self.dtype,
                                       name=f"{name}_norm")(y)
        c, h = refine(c, "c"), refine(h, "h")
        if self.causal:
            c = jnp.pad(c[:, :-1], ((0, 0), (1, 0), (0, 0)))
            h = jnp.pad(h[:, :-1], ((0, 0), (1, 0), (0, 0)))
        return c, h


class SkiMSeparator(nn.Module):
    """Skipping-Memory LSTM separator (skim.py:174-267,
    skim_separator.py:16-133).

    Non-overlapping segments; each block = SegLSTM (batched over segments)
    whose boundary states are woven across segments by a MemLSTM. Causal
    by default (the paper's low-latency configuration); set causal=False
    for an offline variant whose memory sees all segments.
    """
    input_dim: int
    n_outputs: int
    hidden: int = 128
    n_blocks: int = 3
    segment_size: int = 20
    causal: bool = True
    mask_nonlinear: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats.astype(self.dtype)
        b, k, n = x.shape
        pad = (-k) % self.segment_size
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        s = x.shape[1] // self.segment_size
        x = x.reshape(b * s, self.segment_size, n)
        zeros = jnp.zeros((b * s, self.hidden), self.dtype)
        carry = (zeros, zeros)
        for i in range(self.n_blocks):
            x, (c_f, h_f) = SegLSTM(self.hidden, self.causal, self.dtype,
                                    name=f"seg_{i}")(x, carry)
            if i < self.n_blocks - 1:
                c, h = MemLSTM(self.hidden, self.causal, self.dtype,
                               name=f"mem_{i}")(
                    c_f.reshape(b, s, self.hidden),
                    h_f.reshape(b, s, self.hidden))
                carry = (c.reshape(b * s, self.hidden),
                         h.reshape(b * s, self.hidden))
        x = nn.PReLU()(x)
        score = nn.Dense(self.n_outputs * n, dtype=self.dtype,
                         name="out")(x)
        score = score.reshape(b, s * self.segment_size,
                              self.n_outputs, n)[:, :k]
        score = jnp.moveaxis(score, 2, 1).astype(jnp.float32)
        return _mask_nonlinear(score, self.mask_nonlinear)


class DPCLEmbedder(nn.Module):
    """Deep-clustering TF-bin embedder (dpcl_separator.py:11-110).

    log-magnitude [B, T, F] -> unit-norm embeddings [B, T, F, D] via a
    BLSTM stack + per-bin projection. Training uses the affinity loss
    (losses.dpcl_loss); inference clusters the embeddings with a
    fixed-iteration k-means (jit-friendly lax.fori_loop, no data-dependent
    convergence loop like the reference's while-True)."""
    n_freq: int
    emb_dim: int = 20
    hidden: int = 128
    n_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, logmag):
        x = logmag.astype(self.dtype)
        for i in range(self.n_layers):
            x = BiRNNProj(self.hidden, self.hidden, self.dtype,
                          name=f"blstm_{i}")(x)
        emb = nn.tanh(nn.Dense(self.n_freq * self.emb_dim, dtype=self.dtype,
                               name="emb")(x))
        b, t, _ = emb.shape
        emb = emb.reshape(b, t, self.n_freq, self.emb_dim)
        return emb.astype(jnp.float32)


def kmeans_centers(emb: jnp.ndarray, n_clusters: int, valid: jnp.ndarray,
                   iters: int = 10) -> jnp.ndarray:
    """Cluster [B, T, F, D] embeddings -> centers [B, S, D].

    valid: [B, T] frame validity. Fixed-iteration Lloyd k-means; centers
    initialize from the first num_spk embeddings as in the reference."""
    import jax
    from jax import lax
    b, t, f, d = emb.shape
    v = emb.reshape(b, t * f, d)
    w = jnp.repeat(valid, f, axis=1).astype(jnp.float32)  # [B, T*F]
    centers = v[:, :n_clusters]                           # [B, S, D]

    def step(_, centers):
        d2 = jnp.sum((v[:, :, None] - centers[:, None]) ** 2, -1)
        lab = jnp.argmin(d2, -1)                          # [B, TF]
        onehot = jax.nn.one_hot(lab, n_clusters) * w[..., None]
        s = jnp.einsum("bns,bnd->bsd", onehot, v)
        cnt = jnp.maximum(jnp.sum(onehot, 1), 1.0)
        return s / cnt[..., None]

    return lax.fori_loop(0, iters, step, centers)


def kmeans_masks(emb: jnp.ndarray, n_clusters: int, valid: jnp.ndarray,
                 iters: int = 10) -> jnp.ndarray:
    """Cluster [B, T, F, D] embeddings -> one-hot masks [B, S, T, F]."""
    import jax
    b, t, f, d = emb.shape
    v = emb.reshape(b, t * f, d)
    centers = kmeans_centers(emb, n_clusters, valid, iters)
    d2 = jnp.sum((v[:, :, None] - centers[:, None]) ** 2, -1)
    lab = jnp.argmin(d2, -1)
    masks = jax.nn.one_hot(lab, n_clusters).reshape(b, t, f, n_clusters)
    return jnp.moveaxis(masks, 3, 1)                      # [B, S, T, F]


def attractor_masks(emb: jnp.ndarray, attractors: jnp.ndarray
                    ) -> jnp.ndarray:
    """DAN soft masks (dan_separator.py:150-153): softmax over
    embedding-attractor dot products. emb [B, T, F, D], attractors
    [B, S, D] -> [B, S, T, F]."""
    dist = jnp.einsum("btfd,bsd->btfs", emb, attractors)
    return jnp.moveaxis(jax.nn.softmax(dist, axis=-1), 3, 1)

