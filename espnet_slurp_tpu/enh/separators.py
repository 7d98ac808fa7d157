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
