"""SVoice, DPCL-E2E and DC-CRN separators.

Parity targets:
- SVoice (svoice_separator.py:92-199 + layers/dpmulcat.py): gated dual-path
  MulCat LSTM blocks over a learned filterbank; every block emits a
  waveform estimate and training averages the PIT loss over blocks
  (multi-scale loss). The decoder is avg-pool + overlap-add.
- DPCL-E2E (dpcl_e2e_separator.py:11-190): deep-clustering embeddings with
  an in-graph differentiable soft k-means, followed by an enhancement BLSTM
  refining the soft masks — trained end-to-end with the signal loss rather
  than the affinity loss.
- DC-CRN (dc_crn_separator.py + layers/dc_crn.py): densely-connected conv
  encoder/decoder with GLU (de)convolutions, grouped-LSTM bottleneck, and
  complex masking.

TPU notes: the reference's soft-kmeans `while` + per-speaker python loops
become a lax.fori_loop over a fixed iteration count with batched einsums;
MulCat's per-block python list of outputs stays (static unroll, one decode
per block); DC-CRN dense concatenations are channel-last so XLA fuses the
concat into the following conv's im2col.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .separators import (BiRNNProj, GlobalLayerNorm, merge_segments,
                         split_segments)


# ---------------------------------------------------------------------------
# SVoice (dpmulcat.py MulCatBlock/DPMulCat)
# ---------------------------------------------------------------------------

class MulCatBlock(nn.Module):
    """Gated LSTM: rnn(x)*gate_rnn(x) concat x -> proj (dpmulcat.py:5-86)."""
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[-1]
        main = BiRNNProj(self.hidden, n, self.dtype, name="rnn")(x)
        gate = BiRNNProj(self.hidden, n, self.dtype, name="gate")(x)
        gated = main * gate
        return nn.Dense(n, dtype=self.dtype, name="proj")(
            jnp.concatenate([gated, x], axis=-1))


class DPMulCat(nn.Module):
    """Dual-path MulCat stack -> per-layer [B, S, seg, spk*N] outputs
    (dpmulcat.py:89-189: intra + inter MulCat per layer, an output head
    after EVERY layer for the multi-scale loss)."""
    n_spk: int
    hidden: int
    n_layers: int = 4
    input_normalize: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, segs):
        b, s, seg, n = segs.shape
        outputs = []
        x = segs
        for i in range(self.n_layers):
            intra = MulCatBlock(self.hidden, self.dtype, name=f"intra_{i}")(
                x.reshape(b * s, seg, n)).reshape(b, s, seg, n)
            if self.input_normalize:
                intra = GlobalLayerNorm(n, self.dtype,
                                        name=f"intra_n_{i}")(intra)
            x = x + intra
            inter_in = jnp.swapaxes(x, 1, 2).reshape(b * seg, s, n)
            inter = MulCatBlock(self.hidden, self.dtype,
                                name=f"inter_{i}")(inter_in)
            inter = jnp.swapaxes(inter.reshape(b, seg, s, n), 1, 2)
            if self.input_normalize:
                inter = GlobalLayerNorm(n, self.dtype,
                                        name=f"inter_n_{i}")(inter)
            x = x + inter
            out = nn.PReLU()(x)
            out = nn.Dense(self.n_spk * n, dtype=self.dtype,
                           name=f"out_{i}")(out)
            outputs.append(out)
        return outputs


def svoice_decode(feat: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """[B*spk, K, N] feature -> [B*spk, T] wav.

    svoice_separator.py Decoder: AvgPool2d((1, kernel)) pools the FEATURE
    axis in windows of ``kernel`` (frame_length = N/kernel per time frame),
    then overlap_and_add at step kernel//2 — so T = (K-1)*kernel//2 +
    N/kernel, matching the stride-kernel//2 encoder.
    """
    bs, k, n = feat.shape
    fl = n // kernel
    frames = feat[:, :, :fl * kernel].reshape(bs, k, fl, kernel).mean(-1)
    step = kernel // 2
    t = step * (k - 1) + fl
    idx = (jnp.arange(k)[:, None] * step
           + jnp.arange(fl)[None, :]).reshape(-1)
    out = jnp.zeros((bs, t), frames.dtype)
    out = out.at[:, idx].add(frames.reshape(bs, -1))
    return out


class SVoiceSeparator(nn.Module):
    """Full SVoice net: conv filterbank -> DPMulCat -> per-layer decode
    (svoice_separator.py:92-199). Returns a list of [B, spk, T] estimates,
    one per MulCat layer — average the PIT loss over them in training; use
    the last at inference."""
    n_spk: int
    enc_dim: int = 128
    kernel: int = 8
    hidden: int = 128
    n_layers: int = 4
    segment_size: int = 20
    input_normalize: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        c = self
        b, t_mix = wav.shape
        x = nn.Conv(c.enc_dim, (c.kernel,), strides=(c.kernel // 2,),
                    padding="VALID", use_bias=False, dtype=c.dtype,
                    name="encoder")(wav[..., None].astype(c.dtype))
        x = nn.relu(x)                                    # [B, K, N]
        segs, rest = split_segments(x, c.segment_size)
        outs = DPMulCat(c.n_spk, c.hidden, c.n_layers, c.input_normalize,
                        c.dtype, name="dpmulcat")(segs)
        results = []
        for out in outs:
            bb, s, seg, _ = out.shape
            merged = merge_segments(
                out.reshape(bb, s, seg, c.n_spk * c.enc_dim), rest)
            k = merged.shape[1]
            feat = merged.reshape(b, k, c.n_spk, c.enc_dim)
            feat = jnp.moveaxis(feat, 2, 1).reshape(b * c.n_spk, k,
                                                    c.enc_dim)
            est = svoice_decode(feat.astype(jnp.float32), c.kernel)
            est = est[:, :t_mix]
            est = jnp.pad(est, ((0, 0), (0, t_mix - est.shape[1])))
            results.append(est.reshape(b, c.n_spk, t_mix))
        return results


# ---------------------------------------------------------------------------
# DPCL-E2E (dpcl_e2e_separator.py)
# ---------------------------------------------------------------------------

def soft_kmeans(v: jnp.ndarray, n_clusters: int, alpha: float,
                iters: int) -> jnp.ndarray:
    """Differentiable soft k-means over TF embeddings.

    v: [B, TF, D]. Returns soft assignments gamma [B, TF, C]
    (dpcl_e2e_separator.py:131-160; the reference's threshold-while becomes
    a fixed iteration count for a static graph).
    """
    import jax
    centers0 = v[:, :n_clusters, :]

    def step(_, centers):
        d2 = jnp.sum((v[:, :, None, :] - centers[:, None, :, :]) ** 2,
                     axis=-1)                      # [B, TF, C]
        gamma = jax.nn.softmax(-alpha * d2, axis=-1)
        new = jnp.einsum("btc,btd->bcd", gamma, v) \
            / (jnp.sum(gamma, axis=1)[..., None] + 1e-8)
        return new

    import jax.lax as lax
    centers = lax.fori_loop(0, iters, step, centers0)
    d2 = jnp.sum((v[:, :, None, :] - centers[:, None, :, :]) ** 2, axis=-1)
    import jax
    return jax.nn.softmax(-alpha * d2, axis=-1)


class DPCLE2ESeparator(nn.Module):
    """BLSTM embeddings -> soft k-means masks -> enhancement BLSTM ->
    softmax masks over speakers (dpcl_e2e_separator.py:11-190).

    [B, T, F] magnitude -> [B, spk, T, F] masks, end-to-end differentiable.
    """
    n_bins: int
    n_spk: int
    emb_dim: int = 20
    hidden: int = 256
    n_layers: int = 2
    alpha: float = 5.0
    kmeans_iters: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mag):
        b, t, f = mag.shape
        x = jnp.log(mag + 1e-8).astype(self.dtype)
        for i in range(self.n_layers):
            x = BiRNNProj(self.hidden, self.hidden, self.dtype,
                          name=f"blstm_{i}")(x)
        v = nn.tanh(nn.Dense(f * self.emb_dim, dtype=self.dtype,
                             name="emb")(x))
        v = v.reshape(b, t * f, self.emb_dim).astype(jnp.float32)
        gamma = soft_kmeans(v, self.n_spk, self.alpha, self.kmeans_iters)
        masks = jnp.moveaxis(gamma.reshape(b, t, f, self.n_spk), 3, 1)
        masked = masks * mag[:, None]                   # [B, spk, T, F]
        cat = jnp.concatenate(
            [masked[:, i] for i in range(self.n_spk)] + [mag], axis=-1)
        h = BiRNNProj(self.hidden, self.hidden, self.dtype,
                      name="enh_blstm")(cat.astype(self.dtype))
        z = nn.Dense(f * self.n_spk, dtype=self.dtype, name="enh_out")(h)
        z = z.reshape(b, t, f, self.n_spk).astype(jnp.float32)
        import jax
        return jnp.moveaxis(jax.nn.softmax(z, axis=-1), 3, 1)


# ---------------------------------------------------------------------------
# DC-CRN (layers/dc_crn.py)
# ---------------------------------------------------------------------------

class GluConv(nn.Module):
    """GLU-gated conv (dc_crn.py:103-147)."""
    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = nn.ConvTranspose if self.transpose else nn.Conv
        a = conv(self.out_ch, self.kernel, strides=self.stride,
                 padding="SAME", dtype=self.dtype, name="conv")(x)
        g = conv(self.out_ch, self.kernel, strides=self.stride,
                 padding="SAME", dtype=self.dtype, name="gate")(x)
        return a * nn.sigmoid(g)


class DenselyConnectedBlock(nn.Module):
    """Dense conv stack + strided GLU output conv (dc_crn.py:207-310)."""
    hid_ch: int
    out_ch: int
    kernel: Tuple[int, int] = (1, 3)
    last_kernel: Tuple[int, int] = (1, 4)
    last_stride: Tuple[int, int] = (1, 2)
    layers: int = 5
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = x
        for i in range(self.layers - 1):
            h = nn.Conv(self.hid_ch, self.kernel, padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(feats)
            h = nn.elu(nn.LayerNorm(dtype=self.dtype,
                                    name=f"norm_{i}")(h))
            feats = jnp.concatenate([feats, h], axis=-1)
        return GluConv(self.out_ch, self.last_kernel, self.last_stride,
                       self.transpose, self.dtype, name="last")(feats)


class GroupedLSTM(nn.Module):
    """Grouped (block-diagonal) LSTM bottleneck (dc_crn.py:15-100)."""
    groups: int
    hidden: int
    layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, T, D]; split D into groups, run an LSTM per group.
        d = x.shape[-1]
        gd = d // self.groups
        for layer in range(self.layers):
            outs = []
            for g in range(self.groups):
                seg = x[..., g * gd:(g + 1) * gd]
                h = nn.RNN(nn.OptimizedLSTMCell(self.hidden // self.groups,
                                                dtype=self.dtype),
                           name=f"lstm_{layer}_{g}")(seg)
                outs.append(nn.Dense(gd, dtype=self.dtype,
                                     name=f"proj_{layer}_{g}")(h))
            x = x + jnp.concatenate(outs, axis=-1)
        return x


class DCCRNSeparatorDC(nn.Module):
    """DC-CRN complex-masking separator (dc_crn_separator.py:20-178).

    (re, im) [B, T, F] -> (est_re, est_im) [B, spk, T, F].
    """
    n_spk: int
    channels: Sequence[int] = (2, 16, 32, 64)
    hid_ch: int = 8
    glstm_groups: int = 2
    glstm_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, re, im):
        b, t, f = re.shape
        x = jnp.stack([re, im], axis=-1).astype(self.dtype)  # [B,T,F,2]
        skips = []
        enc = x
        chans = list(self.channels)
        for i, ch in enumerate(chans[1:]):
            enc = DenselyConnectedBlock(self.hid_ch, ch,
                                        dtype=self.dtype,
                                        name=f"enc_{i}")(enc)
            # skip pathway: stride-1 dense block on the encoder output
            skips.append(DenselyConnectedBlock(
                self.hid_ch, ch, last_stride=(1, 1),
                dtype=self.dtype, name=f"skip_{i}")(enc))
        bb, tt, ff, cc = enc.shape
        h = GroupedLSTM(self.glstm_groups, ff * cc, self.glstm_layers,
                        self.dtype, name="glstm")(
            enc.reshape(bb, tt, ff * cc))
        dec = h.reshape(bb, tt, ff, cc)
        for i in range(len(chans) - 2, -1, -1):
            # crop the upsampled freq axis to the skip's (odd sizes round
            # differently through stride-2 down/up convs)
            dec = dec[:, :, :skips[i].shape[2], :]
            dec = jnp.concatenate([dec, skips[i]], axis=-1)
            out_ch = 2 * self.n_spk if i == 0 else chans[i]
            dec = DenselyConnectedBlock(self.hid_ch, out_ch,
                                        transpose=True, dtype=self.dtype,
                                        name=f"dec_{i}")(dec)
        dec = dec[:, :, :f, :].astype(jnp.float32)   # [B, T, F, 2*spk]
        masks = dec.reshape(b, t, f, self.n_spk, 2)
        m_re = jnp.moveaxis(masks[..., 0], 3, 1)
        m_im = jnp.moveaxis(masks[..., 1], 3, 1)
        # complex masking: (re + j im) * (m_re + j m_im)
        est_re = m_re * re[:, None] - m_im * im[:, None]
        est_im = m_re * im[:, None] + m_im * re[:, None]
        return est_re, est_im
