"""iNeuBe: iterative neural/beamforming enhancement (DNN1 -> mfMCWF -> DNN2).

Parity target: reference espnet2/enh/separator/ineube_separator.py:30-300 +
espnet2/enh/layers/tcndenseunet.py (TCNDenseUNet: dense conv blocks over
the freq axis, dilated depthwise TCN bottleneck, mirrored skip decoder
emitting complex spectra; Lu et al., ICASSP 2022 L3DAS22 submission).

TPU redesign notes (channel-last [B, T, F, C] vs the reference's NCHW):
- freq-axis VALID (3,3)-convs and stride-2 downsamples mirror the
  reference's (1, 0)-padding geometry; decoder stages crop the upsampled
  freq axis to each skip's width (odd sizes round differently through
  ConvTranspose) instead of relying on exact transposed-conv arithmetic.
- complex STFT images ride as a trailing (re, im) pair; the mfMCWF solve
  is a batched einsum + jnp.linalg.solve over (batch, freq) — no
  per-frequency python loop.
- GroupNorm(C, C) == per-channel InstanceNorm over (T, F): jnp mean/var
  over the spatial axes with per-channel affine.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Conv2DActNorm(nn.Module):
    """Conv2D (or transpose) + ELU + per-channel instance norm
    (tcndenseunet.py:10-38; GroupNorm(C, C) == InstanceNorm)."""
    out_ch: int
    ksz: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 2)
    freq_valid: bool = True      # reference padding (1, 0): time SAME, freq VALID
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, F, C]
        kt, kf = self.ksz
        if self.upsample:
            # VALID + time crop: flax ConvTranspose mixed explicit padding
            # does not follow the (in-1)*s + k - lo - hi arithmetic, so
            # emit the full (T+kt-1, (F-1)*sf + kf) output and trim time.
            h = nn.ConvTranspose(self.out_ch, self.ksz, strides=self.stride,
                                 padding="VALID", dtype=self.dtype,
                                 name="conv")(x)
            h = h[:, kt // 2: h.shape[1] - (kt - 1 - kt // 2)]
        else:
            pad = [(kt // 2, kt // 2),
                   (0, 0) if self.freq_valid else (kf // 2, kf // 2)]
            h = nn.Conv(self.out_ch, self.ksz, strides=self.stride,
                        padding=pad, dtype=self.dtype, name="conv")(x)
        h = nn.elu(h)
        mu = jnp.mean(h, axis=(1, 2), keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=(1, 2), keepdims=True)
        h = (h - mu) / jnp.sqrt(var + 1e-8)
        gamma = self.param("scale", nn.initializers.ones, (self.out_ch,))
        beta = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return h * gamma + beta


class FreqWiseBlock(nn.Module):
    """Pointwise bottleneck + pointwise conv over the FREQ axis
    (tcndenseunet.py:41-68)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, F, C]
        h = Conv2DActNorm(self.out_ch, (1, 1), (1, 1), dtype=self.dtype,
                          name="bottleneck")(x)
        # pointwise over freq: swap F <-> C, 1x1 conv, swap back
        h = jnp.swapaxes(h, 2, 3)  # [B, T, C, F]
        h = Conv2DActNorm(h.shape[-1], (1, 1), (1, 1), dtype=self.dtype,
                          name="freq_proc")(h)
        return jnp.swapaxes(h, 2, 3)


class DenseBlock(nn.Module):
    """DenseNet block: pre convs + freq-wise block + post convs, all with
    dense concatenation (tcndenseunet.py:69-170)."""
    out_ch: int
    hid_ch: int = 32
    pre_blocks: int = 2
    freq_blocks: int = 1
    post_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        i = 0
        for _ in range(self.pre_blocks):
            h = Conv2DActNorm(self.hid_ch, (3, 3), (1, 1), freq_valid=False,
                              dtype=self.dtype, name=f"pre_{i}")(
                jnp.concatenate(feats, -1))
            feats.append(h)
            i += 1
        for j in range(self.freq_blocks):
            h = FreqWiseBlock(self.hid_ch, self.dtype, name=f"freq_{j}")(
                jnp.concatenate(feats, -1))
            feats.append(h)
        for k in range(self.post_blocks - 1):
            h = Conv2DActNorm(self.hid_ch, (3, 3), (1, 1), freq_valid=False,
                              dtype=self.dtype, name=f"post_{k}")(
                jnp.concatenate(feats, -1))
            feats.append(h)
        return Conv2DActNorm(self.out_ch, (3, 3), (1, 1), freq_valid=False,
                             dtype=self.dtype, name="post_last")(
            jnp.concatenate(feats, -1))


class TCNResBlock(nn.Module):
    """Depthwise-separable dilated 1-D TCN block (tcndenseunet.py:172-212)."""
    ch: int
    ksz: int = 3
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
        h = (x - mu) / jnp.sqrt(var + 1e-8)
        gamma = self.param("scale", nn.initializers.ones, (self.ch,))
        beta = self.param("bias", nn.initializers.zeros, (self.ch,))
        h = nn.elu(h * gamma + beta)
        pad = self.dilation * (self.ksz - 1) // 2
        h = nn.Conv(self.ch, (self.ksz,), kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], feature_group_count=self.ch,
                    dtype=self.dtype, name="dconv")(h)
        h = nn.Conv(self.ch, (1,), dtype=self.dtype, name="pconv")(h)
        return x + h


class TCNDenseUNet(nn.Module):
    """Complex spectral mapping net (tcndenseunet.py:214-470).

    [B, T, C_mic, F, 2] complex mixture image -> [B, n_spk, T, F, 2].
    """
    n_spk: int = 1
    mic_channels: int = 1
    hid_ch: int = 32
    hid_ch_dense: int = 32
    tcn_repeats: int = 4
    tcn_blocks: int = 7
    tcn_channels: int = 384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tf_rep):
        b, t, c, f, _ = tf_rep.shape
        assert c == self.mic_channels
        # [B, T, F, 2*C]: real/imag of every mic as image channels
        x = jnp.moveaxis(tf_rep, 2, 4).reshape(b, t, f, 2 * c)
        x = x.astype(self.dtype)

        # Encoder (tcndenseunet.py:316-390): first conv F -> F-2, then
        # stride-2 freq downsamples while F > 15 (reference _get_depth),
        # then three bottleneck convs landing at F == 1 exactly (the
        # geometry assumes F-2 in the 2^k-1 family, e.g. n_fft 128/512).
        skips = []
        h = Conv2DActNorm(self.hid_ch, (3, 3), (1, 1), dtype=self.dtype,
                          name="first_conv")(x)
        h = DenseBlock(self.hid_ch, self.hid_ch_dense, dtype=self.dtype,
                       name="first_dense")(h)
        skips.append(h)
        n_down = 0
        while h.shape[2] > 15:
            h = Conv2DActNorm(self.hid_ch, (3, 3), (1, 2),
                              dtype=self.dtype, name=f"down_{n_down}")(h)
            h = DenseBlock(self.hid_ch, self.hid_ch_dense,
                           dtype=self.dtype,
                           name=f"down_dense_{n_down}")(h)
            skips.append(h)
            n_down += 1
        h = Conv2DActNorm(self.hid_ch * 2, (3, 3), (1, 2),
                          dtype=self.dtype, name="bott0")(h)
        skips.append(h)
        h = Conv2DActNorm(self.hid_ch * 4, (3, 3), (1, 2),
                          dtype=self.dtype, name="bott1")(h)
        skips.append(h)
        h = Conv2DActNorm(self.tcn_channels, (3, 3), (1, 1),
                          dtype=self.dtype, name="bott2")(h)
        skips.append(h)
        assert h.shape[2] == 1, (
            f"freq pyramid must land at 1, got {h.shape[2]} "
            f"(use an n_fft with 2^k-1-family bins, e.g. 128/512)")

        z = h[:, :, 0, :]  # [B, T, C_tcn]
        for r in range(self.tcn_repeats):
            for k in range(self.tcn_blocks):
                z = TCNResBlock(self.tcn_channels, dilation=2 ** k,
                                dtype=self.dtype,
                                name=f"tcn_{r}_{k}")(z)
        h = z[:, :, None, :]

        # Decoder (tcndenseunet.py:337-417): each stage concats the
        # mirrored skip; transposed convs exactly invert the encoder's
        # freq arithmetic ((F-1)*s + 3), so no crops are needed.
        def up(y, out_ch, stride_f, name):
            return Conv2DActNorm(out_ch, (3, 3), (1, stride_f),
                                 upsample=True, dtype=self.dtype,
                                 name=name)(y)

        h = jnp.concatenate([h, skips[-1]], -1)
        h = up(h, self.hid_ch * 4, 1, "dec0")        # 1 -> 3
        h = jnp.concatenate([h, skips[-2]], -1)
        h = up(h, self.hid_ch * 2, 2, "dec1")        # 3 -> 7
        h = jnp.concatenate([h, skips[-3]], -1)
        h = up(h, self.hid_ch, 2, "dec2")            # 7 -> 15
        for j in range(n_down):
            skip = skips[-(4 + j)]
            h = jnp.concatenate([h, skip], -1)
            h = DenseBlock(self.hid_ch * 2, self.hid_ch_dense,
                           dtype=self.dtype, name=f"dec_dense_{j}")(h)
            h = up(h, self.hid_ch, 2, f"dec_up_{j}")
        h = jnp.concatenate([h, skips[0]], -1)
        h = DenseBlock(self.hid_ch * 2, self.hid_ch_dense, dtype=self.dtype,
                       name="last_dense")(h)
        out = nn.ConvTranspose(2 * self.n_spk, (3, 3), strides=(1, 1),
                               padding="VALID", dtype=self.dtype,
                               name="last_deconv")(h)
        out = out[:, 1:-1]  # time crop of the VALID transpose
        assert out.shape[2] == f, (out.shape, f)
        out = out.reshape(b, t, f, self.n_spk, 2)
        return jnp.moveaxis(out, 3, 1).astype(jnp.float32)


def mfmcwf(mix_re, mix_im, est_re, est_im, n_chunks: int = 3,
           tik_eps: float = 1e-8):
    """Multi-frame multi-channel Wiener filter toward the DNN1 estimate
    (ineube_separator.py:156-200).

    mix: [B, T, C, F] complex (re/im); est: [B, T, F]. Returns the
    filtered monaural [B, T, F] (re, im).
    """
    mix = mix_re + 1j * mix_im
    est = est_re + 1j * est_im
    b, t, c, f = mix.shape
    k = 2 * n_chunks + 1
    # unfold frames: taps [B, T, C*K, F] with tap_d[t] = mix[t - d],
    # zero-padded at the edges (the reference F.pads the time axis before
    # unfolding, ineube_separator.py:142-151 — NOT circular).
    padded = jnp.pad(mix, ((0, 0), (n_chunks, n_chunks), (0, 0), (0, 0)))
    taps = [padded[:, n_chunks - d: n_chunks - d + t]
            for d in range(-n_chunks, n_chunks + 1)]
    x = jnp.concatenate(taps, axis=2)                        # [B, T, CK, F]
    x = jnp.moveaxis(x, (2, 3), (3, 1))                      # [B, F, T, CK]
    s = jnp.moveaxis(est, 2, 1)                              # [B, F, T]
    # least squares min_w || x @ w - s ||^2 over the time axis:
    # (X^H X) w = X^H s with X rows x_t^T  (== the reference's
    # zeta = sum_t x_t conj(s_t), w = R^{-1} zeta, y = conj(w)^H x
    # conjugated through).
    scm = jnp.einsum("bftm,bftn->bfmn", jnp.conj(x), x)
    zeta = jnp.einsum("bftm,bft->bfm", jnp.conj(x), s)
    eye = jnp.eye(c * k, dtype=scm.dtype)
    w = jnp.linalg.solve(scm + tik_eps * eye,
                         zeta[..., None])[..., 0]            # [B, F, CK]
    y = jnp.einsum("bftm,bfm->bft", x, w)                    # [B, F, T]
    y = jnp.moveaxis(y, 1, 2)
    return jnp.real(y), jnp.imag(y)
