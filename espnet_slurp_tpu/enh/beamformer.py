"""Mask-based neural MVDR beamformer for multichannel enhancement.

Parity targets: reference espnet2/enh/layers/dnn_beamformer.py:54-460
(DNN_Beamformer, mvdr_souden path), espnet2/enh/layers/beamformer.py
(get_power_spectral_density_matrix, get_mvdr_vector,
apply_beamforming_vector), espnet2/enh/layers/mask_estimator.py and
espnet2/enh/separator/neural_beamformer.py:1-265.

TPU redesign notes:
- The complex C x C solve in the Souden MVDR formula is expanded to a
  real 2C x 2C block system ([[Re, -Im], [Im, Re]]), so the whole
  beamformer lowers to real matmuls/solves that XLA handles on the MXU —
  no reliance on complex LAPACK kernels.
- PSD matrices are one einsum over frames (masked outer products), batched
  over [B, F]; per-frequency solves batch as a single [B*F] solve.
- The mask estimator is a shared BLSTM over per-channel log magnitudes
  (channels folded into the batch axis), emitting n_spk + 1 masks
  (speakers + noise); for each speaker the interference PSD is the noise
  PSD plus the other speakers' PSDs (mvdr_souden multi-source handling,
  dnn_beamformer.py:265-345).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.stft import stft, stft_out_lengths
from ..ops.masks import length_mask


def solve_hermitian(a_re, a_im, b_re, b_im):
    """Solve A X = B for complex A [..., C, C], B [..., C, K] given as
    real/imag parts, via the real 2C x 2C block embedding."""
    c = a_re.shape[-1]
    top = jnp.concatenate([a_re, -a_im], axis=-1)
    bot = jnp.concatenate([a_im, a_re], axis=-1)
    a_block = jnp.concatenate([top, bot], axis=-2)      # [..., 2C, 2C]
    b_block = jnp.concatenate([b_re, b_im], axis=-2)    # [..., 2C, K]
    x = jnp.linalg.solve(a_block, b_block)
    return x[..., :c, :], x[..., c:, :]


def masked_psd(spec_re, spec_im, mask, flens):
    """Mask-weighted PSD: [B, T, C, F] spec, [B, T, F] mask ->
    PSD [B, F, C, C] (re, im). beamformer.py
    get_power_spectral_density_matrix analogue (normalized by mask sum)."""
    t = spec_re.shape[1]
    w = mask * length_mask(flens, t)[..., None]          # [B, T, F]
    denom = jnp.maximum(jnp.sum(w, axis=1), 1e-6)        # [B, F]
    # psd[b,f,i,j] = sum_t w * x_i x_j^*   (x_j^* = re - i im)
    re = jnp.einsum("btf,btif,btjf->bfij", w, spec_re, spec_re) + \
        jnp.einsum("btf,btif,btjf->bfij", w, spec_im, spec_im)
    im = jnp.einsum("btf,btif,btjf->bfij", w, spec_im, spec_re) - \
        jnp.einsum("btf,btif,btjf->bfij", w, spec_re, spec_im)
    return re / denom[..., None, None], im / denom[..., None, None]


def mvdr_souden_vector(psd_s, psd_n, ref_channel: int, eps: float = 1e-6):
    """Souden MVDR: w = (Phi_n^-1 Phi_s) / tr(Phi_n^-1 Phi_s) @ u_ref.

    beamformer.py get_mvdr_vector analogue with diagonal loading."""
    sr, si = psd_s
    nr, ni = psd_n
    c = nr.shape[-1]
    eye = jnp.eye(c)
    # diagonal loading scaled by the mean diagonal magnitude
    load = eps * (jnp.trace(nr, axis1=-2, axis2=-1) / c + eps)
    nr = nr + load[..., None, None] * eye
    num_re, num_im = solve_hermitian(nr, ni, sr, si)     # Phi_n^-1 Phi_s
    tr_re = jnp.trace(num_re, axis1=-2, axis2=-1)
    tr_im = jnp.trace(num_im, axis1=-2, axis2=-1)
    tr_mag = tr_re ** 2 + tr_im ** 2 + eps
    u_re = num_re[..., ref_channel]                      # [B, F, C]
    u_im = num_im[..., ref_channel]
    # w = u / tr  (complex division)
    w_re = (u_re * tr_re[..., None] + u_im * tr_im[..., None]) / \
        tr_mag[..., None]
    w_im = (u_im * tr_re[..., None] - u_re * tr_im[..., None]) / \
        tr_mag[..., None]
    return w_re, w_im


def apply_beamforming(w, spec_re, spec_im):
    """y[b,t,f] = sum_c w[b,f,c]^* x[b,t,c,f]
    (beamformer.py apply_beamforming_vector)."""
    w_re, w_im = w
    y_re = jnp.einsum("bfc,btcf->btf", w_re, spec_re) + \
        jnp.einsum("bfc,btcf->btf", w_im, spec_im)
    y_im = jnp.einsum("bfc,btcf->btf", w_re, spec_im) - \
        jnp.einsum("bfc,btcf->btf", w_im, spec_re)
    return y_re, y_im


class MaskEstimator(nn.Module):
    """Shared per-channel BLSTM mask estimator (mask_estimator.py:17-120).

    [B, T, C, F] log-magnitude -> [B, n_masks, T, F] channel-averaged
    sigmoid masks (speakers first, noise last).
    """
    n_masks: int
    hidden: int = 256
    n_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, logmag):
        b, t, c, f = logmag.shape
        x = jnp.moveaxis(logmag, 2, 1).reshape(b * c, t, f)
        x = x.astype(self.dtype)
        for i in range(self.n_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"fwd_{i}")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"bwd_{i}", reverse=True, keep_order=True)(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        masks = nn.Dense(self.n_masks * f, dtype=self.dtype,
                         name="mask_out")(x)
        masks = nn.sigmoid(masks.astype(jnp.float32))
        masks = masks.reshape(b, c, t, self.n_masks, f)
        return jnp.moveaxis(masks.mean(axis=1), 2, 1)     # [B, M, T, F]


class NeuralBeamformer(nn.Module):
    """Multichannel mixture [B, N, C] -> (spec (re, im) [B, n_spk, T, F],
    frame lengths). MVDR-Souden per speaker with shared mask estimator.
    """
    n_spk: int
    n_fft: int = 512
    hop_length: int = 128
    hidden: int = 256
    n_layers: int = 2
    ref_channel: int = 0
    # WPE dereverberation before mask estimation + beamforming
    # (frontends/dnn_wpe.py use_wpe stage; ops/wpe.py).
    use_wpe: bool = False
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iters: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speech_mix, speech_lengths):
        b, n, c = speech_mix.shape
        wavs = jnp.moveaxis(speech_mix, 2, 1).reshape(b * c, n)
        spec = stft(wavs, n_fft=self.n_fft, hop_length=self.hop_length)
        t, f = spec.shape[1], spec.shape[2]
        spec = spec.reshape(b, c, t, f, 2)
        if self.use_wpe:
            from ..ops.wpe import wpe_dereverb
            derev = wpe_dereverb(spec[..., 0] + 1j * spec[..., 1],
                                 self.wpe_taps, self.wpe_delay,
                                 self.wpe_iters)
            spec = jnp.stack([jnp.real(derev), jnp.imag(derev)], axis=-1)
        spec_re = jnp.moveaxis(spec[..., 0], 1, 2)        # [B, T, C, F]
        spec_im = jnp.moveaxis(spec[..., 1], 1, 2)
        flens = stft_out_lengths(speech_lengths, self.n_fft, self.hop_length)
        logmag = 0.5 * jnp.log(spec_re ** 2 + spec_im ** 2 + 1e-8)
        masks = MaskEstimator(self.n_spk + 1, self.hidden, self.n_layers,
                              self.dtype, name="mask_estimator")(logmag)
        psds = [masked_psd(spec_re, spec_im, masks[:, i], flens)
                for i in range(self.n_spk + 1)]
        noise_re, noise_im = psds[-1]
        outs_re, outs_im = [], []
        for s in range(self.n_spk):
            # interference = noise + other speakers (dnn_beamformer.py:300)
            int_re = noise_re + sum(psds[o][0] for o in range(self.n_spk)
                                    if o != s)
            int_im = noise_im + sum(psds[o][1] for o in range(self.n_spk)
                                    if o != s)
            w = mvdr_souden_vector(psds[s], (int_re, int_im),
                                   self.ref_channel)
            y_re, y_im = apply_beamforming(w, spec_re, spec_im)
            outs_re.append(y_re)
            outs_im.append(y_im)
        return (jnp.stack(outs_re, 1), jnp.stack(outs_im, 1)), flens
