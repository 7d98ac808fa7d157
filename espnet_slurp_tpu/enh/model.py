"""Speech enhancement/separation model: TF-masking, TasNet, beamformer.

Parity target: reference espnet2/enh/ (encoder -> separator -> decoder;
SURVEY.md §2.7). Separator families provided:
- 'blstm' / 'transformer': STFT magnitude masking (rnn_separator.py /
  transformer_separator.py, the reference's default recipe config);
- 'tcn' / 'dprnn' / 'dptnet' / 'skim': time-domain learned conv filterbank
  + Conv-TasNet TCN, dual-path RNN, dual-path transformer, or
  skipping-memory LSTM masks (tcn/dprnn/dptnet/skim_separator.py);
- 'dccrn': complex conv recurrent U-Net over the STFT
  (dccrn_separator.py);
- 'beamformer': multichannel mask-based MVDR (neural_beamformer.py);
- 'fasnet': multichannel time-domain filter-and-sum + TAC (fasnet.py);
- 'dpcl' / 'dan': TF-embedding clustering families (dpcl/dan_separator.py)
  — affinity loss / attractor soft masks; k-means at inference.
Mask/filter families train with SI-SNR + PIT; dpcl trains on the affinity
loss, dan on oracle-attractor masked SI-SNR.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import attention_bias, length_mask
from ..ops.stft import stft, stft_out_lengths
from ..tts.vocoder import istft
from .losses import pit_wrapper, si_snr_loss


@dataclasses.dataclass(frozen=True)
class EnhConfig:
    n_spk: int = 2
    n_fft: int = 512
    hop_length: int = 128
    # blstm | transformer | tcn | dprnn | dptnet | skim | dccrn | beamformer
    # | fasnet (multichannel time-domain filter-and-sum, fasnet.py)
    # | dpcl (deep clustering: TF embeddings + affinity loss + k-means)
    # | dan (deep attractor network: oracle/k-means attractors + soft masks)
    # | svoice (gated dual-path MulCat, multi-scale loss;
    #   svoice_separator.py) | dpcl_e2e (soft-kmeans + enh BLSTM,
    #   dpcl_e2e_separator.py) | dc_crn (densely-connected CRN complex
    #   masking, dc_crn_separator.py) | ineube (TCNDenseUNet complex
    #   mapping -> optional mfMCWF -> DNN2 refinement, multichannel;
    #   ineube_separator.py)
    # | external (bring-your-own flax separator resolved from a dotted
    #   path — the TPU-native analogue of the reference's asteroid plugin
    #   bridge, espnet2/enh/separator/asteroid_models.py:11-67: instead of
    #   wrapping external torch modules, any installed flax module class
    #   is pulled into the task by name and trained/jitted natively)
    separator: str = "blstm"
    # external separator: "package.module:ClassName"; the class is built as
    # ClassName(n_spk=..., **external_kwargs) and called as
    # (speech_mix [B, N], speech_lengths [B]) -> (est [B, n_spk, N'], lens)
    external_path: str = ""
    external_kwargs: Tuple[Tuple[str, Any], ...] = ()
    # ineube options (ineube_separator.py:output_from/n_chunks/tik_eps)
    ineube_output_from: str = "dnn1"  # dnn1 | mfmcwf | dnn2
    ineube_n_chunks: int = 1
    ineube_tik_eps: float = 1e-8
    ineube_tcn_repeats: int = 2
    ineube_tcn_blocks: int = 3
    ineube_tcn_channels: int = 64
    hidden: int = 256
    num_layers: int = 3
    n_head: int = 4
    # time-domain (tcn/dprnn) learned filterbank
    encoder_channels: int = 256
    encoder_kernel: int = 32
    encoder_stride: int = 16
    bottleneck: int = 128      # tcn 1x1 bottleneck width
    tcn_kernel: int = 3
    tcn_blocks: int = 4        # dilated blocks per repeat (X)
    tcn_repeats: int = 2       # repeats (R)
    segment_size: int = 20     # dprnn/dptnet/skim segment
    skim_causal: bool = True   # SkiM low-latency (causal memory) mode
    dccrn_kernel_num: Tuple[int, ...] = (32, 64, 128)
    dccrn_rnn_layers: int = 2
    fasnet_window: int = 64    # FaSNet frame length in samples (4 ms @ 16k)
    fasnet_context: int = 64   # FaSNet context in samples per side
    mask_nonlinear: str = "relu"
    ref_channel: int = 0       # beamformer reference mic
    use_wpe: bool = False      # WPE dereverb before the beamformer
    dpcl_emb_dim: int = 20     # deep-clustering TF-embedding width
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class EnhModel(nn.Module):
    """mix waveform -> n_spk waveforms via magnitude masking."""
    cfg: EnhConfig

    @nn.compact
    def separate(self, speech_mix, speech_lengths, return_embedding=False,
                 multi_scale=False):
        """[B, N] (or [B, N, C] multichannel for the beamformer) ->
        (est wavs [B, n_spk, N'], frame_lengths). return_embedding=True
        (dpcl training) instead returns (emb, (re, im), flens);
        multi_scale=True (svoice training) returns the per-layer estimate
        list."""
        c = self.cfg
        if return_embedding:
            return self._dpcl_embed(speech_mix, speech_lengths)
        if multi_scale:
            return self._separate_svoice(speech_mix)
        if c.separator in ("tcn", "dprnn", "dptnet", "skim"):
            return self._separate_tasnet(speech_mix, speech_lengths)
        if c.separator == "beamformer":
            return self._separate_beamformer(speech_mix, speech_lengths)
        if c.separator == "fasnet":
            return self._separate_fasnet(speech_mix, speech_lengths)
        if c.separator == "dccrn":
            return self._separate_dccrn(speech_mix, speech_lengths)
        if c.separator == "svoice":
            ests = self._separate_svoice(speech_mix)
            return ests[-1], speech_lengths
        if c.separator == "dpcl_e2e":
            return self._separate_dpcl_e2e(speech_mix, speech_lengths)
        if c.separator == "dc_crn":
            return self._separate_dc_crn(speech_mix, speech_lengths)
        if c.separator == "ineube":
            return self._separate_ineube(speech_mix, speech_lengths)
        if c.separator == "external":
            return self._separate_external(speech_mix, speech_lengths)
        if c.separator == "dpcl":
            return self._separate_dpcl(speech_mix, speech_lengths)
        if c.separator == "dan":
            return self._separate_dan(speech_mix, speech_lengths)
        spec = stft(speech_mix, n_fft=c.n_fft, hop_length=c.hop_length)
        re, im = spec[..., 0], spec[..., 1]  # [B, T, F]
        mag = jnp.sqrt(re**2 + im**2 + 1e-8)
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        x = jnp.log(mag + 1e-8).astype(c.jax_dtype)
        if c.separator == "blstm":
            for i in range(c.num_layers):
                fwd = nn.RNN(nn.OptimizedLSTMCell(c.hidden,
                                                  dtype=c.jax_dtype),
                             name=f"fwd_{i}")
                bwd = nn.RNN(nn.OptimizedLSTMCell(c.hidden,
                                                  dtype=c.jax_dtype),
                             name=f"bwd_{i}", reverse=True, keep_order=True)
                x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        elif c.separator == "conformer":
            # conformer_separator.py analogue: conformer blocks over
            # log-magnitude frames at full time resolution (no subsampling
            # — masks need every frame).
            from ..models.conformer import (ConformerBlock,
                                            rel_positional_embedding)
            d = c.hidden
            x = nn.Dense(d, dtype=c.jax_dtype, name="in_proj")(x)
            t = x.shape[1]
            mask_b = length_mask(flens, t)
            bias = attention_bias(mask_b[:, None, None, :])
            pos_emb = rel_positional_embedding(t, d, c.jax_dtype)
            for i in range(c.num_layers):
                x = ConformerBlock(d, c.n_head, 4 * d, kernel_size=15,
                                   dtype=c.jax_dtype,
                                   name=f"block_{i}")(x, pos_emb, bias,
                                                      mask_b)
        else:
            from ..models.attention import MultiHeadAttention
            d = c.hidden
            x = nn.Dense(d, dtype=c.jax_dtype, name="in_proj")(x)
            mask_b = length_mask(flens, x.shape[1])
            bias = attention_bias(mask_b[:, None, None, :])
            for i in range(c.num_layers):
                h = nn.LayerNorm(dtype=c.jax_dtype, name=f"n1_{i}")(x)
                x = x + MultiHeadAttention(c.n_head, d, dtype=c.jax_dtype,
                                           name=f"attn_{i}")(h, h, h, bias)
                h = nn.LayerNorm(dtype=c.jax_dtype, name=f"n2_{i}")(x)
                h = nn.Dense(4 * d, dtype=c.jax_dtype, name=f"f1_{i}")(h)
                x = x + nn.Dense(d, dtype=c.jax_dtype,
                                 name=f"f2_{i}")(nn.relu(h))
        n_bins = mag.shape[-1]
        masks = nn.Dense(c.n_spk * n_bins, dtype=c.jax_dtype,
                         name="mask_out")(x)
        masks = nn.sigmoid(masks.astype(jnp.float32))
        masks = masks.reshape(*mag.shape[:2], c.n_spk, n_bins)
        masks = jnp.moveaxis(masks, 2, 1)  # [B, n_spk, T, F]
        est_re = masks * re[:, None]
        est_im = masks * im[:, None]
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        est = est.reshape(b, s, -1)
        return est, flens

    def _separate_external(self, speech_mix, speech_lengths):
        """Bring-your-own separator (asteroid_models.py:11-67 analogue).

        Resolves cfg.external_path "package.module:ClassName" to a flax
        nn.Module class, builds it with (n_spk=..., **external_kwargs) and
        calls it with the raw mixture — so any externally installed
        JAX/flax separation model plugs into the enh task (training,
        decoding, checkpointing) without a wrapper class per model.
        """
        import importlib
        c = self.cfg
        if ":" not in c.external_path:
            raise ValueError(
                "external separator needs external_path='module:Class', "
                f"got {c.external_path!r}")
        mod_name, cls_name = c.external_path.split(":", 1)
        cls = getattr(importlib.import_module(mod_name), cls_name)
        sep = cls(n_spk=c.n_spk, **dict(c.external_kwargs), name="external")
        return sep(speech_mix, speech_lengths)

    def _separate_tasnet(self, speech_mix, speech_lengths):
        """Time-domain path: conv filterbank -> TCN/DPRNN masks -> deconv."""
        from .separators import (ConvDecoder, ConvEncoder, DPRNNSeparator,
                                 DPTNetSeparator, SkiMSeparator,
                                 TCNSeparator)
        c = self.cfg
        enc = ConvEncoder(c.encoder_channels, c.encoder_kernel,
                          c.encoder_stride, c.jax_dtype, name="encoder")
        feats, flens = enc(speech_mix, speech_lengths)   # [B, K, N]
        if c.separator == "tcn":
            sep = TCNSeparator(
                c.encoder_channels, c.n_spk, c.bottleneck, c.hidden,
                c.tcn_kernel, c.tcn_blocks, c.tcn_repeats,
                mask_nonlinear=c.mask_nonlinear, dtype=c.jax_dtype,
                name="separator")
        elif c.separator == "dptnet":
            sep = DPTNetSeparator(
                c.encoder_channels, c.n_spk, c.n_head, c.hidden,
                c.num_layers, c.segment_size, c.mask_nonlinear,
                c.jax_dtype, name="separator")
        elif c.separator == "skim":
            sep = SkiMSeparator(
                c.encoder_channels, c.n_spk, c.hidden, c.num_layers,
                c.segment_size, c.skim_causal, c.mask_nonlinear,
                c.jax_dtype, name="separator")
        else:
            sep = DPRNNSeparator(
                c.encoder_channels, c.n_spk, c.hidden, c.num_layers,
                c.segment_size, c.mask_nonlinear, c.jax_dtype,
                name="separator")
        masks = sep(feats)                               # [B, S, K, N]
        masked = masks * feats[:, None]
        b, s, k, n = masked.shape
        dec = ConvDecoder(c.encoder_kernel, c.encoder_stride, c.jax_dtype,
                          name="decoder")
        est = dec(masked.reshape(b * s, k, n)).reshape(b, s, -1)
        return est, flens

    def _separate_svoice(self, speech_mix):
        """SVoice: returns the list of per-MulCat-layer [B, spk, T]
        estimates (multi-scale; svoice_separator.py:151-190)."""
        from .extra_separators import SVoiceSeparator
        c = self.cfg
        sep = SVoiceSeparator(
            n_spk=c.n_spk, enc_dim=c.encoder_channels,
            kernel=c.encoder_kernel, hidden=c.hidden,
            n_layers=c.num_layers, segment_size=c.segment_size,
            dtype=c.jax_dtype, name="separator")
        return sep(speech_mix)

    def _separate_dpcl_e2e(self, speech_mix, speech_lengths):
        """DPCL-E2E: soft-kmeans masks refined by an enhancement BLSTM,
        applied to the magnitude with mixture phase."""
        from .extra_separators import DPCLE2ESeparator
        c = self.cfg
        spec = stft(speech_mix, n_fft=c.n_fft, hop_length=c.hop_length)
        re, im = spec[..., 0], spec[..., 1]
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        mag = jnp.sqrt(re**2 + im**2 + 1e-8)
        sep = DPCLE2ESeparator(
            n_bins=mag.shape[-1], n_spk=c.n_spk, emb_dim=c.dpcl_emb_dim,
            hidden=c.hidden, n_layers=c.num_layers, dtype=c.jax_dtype,
            name="separator")
        masks = sep(mag)                             # [B, spk, T, F]
        est_re = masks * re[:, None]
        est_im = masks * im[:, None]
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        return est.reshape(b, s, -1), flens

    def _separate_dc_crn(self, speech_mix, speech_lengths):
        """DC-CRN complex masking path."""
        from .extra_separators import DCCRNSeparatorDC
        c = self.cfg
        spec = stft(speech_mix, n_fft=c.n_fft, hop_length=c.hop_length)
        re, im = spec[..., 0], spec[..., 1]
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        sep = DCCRNSeparatorDC(
            n_spk=c.n_spk, channels=(2,) + tuple(c.dccrn_kernel_num),
            glstm_layers=c.dccrn_rnn_layers, dtype=c.jax_dtype,
            name="separator")
        est_re, est_im = sep(re, im)
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        return est.reshape(b, s, -1), flens

    def _separate_ineube(self, speech_mix, speech_lengths):
        """iNeuBe: DNN1 complex mapping -> mfMCWF toward the estimate ->
        DNN2 refinement (ineube_separator.py). speech_mix [B, N] mono or
        [B, N, C] multichannel."""
        from .ineube import TCNDenseUNet, mfmcwf
        c = self.cfg
        if speech_mix.ndim == 2:
            speech_mix = speech_mix[..., None]
        b, n, mics = speech_mix.shape
        wavs = jnp.moveaxis(speech_mix, 2, 1).reshape(b * mics, n)
        spec = stft(wavs, n_fft=c.n_fft, hop_length=c.hop_length)
        t, f = spec.shape[1], spec.shape[2]
        spec = spec.reshape(b, mics, t, f, 2)
        tf_rep = jnp.moveaxis(spec, 1, 2)              # [B, T, C, F, 2]
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        dnn1 = TCNDenseUNet(
            n_spk=c.n_spk, mic_channels=mics, hid_ch=c.hidden // 8 or 8,
            hid_ch_dense=c.hidden // 16 or 4,
            tcn_repeats=c.ineube_tcn_repeats,
            tcn_blocks=c.ineube_tcn_blocks,
            tcn_channels=c.ineube_tcn_channels, dtype=c.jax_dtype,
            name="dnn1")
        est1 = dnn1(tf_rep)                            # [B, S, T, F, 2]
        est = est1
        if c.ineube_output_from in ("mfmcwf", "dnn2"):
            mix_btcf = jnp.moveaxis(spec, 1, 2)        # [B, T, C, F, 2]
            outs = []
            for s in range(c.n_spk):
                fr, fi = mfmcwf(mix_btcf[..., 0], mix_btcf[..., 1],
                                est1[:, s, ..., 0], est1[:, s, ..., 1],
                                n_chunks=c.ineube_n_chunks,
                                tik_eps=c.ineube_tik_eps)
                outs.append(jnp.stack([fr, fi], -1))
            est = jnp.stack(outs, 1)                   # [B, S, T, F, 2]
            if c.ineube_output_from == "dnn2":
                # DNN2 refines from (all mic channels, DNN1 estimate,
                # mfMCWF estimate) = mics + 2 input channels, matching
                # ineube_separator.py:238-247.
                dnn2 = TCNDenseUNet(
                    n_spk=1, mic_channels=mics + 2,
                    hid_ch=c.hidden // 8 or 8,
                    hid_ch_dense=c.hidden // 16 or 4,
                    tcn_repeats=c.ineube_tcn_repeats,
                    tcn_blocks=c.ineube_tcn_blocks,
                    tcn_channels=c.ineube_tcn_channels,
                    dtype=c.jax_dtype, name="dnn2")
                outs2 = []
                for s in range(c.n_spk):
                    inp = jnp.concatenate(
                        [tf_rep, est1[:, s][:, :, None],
                         est[:, s][:, :, None]], axis=2)  # [B,T,mics+2,F,2]
                    outs2.append(dnn2(inp)[:, 0])
                est = jnp.stack(outs2, 1)
        bsz, s_, t_, f_, _ = est.shape
        wav = istft((est[..., 0] + 1j * est[..., 1]).reshape(bsz * s_,
                                                             t_, f_),
                    n_fft=c.n_fft, hop=c.hop_length)
        return wav.reshape(bsz, s_, -1).astype(jnp.float32), flens

    def _separate_dccrn(self, speech_mix, speech_lengths):
        """Complex-domain path: STFT -> DCCRN complex masks -> iSTFT."""
        from .dccrn import DCCRNSeparator
        c = self.cfg
        spec = stft(speech_mix, n_fft=c.n_fft, hop_length=c.hop_length)
        re, im = spec[..., 0], spec[..., 1]          # [B, T, F]
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        sep = DCCRNSeparator(
            c.n_spk, c.dccrn_kernel_num, c.hidden, c.dccrn_rnn_layers,
            dtype=c.jax_dtype, name="separator")
        est_re, est_im = sep(re, im)                 # [B, S, T, F]
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        return est.reshape(b, s, -1), flens

    def _dpcl_embed(self, speech_mix, speech_lengths):
        """Shared STFT + embedding trunk for the deep-clustering paths."""
        from .separators import DPCLEmbedder
        c = self.cfg
        spec = stft(speech_mix, n_fft=c.n_fft, hop_length=c.hop_length)
        re, im = spec[..., 0], spec[..., 1]
        flens = stft_out_lengths(speech_lengths, c.n_fft, c.hop_length)
        mag = jnp.sqrt(re**2 + im**2 + 1e-8)
        emb = DPCLEmbedder(mag.shape[-1], c.dpcl_emb_dim, c.hidden,
                           c.num_layers, c.jax_dtype,
                           name="separator")(jnp.log(mag + 1e-8))
        return emb, (re, im), flens

    def _separate_dpcl(self, speech_mix, speech_lengths):
        """Inference path: k-means over TF embeddings -> binary masks."""
        from .separators import kmeans_masks
        from ..ops.masks import length_mask
        c = self.cfg
        emb, (re, im), flens = self._dpcl_embed(speech_mix, speech_lengths)
        valid = length_mask(flens, re.shape[1])
        masks = kmeans_masks(emb, c.n_spk, valid)       # [B, S, T, F]
        est_re = masks * re[:, None]
        est_im = masks * im[:, None]
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        return est.reshape(b, s, -1), flens

    def _separate_dan(self, speech_mix, speech_lengths):
        """DAN inference (dan_separator.py): k-means attractors -> soft
        masks via embedding-attractor softmax -> iSTFT."""
        from .separators import attractor_masks, kmeans_centers
        from ..ops.masks import length_mask
        c = self.cfg
        emb, (re, im), flens = self._dpcl_embed(speech_mix, speech_lengths)
        valid = length_mask(flens, re.shape[1])
        attractors = kmeans_centers(emb, c.n_spk, valid)
        masks = attractor_masks(emb, attractors)        # [B, S, T, F]
        est_re = masks * re[:, None]
        est_im = masks * im[:, None]
        b, s, t, f = est_re.shape
        est = istft((est_re + 1j * est_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        return est.reshape(b, s, -1), flens

    def _separate_fasnet(self, speech_mix, speech_lengths):
        """Multichannel time-domain path: [B, N, C] -> filter-and-sum wavs
        (fasnet_separator.py analogue; fixed-geometry array)."""
        from .fasnet import FaSNetTAC
        c = self.cfg
        fasnet = FaSNetTAC(
            n_spk=c.n_spk, enc_dim=c.encoder_channels,
            feature_dim=c.bottleneck, hidden=c.hidden,
            n_layers=c.num_layers, segment_size=c.segment_size,
            window=c.fasnet_window, context=c.fasnet_context,
            dtype=c.jax_dtype, name="fasnet")
        est = fasnet(jnp.moveaxis(speech_mix, 2, 1))     # [B, n_spk, T]
        return est, speech_lengths

    def _separate_beamformer(self, speech_mix, speech_lengths):
        """Multichannel MVDR path: [B, N, C] -> n_spk beamformed wavs."""
        from .beamformer import NeuralBeamformer
        c = self.cfg
        bf = NeuralBeamformer(
            c.n_spk, c.n_fft, c.hop_length, c.hidden, c.num_layers,
            c.ref_channel, use_wpe=c.use_wpe, dtype=c.jax_dtype,
            name="beamformer")
        (spec_re, spec_im), flens = bf(speech_mix, speech_lengths)
        b, s, t, f = spec_re.shape
        est = istft((spec_re + 1j * spec_im).reshape(b * s, t, f),
                    n_fft=c.n_fft, hop=c.hop_length)
        return est.reshape(b, s, -1), flens

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref, *,
                 train=False):
        """speech_ref: [B, n_spk, N]. Returns (loss, stats) with PIT SI-SNR
        (deep clustering trains on the TF affinity loss instead — k-means
        masking is not differentiable)."""
        c = self.cfg
        if c.separator in ("dpcl", "dan"):
            from ..ops.masks import length_mask
            from .losses import dpcl_loss
            emb, (re, im), flens = self.separate(
                speech_mix, speech_mix_lengths, return_embedding=True)
            n = min(speech_mix.shape[-1], speech_ref.shape[-1])
            b, s, _ = speech_ref.shape
            rspec = stft(speech_ref[..., :n].reshape(b * s, n),
                         n_fft=c.n_fft, hop_length=c.hop_length)
            rmag = jnp.sqrt(rspec[..., 0]**2 + rspec[..., 1]**2 + 1e-8)
            rmag = rmag.reshape(b, s, *rmag.shape[1:])[:, :, :re.shape[1]]
            valid = length_mask(flens, re.shape[1])
            if c.separator == "dpcl":
                loss = jnp.mean(dpcl_loss(emb, rmag, valid))
                return loss, {"loss": loss, "dpcl_loss": loss}
            # DAN: oracle attractors from the dominant-speaker labels
            # (dan_separator.py:109-129), soft masks, masked SI-SNR —
            # differentiable end-to-end, no permutation (attractors carry
            # the reference order).
            import jax as _jax
            from .separators import attractor_masks
            lab = jnp.argmax(rmag, axis=1)                  # [B, T, F]
            y = _jax.nn.one_hot(lab, s)                     # [B, T, F, S]
            y = y * valid[..., None, None].astype(y.dtype)[:, :y.shape[1]]
            v_y = jnp.einsum("btfd,btfs->bsd", emb, y)
            cnt = jnp.maximum(jnp.einsum("btfs->bs", y), 1.0)
            attractors = v_y / cnt[..., None]
            masks = attractor_masks(emb, attractors)        # [B, S, T, F]
            est_re = masks * re[:, None]
            est_im = masks * im[:, None]
            bt, st_, t_, f_ = est_re.shape
            est = istft((est_re + 1j * est_im).reshape(bt * st_, t_, f_),
                        n_fft=c.n_fft, hop=c.hop_length).reshape(bt, st_, -1)
            m = min(est.shape[-1], n)
            lens = jnp.minimum(speech_mix_lengths, m)
            loss_b = si_snr_loss(est[..., :m].reshape(bt * st_, -1),
                                 speech_ref[..., :m].reshape(bt * st_, -1),
                                 jnp.repeat(lens, st_))
            loss = jnp.mean(loss_b)
            return loss, {"loss": loss, "si_snr": -loss}
        if c.separator == "svoice":
            # Multi-scale loss: average the PIT SI-SNR over every MulCat
            # layer's decoded estimate (svoice training semantics,
            # svoice_separator.py:176-184 `if self.training: outputs.append`).
            ests = self.separate(speech_mix, speech_mix_lengths,
                                 multi_scale=True)
            total = 0.0
            for est in ests:
                n = min(est.shape[-1], speech_ref.shape[-1])
                lengths = jnp.minimum(speech_mix_lengths, n)
                loss_b, _ = pit_wrapper(
                    lambda e, r: si_snr_loss(e, r, lengths),
                    est[..., :n], speech_ref[..., :n])
                total = total + jnp.mean(loss_b)
            loss = total / len(ests)
            return loss, {"loss": loss, "si_snr": -loss}
        est, _ = self.separate(speech_mix, speech_mix_lengths)
        n = min(est.shape[-1], speech_ref.shape[-1])
        lengths = jnp.minimum(speech_mix_lengths, n)
        loss_b, perm = pit_wrapper(
            lambda e, r: si_snr_loss(e, r, lengths),
            est[..., :n], speech_ref[..., :n])
        loss = jnp.mean(loss_b)
        return loss, {"loss": loss, "si_snr": -loss}
