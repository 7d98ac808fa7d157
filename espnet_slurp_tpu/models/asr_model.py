"""Hybrid CTC/attention ASR model — the flagship task model.

Parity target: reference espnet2/asr/espnet_model.py:169-377 (ESPnetASRModel:
frontend -> specaug -> normalize -> encoder -> {CTC branch, attention decoder
branch}; loss = ctc_weight*ctc + (1-ctc_weight)*att_label_smoothed_CE;
optional intermediate CTC). Here the frontend/augment/normalize stages are
pure jittable functions living inside the same compiled train step, so raw
waveforms go device-side once and everything after is fused by XLA.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ctc as ctc_ops
from ..ops.frontend import FrontendConfig, default_frontend
from ..ops.masks import length_mask
from ..ops.normalize import global_mvn, utterance_mvn
from ..ops.specaug import SpecAugConfig, specaug
from .conformer import ConformerEncoder
from .transformer import TransformerDecoder, TransformerEncoder
from .wav2vec2 import Wav2Vec2Config

IGNORE_ID = -1


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    vocab_size: int = 5000
    # conformer | ebranchformer | transformer | longformer |
    # contextual_block_conformer (streaming, block-parallel context carry) |
    # wav2vec2 (raw-waveform SSL encoder, bypasses frontend/specaug/mvn —
    # wav2vec2_encoder.py FairSeqWav2Vec2Encoder analogue)
    encoder: str = "conformer"
    # Precomputed-feature input (asr.sh:472-543 feats_type=fbank/
    # fbank_pitch path): `speech` is a [B, T, D] feature matrix dumped by
    # recipe stage 3; the STFT/log-mel frontend is skipped (reference
    # --frontend none --input_size D). SpecAug/MVN still apply.
    input_feats: bool = False
    # Feature width of the dump (reference --input_size); 0 = frontend
    # n_mels. fbank_pitch dumps are n_mels + 1.
    input_feats_dim: int = 0
    # Externally-dumped SSL features (S3prlFrontend analogue,
    # espnet2/asr/frontend/s3prl.py): > 0 means `speech` is a
    # [B, T, ssl_num_layers, D] multi-layer hidden-state dump
    # (bin/ssl_dump.py) collapsed by a learned softmax layer weighting —
    # the s3prl Featurizer. Requires input_feats=True; pair with
    # preencoder="linear" for a projection to the encoder width.
    ssl_num_layers: int = 0
    # Longformer sliding-window half-width (frames after x4 subsampling).
    attention_window: int = 64
    # Contextual-block encoder geometry (contextual_block_conformer_encoder
    # block_size/hop_size/look_ahead, in post-subsampling frames).
    block_size: int = 40
    hop_size: int = 16
    look_ahead: int = 16
    # transformer | rnn (LAS, location-aware) | lightweight_conv |
    # lightweight_conv2d | dynamic_conv | dynamic_conv2d (conv-attention
    # decoders, transformer_decoder.py:283-528 / models/lightconv.py)
    decoder: str = "transformer"
    decoder_conv_wshare: int = 4
    decoder_conv_kernel: int = 11
    decoder_conv_usebias: bool = False
    rnn_decoder_units: int = 320
    rnn_decoder_layers: int = 1
    # encoder="rnn"/"vgg_rnn" (espnet1 RNNP / VGG2L+RNNP family) options.
    rnn_encoder_units: int = 320
    rnn_encoder_layers: int = 4
    rnn_encoder_subsample: Tuple[int, ...] = (1, 2, 2, 1)
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 2048
    num_encoder_blocks: int = 12
    num_decoder_blocks: int = 6
    decoder_d_ff: int = 2048
    kernel_size: int = 31
    dropout_rate: float = 0.1
    ctc_weight: float = 0.3
    interctc_weight: float = 0.0
    interctc_layers: Tuple[int, ...] = ()
    # InterCTC self-conditioning (conformer_encoder.py:336-358): project the
    # intermediate CTC softmax back into the encoder stream at each tap; the
    # intermediate loss then uses the encoder's shared conditioning head.
    self_conditioning: bool = False
    # Conformer input layer: "conv2d" (subsampling_factor in {2,4,6,8}) or
    # "linear" (no time reduction) — transformer/subsampling.py variants.
    input_layer: str = "conv2d"
    subsampling_factor: int = 4
    # Per-block whole-batch layer drop at train time (conformer
    # stochastic_depth_rate).
    stochastic_depth_rate: float = 0.0
    lsm_weight: float = 0.1
    blank_id: int = 0
    sos: int = -1  # -1 => vocab_size - 1
    eos: int = -1
    use_mvn: str = "utterance"  # "global" | "utterance" | "none"
    chunk_size: int = 0      # >0: streaming chunk attention (frames after x4)
    left_chunks: int = -1
    remat_encoder: bool = False
    # Fused rel-pos flash attention: "auto" (TPU only) | "on" | "off".
    flash_attention: str = "auto"
    # Routed mixture-of-experts FFNs in the conformer encoder (models/
    # moe.py; expert-parallel over the mesh's "expert" axis). New
    # capability beyond the reference (SURVEY §2.10 parallelism goals).
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01  # Switch load-balance loss weight
    # Multi-speaker PIT (pit_espnet_model.py num_inf/num_ref): >= 2 selects
    # PITASRModel (models/pit_asr.py) with this many speaker streams.
    num_ref: int = 1
    pit_branch_blocks: int = 2
    wav2vec2: Optional[Wav2Vec2Config] = None  # encoder="wav2vec2" opts
    # Pre-encoder between normalize and encoder (espnet2/asr/preencoder/):
    # "" (none) | "sinc" (LightweightSincConvs over sliding-window frames,
    # set frontend.type="sliding_window") | "linear" (projection).
    preencoder: str = ""
    preencoder_dim: int = 256     # sinc out_channels / linear output size
    preencoder_scale: str = "mel"  # sinc filter init: mel | bark
    # Multichannel front-end enhancement (reference DefaultFrontend
    # use_wpe/use_beamformer, espnet/nets/pytorch_backend/frontends/):
    # applied when speech arrives as [B, N, C]. use_beamformer runs the
    # neural MVDR-Souden (enh/beamformer.py, n_spk=1, optional WPE inside);
    # use_wpe alone dereverberates then takes ref_channel.
    use_beamformer: bool = False
    use_wpe: bool = False
    ref_channel: int = 0
    bf_hidden: int = 128
    bf_layers: int = 2
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iters: int = 3
    # Post-encoder over encoder states (espnet2/asr/postencoder/
    # hugging_face_transformers_postencoder.py): "" | "hf_bert".
    postencoder: str = ""
    postencoder_hf_dir: Optional[str] = None  # pretrained HF checkpoint dir
    postencoder_layers: int = 2        # from-scratch geometry (no hf_dir)
    postencoder_hidden: int = 256
    postencoder_heads: int = 4
    postencoder_ff: int = 1024
    postencoder_length_adaptor: int = 0  # x2 conv subsampling layers
    use_tcpgen: bool = False
    tcpgen_gcn_layers: int = 2
    tcpgen_tree_encoder: str = "gcn"  # gcn | gat | sage | treelstm
    tcpgen_smoothprob: float = 1.0
    # > 0 adds an explicit pointer-attention CE at steps where the target
    # is a child of the walk's node (reference calc_ptr_loss att_labs,
    # decoders.py:528-529): trains the tree attention to point correctly
    # even while the generation gate is still closed, which is what keeps
    # the gate from collapsing when biased words are sparse.
    tcpgen_ptr_loss_weight: float = 0.0
    # > 0 additionally supervises the generation gate itself with the
    # oracle labels (BCE toward 1 at target-child steps / 0 at OOKB
    # steps). Extension beyond the reference loss (its oracle,
    # get_oracle_ptrgen e2e_asr.py:349-362, feeds the SLU head instead);
    # useful when biased words are so sparse that the interpolated CE
    # alone cannot keep the gate from closing.
    tcpgen_gate_loss_weight: float = 0.0
    frontend: FrontendConfig = FrontendConfig()
    specaug: Optional[SpecAugConfig] = SpecAugConfig()
    dtype: str = "float32"  # compute dtype: float32 | bfloat16

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1 if self.sos < 0 else self.sos

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1 if self.eos < 0 else self.eos


def add_sos_eos(ys: jnp.ndarray, ys_lengths: jnp.ndarray, sos: int, eos: int,
                ignore_id: int = IGNORE_ID):
    """[B, U] -> (ys_in [B, U+1] with sos prepended, ys_out [B, U+1] with eos
    appended at each example's end, padding = ignore_id in ys_out / eos in ys_in).

    Mirrors add_sos_eos (espnet/nets/pytorch_backend/nets_utils.py) but fully
    vectorized with static shapes.
    """
    b, u = ys.shape
    valid = length_mask(ys_lengths, u)
    ys_clean = jnp.where(valid, ys, 0)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, ys.dtype), jnp.where(valid, ys_clean, eos)], 1)
    pos = jnp.arange(u + 1)[None, :]
    ys_out = jnp.concatenate([ys_clean, jnp.zeros((b, 1), ys.dtype)], 1)
    ys_out = jnp.where(pos < ys_lengths[:, None], ys_out,
                       jnp.where(pos == ys_lengths[:, None], eos, ignore_id))
    return ys_in, ys_out


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float, ignore_id: int = IGNORE_ID,
                         logits_are_logprobs: bool = False):
    """Label-smoothed CE, mean over valid tokens.

    Parity: espnet/nets/pytorch_backend/transformer/label_smoothing_loss.py
    (KLDiv vs uniform-smoothed target, normalized by batch... the reference
    normalizes by number of sequences when normalize_length=False; we use
    token-mean which matches normalize_length=True and is the scale-stable
    choice). Returns (loss, accuracy).
    """
    v = logits.shape[-1]
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    if logits_are_logprobs:
        logp = logits.astype(jnp.float32)
    else:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    # constant offset so perfect prediction -> ~0 (KL form); optional, keeps
    # numbers comparable with the reference's KLDiv loss.
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(jnp.where(valid, loss, 0.0)) / denom
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == tgt) & valid) / denom
    return loss, acc


def build_encoder(c: ASRConfig, name: str = "encoder"):
    """Encoder factory via the plugin registry (ClassChoices analogue)."""
    from ..utils.registry import encoders
    if c.encoder == "conformer":
        return ConformerEncoder(
            c.d_model, c.n_head, c.d_ff, c.num_encoder_blocks,
            c.kernel_size, c.dropout_rate, c.interctc_layers,
            chunk_size=c.chunk_size, left_chunks=c.left_chunks,
            remat=c.remat_encoder, flash=c.flash_attention,
            moe_experts=c.moe_experts, moe_every=c.moe_every,
            moe_capacity_factor=c.moe_capacity_factor,
            input_layer=c.input_layer,
            subsampling_factor=c.subsampling_factor,
            stochastic_depth_rate=c.stochastic_depth_rate,
            self_cond_vocab=c.vocab_size if c.self_conditioning else 0,
            dtype=c.jax_dtype, name=name)
    if c.encoder == "ebranchformer":
        from .branchformer import EBranchformerEncoder
        return EBranchformerEncoder(
            c.d_model, c.n_head, c.d_ff, c.num_encoder_blocks,
            cgmlp_hidden=2 * c.d_ff, kernel_size=c.kernel_size,
            dropout_rate=c.dropout_rate, interctc_layers=c.interctc_layers,
            chunk_size=c.chunk_size, left_chunks=c.left_chunks,
            dtype=c.jax_dtype, name=name)
    if c.encoder == "transformer":
        return TransformerEncoder(
            c.d_model, c.n_head, c.d_ff, c.num_encoder_blocks,
            c.dropout_rate, dtype=c.jax_dtype, name=name)
    if c.encoder == "longformer":
        # Sliding-window conformer (longformer_encoder.py analogue): the
        # band restriction is an additive mask over one dense attention.
        return ConformerEncoder(
            c.d_model, c.n_head, c.d_ff, c.num_encoder_blocks,
            c.kernel_size, c.dropout_rate, c.interctc_layers,
            attention_window=c.attention_window, remat=c.remat_encoder,
            flash="off", dtype=c.jax_dtype, name=name)
    if c.encoder == "wav2vec2":
        from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
        return Wav2Vec2Encoder(c.wav2vec2 or Wav2Vec2Config(), name=name)
    if c.encoder in ("rnn", "vgg_rnn"):
        # espnet1 classic family (rnn/encoders.py RNNP / VGG2L+RNNP).
        from .rnn_encoders import RNNEncoder, VGGRNNEncoder
        cls = VGGRNNEncoder if c.encoder == "vgg_rnn" else RNNEncoder
        kw = {} if c.encoder == "vgg_rnn" else \
            {"subsample": c.rnn_encoder_subsample}
        return cls(d_model=c.d_model, units=c.rnn_encoder_units,
                   num_layers=c.rnn_encoder_layers,
                   dropout_rate=c.dropout_rate, dtype=c.jax_dtype,
                   name=name, **kw)
    if c.encoder == "contextual_block_conformer":
        from .contextual_block import ContextualBlockConformerEncoder
        return ContextualBlockConformerEncoder(
            c.d_model, c.n_head, c.d_ff, c.num_encoder_blocks,
            c.kernel_size, c.dropout_rate, block_size=c.block_size,
            hop_size=c.hop_size, look_ahead=c.look_ahead,
            dtype=c.jax_dtype, name=name)
    # Registered third-party encoders: constructed with the full config.
    if c.encoder in encoders:
        return encoders.get(c.encoder)(c, name=name)
    raise ValueError(
        f"unknown encoder {c.encoder!r}; builtins: conformer, "
        f"ebranchformer, transformer; registered: {encoders.choices()}")


class ASRModel(nn.Module):
    """Encoder + CTC head + attention decoder. Parameters only; the loss
    assembly lives in ``compute_loss`` below so training and inference share
    the same module.
    """
    cfg: ASRConfig

    def setup(self):
        c = self.cfg
        self.encoder = build_encoder(c)
        if c.preencoder == "sinc":
            from .preencoder import LightweightSincConvs
            self.preenc = LightweightSincConvs(
                out_channels=c.preencoder_dim, fs=float(c.frontend.fs),
                scale=c.preencoder_scale, name="preencoder")
        elif c.preencoder == "linear":
            from .preencoder import LinearPreencoder
            self.preenc = LinearPreencoder(output_size=c.preencoder_dim,
                                           name="preencoder")
        if c.use_beamformer:
            from ..enh.beamformer import NeuralBeamformer
            self.beamformer = NeuralBeamformer(
                n_spk=1, n_fft=c.frontend.n_fft,
                hop_length=c.frontend.hop_length, hidden=c.bf_hidden,
                n_layers=c.bf_layers, ref_channel=c.ref_channel,
                use_wpe=c.use_wpe, wpe_taps=c.wpe_taps,
                wpe_delay=c.wpe_delay, wpe_iters=c.wpe_iters,
                dtype=c.jax_dtype, name="beamformer")
        if c.postencoder == "hf_bert":
            from .postencoder import HFTransformersPostencoder
            self.postenc = HFTransformersPostencoder(
                d_model=c.d_model, hidden_size=c.postencoder_hidden,
                num_layers=c.postencoder_layers,
                num_heads=c.postencoder_heads,
                intermediate_size=c.postencoder_ff,
                length_adaptor_n_layers=c.postencoder_length_adaptor,
                hf_dir=c.postencoder_hf_dir, dtype=c.jax_dtype,
                name="postencoder")
        if c.ssl_num_layers > 0:
            self.ssl_layer_weights = self.param(
                "ssl_layer_weights", nn.initializers.zeros,
                (c.ssl_num_layers,))
        self.ctc_proj = nn.Dense(c.vocab_size, dtype=c.jax_dtype, name="ctc")
        if c.decoder == "rnn":
            from .rnn_decoder import RNNDecoder
            self.decoder = RNNDecoder(
                c.vocab_size, c.d_model, units=c.rnn_decoder_units,
                num_layers=c.rnn_decoder_layers, dtype=c.jax_dtype,
                name="decoder")
        else:
            selfattn = {
                "transformer": "selfattn",
                "lightweight_conv": "lightconv",
                "lightweight_conv2d": "lightconv2d",
                "dynamic_conv": "dynamicconv",
                "dynamic_conv2d": "dynamicconv2d",
            }[c.decoder]
            self.decoder = TransformerDecoder(
                c.vocab_size, c.d_model, c.n_head, c.decoder_d_ff,
                c.num_decoder_blocks, c.dropout_rate, dtype=c.jax_dtype,
                selfattn_type=selfattn,
                conv_wshare=c.decoder_conv_wshare,
                conv_kernel=c.decoder_conv_kernel,
                conv_usebias=c.decoder_conv_usebias,
                name="decoder")
        if c.use_tcpgen:
            from .tcpgen import TCPGen
            self.tcpgen = TCPGen(c.d_model, c.vocab_size,
                                 c.tcpgen_gcn_layers, c.dropout_rate,
                                 tree_encoder=c.tcpgen_tree_encoder,
                                 dtype=c.jax_dtype, name="tcpgen")

    def encode(self, speech, speech_lengths, *, train=False, specaug_rng=None,
               mvn_stats=None):
        """Raw waveform -> encoder states. espnet_model.py:319-377 analogue."""
        c = self.cfg
        if c.encoder == "wav2vec2":
            # SSL encoder consumes the raw waveform; no frontend/specaug/mvn
            hs, h_lengths, inter = self.encoder(speech, speech_lengths,
                                                deterministic=not train)
            if c.postencoder:
                hs, h_lengths = self.postenc(hs, h_lengths)
            return hs, h_lengths, inter
        if c.input_feats:
            # Precomputed features (asr.sh feats_type=fbank stage-3 dump):
            # [B, T, D] straight past the frontend.
            feats, feat_lengths = speech.astype(jnp.float32), speech_lengths
            if c.ssl_num_layers > 0:
                # Multi-layer SSL dump [B, T, L, D] -> learned softmax
                # layer weighting (the s3prl Featurizer inside
                # S3prlFrontend, s3prl.py multilayer_feature).
                w = jax.nn.softmax(self.ssl_layer_weights.astype(
                    jnp.float32))
                feats = jnp.einsum("btld,l->btd", feats, w)
        elif speech.ndim == 3:
            # Multichannel [B, N, C]: WPE/MVDR enhancement before log-mel
            # (DefaultFrontend use_wpe/use_beamformer path,
            # frontend/default.py:17-131 + frontends/dnn_{wpe,beamformer}).
            feats, feat_lengths = self._multichannel_frontend(
                speech, speech_lengths)
        else:
            feats, feat_lengths = default_frontend(speech, speech_lengths,
                                                   c.frontend)
        if train and c.specaug is not None and specaug_rng is not None:
            feats = specaug(specaug_rng, feats, feat_lengths, c.specaug)
        if c.use_mvn == "global" and mvn_stats is not None:
            feats = global_mvn(feats, feat_lengths, *mvn_stats)
        elif c.use_mvn == "utterance":
            feats = utterance_mvn(feats, feat_lengths)
        feats = feats.astype(c.jax_dtype)
        if c.preencoder:
            # Pre-encoder stage (abs_task flow: frontend -> specaug ->
            # normalize -> PREENCODER -> encoder).
            feats = self.preenc(feats, deterministic=not train)
        hs, h_lengths, inter = self.encoder(feats, feat_lengths,
                                            deterministic=not train)
        if c.postencoder:
            # Post-encoder stage (encoder -> POSTENCODER -> decoder/CTC).
            hs, h_lengths = self.postenc(hs, h_lengths)
        return hs, h_lengths, inter

    def _multichannel_frontend(self, speech, speech_lengths):
        """[B, N, C] waveforms -> ([B, T, n_mels] log-mel, [B] lengths)."""
        from ..ops.mel import logmel
        from ..ops.stft import stft, stft_out_lengths
        c = self.cfg
        fc = c.frontend
        if c.use_beamformer:
            (re, im), flens = self.beamformer(speech, speech_lengths)
            power = re[:, 0] ** 2 + im[:, 0] ** 2          # [B, T, F]
        else:
            b, n, ch = speech.shape
            wavs = jnp.moveaxis(speech, 2, 1).reshape(b * ch, n)
            spec = stft(wavs, n_fft=fc.n_fft, win_length=fc.win_length,
                        hop_length=fc.hop_length, window=fc.window,
                        center=fc.center)
            t, f = spec.shape[1], spec.shape[2]
            spec = spec.reshape(b, ch, t, f, 2)
            flens = stft_out_lengths(
                speech_lengths, n_fft=fc.n_fft, hop=fc.hop_length,
                center=fc.center)
            if c.use_wpe:
                from ..ops.wpe import wpe_dereverb
                cx = wpe_dereverb(spec[..., 0] + 1j * spec[..., 1],
                                  c.wpe_taps, c.wpe_delay, c.wpe_iters)
                ref = cx[:, c.ref_channel]                 # [B, T, F]
                power = jnp.real(ref) ** 2 + jnp.imag(ref) ** 2
            else:
                ref = spec[:, c.ref_channel]               # [B, T, F, 2]
                power = ref[..., 0] ** 2 + ref[..., 1] ** 2
        feats = logmel(power, flens, fs=fc.fs, n_fft=fc.n_fft,
                       n_mels=fc.n_mels, fmin=fc.fmin, fmax=fc.fmax,
                       htk=fc.htk)
        return feats, flens

    def encode_feats(self, feats, feat_lengths, train=False):
        """Pre-extracted features -> encoder states (for tests/decoding)."""
        return self.encoder(feats.astype(self.cfg.jax_dtype), feat_lengths,
                            deterministic=not train)

    def ctc_logprobs(self, hs):
        return jax.nn.log_softmax(
            self.ctc_proj(hs).astype(jnp.float32), axis=-1)

    def _ctc_loss_mean(self, hs, h_lengths, text, text_lengths):
        """Batch-mean CTC loss from encoder states.

        On TPU (128-aligned width): the fused-head Pallas kernel
        (ops/pallas/ctc_head.py) — projection + logsumexp + label gather
        in VMEM, so the [B, T, V] logits never reach HBM (~4 GB/step at
        the 17x512 config, PERF_NOTES round-3 census). Elsewhere: the
        plain projection + fused-emit path.
        """
        import os
        c = self.cfg
        labels = jnp.maximum(text, 0)
        if (jax.default_backend() == "tpu" and hs.shape[-1] % 128 == 0
                # A/B kill switch for perf attribution (tools/)
                and os.environ.get("ESPNET_TPU_NO_FUSED_CTC_HEAD") != "1"):
            from ..ops.pallas.ctc_head import ctc_loss_pallas_head
            _ = self.ctc_proj(hs[:, :1])  # materialize shared params
            p = self.ctc_proj.variables["params"]
            per = ctc_loss_pallas_head(hs, p["kernel"], p["bias"],
                                       h_lengths, labels, text_lengths,
                                       c.blank_id)
            return jnp.sum(per) / per.shape[0]
        return ctc_ops.ctc_loss_mean_logits(self.ctc_proj(hs), h_lengths,
                                            labels, text_lengths, c.blank_id)

    def decoder_logits(self, ys_in, ys_in_lengths, hs, h_lengths, train=False):
        return self.decoder(ys_in, ys_in_lengths, hs, h_lengths,
                            deterministic=not train)

    def tcpgen_tree_encs(self, trie):
        """Encode trie nodes with the GCN over decoder token embeddings."""
        token_embs = self.decoder.embed(trie["trie_token"])
        return self.tcpgen.encode_tree(token_embs, trie)

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 trie_token=None, trie_children_tok=None,
                 trie_children_node=None, trie_n_children=None, node=None,
                 p_gen_mask=None, ptr_label_mask=None, smoothprob_scale=None,
                 train=False, specaug_rng=None, mvn_stats=None):
        """Full training forward -> (loss, stats dict). espnet_model.py:169-297.

        The trie_*/node/p_gen_mask kwargs are the TCPGen biasing batch
        (slu/kb.py BiasingBatch): a flat trie shared across the batch and the
        host-precomputed teacher-forced walk.
        """
        c = self.cfg
        hs, h_lengths, inter = self.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        stats: Dict[str, jnp.ndarray] = {}
        loss = 0.0
        # Split tagged entries off the interCTC taps (the encoder appends
        # ("moe_aux", scalar) when routed-MoE FFNs are active).
        moe_aux = None
        ctc_taps = []
        for tag, xs in inter:
            if tag == "moe_aux":
                moe_aux = xs
            else:
                ctc_taps.append((tag, xs))
        if moe_aux is not None and c.moe_aux_weight > 0.0:
            stats["loss_moe_aux"] = moe_aux
            loss = loss + c.moe_aux_weight * moe_aux
        if c.ctc_weight > 0.0:
            # Fused gather+logsumexp CTC: no f32 [B,T,V] log-softmax buffer.
            loss_ctc = self._ctc_loss_mean(hs, h_lengths, text, text_lengths)
            stats["loss_ctc"] = loss_ctc
            if c.interctc_weight > 0.0 and ctc_taps:
                inter_loss = 0.0
                for _, xs in ctc_taps:
                    # With self-conditioning the taps already carry the
                    # encoder's shared-head logits (conformer.py sc_ctc).
                    if c.self_conditioning:
                        inter_loss += ctc_ops.ctc_loss_mean_logits(
                            xs, h_lengths, jnp.maximum(text, 0),
                            text_lengths, c.blank_id)
                    else:
                        inter_loss += self._ctc_loss_mean(
                            xs, h_lengths, text, text_lengths)
                inter_loss /= len(ctc_taps)
                stats["loss_interctc"] = inter_loss
                loss_ctc = ((1.0 - c.interctc_weight) * loss_ctc
                            + c.interctc_weight * inter_loss)
            loss = loss + c.ctc_weight * loss_ctc
        if c.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(jnp.maximum(text, 0), text_lengths,
                                        c.sos_id, c.eos_id)
            use_ptr = c.use_tcpgen and trie_token is not None
            if use_ptr:
                from .tcpgen import tcpgen_final_logprobs
                trie = {"trie_token": trie_token,
                        "trie_children_tok": trie_children_tok,
                        "trie_children_node": trie_children_node,
                        "trie_n_children": trie_n_children}
                logits, hidden = self.decoder(
                    ys_in, text_lengths + 1, hs, h_lengths,
                    deterministic=not train, return_hidden=True)
                tree_encs = self.tcpgen_tree_encs(trie)
                ptr_dist, kb_emb = self.tcpgen(hidden, node, trie, tree_encs)
                # Pointer ramp (reference PtrSche / fullepoch scaling,
                # decoders.py:777): the host passes a [0,1] scalar that
                # scales p_gen up over the first epochs so the early-
                # training (noisy) pointer cannot teach the gate shut.
                sp = c.tcpgen_smoothprob
                if smoothprob_scale is not None:
                    sp = sp * smoothprob_scale
                p_gen = self.tcpgen.gen_prob(hidden, kb_emb, p_gen_mask, sp)
                logp = tcpgen_final_logprobs(logits, ptr_dist, p_gen)
                loss_att, acc = label_smoothing_loss(
                    logp, ys_out, c.lsm_weight, logits_are_logprobs=True)
                stats["p_gen"] = jnp.mean(p_gen)
                if ptr_label_mask is not None:
                    # gate openness WHERE POINTING IS CORRECT — the mean
                    # over all steps hides a contextual gate (biased steps
                    # are a few % of the batch).
                    mb = (ptr_label_mask == 1).astype(jnp.float32)
                    stats["p_gen_bias"] = (p_gen * mb).sum() \
                        / jnp.maximum(mb.sum(), 1.0)
                if (c.tcpgen_ptr_loss_weight > 0.0
                        and ptr_label_mask is not None):
                    # att_labs CE (decoders.py:528-529) over live steps:
                    # label 1 -> -log ptr(target child); label 2 -> -log
                    # ptr(OOKB) (slu/kb.py augment). OOKB steps outnumber
                    # child steps; balance the classes so the attention
                    # does not collapse onto the sink.
                    tgt = jnp.clip(ys_out, 0, c.vocab_size - 1)
                    p_child = jnp.take_along_axis(
                        ptr_dist[..., :c.vocab_size], tgt[..., None],
                        axis=-1)[..., 0]
                    p_ookb = ptr_dist[..., c.vocab_size]
                    m1 = (ptr_label_mask == 1).astype(jnp.float32)
                    m2 = (ptr_label_mask == 2).astype(jnp.float32)
                    n1, n2 = m1.sum(), m2.sum()
                    w = m1 + m2 * (n1 / jnp.maximum(n2, 1.0))
                    p_tgt = jnp.where(ptr_label_mask == 1, p_child, p_ookb)
                    loss_ptr = (-jnp.log(p_tgt + 1e-9) * w).sum() \
                        / jnp.maximum(w.sum(), 1.0)
                    stats["loss_ptr"] = loss_ptr
                    loss = loss + c.tcpgen_ptr_loss_weight * loss_ptr
                if (c.tcpgen_gate_loss_weight > 0.0
                        and ptr_label_mask is not None):
                    # oracle-gate BCE (class-balanced): open at pointed
                    # steps, closed at OOKB steps.
                    m1 = (ptr_label_mask == 1).astype(jnp.float32)
                    m2 = (ptr_label_mask == 2).astype(jnp.float32)
                    w = m1 + m2 * (m1.sum() / jnp.maximum(m2.sum(), 1.0))
                    bce = -(m1 * jnp.log(p_gen + 1e-6)
                            + m2 * jnp.log(1.0 - p_gen + 1e-6))
                    loss_gate = (bce * w).sum() / jnp.maximum(w.sum(), 1.0)
                    stats["loss_gate"] = loss_gate
                    # during the PtrSche ramp p_gen is scaled toward 0 by
                    # construction; scale the supervision identically so
                    # the closed-by-schedule gate is not punished.
                    gl_scale = (smoothprob_scale
                                if smoothprob_scale is not None else 1.0)
                    loss = loss + (c.tcpgen_gate_loss_weight * gl_scale
                                   * loss_gate)
            else:
                logits = self.decoder_logits(ys_in, text_lengths + 1, hs,
                                             h_lengths, train=train)
                loss_att, acc = label_smoothing_loss(logits, ys_out,
                                                     c.lsm_weight)
            stats["loss_att"] = loss_att
            stats["acc"] = acc
            loss = loss + (1.0 - c.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats
