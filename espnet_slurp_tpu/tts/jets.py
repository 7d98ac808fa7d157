"""JETS: jointly-trained FastSpeech2 + HiFiGAN end-to-end TTS.

Parity target: reference espnet2/gan_tts/jets/ (generator.py JETSGenerator,
alignments.py AlignmentModule/viterbi_decode/average_by_duration, loss.py
ForwardSumLoss/VarianceLoss, jets.py training wrapper).

TPU redesign notes:
- The reference's numba monotonic-alignment kernel (alignments.py:64-93,
  a host round trip per example) is replaced by the in-jit lax.scan MAS
  shared with VITS (tts/vits.py monotonic_alignment_search) — durations,
  the binarization loss, and token-averaged pitch/energy are all einsums
  over the one-hot alignment, batched over B.
- ForwardSumLoss (loss.py:22-87, torch CTC over the attention) is a plain
  monotonic forward recursion (stay-or-advance lattice) as one lax.scan —
  no blank/CTC machinery needed for a strictly monotonic alignment.
- Frame-level pitch comes from the in-jit autocorrelation tracker
  (ops/pitch.py) instead of host-side pyworld DIO; energy is the frame
  log-mel magnitude. Both are extracted inside the jitted train step.
- Waveform decoding reuses the in-framework HiFiGAN generator on random
  latent windows (same slicing as VITS), trained adversarially with the
  shared MPD/MSD discriminators and mel/FM losses.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.frontend import FrontendConfig, default_frontend
from ..ops.masks import length_mask
from ..ops.pitch import autocorr_f0
from .fastspeech2 import FFTBlock, VariancePredictor, length_regulate
from .hifigan import (HiFiGANConfig, HiFiGANDiscriminator, HiFiGANGenerator,
                      discriminator_adv_loss, feature_matching_loss,
                      generator_adv_loss, mel_l1_loss)
from .vits import monotonic_alignment_search, rand_slice, slice_wav


@dataclasses.dataclass(frozen=True)
class JETSConfig:
    vocab_size: int = 100
    d_model: int = 256           # adim
    n_head: int = 2
    d_ff: int = 1024
    enc_blocks: int = 4
    dec_blocks: int = 4
    conv_kernel: int = 9
    var_kernel: int = 3
    var_channels: int = 256
    var_layers: int = 2
    pitch_embed_kernel: int = 9
    segment_size: int = 32       # frames per adversarial window
    sample_rate: int = 16000
    f0min: float = 70.0
    f0max: float = 400.0
    dropout_rate: float = 0.1
    max_frames: int = 1000
    frontend: FrontendConfig = FrontendConfig()
    hifigan: HiFiGANConfig = HiFiGANConfig(
        in_channels=256, upsample_rates=(4, 4, 4, 2),
        upsample_kernels=(8, 8, 8, 4))
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def n_mels(self) -> int:
        return self.frontend.n_mels

    @property
    def hop_length(self) -> int:
        return self.frontend.hop_length


class AlignmentModule(nn.Module):
    """Text/feature distance attention (alignments.py:11-60).

    log_p_attn[b, f, l] = log_softmax_l(-||q_f - k_l||).
    """
    adim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_h, feats, text_mask):
        t = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                    name="t_conv1")(text_h)
        t = nn.Conv(self.adim, (1,), dtype=self.dtype,
                    name="t_conv2")(nn.relu(t))
        f = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                    name="f_conv1")(feats.astype(self.dtype))
        f = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                    name="f_conv2")(nn.relu(f))
        f = nn.Conv(self.adim, (1,), dtype=self.dtype,
                    name="f_conv3")(nn.relu(f))
        # ||q - k||^2 expanded to einsums (no [B, F, L, C] temporary).
        t32, f32 = t.astype(jnp.float32), f.astype(jnp.float32)
        sq = jnp.sum(f32 ** 2, -1)[:, :, None] \
            + jnp.sum(t32 ** 2, -1)[:, None, :] \
            - 2.0 * jnp.einsum("bfc,blc->bfl", f32, t32)
        score = -jnp.sqrt(jnp.maximum(sq, 1e-8))
        score = jnp.where(text_mask[:, None, :], score, -1e30)
        return jax.nn.log_softmax(score, axis=-1)            # [B, F, L]


def forward_sum_loss(log_p_attn, text_lengths, feats_lengths):
    """-log sum over monotonic alignments (loss.py ForwardSumLoss).

    alpha[f, l] = log_p_attn[f, l] + LSE(alpha[f-1, l], alpha[f-1, l-1]);
    loss = -alpha[F_b-1, L_b-1] / F_b averaged over the batch.
    """
    b, f_max, l_max = log_p_attn.shape
    neg = jnp.float32(-1e30)
    lp = log_p_attn.astype(jnp.float32)
    a0 = jnp.where(jnp.arange(l_max)[None] == 0, lp[:, 0], neg)

    def step(alpha, lp_f):
        shifted = jnp.pad(alpha, ((0, 0), (1, 0)),
                          constant_values=neg)[:, :l_max]
        alpha_new = lp_f + jnp.logaddexp(alpha, shifted)
        return alpha_new, alpha_new

    _, alphas = jax.lax.scan(step, a0, jnp.swapaxes(lp, 0, 1)[1:])
    alphas = jnp.concatenate([a0[None], alphas], 0)          # [F, B, L]
    last = alphas[feats_lengths - 1, jnp.arange(b)]          # [B, L]
    ll = jnp.take_along_axis(last, (text_lengths - 1)[:, None], 1)[:, 0]
    return -jnp.mean(ll / jnp.maximum(feats_lengths, 1).astype(jnp.float32))


def average_by_duration(attn, xs, feat_mask):
    """Token-average frame features via the one-hot alignment
    (alignments.py:128-146). attn [B, F, L], xs [B, F] -> [B, L]."""
    w = attn * feat_mask[..., None]
    num = jnp.einsum("bfl,bf->bl", w, xs)
    den = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    return num / den


class JETSGenerator(nn.Module):
    """FS2 text encoder + learned alignment + variance adaptor + FFT
    decoder + HiFiGAN waveform head (generator.py JETSGenerator)."""
    cfg: JETSConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.jax_dtype)
        self.enc_blocks_ = [FFTBlock(c.d_model, c.n_head, c.d_ff,
                                     c.conv_kernel, c.jax_dtype,
                                     name=f"enc_{i}")
                            for i in range(c.enc_blocks)]
        self.dec_blocks_ = [FFTBlock(c.d_model, c.n_head, c.d_ff,
                                     c.conv_kernel, c.jax_dtype,
                                     name=f"dec_{i}")
                            for i in range(c.dec_blocks)]
        vp = lambda name: VariancePredictor(c.var_channels, c.var_kernel,
                                            c.var_layers, c.jax_dtype,
                                            name=name)
        self.duration_predictor = vp("duration_predictor")
        self.pitch_predictor = vp("pitch_predictor")
        self.energy_predictor = vp("energy_predictor")
        self.pitch_embed = nn.Conv(c.d_model, (c.pitch_embed_kernel,),
                                   padding="SAME", dtype=c.jax_dtype,
                                   name="pitch_embed")
        self.energy_embed = nn.Conv(c.d_model, (c.pitch_embed_kernel,),
                                    padding="SAME", dtype=c.jax_dtype,
                                    name="energy_embed")
        self.alignment = AlignmentModule(c.d_model, c.jax_dtype,
                                         name="alignment")
        self.decoder_out = HiFiGANGenerator(c.hifigan, name="generator")

    def _encode(self, text, text_lengths, deterministic):
        from ..models.embedding import abs_positional_encoding
        from ..ops.masks import attention_bias
        x = abs_positional_encoding(self.embed(text), scale=True)
        mask = length_mask(text_lengths, text.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.enc_blocks_:
            x = blk(x, bias, mask, deterministic)
        return x, mask

    def _decode(self, frames, frame_lengths, deterministic):
        from ..models.embedding import abs_positional_encoding
        from ..ops.masks import attention_bias
        x = abs_positional_encoding(frames, scale=False)
        mask = length_mask(frame_lengths, frames.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        for blk in self.dec_blocks_:
            x = blk(x, bias, mask, deterministic)
        return x, mask

    def __call__(self, text, text_lengths, feats, feats_lengths,
                 pitch_frames, rng, deterministic=True):
        """Training forward -> (wav_seg [B, seg*hop], starts, aux losses).

        feats: [B, F, n_mels] log-mel; pitch_frames: [B, F] log-f0.
        """
        c = self.cfg
        hs, tmask = self._encode(text, text_lengths, deterministic)
        fmask = length_mask(feats_lengths, feats.shape[1])

        log_p_attn = self.alignment(hs, feats, tmask)        # [B, F, L]
        attn = monotonic_alignment_search(
            jax.lax.stop_gradient(
                jnp.where(fmask[..., None], log_p_attn, -1e30)),
            feats_lengths, text_lengths)
        ds = jnp.sum(attn * fmask[..., None], axis=1)        # [B, L] float
        ds_int = ds.astype(jnp.int32)
        # binarization loss: pull soft attention toward the viterbi path
        denom = jnp.maximum(jnp.sum(feats_lengths), 1).astype(jnp.float32)
        bin_loss = -jnp.sum(attn * log_p_attn
                            * fmask[..., None]) / denom
        fs_loss = forward_sum_loss(log_p_attn, text_lengths, feats_lengths)

        # token-level targets from frame-level trackers
        energy_frames = jnp.log(
            jnp.maximum(jnp.mean(jnp.exp(feats), axis=-1), 1e-8))
        ps = average_by_duration(attn, pitch_frames, fmask)  # [B, L]
        es = average_by_duration(attn, energy_frames, fmask)

        d_pred = self.duration_predictor(hs, tmask)
        p_pred = self.pitch_predictor(hs, tmask)
        e_pred = self.energy_predictor(hs, tmask)
        tdenom = jnp.maximum(jnp.sum(tmask), 1.0)
        d_tgt = jnp.log1p(ds)
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - d_tgt) ** 2, 0.0)) \
            / tdenom
        pitch_loss = jnp.sum(jnp.where(tmask, (p_pred - ps) ** 2, 0.0)) \
            / tdenom
        energy_loss = jnp.sum(jnp.where(tmask, (e_pred - es) ** 2, 0.0)) \
            / tdenom

        # teacher-forced variance embedding + upsample + decode
        hs = hs + self.pitch_embed(ps[..., None].astype(hs.dtype))
        hs = hs + self.energy_embed(es[..., None].astype(hs.dtype))
        frames, total = length_regulate(hs, ds_int, feats.shape[1])
        zs, _ = self._decode(frames, jnp.minimum(total, feats.shape[1]),
                             deterministic)
        z_seg, starts = rand_slice(rng, zs, feats_lengths, c.segment_size)
        wav_seg = self.decoder_out(z_seg)
        aux = {"dur_loss": dur_loss, "pitch_loss": pitch_loss,
               "energy_loss": energy_loss, "forwardsum_loss": fs_loss,
               "bin_loss": bin_loss}
        return wav_seg, starts, aux

    def infer(self, text, text_lengths, speed: float = 1.0,
              max_frames: int = 0):
        """Text -> (wav [B, N], sample lengths) (generator.py inference)."""
        c = self.cfg
        mf = max_frames or c.max_frames
        hs, tmask = self._encode(text, text_lengths, True)
        d_pred = self.duration_predictor(hs, tmask)
        durations = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(tmask, jnp.maximum(durations, 1), 0)
        p_pred = self.pitch_predictor(hs, tmask)
        e_pred = self.energy_predictor(hs, tmask)
        hs = hs + self.pitch_embed(p_pred[..., None].astype(hs.dtype))
        hs = hs + self.energy_embed(e_pred[..., None].astype(hs.dtype))
        frames, total = length_regulate(hs, durations, mf)
        total = jnp.minimum(total, mf)
        zs, fmask = self._decode(frames, total, True)
        wav = self.decoder_out(zs * fmask[..., None].astype(zs.dtype))
        return wav, total * c.hop_length


def jets_features(wav, wav_lengths, cfg: JETSConfig):
    """Waveform -> (log-mel [B, F, n_mels], frame lens, log-f0 [B, F])."""
    feats, flens = default_frontend(wav, wav_lengths, cfg.frontend)
    lf0 = autocorr_f0(wav, wav_lengths, fs=cfg.sample_rate,
                      frame_length=cfg.frontend.n_fft,
                      hop=cfg.hop_length, f0min=cfg.f0min, f0max=cfg.f0max)
    f = min(feats.shape[1], lf0.shape[1])
    return feats[:, :f], jnp.minimum(flens, f), lf0[:, :f]


def make_jets_train_step(gen: JETSGenerator, disc: HiFiGANDiscriminator,
                         gen_tx, disc_tx, cfg: JETSConfig,
                         lambda_mel: float = 45.0, lambda_fm: float = 2.0,
                         lambda_var: float = 1.0, lambda_align: float = 2.0):
    """Jitted alternating GAN update (jets.py:330-520 loss composition)."""
    from ..train.gan_trainer import GANTrainState
    import optax

    def step(state: GANTrainState, batch: Dict[str, jnp.ndarray]):
        rng, gen_rng = jax.random.split(state.rng)
        wav = batch["speech"]
        feats, flens, lf0 = jets_features(wav, batch["speech_lengths"], cfg)

        def gen_forward(gp, rng_):
            return gen.apply({"params": gp}, batch["text"],
                             batch["text_lengths"], feats, flens, lf0, rng_,
                             deterministic=False,
                             rngs={"dropout": jax.random.fold_in(rng_, 1)})

        fake_seg, starts, _ = jax.tree.map(
            jax.lax.stop_gradient, gen_forward(state.gen_params, gen_rng))
        real_seg = slice_wav(wav, starts, cfg.segment_size, cfg.hop_length)

        def d_loss(dp):
            real_outs = disc.apply({"params": dp}, real_seg)
            fake_outs = disc.apply({"params": dp}, fake_seg)
            return discriminator_adv_loss(real_outs, fake_outs)

        dl, d_grads = jax.value_and_grad(d_loss)(state.disc_params)
        d_up, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                        state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_up)

        def g_loss(gp):
            fake, st, aux = gen_forward(gp, gen_rng)
            real = slice_wav(wav, st, cfg.segment_size, cfg.hop_length)
            fake_outs = disc.apply({"params": disc_params}, fake)
            real_outs = jax.tree.map(
                jax.lax.stop_gradient,
                disc.apply({"params": disc_params}, real))
            adv = generator_adv_loss(fake_outs)
            fm = feature_matching_loss(real_outs, fake_outs)
            mel = mel_l1_loss(fake, real, cfg.frontend.n_fft,
                              cfg.hop_length, cfg.n_mels, cfg.sample_rate)
            var = aux["dur_loss"] + aux["pitch_loss"] + aux["energy_loss"]
            align = aux["forwardsum_loss"] + aux["bin_loss"]
            loss = adv + lambda_fm * fm + lambda_mel * mel \
                + lambda_var * var + lambda_align * align
            return loss, {"adv_loss": adv, "fm_loss": fm, "mel_loss": mel,
                          **aux}

        (gl, gstats), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(state.gen_params)
        g_up, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                      state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_up)
        stats = dict(gstats)
        stats["disc_loss"] = dl
        stats["gen_loss"] = gl
        return state.replace(step=state.step + 1, gen_params=gen_params,
                             disc_params=disc_params, gen_opt=gen_opt,
                             disc_opt=disc_opt, rng=rng), stats

    return jax.jit(step)
