"""TTS task: text -> mel (Tacotron2 / FastSpeech2) with on-the-fly targets.

Parity target: reference espnet2/tasks/tts.py (TTSTask, 407 LoC) +
espnet2/bin/tts_inference.py (Text2Speech). Mel targets are extracted by the
shared frontend inside the data path; FastSpeech2 durations come from a
provided `durations` stream (teacher alignments) or uniform fallback.
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.fileio import load_wav, read_2column_text
from ..data.tokenizer import CharTokenizer, TokenIDConverter, build_token_list
from ..ops.frontend import FrontendConfig, default_frontend
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig, build_optimizer
from ..train.reporter import Reporter, SubReporter
from ..train.state import TrainState
from ..tts.fastspeech import FastSpeech, FastSpeechConfig
from ..tts.fastspeech2 import FastSpeech2, FastSpeech2Config
from ..tts.hifigan import (HiFiGANConfig, HiFiGANDiscriminator,
                           HiFiGANGenerator)
from ..tts.jets import JETSConfig, JETSGenerator, make_jets_train_step
from ..tts.melgan import (MelGANConfig, MelGANDiscriminator, MelGANGenerator,
                          ParallelWaveGANConfig,
                          ParallelWaveGANDiscriminator,
                          ParallelWaveGANGenerator, StyleMelGANConfig,
                          StyleMelGANDiscriminator, StyleMelGANGenerator)
from ..tts.tacotron2 import Tacotron2, Tacotron2Config
from ..tts.transformer_tts import TransformerTTS, TransformerTTSConfig
from ..tts.vits import VITSConfig, VITSGenerator, make_vits_train_step
from ..utils.config import from_dict, load_yaml, merge_dicts, save_yaml

log = logging.getLogger("espnet_slurp_tpu")

VOCODER_ARCHS = ("hifigan", "melgan", "style_melgan", "parallel_wavegan")
# Archs whose generator consumes a noise rng stream.
NOISE_VOCODERS = ("style_melgan", "parallel_wavegan")


def assert_hop(rates, hop: int):
    prod = 1
    for r in rates:
        prod *= r
    assert prod == hop, (
        f"vocoder upsample_rates {rates} (prod {prod}) must multiply to the "
        f"frontend hop_length {hop}")


@dataclasses.dataclass(frozen=True)
class TTSDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    batch_size: int = 8
    frontend: FrontendConfig = FrontendConfig()
    mel_bucket_multiple: int = 64
    text_bucket_multiple: int = 8
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class TTSTaskConfig:
    exp_dir: str = "exp/tts"
    # text->mel: tacotron2 | transformer_tts | fastspeech | fastspeech2;
    # e2e text->wav: vits | jets;
    # mel->wav vocoders (gan_tts family): hifigan | melgan | style_melgan.
    arch: str = "tacotron2"
    tacotron2: Tacotron2Config = Tacotron2Config()
    transformer_tts: TransformerTTSConfig = TransformerTTSConfig()
    fastspeech: FastSpeechConfig = FastSpeechConfig()
    fastspeech2: FastSpeech2Config = FastSpeech2Config()
    vits: VITSConfig = VITSConfig()
    jets: JETSConfig = JETSConfig()
    hifigan: HiFiGANConfig = HiFiGANConfig()
    melgan: MelGANConfig = MelGANConfig()
    style_melgan: StyleMelGANConfig = StyleMelGANConfig()
    parallel_wavegan: ParallelWaveGANConfig = ParallelWaveGANConfig()
    # Random mel window (frames) per example for vocoder GAN updates.
    vocoder_segment_frames: int = 32
    discriminator: HiFiGANConfig = HiFiGANConfig(in_channels=1)
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    data: TTSDataConfig = TTSDataConfig()
    max_epoch: int = 20
    keep_nbest: int = 5
    log_interval: int = 50
    resume: bool = True


def load_tts_config(path=None, overrides=None) -> TTSTaskConfig:
    d = load_yaml(path) if path else {}
    if overrides:
        d = merge_dicts(d, overrides)
    return from_dict(TTSTaskConfig, d)


class TTSTask:
    @staticmethod
    def prepare_vocab(cfg: TTSTaskConfig):
        exp = Path(cfg.exp_dir)
        text_path = Path(cfg.data.train_dir) / "text"
        if cfg.arch in VOCODER_ARCHS and not text_path.exists():
            # Vocoder corpora are audio-only (wav.scp); no vocabulary.
            return CharTokenizer(), TokenIDConverter(["<blank>", "<unk>"])
        texts = read_2column_text(text_path)
        tokenizer = CharTokenizer()
        tl_path = exp / "tokens.txt"
        if tl_path.exists():
            conv = TokenIDConverter(tl_path)
        else:
            tl = build_token_list(texts.values(), tokenizer)
            tl_path.parent.mkdir(parents=True, exist_ok=True)
            tl_path.write_text("\n".join(tl) + "\n", encoding="utf-8")
            conv = TokenIDConverter(tl)
        return tokenizer, conv

    @staticmethod
    def batches(cfg: TTSTaskConfig, data_dir: str, tokenizer, conv,
                epoch: int, shuffle: bool):
        from ..data.sampler import bucket_length
        fc = cfg.data.frontend
        wavs = read_2column_text(Path(data_dir) / "wav.scp")
        text_path = Path(data_dir) / "text"
        if cfg.arch in VOCODER_ARCHS and not text_path.exists():
            texts = {u: "" for u in wavs}  # audio-only vocoder corpus
        else:
            texts = read_2column_text(text_path)
        dur_path = Path(data_dir) / "durations"
        durations = read_2column_text(dur_path) if dur_path.exists() else None
        uids = sorted(wavs)
        if shuffle:
            np.random.RandomState(cfg.data.seed + epoch).shuffle(uids)
        bs = cfg.data.batch_size
        mel_fn = jax.jit(lambda s, l: default_frontend(s, l, fc))
        for i in range(0, len(uids), bs):
            chunk = uids[i:i + bs]
            toks = [conv.tokens2ids(tokenizer.text2tokens(texts[u]))
                    for u in chunk]
            wavs_np = [load_wav(wavs[u])[0] for u in chunk]
            n_max = bucket_length(max(len(w) for w in wavs_np), 4096)
            if cfg.arch in ("vits", "jets") + VOCODER_ARCHS:
                # GAN paths consume the raw waveform; spectrogram/pitch
                # features are extracted on-device inside the jitted step.
                if cfg.arch in VOCODER_ARCHS:
                    n_max = max(n_max, cfg.vocoder_segment_frames
                                * cfg.data.frontend.hop_length * 2)
                else:
                    gc = cfg.vits if cfg.arch == "vits" else cfg.jets
                    n_max = max(n_max, gc.segment_size * gc.hop_length)
            sp = np.zeros((len(chunk), n_max), np.float32)
            sl = np.zeros((len(chunk),), np.int32)
            for r, w in enumerate(wavs_np):
                sp[r, :len(w)] = w
                sl[r] = len(w)
            l_max0 = bucket_length(max(max(len(t) for t in toks), 1),
                                   cfg.data.text_bucket_multiple)
            if cfg.arch in ("vits", "jets") + VOCODER_ARCHS:
                text = np.zeros((len(chunk), l_max0), np.int32)
                tlens = np.zeros((len(chunk),), np.int32)
                for r, t in enumerate(toks):
                    text[r, :len(t)] = t
                    tlens[r] = len(t)
                yield {"speech": jnp.asarray(sp),
                       "speech_lengths": jnp.asarray(sl),
                       "text": jnp.asarray(text),
                       "text_lengths": jnp.asarray(tlens)}
                continue
            mel, mel_lens = mel_fn(jnp.asarray(sp), jnp.asarray(sl))
            t_max = bucket_length(int(mel_lens.max()),
                                  cfg.data.mel_bucket_multiple)
            mel = np.asarray(mel)[:, :t_max]
            if mel.shape[1] < t_max:
                mel = np.pad(mel, ((0, 0), (0, t_max - mel.shape[1]),
                                   (0, 0)))
            l_max = bucket_length(max(len(t) for t in toks),
                                  cfg.data.text_bucket_multiple)
            text = np.zeros((len(chunk), l_max), np.int32)
            tlens = np.zeros((len(chunk),), np.int32)
            for r, t in enumerate(toks):
                text[r, :len(t)] = t
                tlens[r] = len(t)
            batch = {"text": jnp.asarray(text),
                     "text_lengths": jnp.asarray(tlens),
                     "mel": jnp.asarray(mel),
                     "mel_lengths": jnp.asarray(np.asarray(mel_lens)),
                     }
            if cfg.arch in ("fastspeech", "fastspeech2"):
                if durations is not None:
                    dur = np.zeros((len(chunk), l_max), np.int32)
                    for r, u in enumerate(chunk):
                        vals = [int(x) for x in durations[u].split()]
                        dur[r, :len(vals)] = vals[:l_max]
                else:
                    # uniform fallback: spread mel frames over tokens
                    dur = np.zeros((len(chunk), l_max), np.int32)
                    for r in range(len(chunk)):
                        n_t = max(int(tlens[r]), 1)
                        per = int(mel_lens[r]) // n_t
                        dur[r, :n_t] = per
                        dur[r, 0] += int(mel_lens[r]) - per * n_t
                batch["durations"] = jnp.asarray(dur)
            yield batch

    @classmethod
    def build_model(cls, cfg: TTSTaskConfig, vocab_size: int):
        if cfg.arch in VOCODER_ARCHS:
            n_mels = cfg.data.frontend.n_mels
            hop = cfg.data.frontend.hop_length
            if cfg.arch == "hifigan":
                mcfg = dataclasses.replace(cfg.hifigan, in_channels=n_mels)
                assert_hop(mcfg.upsample_rates, hop)
                return HiFiGANGenerator(mcfg), dataclasses.replace(
                    cfg, hifigan=mcfg)
            if cfg.arch == "melgan":
                mcfg = dataclasses.replace(cfg.melgan, in_channels=n_mels)
                assert_hop(mcfg.upsample_rates, hop)
                return MelGANGenerator(mcfg), dataclasses.replace(
                    cfg, melgan=mcfg)
            if cfg.arch == "parallel_wavegan":
                mcfg = dataclasses.replace(cfg.parallel_wavegan,
                                           in_channels=n_mels)
                assert_hop(mcfg.upsample_rates, hop)
                return ParallelWaveGANGenerator(mcfg), dataclasses.replace(
                    cfg, parallel_wavegan=mcfg)
            mcfg = dataclasses.replace(cfg.style_melgan, in_channels=n_mels)
            assert_hop(mcfg.upsample_rates, hop)
            return StyleMelGANGenerator(mcfg), dataclasses.replace(
                cfg, style_melgan=mcfg)
        if cfg.arch == "vits":
            mcfg = dataclasses.replace(cfg.vits, vocab_size=vocab_size)
            return VITSGenerator(mcfg), dataclasses.replace(cfg, vits=mcfg)
        if cfg.arch == "jets":
            mcfg = dataclasses.replace(cfg.jets, vocab_size=vocab_size,
                                       frontend=cfg.data.frontend)
            return JETSGenerator(mcfg), dataclasses.replace(cfg, jets=mcfg)
        if cfg.arch == "tacotron2":
            mcfg = dataclasses.replace(
                cfg.tacotron2, vocab_size=vocab_size,
                n_mels=cfg.data.frontend.n_mels)
            return Tacotron2(mcfg), dataclasses.replace(cfg, tacotron2=mcfg)
        if cfg.arch == "transformer_tts":
            mcfg = dataclasses.replace(
                cfg.transformer_tts, vocab_size=vocab_size,
                n_mels=cfg.data.frontend.n_mels)
            return TransformerTTS(mcfg), dataclasses.replace(
                cfg, transformer_tts=mcfg)
        if cfg.arch == "fastspeech":
            mcfg = dataclasses.replace(
                cfg.fastspeech, vocab_size=vocab_size,
                n_mels=cfg.data.frontend.n_mels)
            return FastSpeech(mcfg), dataclasses.replace(
                cfg, fastspeech=mcfg)
        mcfg = dataclasses.replace(cfg.fastspeech2, vocab_size=vocab_size,
                                   n_mels=cfg.data.frontend.n_mels)
        return FastSpeech2(mcfg), dataclasses.replace(cfg, fastspeech2=mcfg)

    @classmethod
    def train(cls, cfg: TTSTaskConfig) -> TrainState:
        import optax
        exp = Path(cfg.exp_dir)
        exp.mkdir(parents=True, exist_ok=True)
        tokenizer, conv = cls.prepare_vocab(cfg)
        model, cfg = cls.build_model(cfg, conv.vocab_size)
        save_yaml(cfg, exp / "config.yaml")
        if cfg.arch == "vits":
            return cls._train_vits(cfg, model, tokenizer, conv)
        if cfg.arch == "jets":
            return cls._train_jets(cfg, model, tokenizer, conv)
        if cfg.arch in VOCODER_ARCHS:
            return cls._train_vocoder(cfg, model, tokenizer, conv)
        batch0 = next(cls.batches(cfg, cfg.data.train_dir, tokenizer, conv,
                                  1, False))
        params = model.init(jax.random.PRNGKey(cfg.data.seed),
                            **batch0)["params"]
        tx = build_optimizer(cfg.optim)
        state = TrainState.create(params, tx,
                                  jax.random.PRNGKey(cfg.data.seed))

        @jax.jit
        def train_step(state, batch):
            def loss_fn(p):
                return model.apply({"params": p}, train=True, **batch)

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt), stats

        @jax.jit
        def eval_step(state, batch):
            _, stats = model.apply({"params": state.params}, **batch)
            return stats

        ckpt = CheckpointManager(exp, cfg.keep_nbest)
        reporter = Reporter()
        start = 1
        if cfg.resume and ckpt.latest_epoch() is not None:
            state = ckpt.restore(ckpt.latest_epoch(), state)
            reporter = ckpt.load_reporter()
            start = ckpt.latest_epoch() + 1
        for epoch in range(start, cfg.max_epoch + 1):
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.train_dir, tokenizer,
                                     conv, epoch, True):
                state, stats = train_step(state, batch)
                sub.register({k: float(v) for k, v in stats.items()})
            reporter.observe(epoch, "train", sub.mean())
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.valid_dir, tokenizer,
                                     conv, epoch, False):
                sub.register({k: float(v)
                              for k, v in eval_step(state, batch).items()})
            reporter.observe(epoch, "valid", sub.mean())
            log.info(reporter.log_line(epoch))
            ckpt.save_epoch(epoch, state, reporter)
        return state

    @classmethod
    def _train_vits(cls, cfg: TTSTaskConfig, gen: VITSGenerator, tokenizer,
                    conv):
        """GAN training loop for arch=vits (gan_trainer.py:77-309 analogue,
        VITS aux losses composed into the generator objective)."""
        from ..train.gan_trainer import (GANTrainState, pack_gan_state,
                                         unpack_gan_state)
        from ..tts.vits import linear_spectrogram, make_vits_train_step
        exp = Path(cfg.exp_dir)
        vcfg = cfg.vits
        disc = HiFiGANDiscriminator(cfg.discriminator)
        batch0 = next(cls.batches(cfg, cfg.data.train_dir, tokenizer, conv,
                                  1, False))
        spec0, spec_lens0 = linear_spectrogram(
            batch0["speech"], batch0["speech_lengths"], vcfg)
        key = jax.random.PRNGKey(cfg.data.seed)
        gp = gen.init(key, batch0["text"], batch0["text_lengths"], spec0,
                      spec_lens0, key)["params"]
        fake0 = jnp.zeros(
            (1, vcfg.segment_size * vcfg.hop_length), jnp.float32)
        dp = disc.init(jax.random.PRNGKey(cfg.data.seed + 1), fake0)["params"]
        gen_tx = build_optimizer(cfg.optim)
        disc_tx = build_optimizer(cfg.optim)
        state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                     jax.random.PRNGKey(cfg.data.seed + 2))
        step = make_vits_train_step(gen, disc, gen_tx, disc_tx, vcfg)

        @jax.jit
        def eval_step(gen_params, batch):
            spec, spec_lens = linear_spectrogram(
                batch["speech"], batch["speech_lengths"], vcfg)
            fake, starts, aux = gen.apply(
                {"params": gen_params}, batch["text"],
                batch["text_lengths"], spec, spec_lens,
                jax.random.PRNGKey(0))
            from ..tts.hifigan import mel_l1_loss
            from ..tts.vits import slice_wav
            real = slice_wav(batch["speech"], starts, vcfg.segment_size,
                             vcfg.hop_length)
            mel = mel_l1_loss(fake, real, vcfg.n_fft, vcfg.hop_length,
                              vcfg.n_mels, vcfg.sample_rate)
            return {"loss": mel + aux["kl_loss"] + aux["dur_loss"],
                    "mel_loss": mel, **aux}

        ckpt = CheckpointManager(exp, cfg.keep_nbest)
        reporter = Reporter()
        start = 1
        if cfg.resume and ckpt.latest_epoch() is not None:
            restored = ckpt.restore(ckpt.latest_epoch(),
                                    pack_gan_state(state))
            state = unpack_gan_state(restored)
            reporter = ckpt.load_reporter()
            start = ckpt.latest_epoch() + 1
        for epoch in range(start, cfg.max_epoch + 1):
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.train_dir, tokenizer,
                                     conv, epoch, True):
                state, stats = step(state, batch)
                sub.register({k: float(v) for k, v in stats.items()})
            reporter.observe(epoch, "train", sub.mean())
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.valid_dir, tokenizer,
                                     conv, epoch, False):
                sub.register({k: float(v) for k, v in eval_step(
                    state.gen_params, batch).items()})
            reporter.observe(epoch, "valid", sub.mean())
            log.info(reporter.log_line(epoch))
            ckpt.save_epoch(epoch, pack_gan_state(state), reporter)
        return state


    @classmethod
    def _train_vocoder(cls, cfg: TTSTaskConfig, gen, tokenizer, conv):
        """Mel->wav vocoder GAN loop (gan_tts hifigan/melgan/style_melgan).

        Random mel windows are sliced per step on-device (rand_slice), the
        matching waveform window is the real sample; generator objective is
        LSGAN adv + feature matching + mel-L1 + multi-resolution STFT
        (hifigan.py / stft_loss.py loss stack). Discriminator: HiFiGAN
        MPD+MSD for hifigan, MelGAN multi-scale for melgan, random-window
        for style_melgan.
        """
        import optax

        from ..train.gan_trainer import (GANTrainState, pack_gan_state,
                                         unpack_gan_state)
        from ..tts.hifigan import (discriminator_adv_loss,
                                   feature_matching_loss, generator_adv_loss,
                                   mel_l1_loss)
        from ..tts.melgan import multi_resolution_stft_loss
        from ..tts.vits import rand_slice, slice_wav

        exp = Path(cfg.exp_dir)
        fc = cfg.data.frontend
        hop = fc.hop_length
        seg = cfg.vocoder_segment_frames
        style = cfg.arch == "style_melgan"
        noisy = cfg.arch in NOISE_VOCODERS
        if cfg.arch == "hifigan":
            disc = HiFiGANDiscriminator(cfg.discriminator)
        elif cfg.arch == "melgan":
            disc = MelGANDiscriminator(cfg.melgan)
        elif cfg.arch == "parallel_wavegan":
            disc = ParallelWaveGANDiscriminator(cfg.parallel_wavegan)
        else:
            disc = StyleMelGANDiscriminator(cfg.style_melgan)

        def gen_wav(gp, mel_seg, rng):
            if noisy:
                return gen.apply({"params": gp}, mel_seg, rng=rng,
                                 rngs={"noise": rng})
            return gen.apply({"params": gp}, mel_seg)

        def disc_outs(dp, wav, rng):
            if style:
                return disc.apply({"params": dp}, wav,
                                  rngs={"windows": rng})
            return disc.apply({"params": dp}, wav)

        mel0 = jnp.zeros((1, seg, fc.n_mels), jnp.float32)
        key = jax.random.PRNGKey(cfg.data.seed)
        if noisy:
            gp = gen.init({"params": key, "noise": key}, mel0)["params"]
        else:
            gp = gen.init(key, mel0)["params"]
        if style:
            dp = disc.init({"params": key, "windows": key},
                           jnp.zeros((1, seg * hop), jnp.float32))["params"]
        else:
            dp = disc.init(key,
                           jnp.zeros((1, seg * hop), jnp.float32))["params"]
        gen_tx = build_optimizer(cfg.optim)
        disc_tx = build_optimizer(cfg.optim)
        state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                     jax.random.PRNGKey(cfg.data.seed + 2))

        def slice_batch(batch, rng):
            mel, mel_lens = default_frontend(batch["speech"],
                                             batch["speech_lengths"], fc)
            mel_seg, starts = rand_slice(rng, mel,
                                         jnp.maximum(mel_lens, seg), seg)
            real = slice_wav(batch["speech"], starts, seg, hop)
            return mel_seg, real

        def gen_objective(fake, real, fake_outs, real_outs):
            adv = generator_adv_loss(fake_outs)
            fm = feature_matching_loss(real_outs, fake_outs)
            mel_l = mel_l1_loss(fake, real, fc.n_fft, hop, fc.n_mels, fc.fs)
            mr = multi_resolution_stft_loss(fake, real)
            loss = adv + 2.0 * fm + 45.0 * mel_l + mr
            return loss, {"adv": adv, "fm": fm, "mel_loss": mel_l,
                          "mrstft": mr}

        @jax.jit
        def step(state: "GANTrainState", batch):
            rng, r_seg, r_gen, r_win = jax.random.split(state.rng, 4)
            mel_seg, real = slice_batch(batch, r_seg)
            fake_d = jax.lax.stop_gradient(gen_wav(state.gen_params,
                                                   mel_seg, r_gen))

            def d_loss(dp_):
                return discriminator_adv_loss(
                    disc_outs(dp_, real, r_win),
                    disc_outs(dp_, fake_d, r_win))

            dl, d_grads = jax.value_and_grad(d_loss)(state.disc_params)
            d_up, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                            state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, d_up)

            def g_loss(gp_):
                fake = gen_wav(gp_, mel_seg, r_gen)
                fouts = disc_outs(disc_params, fake, r_win)
                routs = jax.tree.map(
                    jax.lax.stop_gradient, disc_outs(disc_params, real,
                                                     r_win))
                loss, stats = gen_objective(fake, real, fouts, routs)
                return loss, stats

            (gl, gstats), g_grads = jax.value_and_grad(
                g_loss, has_aux=True)(state.gen_params)
            g_up, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                          state.gen_params)
            gen_params = optax.apply_updates(state.gen_params, g_up)
            stats = {**gstats, "disc_loss": dl, "gen_loss": gl}
            return state.replace(step=state.step + 1, gen_params=gen_params,
                                 disc_params=disc_params, gen_opt=gen_opt,
                                 disc_opt=disc_opt, rng=rng), stats

        @jax.jit
        def eval_step(gen_params, batch, rng):
            mel_seg, real = slice_batch(batch, rng)
            fake = gen_wav(gen_params, mel_seg, rng)
            return {"loss": mel_l1_loss(fake, real, fc.n_fft, hop,
                                        fc.n_mels, fc.fs)}

        ckpt = CheckpointManager(exp, cfg.keep_nbest)
        reporter = Reporter()
        start = 1
        if cfg.resume and ckpt.latest_epoch() is not None:
            restored = ckpt.restore(ckpt.latest_epoch(),
                                    pack_gan_state(state))
            state = unpack_gan_state(restored)
            reporter = ckpt.load_reporter()
            start = ckpt.latest_epoch() + 1
        for epoch in range(start, cfg.max_epoch + 1):
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.train_dir, tokenizer,
                                     conv, epoch, True):
                state, stats = step(state, batch)
                sub.register({k: float(v) for k, v in stats.items()})
            reporter.observe(epoch, "train", sub.mean())
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.valid_dir, tokenizer,
                                     conv, epoch, False):
                sub.register({k: float(v) for k, v in eval_step(
                    state.gen_params, batch,
                    jax.random.PRNGKey(epoch)).items()})
            reporter.observe(epoch, "valid", sub.mean())
            log.info(reporter.log_line(epoch))
            ckpt.save_epoch(epoch, pack_gan_state(state), reporter)
        return state

    @classmethod
    def _train_jets(cls, cfg: TTSTaskConfig, gen: JETSGenerator, tokenizer,
                    conv):
        """GAN training loop for arch=jets (gan_tts/jets/jets.py:330-520
        loss composition over the shared GAN-trainer machinery)."""
        from ..train.gan_trainer import (GANTrainState, pack_gan_state,
                                         unpack_gan_state)
        from ..tts.jets import jets_features
        exp = Path(cfg.exp_dir)
        jcfg = cfg.jets
        disc = HiFiGANDiscriminator(cfg.discriminator)
        batch0 = next(cls.batches(cfg, cfg.data.train_dir, tokenizer, conv,
                                  1, False))
        feats0, flens0, lf00 = jets_features(
            batch0["speech"], batch0["speech_lengths"], jcfg)
        key = jax.random.PRNGKey(cfg.data.seed)
        gp = gen.init(key, batch0["text"], batch0["text_lengths"], feats0,
                      flens0, lf00, key)["params"]
        fake0 = jnp.zeros(
            (1, jcfg.segment_size * jcfg.hop_length), jnp.float32)
        dp = disc.init(jax.random.PRNGKey(cfg.data.seed + 1), fake0)["params"]
        gen_tx = build_optimizer(cfg.optim)
        disc_tx = build_optimizer(cfg.optim)
        state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                     jax.random.PRNGKey(cfg.data.seed + 2))
        step = make_jets_train_step(gen, disc, gen_tx, disc_tx, jcfg)

        @jax.jit
        def eval_step(gen_params, batch):
            feats, flens, lf0 = jets_features(
                batch["speech"], batch["speech_lengths"], jcfg)
            fake, starts, aux = gen.apply(
                {"params": gen_params}, batch["text"],
                batch["text_lengths"], feats, flens, lf0,
                jax.random.PRNGKey(0))
            from ..tts.hifigan import mel_l1_loss
            from ..tts.vits import slice_wav
            real = slice_wav(batch["speech"], starts, jcfg.segment_size,
                             jcfg.hop_length)
            mel = mel_l1_loss(fake, real, jcfg.frontend.n_fft,
                              jcfg.hop_length, jcfg.n_mels, jcfg.sample_rate)
            return {"loss": mel + aux["dur_loss"] + aux["forwardsum_loss"],
                    "mel_loss": mel, **aux}

        ckpt = CheckpointManager(exp, cfg.keep_nbest)
        reporter = Reporter()
        start = 1
        if cfg.resume and ckpt.latest_epoch() is not None:
            restored = ckpt.restore(ckpt.latest_epoch(),
                                    pack_gan_state(state))
            state = unpack_gan_state(restored)
            reporter = ckpt.load_reporter()
            start = ckpt.latest_epoch() + 1
        for epoch in range(start, cfg.max_epoch + 1):
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.train_dir, tokenizer,
                                     conv, epoch, True):
                state, stats = step(state, batch)
                sub.register({k: float(v) for k, v in stats.items()})
            reporter.observe(epoch, "train", sub.mean())
            sub = SubReporter()
            for batch in cls.batches(cfg, cfg.data.valid_dir, tokenizer,
                                     conv, epoch, False):
                sub.register({k: float(v) for k, v in eval_step(
                    state.gen_params, batch).items()})
            reporter.observe(epoch, "valid", sub.mean())
            log.info(reporter.log_line(epoch))
            ckpt.save_epoch(epoch, pack_gan_state(state), reporter)
        return state


class Text2Speech:
    """Inference wrapper (tts_inference.py analogue): text -> (mel, wav)."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 use_griffin_lim: bool = True,
                 vocoder_exp_dir: Optional[str] = None):
        exp = Path(exp_dir)
        self.cfg = load_tts_config(exp / "config.yaml")
        self.tokenizer, self.converter = TTSTask.prepare_vocab(self.cfg)
        self.model, _ = TTSTask.build_model(self.cfg,
                                            self.converter.vocab_size)
        mgr = CheckpointManager(exp, self.cfg.keep_nbest)
        self.params = mgr.load_params(
            ckpt_name or f"{mgr.latest_epoch()}epoch")
        if self.cfg.arch in ("vits", "jets") + VOCODER_ARCHS \
                and "gen" in self.params:
            self.params = self.params["gen"]  # packed GAN checkpoint
        self.use_griffin_lim = use_griffin_lim
        # Trained neural vocoder (tts_inference.py --vocoder_file analogue):
        # replaces Griffin-Lim for mel-output archs.
        self.vocoder = None
        if vocoder_exp_dir is not None:
            vexp = Path(vocoder_exp_dir)
            vcfg = load_tts_config(vexp / "config.yaml")
            assert vcfg.arch in VOCODER_ARCHS, vcfg.arch
            self.vocoder, self.vocoder_cfg = TTSTask.build_model(
                vcfg, vocab_size=1)[0], vcfg
            vmgr = CheckpointManager(vexp, vcfg.keep_nbest)
            vparams = vmgr.load_params(f"{vmgr.latest_epoch()}epoch")
            self.vocoder_params = vparams.get("gen", vparams)

    def _vocode(self, mel: np.ndarray) -> np.ndarray:
        vcfg = self.vocoder_cfg
        if vcfg.arch in NOISE_VOCODERS:
            wav = self.vocoder.apply({"params": self.vocoder_params},
                                     jnp.asarray(mel[None]),
                                     rngs={"noise": jax.random.PRNGKey(0)})
        else:
            wav = self.vocoder.apply({"params": self.vocoder_params},
                                     jnp.asarray(mel[None]))
        return np.asarray(wav)[0]

    def __call__(self, text: str, max_frames: int = 500):
        ids = self.converter.tokens2ids(self.tokenizer.text2tokens(text))
        t = jnp.asarray(np.asarray(ids, np.int32)[None])
        tl = jnp.asarray([len(ids)], np.int32)
        if self.cfg.arch == "vits":
            # end-to-end waveform model: no mel / Griffin-Lim stage
            wav, wav_lens = self.model.apply(
                {"params": self.params}, t, tl, jax.random.PRNGKey(0),
                method=lambda m, x, xl, r: m.infer(x, xl, r,
                                                   max_frames=max_frames))
            return None, np.asarray(wav)[0][: int(wav_lens[0])]
        if self.cfg.arch == "jets":
            wav, wav_lens = self.model.apply(
                {"params": self.params}, t, tl,
                method=lambda m, x, xl: m.infer(x, xl,
                                                max_frames=max_frames))
            return None, np.asarray(wav)[0][: int(wav_lens[0])]
        if self.cfg.arch in ("tacotron2", "transformer_tts"):
            mel, lens = self.model.apply(
                {"params": self.params}, t, tl, max_frames,
                method=lambda m, x, xl, mf: m.inference(x, xl, mf))
        else:
            mel, lens = self.model.apply(
                {"params": self.params}, t, tl,
                method=lambda m, x, xl: m.inference(x, xl))
        mel = np.asarray(mel)[0][: int(lens[0])]
        wav = None
        # Vocoders need a few frames of context (Griffin-Lim's reflect-pad
        # stft rejects near-empty inputs — early-stop of a barely-trained
        # model can emit 1 frame); return mel-only below the minimum.
        if self.vocoder is not None and mel.shape[0] >= 8:
            return mel, self._vocode(mel)
        if self.use_griffin_lim and mel.shape[0] >= 8:
            from ..tts.vocoder import griffin_lim
            fc = self.cfg.data.frontend
            wav = np.asarray(griffin_lim(
                jnp.asarray(mel[None]), n_iter=16, fs=fc.fs, n_fft=fc.n_fft,
                hop=fc.hop_length, n_mels=fc.n_mels))[0]
        return mel, wav
