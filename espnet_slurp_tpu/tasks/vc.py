"""Voice conversion task: source-speaker mel -> target-speaker mel.

Parity target: reference espnet1 VC stack (espnet/vc/pytorch_backend,
Tacotron2-VC: the TTS model whose encoder consumes source mel frames;
egs voice-conversion recipes pair src_wav.scp with wav.scp). The model IS
Tacotron2 with ``input_type="mel"`` (tts/tacotron2.py) — everything after
the encoder embedding is the shared attention decoder.

Data dir layout: ``src_wav.scp`` (source-speaker audio) + ``wav.scp``
(target-speaker audio), paired by utterance id.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.fileio import load_wav, read_2column_text
from ..data.sampler import bucket_length
from ..ops.frontend import FrontendConfig, default_frontend
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig, build_optimizer
from ..train.state import TrainState, make_eval_step, make_train_step
from ..train.trainer import Trainer, TrainerOptions
from ..tts.tacotron2 import Tacotron2, Tacotron2Config
from ..utils.config import from_dict, load_yaml, merge_dicts, save_yaml


@dataclasses.dataclass(frozen=True)
class VCDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    batch_size: int = 8
    frontend: FrontendConfig = FrontendConfig()
    mel_bucket_multiple: int = 64
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class VCTaskConfig:
    exp_dir: str = "exp/vc"
    model: Tacotron2Config = Tacotron2Config(input_type="mel")
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    data: VCDataConfig = VCDataConfig()
    max_epoch: int = 20
    keep_nbest: int = 5
    log_interval: int = 50
    resume: bool = True


def load_vc_config(path=None, overrides=None) -> VCTaskConfig:
    d = load_yaml(path) if path else {}
    if overrides:
        d = merge_dicts(d, overrides)
    cfg = from_dict(VCTaskConfig, d)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, input_type="mel",
            n_mels=cfg.data.frontend.n_mels))


class VCTask:
    @classmethod
    def batches(cls, cfg: VCTaskConfig, data_dir: str, epoch: int,
                shuffle: bool):
        fc = cfg.data.frontend
        src = read_2column_text(Path(data_dir) / "src_wav.scp")
        tgt = read_2column_text(Path(data_dir) / "wav.scp")
        uids = sorted(set(src) & set(tgt))
        if shuffle:
            np.random.RandomState(cfg.data.seed + epoch).shuffle(uids)
        mel_fn = jax.jit(lambda s, l: default_frontend(s, l, fc))

        def mels(paths):
            wavs = [load_wav(p)[0] for p in paths]
            n_max = bucket_length(max(len(w) for w in wavs), 4096)
            sp = np.zeros((len(wavs), n_max), np.float32)
            sl = np.zeros((len(wavs),), np.int32)
            for r, w in enumerate(wavs):
                sp[r, :len(w)] = w
                sl[r] = len(w)
            mel, mlens = mel_fn(jnp.asarray(sp), jnp.asarray(sl))
            t_max = bucket_length(int(mlens.max()),
                                  cfg.data.mel_bucket_multiple)
            mel = np.asarray(mel)[:, :t_max]
            if mel.shape[1] < t_max:
                mel = np.pad(mel, ((0, 0), (0, t_max - mel.shape[1]),
                                   (0, 0)))
            return mel, np.asarray(mlens)

        bs = cfg.data.batch_size
        for i in range(0, len(uids), bs):
            chunk = uids[i:i + bs]
            smel, slens = mels([src[u] for u in chunk])
            tmel, tlens = mels([tgt[u] for u in chunk])
            yield {"text": jnp.asarray(smel),
                   "text_lengths": jnp.asarray(slens),
                   "mel": jnp.asarray(tmel),
                   "mel_lengths": jnp.asarray(tlens)}

    @classmethod
    def train(cls, cfg: VCTaskConfig) -> TrainState:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, input_type="mel",
                n_mels=cfg.data.frontend.n_mels))
        exp = Path(cfg.exp_dir)
        exp.mkdir(parents=True, exist_ok=True)
        save_yaml(cfg, exp / "config.yaml")
        model = Tacotron2(cfg.model)
        batch0 = next(cls.batches(cfg, cfg.data.train_dir, 1, False))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(cfg.data.seed), **batch0)["params"])()
        tx = build_optimizer(cfg.optim)
        state = TrainState.create(params, tx,
                                  jax.random.PRNGKey(cfg.data.seed))
        ckpt = CheckpointManager(exp, cfg.keep_nbest)

        def train_apply(p, batch, dropout_rng, specaug_rng):
            return model.apply({"params": p}, train=True, **batch)

        def eval_apply(p, batch):
            return model.apply({"params": p}, **batch)

        trainer = Trainer(
            make_train_step(model, tx, apply_fn=train_apply),
            make_eval_step(model, apply_fn=eval_apply), ckpt,
            TrainerOptions(max_epoch=cfg.max_epoch,
                           keep_nbest=cfg.keep_nbest,
                           log_interval=cfg.log_interval,
                           resume=cfg.resume))
        return trainer.run(
            state,
            lambda e: cls.batches(cfg, cfg.data.train_dir, e, True),
            lambda e: cls.batches(cfg, cfg.data.valid_dir, e, False))


class Speech2Speech:
    """Inference wrapper: source wav -> (converted mel, wav)."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 use_griffin_lim: bool = True):
        exp = Path(exp_dir)
        self.cfg = load_vc_config(exp / "config.yaml")
        self.model = Tacotron2(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.keep_nbest)
        self.params = mgr.load_params(
            ckpt_name or f"{mgr.latest_epoch()}epoch")
        self.use_griffin_lim = use_griffin_lim

    def __call__(self, wav: np.ndarray, max_frames: int = 500):
        fc = self.cfg.data.frontend
        mel, mlens = default_frontend(jnp.asarray(wav[None]),
                                      jnp.asarray([len(wav)]), fc)
        out_mel, lens = self.model.apply(
            {"params": self.params}, mel, mlens, max_frames,
            method=lambda m, x, xl, mf: m.inference(x, xl, mf))
        out = np.asarray(out_mel)[0][: int(lens[0])]
        wav_out = None
        if self.use_griffin_lim and out.shape[0] >= 8:
            from ..tts.vocoder import griffin_lim
            wav_out = np.asarray(griffin_lim(
                jnp.asarray(out[None]), n_iter=16, fs=fc.fs, n_fft=fc.n_fft,
                hop=fc.hop_length, n_mels=fc.n_mels))[0]
        return out, wav_out
