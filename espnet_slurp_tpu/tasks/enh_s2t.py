"""Joint enhancement + ASR task (Enh+ASR).

Parity target: reference espnet2/tasks/enh_s2t.py (EnhS2TTask, 563 LoC)
and the enh_asr recipes. Data dir convention: wav.scp = mixture,
spk{n}.scp = clean references (optional; enables the SI-SNR loss),
text_spk{n} = per-speaker transcripts (enh_s2t model kwargs
text_spk1/text_spk2..., espnet_enh_s2t_model.py:80-86).
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import CommonPreprocessor, SpeechDataset
from ..data.fileio import read_2column_text
from ..data.tokenizer import (TokenIDConverter, build_token_list,
                              build_tokenizer)
from ..models.enh_s2t import EnhS2TConfig, EnhS2TModel
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig
from ..train.state import TrainState
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class EnhS2TTaskConfig:
    exp_dir: str = "exp/enh_s2t"
    model: EnhS2TConfig = EnhS2TConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    token_type: str = "word"
    batch_size: int = 8
    speech_bucket_multiple: int = 4096
    text_bucket_multiple: int = 8


def load_enh_s2t_config(path=None, overrides=None) -> EnhS2TTaskConfig:
    return load_config(EnhS2TTaskConfig, path, overrides)


class EnhS2TTask:
    @staticmethod
    def prepare_vocab(cfg: EnhS2TTaskConfig):
        tok = build_tokenizer(cfg.token_type)
        lp = Path(cfg.exp_dir) / "tokens.txt"
        if lp.exists():
            return tok, TokenIDConverter(lp)
        texts = []
        for s in range(cfg.model.enh.n_spk):
            p = Path(cfg.train_dir) / f"text_spk{s+1}"
            texts.extend(read_2column_text(p).values())
        tl = build_token_list(texts, tok)
        lp.parent.mkdir(parents=True, exist_ok=True)
        lp.write_text("\n".join(tl) + "\n", encoding="utf-8")
        return tok, TokenIDConverter(tl)

    @classmethod
    def build_dataset(cls, cfg, data_dir, tok, conv):
        d = Path(data_dir)
        n_spk = cfg.model.enh.n_spk
        streams = [(str(d / "wav.scp"), "speech_mix", "sound")]
        extra = {}
        for s in range(n_spk):
            streams.append((str(d / f"text_spk{s+1}"), f"text_spk{s+1}",
                            "text"))
            extra[f"text_spk{s+1}"] = (tok, conv)
            if (d / f"spk{s+1}.scp").exists():
                streams.append((str(d / f"spk{s+1}.scp"), f"ref{s+1}",
                                "sound"))
        pre = CommonPreprocessor(None, None, extra=extra)
        return SpeechDataset(streams, preprocess=pre)

    @staticmethod
    def batch_adapter(n_spk: int):
        def adapt(uids, coll):
            out = {
                "speech_mix": coll["speech_mix"].astype(np.float32),
                "speech_mix_lengths": coll["speech_mix_lengths"],
            }
            for s in range(n_spk):
                out[f"text_spk{s+1}"] = np.maximum(
                    coll[f"text_spk{s+1}"], 0).astype(np.int32)
                out[f"text_spk{s+1}_lengths"] = \
                    coll[f"text_spk{s+1}_lengths"]
            if "ref1" in coll:
                n = coll["speech_mix"].shape[1]
                refs = [coll[f"ref{s+1}"] for s in range(n_spk)]
                m = min([n] + [r.shape[1] for r in refs])
                out["speech_mix"] = out["speech_mix"][:, :m]
                out["speech_mix_lengths"] = np.minimum(
                    out["speech_mix_lengths"], m)
                out["speech_ref"] = np.stack(
                    [r[:, :m] for r in refs], 1).astype(np.float32)
            return out
        return adapt

    @classmethod
    def train(cls, cfg: EnhS2TTaskConfig, mesh=None) -> TrainState:
        Path(cfg.exp_dir).mkdir(parents=True, exist_ok=True)
        tok, conv = cls.prepare_vocab(cfg)
        mcfg = dataclasses.replace(
            cfg.model, asr=dataclasses.replace(cfg.model.asr,
                                               vocab_size=conv.vocab_size))
        model = EnhS2TModel(mcfg)
        resolved = dataclasses.replace(cfg, model=mcfg)
        n_spk = mcfg.enh.n_spk
        buckets = {"speech_mix": cfg.speech_bucket_multiple}
        for s in range(n_spk):
            buckets[f"text_spk{s+1}"] = cfg.text_bucket_multiple
            buckets[f"ref{s+1}"] = cfg.speech_bucket_multiple
        adapt = cls.batch_adapter(n_spk)
        mk = lambda d, sh: simple_iter_factory(
            cls.build_dataset(cfg, d, tok, conv), adapt, cfg.batch_size,
            cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0)["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply(
                {"params": params}, train=True, specaug_rng=specaug_rng,
                rngs={"dropout": dropout_rng,
                      "bypass": jax.random.fold_in(dropout_rng, 7)},
                **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=resolved)


class EnhSpeech2Text:
    """Inference: mixture -> n_spk transcripts (separate then decode;
    enh_inference + asr_inference composition per the reference recipes)."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 max_len: int = 64):
        exp = Path(exp_dir)
        self.cfg = load_enh_s2t_config(exp / "config.yaml")
        tok = build_tokenizer(self.cfg.token_type)
        conv = TokenIDConverter(exp / "tokens.txt")
        self.tokenizer, self.converter = tok, conv
        self.model = EnhS2TModel(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.run.keep_nbest)
        if ckpt_name is None:
            ckpt_name = f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)
        self.max_len = max_len
        from ..ops.ctc import greedy_decode
        model = self.model
        blank = self.cfg.model.asr.blank_id

        def decode(params, mix, lengths):
            est, _ = model.apply({"params": params}, mix, lengths,
                                 method=lambda m, x, xl: m.separate(x, xl))
            b, s, n = est.shape
            el = jnp.minimum(lengths, n)
            hs, h_lengths, _ = model.apply(
                {"params": params}, est.reshape(b * s, n),
                jnp.repeat(el[:, None], s, 1).reshape(-1),
                method=lambda m, x, xl: m.asr.encode(x, xl))
            logp = model.apply({"params": params}, hs,
                               method=lambda m, h: m.asr.ctc_logprobs(h))
            return greedy_decode(logp, h_lengths, blank)

        self._jit = jax.jit(decode)
        self._blank = blank

    def __call__(self, mix: np.ndarray):
        from ..data.sampler import bucket_length
        from ..ops.ctc import collapse_repeats
        n = bucket_length(len(mix), self.cfg.speech_bucket_multiple)
        buf = np.zeros((1, n), np.float32)
        buf[0, :len(mix)] = mix
        tokens = self._jit(self.params, jnp.asarray(buf),
                           jnp.asarray([len(mix)], jnp.int32))
        out = []
        for s in range(self.cfg.model.enh.n_spk):
            ids = collapse_repeats(np.asarray(tokens)[s], self._blank)
            out.append(self.tokenizer.tokens2text(
                self.converter.ids2tokens(ids)))
        return out
