"""Speech translation task.

Parity target: reference espnet2/tasks/st.py (STTask, 580 LoC: src+tgt
token lists, ASR-CTC auxiliary loss) and espnet2/bin/st_inference.py
(Speech2Text for translation). Data dir: wav.scp + text (target language)
+ src_text (source transcript, optional — enables the ASR-CTC aux loss).
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import CommonPreprocessor, SpeechDataset
from ..data.fileio import read_2column_text
from ..data.tokenizer import (TokenIDConverter, build_token_list,
                              build_tokenizer)
from ..models.asr_model import ASRConfig, ASRModel
from ..models.st_mt import STModel
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig
from ..train.state import TrainState
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class STTaskConfig:
    exp_dir: str = "exp/st"
    model: ASRConfig = ASRConfig()     # vocab_size resolved to TGT vocab
    asr_ctc_weight: float = 0.3
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    token_type: str = "word"
    batch_size: int = 8
    speech_bucket_multiple: int = 4096
    text_bucket_multiple: int = 8


def load_st_config(path=None, overrides=None) -> STTaskConfig:
    return load_config(STTaskConfig, path, overrides)


class STTask:
    @staticmethod
    def prepare_vocabs(cfg: STTaskConfig):
        """Separate tgt/src token lists (tasks/st.py src+tgt tokenizers)."""
        tok = build_tokenizer(cfg.token_type)
        out = []
        for stream, fname in (("text", "tokens.txt"),
                              ("src_text", "src_tokens.txt")):
            path = Path(cfg.train_dir) / stream
            lp = Path(cfg.exp_dir) / fname
            if lp.exists():
                conv = TokenIDConverter(lp)
            elif path.exists():
                tl = build_token_list(read_2column_text(path).values(), tok)
                lp.parent.mkdir(parents=True, exist_ok=True)
                lp.write_text("\n".join(tl) + "\n", encoding="utf-8")
                conv = TokenIDConverter(tl)
            else:
                conv = None
            out.append(conv)
        return tok, out[0], out[1]

    @classmethod
    def build_dataset(cls, cfg, data_dir, tok, tgt_conv, src_conv):
        extra = {}
        streams = [(str(Path(data_dir) / "wav.scp"), "speech", "sound"),
                   (str(Path(data_dir) / "text"), "text", "text")]
        if src_conv is not None and (Path(data_dir) / "src_text").exists():
            streams.append((str(Path(data_dir) / "src_text"), "src_text",
                            "text"))
            extra["src_text"] = (tok, src_conv)
        pre = CommonPreprocessor(tok, tgt_conv, extra=extra)
        return SpeechDataset(streams, preprocess=pre)

    @staticmethod
    def batch_adapter(uids, coll):
        out = {
            "speech": coll["speech"].astype(np.float32),
            "speech_lengths": coll["speech_lengths"],
            "text": np.maximum(coll["text"], 0).astype(np.int32),
            "text_lengths": coll["text_lengths"],
        }
        if "src_text" in coll:
            out["src_text"] = np.maximum(coll["src_text"],
                                         0).astype(np.int32)
            out["src_text_lengths"] = coll["src_text_lengths"]
        return out

    @classmethod
    def train(cls, cfg: STTaskConfig, mesh=None) -> TrainState:
        Path(cfg.exp_dir).mkdir(parents=True, exist_ok=True)
        tok, tgt_conv, src_conv = cls.prepare_vocabs(cfg)
        model_cfg = dataclasses.replace(cfg.model,
                                        vocab_size=tgt_conv.vocab_size)
        src_v = src_conv.vocab_size if src_conv is not None else 0
        model = STModel(model_cfg, src_vocab_size=src_v,
                        asr_ctc_weight=cfg.asr_ctc_weight if src_v else 0.0)
        resolved = dataclasses.replace(cfg, model=model_cfg)
        buckets = {"speech": cfg.speech_bucket_multiple,
                   "text": cfg.text_bucket_multiple,
                   "src_text": cfg.text_bucket_multiple}
        mk = lambda d, sh: simple_iter_factory(
            cls.build_dataset(cfg, d, tok, tgt_conv, src_conv),
            cls.batch_adapter, cfg.batch_size, cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0)["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply({"params": params}, train=True,
                               specaug_rng=specaug_rng,
                               rngs={"dropout": dropout_rng}, **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=resolved)


class Speech2Translation:
    """Inference (st_inference.py analogue): waveform -> target-language
    text via the shared batched beam search over the ST model's inner
    ASR-style encoder/decoder (params subtree 'asr')."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 beam_size: int = 5, max_len: int = 64):
        exp = Path(exp_dir)
        self.cfg = load_st_config(exp / "config.yaml")
        self.tokenizer, self.converter, _ = STTask.prepare_vocabs(self.cfg)
        self.asr_model = ASRModel(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.run.keep_nbest)
        if ckpt_name is None:
            ckpt_name = f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)["asr"]
        self.beam_size = beam_size
        self.max_len = max_len
        self._jit = None

    def __call__(self, wav: np.ndarray) -> str:
        from ..data.sampler import bucket_length
        from ..decode.beam import BeamSearchConfig, batch_beam_search
        from ..decode.greedy import attention_greedy_decode
        if self._jit is None:
            def decode(params, speech, lens):
                hs, hl, _ = self.asr_model.apply(
                    {"params": params}, speech, lens,
                    method=lambda m, s, sl: m.encode(s, sl))
                if self.beam_size <= 1:
                    return attention_greedy_decode(
                        self.asr_model, params, hs, hl, self.max_len)
                return batch_beam_search(
                    self.asr_model, params, hs, hl,
                    BeamSearchConfig(beam_size=self.beam_size,
                                     max_len=self.max_len, ctc_weight=0.0))
            self._jit = jax.jit(decode)
        n = bucket_length(len(wav), self.cfg.speech_bucket_multiple)
        buf = np.zeros((1, n), np.float32)
        buf[0, :len(wav)] = wav
        tokens, lengths = self._jit(self.params, jnp.asarray(buf),
                                    jnp.asarray([len(wav)], jnp.int32))
        ids = np.asarray(tokens)[0][: int(lengths[0])]
        return self.tokenizer.tokens2text(self.converter.ids2tokens(ids))
