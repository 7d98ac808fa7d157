"""Machine translation task.

Parity target: reference espnet2/tasks/mt.py (MTTask, 385 LoC). Data dir:
text (target) + src_text (source).
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
from ..models.st_mt import MTConfig, MTModel
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig
from ..train.state import TrainState
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class MTTaskConfig:
    exp_dir: str = "exp/mt"
    model: MTConfig = MTConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    token_type: str = "word"
    batch_size: int = 16
    text_bucket_multiple: int = 8


def load_mt_config(path=None, overrides=None) -> MTTaskConfig:
    return load_config(MTTaskConfig, path, overrides)


class MTTask:
    @staticmethod
    def prepare_vocabs(cfg: MTTaskConfig):
        tok = build_tokenizer(cfg.token_type)
        convs = []
        for stream, fname in (("text", "tokens.txt"),
                              ("src_text", "src_tokens.txt")):
            lp = Path(cfg.exp_dir) / fname
            if lp.exists():
                convs.append(TokenIDConverter(lp))
            else:
                tl = build_token_list(read_2column_text(
                    Path(cfg.train_dir) / stream).values(), tok)
                lp.parent.mkdir(parents=True, exist_ok=True)
                lp.write_text("\n".join(tl) + "\n", encoding="utf-8")
                convs.append(TokenIDConverter(tl))
        return tok, convs[0], convs[1]

    @classmethod
    def build_dataset(cls, data_dir, tok, tgt_conv, src_conv):
        pre = CommonPreprocessor(tok, tgt_conv,
                                 extra={"src_text": (tok, src_conv)})
        return SpeechDataset(
            [(str(Path(data_dir) / "text"), "text", "text"),
             (str(Path(data_dir) / "src_text"), "src_text", "text")],
            preprocess=pre)

    @staticmethod
    def batch_adapter(uids, coll):
        return {
            "src_text": np.maximum(coll["src_text"], 0).astype(np.int32),
            "src_text_lengths": coll["src_text_lengths"],
            "text": np.maximum(coll["text"], 0).astype(np.int32),
            "text_lengths": coll["text_lengths"],
        }

    @classmethod
    def train(cls, cfg: MTTaskConfig, mesh=None) -> TrainState:
        Path(cfg.exp_dir).mkdir(parents=True, exist_ok=True)
        tok, tgt_conv, src_conv = cls.prepare_vocabs(cfg)
        model_cfg = dataclasses.replace(cfg.model,
                                        vocab_size=tgt_conv.vocab_size,
                                        src_vocab_size=src_conv.vocab_size)
        model = MTModel(model_cfg)
        resolved = dataclasses.replace(cfg, model=model_cfg)
        buckets = {"text": cfg.text_bucket_multiple,
                   "src_text": cfg.text_bucket_multiple}
        mk = lambda d, sh: simple_iter_factory(
            cls.build_dataset(d, tok, tgt_conv, src_conv),
            cls.batch_adapter, cfg.batch_size, cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0)["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply({"params": params}, train=True,
                               rngs={"dropout": dropout_rng}, **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=resolved)


class Text2Text:
    """Inference (mt_inference.py analogue): greedy decode."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 max_len: int = 32):
        exp = Path(exp_dir)
        self.cfg = load_mt_config(exp / "config.yaml")
        self.tok, self.tgt_conv, self.src_conv = MTTask.prepare_vocabs(
            self.cfg)
        self.model = MTModel(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.run.keep_nbest)
        if ckpt_name is None:
            ckpt_name = f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)
        self.max_len = max_len

    def __call__(self, src: str) -> str:
        c = self.cfg.model
        ids = self.src_conv.tokens2ids(self.tok.text2tokens(src))
        src_ids = jnp.asarray([ids], jnp.int32)
        src_len = jnp.asarray([len(ids)], jnp.int32)
        memory, mem_mask = self.model.apply(
            {"params": self.params}, jnp.maximum(src_ids, 0), src_len,
            method=lambda m, s, sl: m.encoder(s, sl))
        ys = np.full((1, self.max_len + 1), c.sos_id, np.int32)
        out = []
        for i in range(self.max_len):
            logits = self.model.apply(
                {"params": self.params}, jnp.asarray(ys[:, :i + 1]),
                jnp.asarray([i + 1]), memory, None, mem_mask,
                method=lambda m, y, yl, mem, ml, mm: m.decoder(
                    y, yl, mem, ml, memory_mask=mm))
            nxt = int(jnp.argmax(logits[0, i]))
            if nxt == c.eos_id:
                break
            ys[0, i + 1] = nxt
            out.append(nxt)
        return self.tok.tokens2text(self.tgt_conv.ids2tokens(out))
