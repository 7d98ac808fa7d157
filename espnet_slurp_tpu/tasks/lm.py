"""LM task: train a Transformer/LSTM LM on text; perplexity evaluation.

Parity target: reference espnet2/tasks/lm.py (LMTask, 207 LoC) +
espnet2/bin/lm_calc_perplexity.py + espnet2/lm/espnet_model.py (nll/ppl).
Trained LMs plug into the beam search as shallow-fusion scorers
(decode/beam.py lm_step hook).
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.fileio import read_2column_text
from ..data.tokenizer import TokenIDConverter, build_token_list, build_tokenizer
from ..models.lm import LMConfig, LSTMLM, TransformerLM, lm_loss
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig, build_optimizer
from ..train.reporter import Reporter, SubReporter
from ..train.state import TrainState
from ..utils.config import from_dict, load_yaml, merge_dicts, save_yaml

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class LMDataConfig:
    train_text: str = ""
    valid_text: str = ""
    token_type: str = "char"
    bpemodel: Optional[str] = None
    bpe_marker: str = "prefix"
    batch_size: int = 32
    max_len: int = 128
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class LMTaskConfig:
    exp_dir: str = "exp/lm"
    model: LMConfig = LMConfig()
    optim: OptimConfig = OptimConfig()
    data: LMDataConfig = LMDataConfig()
    max_epoch: int = 20
    keep_nbest: int = 5
    log_interval: int = 100
    resume: bool = True


def load_lm_config(path=None, overrides=None) -> LMTaskConfig:
    d = load_yaml(path) if path else {}
    if overrides:
        d = merge_dicts(d, overrides)
    return from_dict(LMTaskConfig, d)


def build_lm(cfg: LMConfig):
    return TransformerLM(cfg) if cfg.arch == "transformer" else LSTMLM(cfg)


class LMTask:
    @staticmethod
    def prepare_vocab(cfg: LMTaskConfig):
        exp = Path(cfg.exp_dir)
        texts = read_2column_text(cfg.data.train_text)
        tokenizer = build_tokenizer(cfg.data.token_type,
                                    bpemodel=cfg.data.bpemodel,
                                    bpe_marker=cfg.data.bpe_marker)
        tl_path = exp / "tokens.txt"
        if tl_path.exists():
            conv = TokenIDConverter(tl_path)
        else:
            tl = build_token_list(texts.values(), tokenizer)
            tl_path.parent.mkdir(parents=True, exist_ok=True)
            tl_path.write_text("\n".join(tl) + "\n", encoding="utf-8")
            conv = TokenIDConverter(tl)
        model_cfg = dataclasses.replace(cfg.model,
                                        vocab_size=conv.vocab_size)
        return tokenizer, conv, model_cfg

    @staticmethod
    def batches(text_path, tokenizer, conv, cfg: LMTaskConfig, epoch: int,
                shuffle: bool):
        """Yield {ys, ys_lengths, targets}: sos-prefixed input, eos-suffixed
        target (espnet2/lm/espnet_model.py:30-60 semantics)."""
        texts = read_2column_text(text_path)
        sos_eos = conv.vocab_size - 1
        seqs = []
        for line in texts.values():
            ids = conv.tokens2ids(tokenizer.text2tokens(line))
            seqs.append(ids[:cfg.data.max_len - 1])
        order = np.arange(len(seqs))
        if shuffle:
            np.random.RandomState(cfg.data.seed + epoch).shuffle(order)
        bs = cfg.data.batch_size
        for i in range(0, len(order), bs):
            chunk = [seqs[j] for j in order[i:i + bs]]
            maxlen = max(len(s) + 1 for s in chunk)
            maxlen = ((maxlen + 7) // 8) * 8
            ys = np.full((len(chunk), maxlen), sos_eos, np.int32)
            tgt = np.full((len(chunk), maxlen), 0, np.int32)
            lens = np.zeros((len(chunk),), np.int32)
            for r, s in enumerate(chunk):
                ys[r, 1:1 + len(s)] = s       # [sos, tokens...]
                tgt[r, :len(s)] = s
                tgt[r, len(s)] = sos_eos      # [tokens..., eos]
                lens[r] = len(s) + 1
            yield {"ys": jnp.asarray(ys), "targets": jnp.asarray(tgt),
                   "ys_lengths": jnp.asarray(lens)}

    @classmethod
    def train(cls, cfg: LMTaskConfig) -> TrainState:
        exp = Path(cfg.exp_dir)
        exp.mkdir(parents=True, exist_ok=True)
        tokenizer, conv, model_cfg = cls.prepare_vocab(cfg)
        save_yaml(dataclasses.replace(cfg, model=model_cfg),
                  exp / "config.yaml")
        model = build_lm(model_cfg)
        sample = next(cls.batches(cfg.data.train_text, tokenizer, conv, cfg,
                                  1, False))
        params = model.init(jax.random.PRNGKey(cfg.data.seed), sample["ys"],
                            sample["ys_lengths"])["params"]
        tx = build_optimizer(cfg.optim)
        state = TrainState.create(params, tx,
                                  jax.random.PRNGKey(cfg.data.seed))

        @jax.jit
        def train_step(state, batch):
            def loss_fn(p):
                logits = model.apply({"params": p}, batch["ys"],
                                     batch["ys_lengths"])
                loss, ppl, n = lm_loss(logits, batch["targets"],
                                       batch["ys_lengths"])
                return loss, {"loss": loss, "ppl": ppl}

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt), stats

        @jax.jit
        def eval_step(state, batch):
            logits = model.apply({"params": state.params}, batch["ys"],
                                 batch["ys_lengths"])
            loss, ppl, n = lm_loss(logits, batch["targets"],
                                   batch["ys_lengths"])
            return {"loss": loss, "ppl": ppl}

        ckpt = CheckpointManager(exp, cfg.keep_nbest)
        reporter = Reporter()
        start = 1
        if cfg.resume and ckpt.latest_epoch() is not None:
            state = ckpt.restore(ckpt.latest_epoch(), state)
            reporter = ckpt.load_reporter()
            start = ckpt.latest_epoch() + 1
        for epoch in range(start, cfg.max_epoch + 1):
            sub = SubReporter()
            for batch in cls.batches(cfg.data.train_text, tokenizer, conv,
                                     cfg, epoch, True):
                state, stats = train_step(state, batch)
                sub.register({k: float(v) for k, v in stats.items()})
            reporter.observe(epoch, "train", sub.mean())
            sub = SubReporter()
            for batch in cls.batches(cfg.data.valid_text, tokenizer, conv,
                                     cfg, epoch, False):
                sub.register({k: float(v) for k, v in eval_step(state, batch).items()})
            reporter.observe(epoch, "valid", sub.mean())
            log.info(reporter.log_line(epoch))
            ckpt.save_epoch(epoch, state, reporter)
        return state

    @classmethod
    def perplexity(cls, exp_dir: str, text_path: str,
                   ckpt_name: Optional[str] = None) -> float:
        """lm_calc_perplexity.py analogue."""
        exp = Path(exp_dir)
        cfg = load_lm_config(exp / "config.yaml")
        tokenizer, conv, model_cfg = cls.prepare_vocab(cfg)
        model = build_lm(model_cfg)
        mgr = CheckpointManager(exp, cfg.keep_nbest)
        params = mgr.load_params(ckpt_name or f"{mgr.latest_epoch()}epoch")

        total_nll, total_n = 0.0, 0
        for batch in cls.batches(text_path, tokenizer, conv, cfg, 1, False):
            logits = model.apply({"params": params}, batch["ys"],
                                 batch["ys_lengths"])
            loss, _, n = lm_loss(logits, batch["targets"],
                                 batch["ys_lengths"])
            total_nll += float(loss) * int(n)
            total_n += int(n)
        return float(np.exp(total_nll / max(total_n, 1)))


def make_lm_fusion(model, params, batch_size: int, max_len: int):
    """Build (lm_step, lm_init) hooks for batch_beam_search shallow fusion."""
    if isinstance(model, TransformerLM):
        def lm_init(n):
            return model.apply({"params": params},
                               method=lambda m: m.init_cache(n, max_len))

        def lm_step(y_prev, cache):
            logits, cache = model.apply({"params": params}, y_prev, cache,
                                        method=lambda m, y, c: m.step(y, c))
            return jax.nn.log_softmax(logits.astype(jnp.float32), -1), cache
    else:
        def lm_init(n):
            return model.apply({"params": params},
                               method=lambda m: m.init_carry(n))

        def lm_step(y_prev, carry):
            logits, carry = model.apply({"params": params}, y_prev, carry,
                                        method=lambda m, y, c: m.step(y, c))
            return jax.nn.log_softmax(logits.astype(jnp.float32), -1), carry
    return lm_step, lm_init
