"""End-to-end smoke: mini corpus -> train -> checkpoint -> decode -> score.

The mini_an4-style integration test (SURVEY.md §4): a real pipeline on micro
data, CPU-only, every stage exercised — data prep, vocab build, bucketed
iteration, jitted training, checkpointing/resume, greedy + beam decode, WER
scoring.
"""
import dataclasses

import numpy as np
import pytest

import jax

from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.ops.specaug import SpecAugConfig
from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig, DataConfig,
                                        Speech2Text, load_task_config)
from espnet_slurp_tpu.train.optim import OptimConfig
from espnet_slurp_tpu.utils.config import save_yaml
from espnet_slurp_tpu.utils.metrics import error_rate


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    train_dir, dev_dir = make_mini_corpus(root, n_train=12, n_dev=4)
    return train_dir, dev_dir


def make_cfg(corpus, exp_dir) -> ASRTaskConfig:
    train_dir, dev_dir = corpus
    return ASRTaskConfig(
        exp_dir=str(exp_dir),
        model=ASRConfig(
            d_model=32, n_head=2, d_ff=64, num_encoder_blocks=2,
            num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
            dropout_rate=0.0, ctc_weight=0.3,
            frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
            specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant", grad_clip=5.0),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=6,
                        speech_bucket_multiple=2048,
                        text_bucket_multiple=4),
        max_epoch=2, keep_nbest=2, nbest_average=2, log_interval=10)


def test_config_yaml_roundtrip(corpus, tmp_path):
    cfg = make_cfg(corpus, tmp_path / "exp")
    save_yaml(cfg, tmp_path / "c.yaml")
    cfg2 = load_task_config(tmp_path / "c.yaml")
    assert cfg2 == cfg


def test_train_checkpoint_resume_decode(corpus, tmp_path):
    exp = tmp_path / "exp"
    cfg = make_cfg(corpus, exp)
    state = ASRTask.train(cfg)
    assert int(state.step) > 0
    # artifacts
    assert (exp / "config.yaml").exists()
    assert (exp / "tokens.txt").exists()
    assert (exp / "reporter.json").exists()
    # resume: continue 1 more epoch from checkpoint
    cfg3 = dataclasses.replace(cfg, max_epoch=3)
    state3 = ASRTask.train(cfg3)
    assert int(state3.step) > int(state.step)

    # decode (greedy + beam) through the Speech2Text API
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    train_dir, dev_dir = corpus
    refs = read_2column_text(dev_dir / "text")
    wavs = read_2column_text(dev_dir / "wav.scp")
    s2t = Speech2Text(str(exp), max_len=12)
    hyps = {}
    for uid, path in list(wavs.items())[:2]:
        wav, _ = load_wav(path)
        hyps[uid] = s2t(wav)
        assert isinstance(hyps[uid], str)
    wer, stats = error_rate(
        {u: refs[u] for u in hyps}, hyps, unit="word")
    assert np.isfinite(wer)  # untrained-quality model: just a sane number

    s2t_beam = Speech2Text(str(exp), max_len=12, beam_size=3, ctc_weight=0.3)
    for uid, path in list(wavs.items())[:1]:
        wav, _ = load_wav(path)
        out = s2t_beam(wav)
        assert isinstance(out, str)
