"""SLU quality run: synthetic SLURP-style corpus -> two-pass SLU training
-> intent accuracy + SLU-F1 at several checkpoints.

Companion to recipe/results_run.py (the ASR WER quality run): real SLURP
audio is not obtainable in-environment, so this synthesizes a
SLURP-entity-format corpus with enough per-speaker acoustic variability
(pitch/rate/amplitude/noise, shared with results_run._unit_wave) that the
intent/entity mapping must be LEARNED. Writes {out}/RESULTS_SLU.md.

Usage: python -m espnet_slurp_tpu.recipe.slu_results_run [--out exp/slu_results]
"""
from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

from ..data.fileio import DatadirWriter, write_wav
from .results_run import _unit_wave

log = logging.getLogger("espnet_slurp_tpu")

INTENTS = ["audio_volume_up", "calendar_set", "play_music", "weather_query",
           "alarm_set", "email_send"]
ENT_TYPES = ["device", "date", "song", "place", "time", "person"]
VOCAB = [f"w{i:02d}" for i in range(60)]


def make_slu_synth_corpus(root, n_train=2000, n_dev=100, n_test=100,
                          fs=16000, seed=17):
    """Intent is carried by a 2-word 'carrier phrase' (unit sequence) per
    intent class — not a single marker tone — plus a typed entity word, so
    the model must decode words AND map them to labels."""
    root = Path(root)
    rng = np.random.RandomState(seed)
    word_units = {w: (rng.randint(0, 30), rng.randint(0, 30))
                  for w in VOCAB}
    carrier = {it: [VOCAB[rng.randint(len(VOCAB))] for _ in range(2)]
               for it in INTENTS}
    dirs = []
    for split, n in (("train", n_train), ("dev", n_dev), ("test", n_test)):
        d = root / split
        (d / "wav").mkdir(parents=True, exist_ok=True)
        with DatadirWriter(d) as writer:
            for i in range(n):
                it = INTENTS[rng.randint(len(INTENTS))]
                filler = VOCAB[rng.randint(len(VOCAB))]
                extra = [VOCAB[rng.randint(len(VOCAB))]
                         for _ in range(rng.randint(0, 3))]
                words = carrier[it] + [filler] + extra
                f0 = rng.uniform(0.85, 1.2)      # per-utt "speaker"
                rate = rng.uniform(0.85, 1.2)
                amp = rng.uniform(0.5, 1.0)
                segs = []
                for w in words:
                    for u in word_units[w]:
                        dur = int(fs * 0.09 * rate * rng.uniform(0.9, 1.1))
                        segs.append(_unit_wave(u, f0, dur, fs, rng))
                wav = amp * np.concatenate(segs)
                wav = wav + 0.02 * rng.randn(len(wav)).astype(np.float32)
                uid = f"{split}_{i:05d}"
                path = d / "wav" / f"{uid}.wav"
                write_wav(str(path), wav.astype(np.float32), fs)
                ent = ENT_TYPES[INTENTS.index(it)]
                writer["wav.scp"][uid] = str(path)
                writer["text"][uid] = (f"{it} SEP {ent} FILL {filler} SEP "
                                       f"{' '.join(words)}")
                writer["transcript"][uid] = " ".join(words)
        dirs.append(d)
    return tuple(dirs)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="exp/slu_results")
    p.add_argument("--corpus", default="exp/slu_results/corpus")
    p.add_argument("--n_train", type=int, default=2000)
    p.add_argument("--max_epoch", type=int, default=30)
    p.add_argument("--asr_epochs", type=int, default=0,
                   help="> 0: also train a first-pass ASR on the corpus "
                        "transcripts and score the TRUE two-pass loop "
                        "(ASR-hypothesis transcript stream, the "
                        "reference's 86.8-vs-89.0 distinction)")
    args = p.parse_args(argv)

    from ..models.asr_model import ASRConfig
    from ..ops.specaug import SpecAugConfig
    from ..slu.metrics import intent_accuracy, slu_f1
    from ..slu.model import SLUConfig
    from ..tasks.asr import DataConfig
    from ..tasks.slu import SLUTask, SLUTaskConfig, Speech2Understand
    from ..train.optim import OptimConfig
    from ..data.fileio import load_wav, read_2column_text

    t0 = time.time()
    train_dir, dev_dir, test_dir = make_slu_synth_corpus(
        args.corpus, n_train=args.n_train)
    log.info("corpus ready (%.1fs)", time.time() - t0)

    exp = Path(args.out) / "exp"
    cfg = SLUTaskConfig(
        exp_dir=str(exp),
        model=SLUConfig(
            asr=ASRConfig(
                d_model=128, n_head=4, d_ff=512, num_encoder_blocks=4,
                num_decoder_blocks=2, decoder_d_ff=512, kernel_size=15,
                dropout_rate=0.1, ctc_weight=0.3, use_mvn="utterance",
                specaug=SpecAugConfig(freq_mask_width_range=(0, 10),
                                      time_mask_width_range=(0, 20)),
                dtype="bfloat16"),
            two_pass=True, text_encoder_blocks=2, text_encoder_d_ff=256),
        optim=OptimConfig(lr=1e-3, scheduler="warmuplr", warmup_steps=600),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted",
                        batch_size=64, speech_bucket_multiple=8192,
                        text_bucket_multiple=8),
        max_epoch=args.max_epoch, keep_nbest=100, nbest_average=5,
        log_interval=20)
    SLUTask.train(cfg)
    log.info("training done (%.1fs)", time.time() - t0)

    refs = read_2column_text(Path(test_dir) / "text")
    wavs = read_2column_text(Path(test_dir) / "wav.scp")
    trs = read_2column_text(Path(test_dir) / "transcript")

    def decode_with(ckpt_name):
        s2u = Speech2Understand(str(exp), ckpt_name=ckpt_name, max_len=24)
        hyps = {u: s2u(load_wav(p)[0], transcript=trs[u])
                for u, p in wavs.items()}
        f1 = slu_f1(refs, hyps)
        return intent_accuracy(refs, hyps), f1.f1

    hist = json.loads((exp / "reporter.json").read_text())["history"]
    ckpts = []
    for e in (3, max(args.max_epoch // 2, 4), args.max_epoch):
        if (exp / f"{e}epoch").exists():
            ckpts.append(f"{e}epoch")
    ave = sorted(exp.glob("valid.*ave_*best"))
    if ave:
        ckpts.append(ave[0].name)
    scores = {}
    for name in ckpts:
        scores[name] = decode_with(name)
        log.info("intent-acc[%s] = %.2f%%  SLU-F1 = %.3f", name,
                 scores[name][0] * 100, scores[name][1])

    # TRUE two-pass: train a first-pass ASR on the corpus transcripts and
    # feed its hypotheses into the transcript stream (slu_inference.py's
    # deployment path; GT transcripts above are the upper bound).
    two_pass = None
    if args.asr_epochs > 0:
        from ..tasks.asr import ASRTask, ASRTaskConfig
        from ..models.asr_model import ASRConfig as _ASRCfg
        from ..ops.specaug import SpecAugConfig as _SA
        asr_root = Path(args.corpus)
        for split, d in (("train", train_dir), ("dev", dev_dir)):
            ad = asr_root / f"asr_{split}"
            ad.mkdir(parents=True, exist_ok=True)
            for src, dst in (("wav.scp", "wav.scp"),
                             ("transcript", "text")):
                (ad / dst).write_text((Path(d) / src).read_text())
        asr_exp = Path(args.out) / "asr_exp"
        asr_cfg = ASRTaskConfig(
            exp_dir=str(asr_exp),
            model=_ASRCfg(
                d_model=128, n_head=4, d_ff=512, num_encoder_blocks=4,
                num_decoder_blocks=2, decoder_d_ff=512, kernel_size=15,
                dropout_rate=0.1, ctc_weight=0.3, use_mvn="utterance",
                specaug=_SA(freq_mask_width_range=(0, 10),
                            time_mask_width_range=(0, 20)),
                dtype="bfloat16"),
            optim=OptimConfig(lr=1e-3, scheduler="warmuplr",
                              warmup_steps=400),
            data=DataConfig(train_dir=str(asr_root / "asr_train"),
                            valid_dir=str(asr_root / "asr_dev"),
                            token_type="word", batch_type="sorted",
                            batch_size=64, speech_bucket_multiple=8192,
                            text_bucket_multiple=8),
            max_epoch=args.asr_epochs, keep_nbest=5, nbest_average=3,
            log_interval=20)
        ASRTask.train(asr_cfg)
        log.info("first-pass ASR done (%.1fs)", time.time() - t0)
        best = ckpts[-1]
        s2u = Speech2Understand(str(exp), ckpt_name=best, max_len=24,
                                asr_exp_dir=str(asr_exp), asr_beam_size=5)
        hyps = {u: s2u(load_wav(p)[0]) for u, p in wavs.items()}
        f1 = slu_f1(refs, hyps)
        two_pass = (best, intent_accuracy(refs, hyps), f1.f1)
        log.info("TWO-PASS (ASR hyp) intent-acc[%s] = %.2f%% SLU-F1 = %.3f",
                 best, two_pass[1] * 100, two_pass[2])

    out = Path(args.out)
    lines = [
        "## SLU quality run (two-pass, GT-transcript stream)",
        "",
        f"Corpus: {args.n_train} train / 100 dev / 100 test synthetic "
        f"SLURP-entity-format utterances, {len(INTENTS)} intents with "
        "2-word carrier phrases + typed entity fillers, per-utterance "
        "pitch/rate/amplitude/noise variation "
        "(recipe/slu_results_run.py:make_slu_synth_corpus).",
        "",
        "| epoch | train loss | valid loss | valid acc |",
        "|---|---|---|---|",
    ]
    for e in hist:
        lines.append(f"| {e['epoch']} | {e['train']['loss']:.3f} | "
                     f"{e['valid']['loss']:.3f} | "
                     f"{e['valid'].get('acc', float('nan')):.3f} |")
    lines += ["", "| checkpoint | intent acc | SLU-F1 |", "|---|---|---|"]
    for name, (acc, f1) in scores.items():
        lines.append(f"| {name} | {acc * 100:.2f}% | {f1:.3f} |")
    if two_pass is not None:
        name, acc, f1 = two_pass
        lines += ["",
                  "| two-pass (first-pass ASR hypotheses) | intent acc "
                  "| SLU-F1 |", "|---|---|---|",
                  f"| {name} + ASR beam 5 | {acc * 100:.2f}% | {f1:.3f} |"]
    (out / "RESULTS_SLU.md").write_text("\n".join(lines) + "\n")
    log.info("wrote %s", out / "RESULTS_SLU.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
