"""Scaled quality run: 50k-utterance corpus through the full recipe.

VERDICT r3 next-step #7: give the quality numbers a harder, non-saturated
substrate (>= 50k utts, >= 5k BPE vocab, noise + channel tilt) and exercise
checkpoint/resume + the LM/beam decode arms at scale. Reuses the ablation
corpus generator (recipe/ablation_run.py:make_hard_corpus) at 5x the
utterances and 6x the vocabulary (6000 words, 1000-word rare tail), a
bigger model (Conformer 8x256), BPE-5000, and reports WER / rare-word WER
for greedy, beam10 and beam10+LM (fusion weight swept on dev).

Reference analogue: egs2 recipe stages 10-13 at dataset scale
(egs2/TEMPLATE/asr1/asr.sh).

Usage: python -m espnet_slurp_tpu.recipe.scale_run [--out exp/scale]
Writes {out}/RESULTS_SCALE.md; arms are crash-resumable via results.json.
"""
from __future__ import annotations

import argparse
import json
import logging
import shutil
import time
from pathlib import Path

from ..data.fileio import load_wav, read_2column_text
from .ablation_run import make_hard_corpus

log = logging.getLogger("espnet_slurp_tpu")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="exp/scale")
    p.add_argument("--n_train", type=int, default=50000)
    # 8 epochs: the 50k corpus converges into the target 15-40% WER band
    # well before that; the axon tunnel pays per-RPC, so fewer/larger
    # steps and fewer epochs are the transport-friendly shape.
    p.add_argument("--max_epoch", type=int, default=8)
    p.add_argument("--skip_lm", action="store_true")
    p.add_argument("--compositional", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="grapheme-acoustic lexicon (see "
                        "ablation_run.make_hard_corpus)")
    args = p.parse_args(argv)

    from ..models.asr_model import ASRConfig
    from ..ops.specaug import SpecAugConfig
    from ..tasks.asr import ASRTask, ASRTaskConfig, DataConfig, Speech2Text
    from ..train.optim import OptimConfig
    from ..utils.metrics import error_rate, rare_word_error_rate

    t0 = time.time()
    out = Path(args.out)
    train_dir, dev_dir, test_dir, rare = make_hard_corpus(
        out / "corpus", n_train=args.n_train, n_dev=400, n_test=800,
        vocab_size=6000, n_rare=1000, seed=31,
        compositional=args.compositional)
    log.info("corpus ready (%.1fs)", time.time() - t0)

    base_exp = out / "exp_base"
    cfg = ASRTaskConfig(
        exp_dir=str(base_exp),
        model=ASRConfig(
            d_model=256, n_head=4, d_ff=1024, num_encoder_blocks=8,
            num_decoder_blocks=3, decoder_d_ff=1024, kernel_size=15,
            dropout_rate=0.1, ctc_weight=0.3, use_mvn="utterance",
            specaug=SpecAugConfig(freq_mask_width_range=(0, 10),
                                  time_mask_width_range=(0, 25)),
            dtype="bfloat16"),
        optim=OptimConfig(lr=2e-3, scheduler="warmuplr", warmup_steps=4000),
        data=DataConfig(
            train_dir=str(train_dir), valid_dir=str(dev_dir),
            token_type="bpe", bpe_vocab_size=5000,
            # Fixed-B sorted batching + coarse buckets (see
            # ablation_run.py): each distinct (B, T, U) shape costs a
            # remote compile + ~50 MB executable fetch over the tunnel;
            # the r4 numel config's ~100 shapes made epoch 1 cost 4285 s.
            batch_type="sorted", batch_size=64,
            speech_bucket_multiple=16384, text_bucket_multiple=32,
            # 50k utts ~ 5 GB int16 in HBM: the whole corpus rides the
            # tunnel once instead of 12 MB per step (the r4 run's 5:1
            # iter:step ratio and 20 s/step degraded-tunnel stalls).
            resident_corpus=True),
        max_epoch=args.max_epoch, keep_nbest=5, nbest_average=5,
        log_interval=50)
    log.info("=== base training (%d utts) ===", args.n_train)
    ASRTask.train(cfg)

    refs = read_2column_text(Path(test_dir) / "text")
    wavs = read_2column_text(Path(test_dir) / "wav.scp")
    loaded = sorted(((u, load_wav(pth)[0]) for u, pth in wavs.items()),
                    key=lambda x: len(x[1]))
    dev_refs = read_2column_text(Path(dev_dir) / "text")
    dev_wavs = read_2column_text(Path(dev_dir) / "wav.scp")
    dev_loaded = sorted(((u, load_wav(pth)[0])
                         for u, pth in dev_wavs.items()),
                        key=lambda x: len(x[1]))

    # One decode shape per model family (see ablation_run.py): 16-utt
    # chunks padded with repeats, waveforms padded to the corpus max.
    max_t = max(len(x) for _, x in loaded + dev_loaded)
    decode_bucket = -(-max_t // 16384) * 16384

    def run_decode(s2t, utts):
        hyps = {}
        for i in range(0, len(utts), 16):
            chunk = utts[i:i + 16]
            while len(chunk) < 16:
                chunk = chunk + [chunk[-1]]
            for (u, _), txt in zip(
                    chunk, s2t.decode_batch([x for _, x in chunk])):
                hyps[u] = txt
        return hyps

    def make_s2t(exp_dir, beam, **kw):
        return Speech2Text(str(exp_dir), beam_size=beam, ctc_weight=0.3,
                           max_len=32, decode_bucket_multiple=decode_bucket,
                           **kw)

    def decode(exp_dir, beam, _loaded=None, **kw):
        utts = loaded if _loaded is None else _loaded
        for attempt in range(3):
            try:
                return run_decode(make_s2t(exp_dir, beam, **kw), utts)
            except Exception as e:  # noqa: BLE001 - transport flake
                if attempt == 2:
                    raise
                log.warning("decode attempt %d failed (%s); retrying",
                            attempt + 1, e)
                time.sleep(20.0)

    results_json = out / "results.json"
    results = (json.loads(results_json.read_text())
               if results_json.exists() else {})

    def arm(tag, make_hyps):
        if tag in results:
            log.info("%s: cached %s", tag, results[tag])
            return
        hyps = make_hyps()
        wer, _ = error_rate(refs, hyps, "word")
        rare_wer, common_wer, _, _ = rare_word_error_rate(refs, hyps, rare)
        results[tag] = {"wer": wer, "rare_wer": rare_wer,
                        "common_wer": common_wer}
        results_json.write_text(json.dumps(results, indent=1))
        log.info("%s: WER %.2f%% rare %.2f%% common %.2f%%",
                 tag, wer * 100, rare_wer * 100, common_wer * 100)

    log.info("=== decode ===")
    arm("greedy", lambda: decode(base_exp, beam=1))
    arm("beam10", lambda: decode(base_exp, beam=10))

    if not args.skip_lm:
        from ..tasks.lm import LMDataConfig, LMTask, LMTaskConfig
        from ..models.lm import LMConfig
        lm_exp = out / "exp_lm"
        lm_exp.mkdir(parents=True, exist_ok=True)
        shutil.copy(base_exp / "tokens.txt", lm_exp / "tokens.txt")
        lm_cfg = LMTaskConfig(
            exp_dir=str(lm_exp),
            model=LMConfig(arch="transformer", d_model=256, n_head=4,
                           d_ff=1024, num_blocks=4, dropout_rate=0.1),
            optim=OptimConfig(lr=1e-3, scheduler="warmuplr",
                              warmup_steps=1000),
            data=LMDataConfig(train_text=str(Path(train_dir) / "text"),
                              valid_text=str(Path(dev_dir) / "text"),
                              token_type="bpe",
                              bpemodel=str(base_exp / "bpe.json"),
                              batch_size=128),
            max_epoch=8, keep_nbest=3)
        log.info("=== LM training ===")
        LMTask.train(lm_cfg)
        if "lm_weight" not in results:
            s2t = make_s2t(base_exp, beam=10, lm_exp_dir=str(lm_exp),
                           lm_weight=0.05, sweep_fusion=True)
            best, best_wer = (0.0, 0.0), None
            for w, ilm in ((0.05, 0.0), (0.1, 0.0), (0.2, 0.0),
                           (0.2, 0.1), (0.3, 0.15)):
                s2t.set_fusion_weights(lm_weight=w, ilm_weight=ilm)
                dev_hyps = run_decode(s2t, dev_loaded)
                dev_wer, _ = error_rate(dev_refs, dev_hyps, "word")
                log.info("lm sweep w=%.2f ilm=%.2f dev WER %.2f%%",
                         w, ilm, dev_wer * 100)
                if best_wer is None or dev_wer < best_wer:
                    best, best_wer = (w, ilm), dev_wer
            results["lm_weight"], results["lm_ilm_weight"] = best
            results_json.write_text(json.dumps(results, indent=1))
        arm("beam10_lm", lambda: decode(
            base_exp, beam=10, lm_exp_dir=str(lm_exp),
            lm_weight=results["lm_weight"], sweep_fusion=True,
            ilm_weight=results.get("lm_ilm_weight", 0.0)))

    lines = [
        "# RESULTS — scaled run (50k utts, 6000-word vocab, BPE-5000)",
        "",
        f"Corpus: {args.n_train} train / 400 dev / 800 test utts, "
        "6000-word Zipf vocab (1000-word rare tail), sparse bigram "
        "grammar, noise 0.05-0.12 + channel tilt "
        "(recipe/ablation_run.py:make_hard_corpus, seed 31).",
        f"Model: Conformer 8x256 + Transformer 3x256 decoder, BPE-5000, "
        f"CTC 0.3, SpecAug, bf16, {args.max_epoch} epochs.",
        "",
        "| setup | WER | rare-word WER | common WER |",
        "|---|---|---|---|",
    ]
    for tag, r in results.items():
        if not isinstance(r, dict):
            lines.append(f"| {tag} = {r} | | | |")
            continue
        lines.append(f"| {tag} | {r['wer'] * 100:.2f}% | "
                     f"{r['rare_wer'] * 100:.2f}% | "
                     f"{r['common_wer'] * 100:.2f}% |")
    lines += ["", json.dumps(results)]
    (out / "RESULTS_SCALE.md").write_text("\n".join(lines) + "\n")
    log.info("wrote %s (total %.0fs)", out / "RESULTS_SCALE.md",
             time.time() - t0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
