"""SLU inference CLI: decode a data dir, score intent acc + SLU-F1.

Reference: espnet2/bin/slu_inference.py + slurp local/score.py.
"""
import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--use_transcript", action="store_true",
                   help="feed the GT transcript stream (two-pass upper bound)")
    p.add_argument("--asr_exp_dir", default=None,
                   help="first-pass ASR exp dir: its hypotheses feed the "
                        "two-pass transcript stream (the full deployment "
                        "loop, slu_inference.py:241-290)")
    p.add_argument("--asr_beam_size", type=int, default=5)
    p.add_argument("--use_history", action="store_true",
                   help="roll decoded turns into the transcript stream "
                        "(asr_recog --usehistory analogue; utterances are "
                        "processed in uid order as one dialogue)")
    p.add_argument("--max_len", type=int, default=64)
    args = p.parse_args(argv)

    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..slu.metrics import intent_accuracy, slu_f1
    from ..tasks.slu import Speech2Understand

    s2u = Speech2Understand(args.exp_dir, max_len=args.max_len,
                            asr_exp_dir=args.asr_exp_dir,
                            asr_beam_size=args.asr_beam_size,
                            use_history=args.use_history)
    d = Path(args.data_dir)
    wavs = read_2column_text(d / "wav.scp")
    trs = read_2column_text(d / "transcript") \
        if (d / "transcript").exists() and args.use_transcript else {}
    hyps = {}
    with DatadirWriter(args.output_dir) as w:
        for uid, path in wavs.items():
            wav, _ = load_wav(path)
            hyps[uid] = s2u(wav, transcript=trs.get(uid))
            w["text"][uid] = hyps[uid]
    ref_path = d / "text"
    if ref_path.exists():
        refs = read_2column_text(ref_path)
        acc = intent_accuracy(refs, hyps)
        f1 = slu_f1(refs, hyps)
        logging.info("intent acc %.4f | SLU-F1 p=%.4f r=%.4f f1=%.4f",
                     acc, f1.precision, f1.recall, f1.f1)
        with open(Path(args.output_dir) / "score.txt", "w") as f:
            f.write(f"intent_acc {acc:.4f}\nslu_f1 {f1.f1:.4f}\n"
                    f"precision {f1.precision:.4f}\nrecall {f1.recall:.4f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
