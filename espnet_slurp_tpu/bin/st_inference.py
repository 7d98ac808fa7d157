"""ST inference CLI (reference espnet2/bin/st_inference.py): decode a data
dir to target-language text."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Speech translation decode")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--max_len", type=int, default=64)
    args = p.parse_args(argv)
    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..tasks.st import Speech2Translation
    from ..utils.metrics import corpus_bleu
    s2t = Speech2Translation(args.exp_dir, ckpt_name=args.ckpt,
                             beam_size=args.beam_size, max_len=args.max_len)
    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    hyps = {}
    with DatadirWriter(args.output_dir) as w:
        for uid, path in wavs.items():
            wav, _ = load_wav(path)
            hyps[uid] = s2t(wav)
            w["text"][uid] = hyps[uid]
    logging.info("translated %d utts -> %s", len(wavs), args.output_dir)
    # BLEU scoring (st.sh stage-13 sacrebleu analogue).
    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        bleu = corpus_bleu(read_2column_text(ref_path), hyps)
        logging.info("BLEU=%.2f", bleu)
        with open(Path(args.output_dir) / "score.txt", "w") as f:
            f.write(f"BLEU {bleu:.2f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
