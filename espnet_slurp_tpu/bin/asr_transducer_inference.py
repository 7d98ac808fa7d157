"""Transducer inference CLI (reference espnet2/bin/asr_transducer_inference.py)."""
import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--search", default="alsa",
                   choices=("greedy", "alsa", "default", "maes", "tsd",
                            "nsc"))
    p.add_argument("--streaming", action="store_true",
                   help="chunked incremental decode (requires a model "
                        "trained with asr.chunk_size > 0; reference "
                        "asr_transducer_inference.py --streaming)")
    p.add_argument("--sim_chunk_length", type=int, default=8192,
                   help="samples fed per streaming call")
    args = p.parse_args(argv)
    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..tasks.asr_transducer import Speech2TextTransducer
    from ..utils.metrics import error_rate
    s2t = Speech2TextTransducer(args.exp_dir, beam_size=args.beam_size,
                                search=args.search)
    rec = None
    if args.streaming:
        from ..decode.streaming import StreamingTransducerRecognizer
        rec = StreamingTransducerRecognizer(
            s2t.model, s2t.params, tokenizer=s2t.tokenizer,
            converter=s2t.converter, chunk_samples=args.sim_chunk_length,
            max_len=s2t.max_len, beam_size=args.beam_size,
            search=args.search)
    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    hyps = {}
    with DatadirWriter(args.output_dir) as w:
        for uid, path in wavs.items():
            wav, _ = load_wav(path)
            if rec is not None:
                rec.reset()
                ids = []
                n = args.sim_chunk_length
                for off in range(0, max(len(wav), 1), n):
                    ids, _ = rec(wav[off:off + n],
                                 is_final=off + n >= len(wav))
                hyps[uid] = rec.text(ids)
            else:
                hyps[uid] = s2t(wav)
            w["text"][uid] = hyps[uid]
    refs_p = Path(args.data_dir) / "text"
    if refs_p.exists():
        wer, _ = error_rate(read_2column_text(refs_p), hyps)
        logging.info("WER %.2f%%", wer * 100)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
