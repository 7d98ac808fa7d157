"""Streaming (block-online) ASR inference CLI.

Parity target: reference espnet2/bin/asr_inference_streaming.py
(Speech2TextStreaming fed sim_chunk_length samples at a time from a data
dir, emitting partial hypotheses per chunk and a final beam result). Drives
decode/streaming.py:StreamingRecognizer over a chunk-attention model.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(
        description="Streaming decode with a chunk-attention ASR model")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True,
                   help="dir with wav.scp (+ text for scoring)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir name under exp_dir")
    p.add_argument("--sim_chunk_length", type=int, default=8192,
                   help="samples fed per streaming call (reference "
                        "asr_inference_streaming.py --sim_chunk_length)")
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--max_len", type=int, default=128)
    p.add_argument("--print_partial", action="store_true",
                   help="log intermediate CTC-greedy hypotheses per chunk")
    p.add_argument("--incremental", action="store_true",
                   help="O(1)-state exact incremental encoder (per-layer "
                        "caches, decode/incremental.py) instead of "
                        "full-prefix re-encoding — constant per-chunk "
                        "latency on long streams; needs left_chunks >= 0")
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    import time

    import numpy as np

    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..decode.streaming import StreamingRecognizer
    from ..tasks.asr import ASRTask, Speech2Text, load_task_config
    from ..utils.metrics import error_rate

    # Reuse Speech2Text's config/vocab/params loading, then wrap the model
    # in the incremental recognizer.
    s2t = Speech2Text(args.exp_dir, ckpt_name=args.ckpt,
                      max_len=args.max_len, beam_size=args.beam_size)
    if args.incremental:
        from ..decode.incremental import IncrementalRecognizer
        rec = IncrementalRecognizer(
            s2t.model, s2t.params, tokenizer=s2t.tokenizer,
            converter=s2t.converter, chunk_samples=args.sim_chunk_length,
            max_len=args.max_len, beam_size=args.beam_size,
            mvn_stats=s2t.mvn_stats)
    else:
        rec = StreamingRecognizer(
            s2t.model, s2t.params, tokenizer=s2t.tokenizer,
            converter=s2t.converter, chunk_samples=args.sim_chunk_length,
            max_len=args.max_len, beam_size=args.beam_size,
            mvn_stats=s2t.mvn_stats)

    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    hyps = {}
    audio_sec = 0.0
    decode_sec = 0.0
    with DatadirWriter(args.output_dir) as w:
        for uid, path in wavs.items():
            wav, sr = load_wav(path)
            audio_sec += len(wav) / sr
            rec.reset()
            n = args.sim_chunk_length
            t0 = time.perf_counter()
            ids = []
            for off in range(0, max(len(wav), 1), n):
                chunk = wav[off:off + n]
                final = off + n >= len(wav)
                ids, done = rec(chunk, is_final=final)
                if args.print_partial and not done and ids:
                    logging.info("%s [partial] %s", uid, rec.text(ids))
            decode_sec += time.perf_counter() - t0
            text = rec.text(ids)
            hyps[uid] = text
            w["text"][uid] = text
    rtf = decode_sec / max(audio_sec, 1e-9)
    logging.info("streamed %.1fs audio in %.1fs (RTF %.4f, chunk %d)",
                 audio_sec, decode_sec, rtf, args.sim_chunk_length)
    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = read_2column_text(ref_path)
        wer, stats = error_rate(refs, hyps, unit="word")
        cer, _ = error_rate(refs, hyps, unit="char")
        logging.info("WER=%.2f%% CER=%.2f%% (%d ref words)", wer * 100,
                     cer * 100, stats.ref_len)
        with open(Path(args.output_dir) / "score.txt", "w") as f:
            f.write(f"WER {wer:.4f}\nCER {cer:.4f}\nRTF {rtf:.4f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
