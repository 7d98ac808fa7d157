"""Streaming (block-online) speech-translation inference CLI.

Parity target: reference espnet2/bin/st_inference_streaming.py —
Speech2TextStreaming over an ST model trained with a streaming encoder
(chunk attention + causal convs here, contextual-block there), fed
sim_chunk_length samples per call, final attention beam at end-of-stream.
Partial hypotheses come from the inner ASR CTC head and are only
meaningful if the ST model was trained with an aux CTC over target tokens;
by default partials are not printed.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(
        description="Streaming speech-translation decode")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True,
                   help="dir with wav.scp (+ text for BLEU scoring)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--sim_chunk_length", type=int, default=8192)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--max_len", type=int, default=64)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    import time

    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..decode.streaming import StreamingRecognizer
    from ..models.asr_model import ASRModel
    from ..tasks.st import STTask, load_st_config
    from ..train.checkpoint import CheckpointManager
    from ..utils.metrics import corpus_bleu

    exp = Path(args.exp_dir)
    cfg = load_st_config(exp / "config.yaml")
    if cfg.model.chunk_size <= 0:
        raise SystemExit("streaming ST needs a chunk-attention encoder "
                         "(model.chunk_size > 0 at training time)")
    tokenizer, tgt_conv, _ = STTask.prepare_vocabs(cfg)
    model = ASRModel(cfg.model)
    mgr = CheckpointManager(exp, cfg.run.keep_nbest)
    ckpt = args.ckpt or f"{mgr.latest_epoch()}epoch"
    params = mgr.load_params(ckpt)["asr"]
    rec = StreamingRecognizer(model, params, tokenizer=tokenizer,
                              converter=tgt_conv,
                              chunk_samples=args.sim_chunk_length,
                              max_len=args.max_len,
                              beam_size=args.beam_size, ctc_weight=0.0)

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
                final = off + n >= len(wav)
                ids, _ = rec(wav[off:off + n], is_final=final)
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
        bleu = corpus_bleu(refs, hyps)
        logging.info("BLEU=%.2f", bleu)
        with open(Path(args.output_dir) / "score.txt", "w") as f:
            f.write(f"BLEU {bleu:.2f}\nRTF {rtf:.4f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
