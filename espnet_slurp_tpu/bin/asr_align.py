"""CTC forced-alignment CLI (reference espnet2/bin/asr_align.py):
align known transcripts to audio, write per-word timings + confidences."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="CTC segmentation / alignment")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True,
                   help="dir with wav.scp + text (the transcripts to align)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..data.fileio import load_wav, read_2column_text
    from ..data.sampler import bucket_length
    from ..decode.ctc_segmentation import align_words, ctc_viterbi_align
    from ..tasks.asr import Speech2Text

    s2t = Speech2Text(args.exp_dir, ckpt_name=args.ckpt)
    model, params = s2t.model, s2t.params
    frontend = s2t.cfg.model.frontend
    # encoder frame rate: frontend hop x conv2d x4 subsampling
    frame_s = frontend.hop_length * 4 / 16000.0

    @jax.jit
    def posteriors(speech, lengths):
        hs, hl, _ = model.apply(
            {"params": params}, speech, lengths,
            method=lambda m, s, sl: m.encode(s, sl,
                                             mvn_stats=s2t.mvn_stats))
        return model.apply({"params": params}, hs,
                           method=lambda m, x: m.ctc_logprobs(x)), hl

    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    texts = read_2column_text(Path(args.data_dir) / "text")
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_done = 0
    with open(out / "segments", "w", encoding="utf-8") as f:
        for uid, path in wavs.items():
            if uid not in texts:
                continue
            wav, sr = load_wav(path)
            n = bucket_length(len(wav), s2t.cfg.data.speech_bucket_multiple)
            buf = np.zeros((1, n), np.float32)
            buf[0, :len(wav)] = wav
            lp, hl = posteriors(jnp.asarray(buf),
                                jnp.asarray([len(wav)], np.int32))
            lp = np.asarray(lp)[0][: int(hl[0])]
            toks = s2t.tokenizer.text2tokens(texts[uid])
            ids = s2t.converter.tokens2ids(toks)
            timings = ctc_viterbi_align(lp, list(ids),
                                        s2t.cfg.model.blank_id)
            if s2t.cfg.data.token_type == "word":
                # word-level tokens: every token IS a word
                rows = [(st, en, cf, w) for (st, en, cf), w
                        in zip(timings, toks)]
            else:
                rows = align_words(timings, toks)
            for start, end, conf, word in rows:
                f.write(f"{uid} {start * frame_s:.3f} {end * frame_s:.3f} "
                        f"{conf:.3f} {word}\n")
            n_done += 1
    logging.info("aligned %d utts -> %s/segments", n_done, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
