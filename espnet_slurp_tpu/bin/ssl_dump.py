"""Dump SSL features for feats_type=ssl training (S3PRL-analogue).

Parity target: the reference's S3prlFrontend path
(espnet2/asr/frontend/s3prl.py) where an external SSL model provides
frame-level features. Here the in-framework wav2vec2 encoder
(models/wav2vec2.py, HF weight import via wav2vec2_params_from_torch)
plays the external model: every utterance's per-layer transformer hidden
states are dumped as .npy [T, L, D] (--layer -1, multilayer_feature
analogue) or [T, D] (--layer k), written as feats.scp consumable by
`--feats_type ssl` training and decoding.

Usage:
  python -m espnet_slurp_tpu.bin.ssl_dump --data_dir data/train \
      --out_dir dump/ssl/train [--torch_ckpt w2v2.pt] [--layer -1]
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="Dump SSL features (S3PRL "
                                            "frontend analogue)")
    p.add_argument("--data_dir", required=True, help="dir with wav.scp")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--torch_ckpt", default=None,
                   help="HF wav2vec2 state-dict .pt to load (random-"
                        "initialized extractor otherwise — useful for "
                        "pipeline tests)")
    p.add_argument("--layer", type=int, default=-1,
                   help="-1: stack ALL layers [T, L, D]; k: single layer")
    p.add_argument("--d_model", type=int, default=64)
    p.add_argument("--num_blocks", type=int, default=3)
    p.add_argument("--n_head", type=int, default=4)
    p.add_argument("--d_ff", type=int, default=128)
    p.add_argument("--batch_frames", type=int, default=1_600_000,
                   help="waveform samples per dump batch")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..models.wav2vec2 import (Wav2Vec2Config, Wav2Vec2Encoder,
                                   wav2vec2_params_from_torch)

    cfg = Wav2Vec2Config(d_model=args.d_model, num_blocks=args.num_blocks,
                         n_head=args.n_head, d_ff=args.d_ff)
    enc = Wav2Vec2Encoder(cfg)
    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    first = load_wav(next(iter(wavs.values())))[0]
    params = enc.init(jax.random.PRNGKey(args.seed),
                      jnp.asarray(first[None, :]),
                      jnp.asarray([len(first)]))["params"]
    if args.torch_ckpt:
        import torch
        sd = torch.load(args.torch_ckpt, map_location="cpu")
        params = wav2vec2_params_from_torch(sd, cfg)

    @jax.jit
    def run(speech, lengths):
        return enc.apply({"params": params}, speech, lengths,
                         method=lambda m, s, sl: m.layer_states(s, sl))

    out = Path(args.out_dir)
    feat_dir = out / "data"
    feat_dir.mkdir(parents=True, exist_ok=True)
    items = sorted(((u, p) for u, p in wavs.items()))
    n_frames = 0
    with DatadirWriter(out) as w:
        batch, batch_n = [], 0
        def flush():
            nonlocal n_frames
            if not batch:
                return
            n_max = max(len(x) for _, x in batch)
            buf = np.zeros((len(batch), n_max), np.float32)
            lens = np.zeros((len(batch),), np.int32)
            for i, (_, x) in enumerate(batch):
                buf[i, :len(x)] = x
                lens[i] = len(x)
            states, flens = run(jnp.asarray(buf), jnp.asarray(lens))
            states = np.asarray(states, np.float32)
            for i, (uid, _) in enumerate(batch):
                t = int(flens[i])
                mat = states[i, :t]            # [T, L, D]
                if args.layer >= 0:
                    mat = mat[:, args.layer]   # [T, D]
                path = feat_dir / f"{uid}.npy"
                np.save(path, mat)
                w["feats.scp"][uid] = str(path)
                n_frames += t
            batch.clear()
        for uid, path in items:
            wav, _ = load_wav(path)
            batch.append((uid, wav))
            batch_n += len(wav)
            if batch_n >= args.batch_frames:
                flush()
                batch_n = 0
        flush()
        # carry text through so the dump dir is a complete data dir
        text_path = Path(args.data_dir) / "text"
        if text_path.exists():
            for uid, txt in read_2column_text(text_path).items():
                if uid in wavs:
                    w["text"][uid] = txt
    logging.info("dumped %d utts (%d frames, %s layers x %d dims) to %s",
                 len(items), n_frames,
                 "all" if args.layer < 0 else 1, args.d_model, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
