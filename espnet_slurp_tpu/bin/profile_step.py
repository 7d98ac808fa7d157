"""Profile one ASR train step by section (train/profile.py CLI).

Transport-robust op-level attribution: per-subgraph timing + XLA cost
analysis, printed as a markdown table. Use --exp_dir for a trained model
or --preset flagship|large for the bench configs.

Usage:
  python -m espnet_slurp_tpu.bin.profile_step --preset flagship
  python -m espnet_slurp_tpu.bin.profile_step --exp_dir exp/asr --b 16
"""
from __future__ import annotations

import argparse
import logging

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="Per-section step profiler")
    p.add_argument("--exp_dir", default=None)
    p.add_argument("--preset", default="flagship",
                   choices=["flagship", "large"])
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--secs", type=float, default=15.0)
    p.add_argument("--u", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    import jax
    from ..models.asr_model import ASRConfig, ASRModel
    from ..train.optim import OptimConfig, build_optimizer
    from ..train.profile import format_breakdown, step_breakdown

    if args.exp_dir:
        from pathlib import Path
        from ..tasks.asr import ASRTask, load_task_config
        from ..train.checkpoint import CheckpointManager
        cfg = load_task_config(Path(args.exp_dir) / "config.yaml")
        _, _, model_cfg = ASRTask.prepare_vocab(cfg)
        model = ASRModel(model_cfg)
        mgr = CheckpointManager(Path(args.exp_dir), cfg.keep_nbest)
        params = mgr.load_params(f"{mgr.latest_epoch()}epoch")
        vocab = model_cfg.vocab_size
    else:
        if args.preset == "flagship":
            cfg = ASRConfig(vocab_size=5000, d_model=256, n_head=4,
                            d_ff=1024, num_encoder_blocks=12,
                            num_decoder_blocks=6, decoder_d_ff=2048,
                            dropout_rate=0.1, dtype="bfloat16")
        else:
            cfg = ASRConfig(vocab_size=5000, d_model=512, n_head=8,
                            d_ff=2048, num_encoder_blocks=17,
                            num_decoder_blocks=6, decoder_d_ff=2048,
                            dropout_rate=0.1, dtype="bfloat16")
        model = ASRModel(cfg)
        vocab = cfg.vocab_size
        params = None

    rng = np.random.RandomState(0)
    n = int(16000 * args.secs)
    batch = {
        "speech": rng.randn(args.b, n).astype(np.float32) * 0.1,
        "speech_lengths": np.full((args.b,), n, np.int32),
        "text": rng.randint(1, vocab - 1,
                            size=(args.b, args.u)).astype(np.int32),
        "text_lengths": np.full((args.b,), args.u, np.int32),
    }
    if params is None:
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch["speech"][:2],
            batch["speech_lengths"][:2], batch["text"][:2],
            batch["text_lengths"][:2])["params"])()
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    sections = step_breakdown(model, params, batch, tx=tx,
                              repeats=args.repeats)
    print(format_breakdown(sections))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
