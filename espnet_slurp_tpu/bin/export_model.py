"""Export a trained ASR model's inference graph for serving.

Production-deployment path with no reference equivalent (the reference
serves through espnet_model_zoo + a live torch runtime): the jitted
speech->tokens function — frontend, encoder, and greedy/beam decode, with
the trained parameters baked in as constants — is serialized to a
versioned StableHLO artifact via ``jax.export``. A server (or another
process/framework version) reloads it with ``load_exported`` and calls it
without any model code, config parsing, or checkpoint restore.

Shapes are static per artifact (TPU serving discipline): pick the audio
bucket lengths and batch size at export time; export one artifact per
bucket and route requests by length, exactly like the training-side
bucketing.
"""
from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path


def export_speech2text(exp_dir: str, out_dir: str, batch: int,
                       num_samples: int, beam_size: int = 1,
                       max_len: int = 128, ckpt: str | None = None):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..tasks.asr import Speech2Text

    s2t = Speech2Text(exp_dir, ckpt_name=ckpt, beam_size=beam_size,
                      max_len=max_len)
    params = s2t.params
    decode = s2t._build_decode()  # jitted (params, speech, lengths) fn

    fusion = jnp.asarray([s2t.lm_weight, s2t.ngram_weight,
                          s2t.ilm_weight], jnp.float32)

    def serve(speech, speech_lengths):
        return decode(params, speech, speech_lengths, fusion)

    exp = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((batch, num_samples), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "model.stablehlo").write_bytes(exp.serialize())
    tokens = (Path(exp_dir) / "tokens.txt").read_text()
    (out / "tokens.txt").write_text(tokens)
    (out / "meta.json").write_text(json.dumps({
        "batch": batch, "num_samples": num_samples,
        "beam_size": beam_size, "max_len": max_len,
        "platforms": list(exp.platforms),
    }))
    return out


def load_exported(out_dir: str):
    """-> (call(speech [B, N] f32, lengths [B] i32) -> (tokens, lengths),
    token_list, meta). No model code or checkpoints needed."""
    from jax import export as jexport
    out = Path(out_dir)
    exp = jexport.deserialize((out / "model.stablehlo").read_bytes())
    meta = json.loads((out / "meta.json").read_text())
    tokens = (out / "tokens.txt").read_text().splitlines()
    return exp.call, tokens, meta


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Export ASR for serving")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=16000 * 15,
                   help="audio bucket length in samples (static shape)")
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--max_len", type=int, default=128)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)
    out = export_speech2text(args.exp_dir, args.output_dir, args.batch,
                             args.num_samples, args.beam_size, args.max_len,
                             args.ckpt)
    size = (out / "model.stablehlo").stat().st_size
    logging.info("exported %s (%.1f MB, B=%d, N=%d)", out, size / 1e6,
                 args.batch, args.num_samples)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
