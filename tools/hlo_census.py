"""HLO byte census of the flagship train step (PERF_NOTES methodology).

Compiles bench.py's exact train step (CPU backend is fine for HLO; pass
--tpu to compile for the chip) and prints:
  - compiled.cost_analysis() flops / bytes accessed
  - the top-N largest buffers in the optimized HLO, by shape size

Usage: python tools/hlo_census.py [--tpu] [--top 30]
"""
from __future__ import annotations

import argparse
import collections
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import os
    sys.path.insert(0, "/root/repo")
    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_default_prng_impl", "rbg")

    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
    from espnet_slurp_tpu.train.state import TrainState, make_train_step

    cfg = ASRConfig(vocab_size=5000, d_model=256, n_head=4, d_ff=1024,
                    num_encoder_blocks=12, num_decoder_blocks=6,
                    decoder_d_ff=2048, dropout_rate=0.1, dtype="bfloat16")
    model = ASRModel(cfg)
    b, secs, u = 64, 15, 64
    n = 16000 * secs
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((b,), n, jnp.int32),
        "text": jnp.asarray(rng.randint(1, 4999, size=(b, u)), jnp.int32),
        "text_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch["speech"][:2],
                           batch["speech_lengths"][:2], batch["text"][:2],
                           batch["text_lengths"][:2])["params"])()
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, donate=False)
    lowered = jax.jit(step).lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byt = ca.get("bytes accessed", 0.0)
    print(f"flops={flops/1e12:.2f} TF  bytes={byt/1e9:.2f} GB")
    print(f"  roofline @819GB/s: {byt/819e9*1e3:.1f} ms; "
          f"@180TF/s: {flops/180e12*1e3:.1f} ms")

    hlo = compiled.as_text()
    # Census: count bytes per (dtype, shape) across all HLO instruction
    # result types. Crude but effective for spotting dominant temporaries.
    pat = re.compile(r"\b(f32|bf16|f16|u32|s32|u8|pred)\[([0-9,]+)\]")
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "u32": 4, "s32": 4,
                "u8": 1, "pred": 1}
    census = collections.Counter()
    for m in pat.finditer(hlo):
        dt, dims = m.group(1), m.group(2)
        numel = 1
        for d in dims.split(","):
            numel *= int(d)
        census[f"{dt}[{dims}]"] += numel * dt_bytes[dt]
    total = sum(census.values())
    print(f"total census bytes (incl. double counting): {total/1e9:.1f} GB")
    for k, v in census.most_common(args.top):
        print(f"  {v/1e9:8.2f} GB  {k}")


if __name__ == "__main__":
    sys.exit(main())
