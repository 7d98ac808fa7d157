"""Pipelined-vs-serial train-step timing on the real chip.

Single-chip hardware (v5e-1 over axon) cannot host a >1-stage pipe axis, so
this measures what IS measurable on one chip: the pipelined machinery's
overhead at pipe=1 (microbatch scan + stacked-block layout + restack) vs
the serial step, at the memory-pressured 17x512 config. Multi-stage
correctness/speedup structure is validated separately on the virtual
8-device CPU mesh (tests/test_pipeline_parallel.py + __graft_entry__
dryrun_multichip). Reports ms/step and device memory stats when the PJRT
backend exposes them (microbatching trades peak activation memory for
bubble time — the memory column is the point).

Usage: python tools/pipelined_probe.py [n_micro] [d_model] [blocks] [B]
Prints one JSON line.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    sys.path.insert(0, "/root/repo")
    from jax.sharding import Mesh
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.parallel.pipelined_asr import (
        make_pipelined_asr_train_step, to_pipelined)
    from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
    from espnet_slurp_tpu.train.state import TrainState, make_train_step

    n_micro = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    d_model = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 17
    b = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    secs, u = 15, 80
    cfg = ASRConfig(vocab_size=5000, d_model=d_model, n_head=8,
                    d_ff=4 * d_model, num_encoder_blocks=blocks,
                    num_decoder_blocks=6, decoder_d_ff=2048,
                    dropout_rate=0.1, dtype="bfloat16")
    model = ASRModel(cfg)
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

    def timeit(step, state, iters=6):
        st, stats = step(state, batch)
        float(stats["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, stats = step(st, batch)
        float(stats["loss"])
        return (time.perf_counter() - t0) / iters

    def memstats():
        try:
            s = jax.devices()[0].memory_stats() or {}
            return round(s.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            return None

    out = {"config": f"{blocks}x{d_model} B={b}", "n_micro": n_micro}
    # serial
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    t = timeit(make_train_step(model, tx, donate=True), state)
    out["serial_ms"] = round(t * 1e3, 1)
    out["serial_peak_gib"] = memstats()
    # pipelined (pipe=1 on one chip: machinery overhead measurement)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("pipe",))
    pp = to_pipelined(params, 1)
    pstate = TrainState.create(pp, tx, jax.random.PRNGKey(0))
    step, _ = make_pipelined_asr_train_step(model, tx, mesh, n_micro=n_micro)
    t = timeit(step, pstate)
    out["pipelined_ms"] = round(t * 1e3, 1)
    out["pipelined_peak_gib"] = memstats()
    out["overhead_pct"] = round(
        100.0 * (out["pipelined_ms"] / out["serial_ms"] - 1.0), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
