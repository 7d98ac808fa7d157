"""Perf probe on the real chip: step time for variants + cost analysis."""
import json, time
import numpy as np

def build(dropout, b=64, secs=15, u=64, remat=False):
    import jax, jax.numpy as jnp
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
    from espnet_slurp_tpu.train.state import TrainState, make_train_step
    cfg = ASRConfig(vocab_size=5000, d_model=256, n_head=4, d_ff=1024,
                    num_encoder_blocks=12, num_decoder_blocks=6,
                    decoder_d_ff=2048, dropout_rate=dropout,
                    remat_encoder=remat, dtype="bfloat16")
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
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, donate=False)
    return step, state, batch

def timeit(step, state, batch, iters=8):
    import jax
    st, stats = step(state, batch)
    _ = float(stats["loss"])  # sync via value fetch (axon: block_until_ready no-op)
    t0 = time.time()
    for _ in range(iters):
        st, stats = step(st, batch)
    _ = float(stats["loss"])
    return (time.time() - t0) / iters

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    import sys
    drop = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    remat = len(sys.argv) > 3 and sys.argv[3] == "remat"
    step, state, batch = build(drop, b=b, remat=remat)
    t = timeit(step, state, batch)
    print(json.dumps({"variant": f"dropout{drop}_b{b}_remat{remat}",
                      "step_s": round(t, 4),
                      "audio_sec_s": round(b*15/t, 1)}))



def cost():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    step, state, batch = build(0.1)
    lowered = step.lower(state, batch) if hasattr(step, "lower") else None
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    keys = ["bytes accessed", "flops", "transcendentals",
            "bytes accessed output", "optimal_seconds"]
    out = {k: ca.get(k) for k in keys if ca and k in ca}
    print(json.dumps({"cost": out}))
    try:
        ma = comp.memory_analysis()
        print(json.dumps({"mem": {
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "arg_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "out_mb": round(ma.output_size_in_bytes / 1e6, 1)}}))
    except Exception as e:
        print("memory_analysis unavailable:", e)

if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "cost":
        cost()
    else:
        main()
