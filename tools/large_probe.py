"""LS-960 conformer-large-class step benchmark: achieved TFLOP/s + MFU."""
import json, sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
    from espnet_slurp_tpu.train.state import TrainState, make_train_step
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    secs, u = 15, 80
    cfg = ASRConfig(vocab_size=5000, d_model=512, n_head=8, d_ff=2048,
                    num_encoder_blocks=17, num_decoder_blocks=6,
                    decoder_d_ff=2048, dropout_rate=0.1, dtype="bfloat16")
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
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, donate=True)
    flops = None
    try:
        low = jax.jit(make_train_step(model, tx, donate=False)).lower(
            state, batch)
        ca = low.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception as e:
        byts = 0.0
        print("cost_analysis failed:", e, file=sys.stderr)
    state, stats = step(state, batch)
    float(stats["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, batch)
    float(stats["loss"])
    dt = (time.perf_counter() - t0) / iters
    peak = 197e12  # v5e bf16
    out = {"b": b, "params_m": round(n_params / 1e6, 1),
           "step_ms": round(dt * 1e3, 1),
           "audio_sec_s": round(b * secs / dt, 1)}
    if flops:
        out["tflops_per_step"] = round(flops / 1e12, 2)
        out["achieved_tflops"] = round(flops / dt / 1e12, 1)
        out["mfu_pct"] = round(flops / dt / peak * 100, 1)
        out["bytes_gb"] = round(byts / 1e9, 1)
        out["hbm_gbps"] = round(byts / dt / 1e9, 1)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
