"""Component-ablation timing of the flagship train step (op-level profiler
is unavailable over the axon transport; differences between jitted variants
attribute the step time instead)."""
import json, sys, time
import numpy as np


def build(b=64, secs=15, u=64, **over):
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
    from espnet_slurp_tpu.train.state import TrainState, make_train_step
    kw = dict(vocab_size=5000, d_model=256, n_head=4, d_ff=1024,
              num_encoder_blocks=12, num_decoder_blocks=6,
              decoder_d_ff=2048, dropout_rate=0.1, dtype="bfloat16")
    kw.update(over)
    cfg = ASRConfig(**kw)
    model = ASRModel(cfg)
    n = 16000 * secs
    rng = np.random.RandomState(0)
    if over.get("input_feats"):
        t = n // 128  # frontend hop 128: T matches the raw path
        speech = jnp.asarray(rng.randn(b, t, 80).astype(np.float32))
        slens = jnp.full((b,), t, jnp.int32)
    else:
        speech = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1)
        slens = jnp.full((b,), n, jnp.int32)
    batch = {
        "speech": speech, "speech_lengths": slens,
        "text": jnp.asarray(rng.randint(1, 4999, size=(b, u)), jnp.int32),
        "text_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch["speech"][:2],
                           batch["speech_lengths"][:2], batch["text"][:2],
                           batch["text_lengths"][:2])["params"])()
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, donate=True)
    return step, state, batch


def timeit(step, state, batch, iters=8):
    st, stats = step(state, batch)
    float(stats["loss"])
    t0 = time.time()
    for _ in range(iters):
        st, stats = step(st, batch)
    float(stats["loss"])
    return (time.time() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    name = sys.argv[1]
    over = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
    step, state, batch = build(**over)
    t = timeit(step, state, batch)
    print(json.dumps({"variant": name, "step_ms": round(t * 1e3, 1),
                      "audio_sec_s": round(64 * 15 / t, 1)}))


if __name__ == "__main__":
    main()
