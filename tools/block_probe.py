"""Micro-bench the conformer block's components at bench scale
[64, 512, 256]: fused Pallas FFN vs XLA FFN, flash attention, conv module.
fwd+bwd each, value-fetch synced."""
import json, sys, time
import numpy as np

def timeit(f, *args, iters=20):
    import jax
    g = jax.jit(jax.value_and_grad(f))
    v, _ = g(*args); float(v)
    t0 = time.time()
    for _ in range(iters):
        v, _ = g(*args)
    float(v)
    return (time.time() - t0) / iters

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_default_prng_impl", "rbg")
    import flax.linen as nn
    b, t, d, dff, h = 64, 512, 256, 1024, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32), jnp.bfloat16)
    out = {}

    from espnet_slurp_tpu.models.conformer import FeedForward, ConvModule
    for tag, flash, drop in (("ffn_pallas_drop", True, 0.1),
                             ("ffn_pallas_nodrop", True, 0.0),
                             ("ffn_xla_drop", False, 0.1),
                             ("ffn_xla_nodrop", False, 0.0)):
        m = FeedForward(d, dff, drop, jnp.bfloat16, use_flash=flash)
        p = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x,
                   deterministic=drop == 0.0)["params"]
        def f(xx, p=p, m=m, drop=drop):
            y = m.apply({"params": p}, xx, deterministic=drop == 0.0,
                        rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y.astype(jnp.float32))
        out[tag] = round(timeit(f, x) * 1e3, 3)

    from espnet_slurp_tpu.models.attention import RelPosMultiHeadAttention
    from espnet_slurp_tpu.models.conformer import rel_positional_embedding
    pos = rel_positional_embedding(t, d, jnp.bfloat16)
    for tag, flash in (("attn_flash", True), ("attn_masked", False)):
        if not flash:
            continue  # masked path won't compile at this scale (PERF_NOTES)
        m = RelPosMultiHeadAttention(h, d, dropout_rate=0.1,
                                     dtype=jnp.bfloat16, use_flash=True)
        lens = jnp.full((b,), t, jnp.int32)
        p = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, pos, None,
                   False, lengths=lens)["params"]
        def f(xx, p=p, m=m):
            y = m.apply({"params": p}, xx, pos, None, False, lengths=lens,
                        rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y.astype(jnp.float32))
        out[tag] = round(timeit(f, x) * 1e3, 3)

    m = ConvModule(d, 31, dtype=jnp.bfloat16)
    pad = jnp.ones((b, t), bool)
    p = m.init(jax.random.PRNGKey(0), x, pad)["params"]
    def f(xx):
        return jnp.sum(m.apply({"params": p}, xx, pad).astype(jnp.float32))
    out["conv_module"] = round(timeit(f, x) * 1e3, 3)

    # layernorm x4 + residuals rough floor
    ln = nn.LayerNorm(dtype=jnp.bfloat16)
    p = ln.init(jax.random.PRNGKey(0), x)["params"]
    def f(xx):
        y = xx
        for _ in range(4):
            y = y + ln.apply({"params": p}, y)
        return jnp.sum(y.astype(jnp.float32))
    out["4xln_resid"] = round(timeit(f, x) * 1e3, 3)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
