"""Time rel_flash_attention fwd and fwd+bwd at bench scale, across tile
sizes and dropout settings."""
import json, sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from espnet_slurp_tpu.ops.pallas.flash_attention import rel_flash_attention
    b, h, t, dh = 64, 4, 512, 64
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1,
                                jnp.bfloat16)
    qu, qv = mk(b, h, t, dh), mk(b, h, t, dh)
    k, v = mk(b, h, t, dh), mk(b, h, t, dh)
    p = mk(h, 2 * t, dh)
    lens = jnp.full((b,), t, jnp.int32)
    out = {}
    for tag, bq, bk, rate in (("q512k512", 512, 512, 0.1),
                              ("q256k512", 256, 512, 0.1),
                              ("q128k512", 128, 512, 0.1)):
        kw = dict(scale=dh ** -0.5, dropout_rate=rate,
                  block_q=bq, block_k=bk)
        seed = jnp.zeros((1,), jnp.int32) if rate > 0 else None

        def f_fwd(qu, qv, k, v, p):
            return jnp.sum(rel_flash_attention(
                qu, qv, k, v, p, lens, seed, **kw).astype(jnp.float32))
        g_fwd = jax.jit(f_fwd)
        float(g_fwd(qu, qv, k, v, p))
        t0 = time.time()
        for _ in range(20):
            r = g_fwd(qu, qv, k, v, p)
        float(r); out[tag + "_fwd"] = round((time.time() - t0) / 20 * 1e3, 3)

        g = jax.jit(jax.grad(f_fwd, argnums=(0, 1, 2, 3, 4)))
        r = g(qu, qv, k, v, p); float(r[0].sum())
        t0 = time.time()
        for _ in range(20):
            r = g(qu, qv, k, v, p)
        float(r[0].sum())
        out[tag + "_fwdbwd"] = round((time.time() - t0) / 20 * 1e3, 3)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
