import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

@jax.jit
def chain(x, w):
    for _ in range(32):
        x = jnp.tanh(x @ w)
    return x

n = 4096
x = jnp.ones((n, n), jnp.bfloat16)
w = jnp.ones((n, n), jnp.bfloat16) * 0.001
y = chain(x, w); float(y.sum())  # warmup
iters = 16
t0 = time.perf_counter()
y = x
for _ in range(iters):
    y = chain(y, w)   # data-dependent chain
s = float(y.sum())    # ONE fetch forces the whole chain
dt = time.perf_counter() - t0
flops = 2 * n**3 * 32 * iters
print(f"chained roofline: {flops/dt/1e12:.1f} TFLOP/s bf16 (sum={s})",
      flush=True)
