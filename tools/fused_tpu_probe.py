"""Real-chip (Mosaic) parity check for the fused conv-module and fused
CTC-head Pallas kernels vs their unfused flax/XLA compositions.

The test suite pins JAX to the 8-device virtual CPU mesh (tests/conftest.py),
so Pallas runs there in interpret mode only; this probe validates the actual
Mosaic lowering on the TPU: forward values AND gradients (params + input)
of each fused path against the unfused composition, bf16 tolerances.

Usage: python tools/fused_tpu_probe.py   (prints one JSON line)
"""
import json
import os
import sys

import numpy as np


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, "/root/repo")
    from espnet_slurp_tpu.models.conformer import ConvModule

    assert jax.default_backend() == "tpu", jax.devices()
    out = {}
    rng = np.random.RandomState(0)

    # ---- fused conv module ----
    B, T, D, K = 4, 256, 512, 15
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    lengths = jnp.asarray([256, 200, 131, 77], jnp.int32)
    pad_mask = jnp.arange(T)[None, :] < lengths[:, None]
    mod = ConvModule(d_model=D, kernel_size=K, dtype=jnp.bfloat16,
                     use_flash=True)
    params = mod.init(jax.random.PRNGKey(0), x, pad_mask)["params"]

    def loss(p, fused):
        os.environ["ESPNET_TPU_NO_FUSED_CONV"] = "0" if fused else "1"
        y = mod.apply({"params": p}, x, pad_mask)
        m = pad_mask[..., None].astype(jnp.float32)
        return jnp.sum((y.astype(jnp.float32) * m) ** 2)

    vf, gf = jax.value_and_grad(lambda p: loss(p, True))(params)
    vu, gu = jax.value_and_grad(lambda p: loss(p, False))(params)
    out["conv_fwd_rel"] = rel(vf, vu)
    gdiff = jax.tree.map(rel, gf, gu)
    out["conv_grad_rel_max"] = max(
        float(v) for v in jax.tree.leaves(gdiff))

    # ---- fused CTC head ----
    from espnet_slurp_tpu.ops import ctc as ctc_ops
    from espnet_slurp_tpu.ops.pallas.ctc_head import ctc_loss_pallas_head
    V = 5000
    hs = jnp.asarray(rng.randn(B, 128, D).astype(np.float32) * 0.3,
                     jnp.bfloat16)
    w = jnp.asarray(rng.randn(D, V).astype(np.float32) * 0.05)
    bias = jnp.zeros((V,), jnp.float32)
    h_lengths = jnp.asarray([128, 100, 77, 54], jnp.int32)
    labels = jnp.asarray(rng.randint(1, V, size=(B, 20)), jnp.int32)
    label_lengths = jnp.asarray([20, 15, 9, 5], jnp.int32)

    def fused_loss(hw):
        h, wt = hw
        per = ctc_loss_pallas_head(h, wt, bias, h_lengths, labels,
                                   label_lengths, 0)
        return jnp.sum(per) / B

    def ref_loss(hw):
        h, wt = hw
        logits = (h.astype(jnp.float32) @ wt + bias)
        return ctc_ops.ctc_loss_mean_logits(logits, h_lengths, labels,
                                            label_lengths, 0)

    vf, (gh_f, gw_f) = jax.value_and_grad(fused_loss)((hs, w))
    vu, (gh_u, gw_u) = jax.value_and_grad(ref_loss)((hs, w))
    out["ctc_head_fwd_rel"] = rel(vf, vu)
    out["ctc_head_dh_rel"] = rel(gh_f, gh_u)
    out["ctc_head_dw_rel"] = rel(gw_f, gw_u)

    out["ok"] = (out["conv_fwd_rel"] < 3e-2 and
                 out["conv_grad_rel_max"] < 6e-2 and
                 out["ctc_head_fwd_rel"] < 3e-2 and
                 out["ctc_head_dh_rel"] < 6e-2 and
                 out["ctc_head_dw_rel"] < 6e-2)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
