"""Section-level step profiler that works over remote-TPU transports.

SURVEY §5 tracing/profiling: the reference has wall-clock section timers
(trainer.py measure_time) and we additionally ship jax.profiler trace
hooks (train/observe.py ProfilerHook). On the axon remote transport,
however, op-level trace COLLECTION hangs (the profiler RPC never
completes), so this module provides the transport-robust equivalent:
attribute step time by TIMING EACH SUBGRAPH separately — frontend,
encoder, decoder, CTC, full forward, forward+backward+update — each as
its own jitted program synced by value fetch, plus XLA cost analysis
(FLOPs / HBM bytes) per section where the compiler reports it.

The numbers are attributable arithmetic, not narrative: section times
should roughly sum to the step; big gaps indicate fusion wins/losses.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def _sync(x):
    """Force completion via a value fetch (block_until_ready is a no-op on
    some remote transports)."""
    import jax
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


def _time_fn(fn, *args, repeats: int = 5):
    out = fn(*args)  # compile + warm
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / repeats


def _cost(fn, *args) -> Dict[str, float]:
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {"gflops": round(float(ca.get("flops", 0.0)) / 1e9, 2),
                "hbm_gb": round(float(ca.get("bytes accessed", 0.0)) / 1e9,
                                3)}
    except Exception:
        return {}


def step_breakdown(model, params, batch, tx=None, repeats: int = 5
                   ) -> Dict[str, Dict[str, float]]:
    """Per-section timing + cost table for one ASR train step.

    batch: the usual speech/speech_lengths/text/text_lengths dict
    (device or host arrays). Returns {section: {ms, gflops, hbm_gb}}.
    """
    import jax
    import jax.numpy as jnp

    speech = jnp.asarray(batch["speech"])
    slen = jnp.asarray(batch["speech_lengths"])
    text = jnp.asarray(batch["text"])
    tlen = jnp.asarray(batch["text_lengths"])

    sections: Dict[str, Dict[str, float]] = {}

    def add(name, fn, *args):
        ms = _time_fn(jax.jit(fn), *args, repeats=repeats) * 1e3
        sections[name] = {"ms": round(ms, 3), **_cost(fn, *args)}

    def frontend(s, sl):
        from ..ops.frontend import default_frontend
        return default_frontend(s, sl, model.cfg.frontend)[0]

    try:
        add("frontend(stft+mel)", frontend, speech, slen)
    except Exception:
        pass  # feats-input / SSL models have no waveform frontend

    def encode(p, s, sl):
        hs, hl, _ = model.apply({"params": p}, s, sl,
                                method=lambda m, x, xl: m.encode(x, xl))
        return hs

    add("encode(frontend+encoder)", encode, params, speech, slen)
    hs, hl, _ = model.apply({"params": params}, speech, slen,
                            method=lambda m, x, xl: m.encode(x, xl))

    def ctc_loss(p, h, hlen, t, tl):
        return model.apply({"params": p}, h, hlen, t, tl,
                           method=lambda m, *a: m._ctc_loss_mean(*a))

    add("ctc_loss", ctc_loss, params, hs, hl, text, tlen)

    def dec(p, h, hlen, t, tl):
        from ..models.asr_model import add_sos_eos
        ys_in, _ = add_sos_eos(jnp.maximum(t, 0), tl, model.cfg.sos_id,
                               model.cfg.eos_id)
        return model.apply(
            {"params": p}, ys_in, tl + 1, h, hlen,
            method=lambda m, yi, yl, hh, hhl: m.decoder(yi, yl, hh, hhl))

    add("decoder_forward", dec, params, hs, hl, text, tlen)

    def full_fwd(p, s, sl, t, tl):
        loss, _ = model.apply({"params": p}, s, sl, t, tl)
        return loss

    add("full_forward", full_fwd, params, speech, slen, text, tlen)

    def fwd_bwd(p, s, sl, t, tl):
        return jax.grad(lambda pp: full_fwd(pp, s, sl, t, tl))(p)

    add("forward+backward", fwd_bwd, params, speech, slen, text, tlen)

    if tx is not None:
        from .state import TrainState, make_train_step
        state = TrainState.create(params, tx, jax.random.PRNGKey(0))
        step = make_train_step(model, tx, donate=False)
        bt = {"speech": speech, "speech_lengths": slen, "text": text,
              "text_lengths": tlen}
        out = step(state, bt)
        _sync(out[1]["loss"])
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = step(state, bt)
        _sync(out[1]["loss"])
        sections["train_step(fwd+bwd+optim)"] = {
            "ms": round((time.perf_counter() - t0) / repeats * 1e3, 3)}
    return sections


def format_breakdown(sections: Dict[str, Dict[str, float]]) -> str:
    total = max((v["ms"] for k, v in sections.items()
                 if k.startswith("train_step") or k == "forward+backward"),
                default=None)
    lines = ["| section | ms | %step | GFLOP | HBM GB |",
             "|---|---|---|---|---|"]
    for name, v in sections.items():
        pct = f"{100.0 * v['ms'] / total:.0f}%" if total else ""
        lines.append(
            f"| {name} | {v['ms']:.2f} | {pct} | "
            f"{v.get('gflops', '')} | {v.get('hbm_gb', '')} |")
    return "\n".join(lines)
