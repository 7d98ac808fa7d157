"""Pipeline parallelism: GPipe microbatch schedule over a ``pipe`` mesh axis.

New capability beyond the reference (SURVEY.md §2.10: the reference has no
tensor/pipeline parallelism; this repo already adds TP + sequence parallel —
this module adds the third axis for models whose *depth* exceeds one chip).

Design (idiomatic SPMD, no per-stage programs): the L homogeneous encoder
blocks are grouped into P stages; each stage's parameters are STACKED on a
leading axis sharded ``P('pipe')`` so device i holds only stage i. Inside a
single ``shard_map`` program, a ``lax.scan`` runs ``n_micro + P - 1`` ticks
of the classic GPipe wavefront: every tick, each device

    1. receives its predecessor's activation (``lax.ppermute`` shift +1),
    2. (stage 0) injects the next microbatch from the replicated input,
    3. applies its stage function,
    4. (last stage) deposits finished microbatches into the output buffer.

Idle devices compute on garbage and are masked — that waste IS the pipeline
bubble, (P-1)/(n_micro+P-1) of the ticks, exactly GPipe's. Reverse-mode AD
flows through ``ppermute`` (reverse shift) and the scan (activation stash),
so the same schedule trains: no hand-written backward schedule.

The transfer per tick is one [mb, ...] activation over ICI neighbors
(a ring ``collective_permute``), which is the canonical TPU pipeline
transport (scaling-book pipelining chapter).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def spmd_pipeline(stage_fn: Callable, stage_params: Any, x: Any,
                  n_micro: int, axis: str = PIPE_AXIS,
                  batched_consts: Any = None,
                  shared_consts: Any = None,
                  pass_index: bool = False) -> Any:
    """Run ``x`` through P sequential stages (one per device on ``axis``).

    Must be traced inside ``shard_map``. ``stage_params`` is the LOCAL
    stage's parameter pytree (leading stacked axis of size 1, squeezed
    here). ``x`` is a replicated pytree of [B, ...] arrays with
    B = n_micro * mb; the result is the composition
    ``stage_{P-1}(... stage_0(x))`` replicated to every device.

    ``batched_consts``: optional pytree of [B, ...] rider arrays (attention
    bias, pad masks) that every stage reads for the microbatch it is
    processing but does NOT transform — each device slices the current
    microbatch's rows locally (no ppermute traffic). ``shared_consts``:
    pytree passed whole to every stage (positional tables). When either is
    given, ``stage_fn(params, x_mb, batched_mb, shared)`` is the contract.
    ``pass_index``: append the (traced, clipped) microbatch index as a
    final argument — ``stage_fn(params, x_mb, batched_mb, shared, midx)``
    — so stages can derive per-(stage, microbatch) rng keys (dropout).
    """
    p = lax.psum(1, axis)
    i = lax.axis_index(axis)
    params = jax.tree.map(lambda a: a[0], stage_params)
    b = jax.tree.leaves(x)[0].shape[0]
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro {n_micro}"
    mb = b // n_micro
    with_consts = batched_consts is not None or shared_consts is not None

    # Shapes of one microbatch flowing between stages = stage_fn output
    # (stages are homogeneous: input and output shapes match).
    mb_zero = jax.tree.map(lambda a: jnp.zeros((mb,) + a.shape[1:], a.dtype),
                           x)
    out_zero = jax.tree.map(jnp.zeros_like, x)
    fwd = [(src, (src + 1) % p) for src in range(p)]

    def tick(carry, t):
        send, outputs = carry
        recv = jax.tree.map(lambda a: lax.ppermute(a, axis, fwd), send)
        midx = jnp.clip(t - i, 0, n_micro - 1)
        inject = jax.tree.map(
            lambda full, r: jnp.where(
                i == 0,
                lax.dynamic_slice_in_dim(
                    full, jnp.clip(t, 0, n_micro - 1) * mb, mb, axis=0),
                r),
            x, recv)
        if with_consts:
            bc = jax.tree.map(
                lambda a: lax.dynamic_slice_in_dim(a, midx * mb, mb, axis=0),
                batched_consts)
            if pass_index:
                y = stage_fn(params, inject, bc, shared_consts, midx)
            else:
                y = stage_fn(params, inject, bc, shared_consts)
        else:
            y = stage_fn(params, inject)
        active_out = (i == p - 1) & (t - i >= 0) & (t - i < n_micro)
        outputs = jax.tree.map(
            lambda buf, val: jnp.where(
                active_out,
                lax.dynamic_update_slice_in_dim(buf, val, midx * mb, axis=0),
                buf),
            outputs, y)
        return (y, outputs), None

    (_, outputs), _ = lax.scan(tick, (mb_zero, out_zero),
                               jnp.arange(n_micro + p - 1))
    # Result lives on the last stage; replicate it (masked all-reduce).
    return jax.tree.map(
        lambda o: lax.psum(jnp.where(i == p - 1, o, jnp.zeros_like(o)),
                           axis),
        outputs)


def pipeline(mesh: Mesh, stage_fn: Callable, stacked_params: Any, x: Any,
             n_micro: int, axis: str = PIPE_AXIS,
             data_axis: str | None = None,
             batched_consts: Any = None, shared_consts: Any = None,
             pass_index: bool = False) -> Any:
    """shard_map wrapper: ``stacked_params`` [P, ...] sharded over ``axis``,
    ``x`` replicated (or batch-sharded over ``data_axis`` on a 2-D
    (data, pipe) mesh — each data row runs its own pipeline wavefront over
    its batch shard; grads psum over data as usual outside), output laid
    out like ``x``.

    ``stage_fn(params_one_stage, x_mb) -> y_mb`` with matching shapes —
    or ``stage_fn(params, x_mb, batched_mb, shared)`` when rider consts
    are given (see spmd_pipeline).
    """
    import inspect
    kw = ("check_vma"
          if "check_vma" in inspect.signature(shard_map).parameters
          else "check_rep")
    x_spec = P(data_axis) if data_axis else P()
    if batched_consts is None and shared_consts is None:
        run = shard_map(
            partial(spmd_pipeline, stage_fn, n_micro=n_micro, axis=axis),
            mesh=mesh,
            in_specs=(P(axis), x_spec),
            out_specs=x_spec,
            **{kw: False},
        )
        return run(stacked_params, x)
    if batched_consts is None:
        batched_consts = ()
    if shared_consts is None:
        shared_consts = ()
    run = shard_map(
        lambda sp, xx, bc, sc: spmd_pipeline(
            stage_fn, sp, xx, n_micro=n_micro, axis=axis,
            batched_consts=bc, shared_consts=sc, pass_index=pass_index),
        mesh=mesh,
        in_specs=(P(axis), x_spec,
                  jax.tree.map(lambda _: x_spec, batched_consts),
                  jax.tree.map(lambda _: P(), shared_consts)),
        out_specs=x_spec,
        **{kw: False},
    )
    return run(stacked_params, x, batched_consts, shared_consts)


def stack_stages(param_trees) -> Any:
    """[stage pytrees] -> one pytree with a leading stacked stage axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)
