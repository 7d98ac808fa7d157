"""Parameter sharding rules for tensor parallelism (GSPMD).

The reference has no TP/PP (SURVEY.md §2.10) — this is the north-star
capability: when a model exceeds one chip, annotate parameter shardings over
the mesh's `model` axis and let GSPMD insert the collectives. Rules shard
the wide dimensions (FFN hidden, vocab projections, attention head blocks);
everything else replicates. Activations stay batch-sharded over `data`.
"""
from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS

# (regex over 'path/to/param', PartitionSpec) — first match wins.
# Dense kernels are [in, out]; Embed tables are [vocab, d]; conv kernels
# [k, in, out].
DEFAULT_RULES: Sequence[Tuple[str, P]] = (
    # Mixture-of-experts kernels [E, ...]: shard the expert dim over the
    # `expert` axis (expert parallelism, models/moe.py).
    (r".*moe/(w1|w2)$", P(EXPERT_AXIS, None, None)),
    (r".*moe/(b1|b2)$", P(EXPERT_AXIS, None)),
    # FFN up-projections: shard the hidden (out) dim.
    (r".*(ff1?|ff_\d+|w1|ff/w1|pointwise1|conv1)/kernel$",
     P(None, MODEL_AXIS)),
    # FFN down-projections: shard the hidden (in) dim.
    (r".*(ff2|w2|ff/w2|pointwise2|conv2)/kernel$", P(MODEL_AXIS, None)),
    # Attention q/k/v: shard heads (out dim); out-proj: shard in dim.
    (r".*linear_[qkv]/kernel$", P(None, MODEL_AXIS)),
    (r".*linear_out/kernel$", P(MODEL_AXIS, None)),
    # Vocab-sized projections and embeddings: shard the vocab dim.
    (r".*(output|ctc)/kernel$", P(None, MODEL_AXIS)),
    (r".*embed(ding)?/embedding$", P(MODEL_AXIS, None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding_rules(params: Any, mesh: Mesh,
                         rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """Pytree of NamedSharding matching `params` (replicated by default).

    A rule only applies if every named mesh axis in the spec exists in the
    mesh AND the spec's sharded dims divide the param's shape by that
    axis's size; otherwise the param replicates (safe fallback).
    """

    def assign(path, x):
        name = _path_str(path)
        for pat, spec in rules:
            if re.match(pat, name):
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    if (axis not in mesh.shape or dim >= x.ndim
                            or x.shape[dim] % mesh.shape[axis] != 0):
                        ok = False
                        break
                if ok:
                    # Pad spec to param rank.
                    full = list(spec) + [None] * (x.ndim - len(spec))
                    return NamedSharding(mesh, P(*full[:x.ndim]))
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """device_put params with TP shardings."""
    shardings = param_sharding_rules(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def count_sharded(params, mesh, rules=DEFAULT_RULES) -> Tuple[int, int]:
    """(#sharded params, #total params) for introspection/tests."""
    sh = param_sharding_rules(params, mesh, rules)
    leaves = jax.tree.leaves(sh)
    n_sharded = sum(1 for s in leaves if s.spec != P())
    return n_sharded, len(leaves)


def zero_opt_shardings(opt_state: Any, params_shardings: Any, mesh: Mesh,
                       min_size: int = 16384):
    """ZeRO-1-style optimizer-state sharding over the DATA axis.

    Parity target: the reference's fairscale OSS optimizer
    (abs_task.py:869-874, trainer.py:215-219) — each data-parallel rank
    holds a shard of the Adam moments. Here it is pure GSPMD: any opt-state
    subtree whose pytree structure mirrors the parameter tree (Adam mu/nu,
    RMS nu, momentum trace, EMA shadows, ...) takes the parameter's TP
    sharding per-leaf with the largest still-replicated dim additionally
    partitioned over ``data``; non-mirroring large leaves fall back to a
    first-data-divisible-dim shard; everything else replicates. XLA inserts
    the gather at update time.
    """
    n_data = mesh.shape[DATA_AXIS]
    params_treedef = jax.tree.structure(params_shardings)

    def add_data_axis(shape, spec):
        """Partition the largest replicated, divisible dim over DATA."""
        dims = [d for d in range(len(shape))
                if (d >= len(spec) or spec[d] is None)
                and shape[d] % n_data == 0]
        if not dims:
            return spec
        best = max(dims, key=lambda d: shape[d])
        full = list(spec) + [None] * (len(shape) - len(spec))
        full[best] = DATA_AXIS
        return P(*full)

    def mirror(x, p_sharding):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        spec = tuple(p_sharding.spec)
        if len(spec) > x.ndim or any(
                a is not None and x.shape[d] % mesh.shape[a] != 0
                for d, a in enumerate(spec)):
            spec = ()  # moment shape diverges from param: drop TP spec
        return NamedSharding(mesh, add_data_axis(x.shape, P(*spec)))

    def heuristic(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, add_data_axis(x.shape, P()))

    def is_param_subtree(node):
        try:
            return jax.tree.structure(node) == params_treedef
        except Exception:  # pragma: no cover - exotic nodes
            return False

    def assign(node):
        if is_param_subtree(node):
            return jax.tree.map(mirror, node, params_shardings)
        return jax.tree.map(heuristic, node)

    return jax.tree.map(assign, opt_state, is_leaf=is_param_subtree)


def shard_opt_state(opt_state: Any, params_shardings: Any, mesh: Mesh,
                    min_size: int = 16384):
    """device_put the optimizer state with ZeRO-1 data-axis shardings."""
    sh = zero_opt_shardings(opt_state, params_shardings, mesh, min_size)
    return jax.tree.map(jax.device_put, opt_state, sh)
