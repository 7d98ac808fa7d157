"""Sequence parallelism: time-axis activation sharding over a mesh axis.

New capability beyond the reference (SURVEY.md §2.10 names it a goal; the
reference has no ring attention / sequence-parallel path — long inputs
there are handled only by batch-size-1 + chunked iteration).

Design (GSPMD style, per the scaling-book recipe): the mesh grows a third
``seq`` axis; [B, T, D] activations carry a `with_sharding_constraint`
at every encoder block boundary. XLA then keeps the frame-pointwise work
(convs, FFN, layernorm — the bulk of a conformer) partitioned over time
and inserts all-gathers only around attention, which is exactly the
Korthikanti-style sequence-parallel schedule — no hand-written
collectives.

Spec choice: when the mesh also has a ``model`` axis, the default spec is
P((data, model), seq) — the batch dim is jointly sharded over data AND
model inside the sequence-parallel region, so no mesh axis is idle in the
windowed-conv computations. This both reuses the tensor-parallel ranks'
capacity for the pointwise region (the standard SP schedule) and avoids
an XLA SPMD partitioner pitfall observed on jax 0.9 where a conv whose
time dim is seq-sharded while another mesh axis is idle gets its weight
gradient multiplied by that idle axis's size (compute replicated, then
psum'ed over all axes). tests/test_seq_parallel.py pins exactness.

Models stay mesh-agnostic: they call ``constrain_acts(x)``, a no-op unless
a trace runs inside ``activation_sharding(mesh, spec)``.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

SEQ_AXIS = "seq"

_ACT: contextvars.ContextVar[Optional[NamedSharding]] = \
    contextvars.ContextVar("espnet_act_sharding", default=None)


@contextlib.contextmanager
def activation_sharding(mesh: Mesh, spec: Optional[P] = None):
    """Enable activation sharding for traces performed inside the block.

    ``spec`` indexes [batch, time, ...]; default P((data, model), seq) on
    a 3-axis mesh (see module docstring), P(data, seq) without a model
    axis, P(data) without a seq axis. The batch dim must divide the
    product of its assigned axis sizes.
    """
    if spec is None:
        if SEQ_AXIS in mesh.axis_names and MODEL_AXIS in mesh.axis_names:
            spec = P((DATA_AXIS, MODEL_AXIS), SEQ_AXIS)
        elif SEQ_AXIS in mesh.axis_names:
            spec = P(DATA_AXIS, SEQ_AXIS)
        else:
            spec = P(DATA_AXIS)
    token = _ACT.set(NamedSharding(mesh, spec))
    try:
        yield
    finally:
        _ACT.reset(token)


def constrain_acts(x):
    """Apply the active [B, T, ...] sharding constraint (no-op outside
    an activation_sharding context or on low-rank values)."""
    s = _ACT.get()
    if s is None or not hasattr(x, "ndim") or x.ndim < 2:
        return x
    spec = list(s.spec)[: x.ndim]
    spec = spec + [None] * (x.ndim - len(spec))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(s.mesh, P(*spec)))
