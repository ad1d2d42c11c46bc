"""Device mesh construction.

The reference's parallelism is launcher-owned (DeepSpeed forks ranks, NCCL
underneath — SURVEY.md §2.4). Here the mesh is an explicit object with three
axes and all parallelism falls out of NamedSharding over it:

- ``dp``:   pure data parallelism (gradient all-reduce over ICI/DCN)
- ``fsdp``: ZeRO-3-style parameter/optimizer sharding + data parallelism
- ``tp``:   tensor parallelism (attention heads / MLP columns)
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp")

# Mesh active for activation-sharding constraints (trace-time state: the
# constraint ops are baked into the jaxpr while the context is held).
_ACTIVE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "llava_active_mesh", default=None
)


@contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Make ``constrain`` calls inside model code bind to this mesh.

    Held around jit *tracing* (the first call of a train step). Without an
    active mesh every ``constrain`` is a no-op, so single-chip paths and
    tests are untouched.
    """
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_MESH.reset(token)


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH.get()


def constrain(x: jax.Array, *dims) -> jax.Array:
    """``with_sharding_constraint`` against the active mesh (no-op without
    one). Each dim is None, an axis name, or a tuple of names; names absent
    from the mesh are dropped so the same model code runs on any mesh shape.

    Pinning activations at module seams keeps GSPMD from flip-flopping
    between layouts mid-graph (the "Involuntary full rematerialization"
    warnings XLA emits when specs disagree across an op).
    """
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return x
    names = set(mesh.axis_names)

    def fix(d):
        if d is None:
            return None
        if isinstance(d, str):
            return d if d in names else None
        kept = tuple(a for a in d if a in names)
        return kept if kept else None

    spec = P(*(fix(d) for d in dims))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def make_mesh(
    dp: int = 1,
    fsdp: Optional[int] = None,
    tp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh. ``fsdp=None`` absorbs remaining devices.

    Axis order puts ``tp`` innermost so tensor-parallel collectives ride the
    fastest ICI links on real slices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp is None:
        assert n % (dp * tp) == 0, (n, dp, tp)
        fsdp = n // (dp * tp)
    need = dp * fsdp * tp
    assert need <= n, f"{dp}x{fsdp}x{tp} > {n} devices"
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1, devices=jax.devices()[:1])


def shardings(mesh: Mesh, spec_tree):
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_spec() -> P:
    """Activations/batch arrays: shard the batch dim over dp+fsdp."""
    return P(("dp", "fsdp"))
