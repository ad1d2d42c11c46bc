"""Device mesh construction.

The reference's parallelism is launcher-owned (DeepSpeed forks ranks, NCCL
underneath — SURVEY.md §2.4). Here the mesh is an explicit object with three
axes and all parallelism falls out of NamedSharding over it:

- ``dp``:   pure data parallelism (gradient all-reduce over ICI/DCN)
- ``fsdp``: ZeRO-3-style parameter/optimizer sharding + data parallelism
- ``tp``:   tensor parallelism (attention heads / MLP columns)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp")


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
