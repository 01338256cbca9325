"""Device meshes and sharding rules.

The reference has NO parallelism of any kind (SURVEY.md §2.9: single ``device="cuda"``,
batch 1). The natural TPU scaling axis for this workload is the batch/tile dimension:
SD1.5-scale models fit one chip, so training is data-parallel and sheet stylization is
map-parallel — a 10×10 sheet is a batch of 100 tiles sharded over the mesh. Parameters are
replicated; gradients all-reduce over ICI (GSPMD inserts the psum from the shardings).

For multi-slice scale-out the same mesh generalizes to ("dcn", "data") with
``jax.sharding.Mesh`` spanning slices — the sharding rules below only name the batch axis,
so nothing else changes.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch/tile) sharding for data tensors."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put a host batch pytree with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad the leading axis of every array to a multiple of the mesh size (returns
    (padded, original_b)) so uneven tile counts (e.g. 100 tiles on 8 chips) shard evenly."""
    leaves = jax.tree.leaves(batch)
    b = leaves[0].shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch, b
    padded = jax.tree.map(
        lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        if hasattr(x, "shape") and x.ndim >= 1
        else x,
        batch,
    )
    return padded, b


def make_mesh_2d(
    n_dcn: int, n_ici: int | None = None, axis_names: tuple[str, str] = ("dcn", "data")
) -> Mesh:
    """Multi-slice mesh: outer axis spans slices (DCN), inner axis the chips of a slice
    (ICI). Data-parallel shardings use BOTH axes for the batch (``P(("dcn","data"))``) so
    gradient all-reduces hierarchically: ICI within a slice, DCN across — GSPMD emits that
    decomposition from the mesh structure."""
    devices = jax.devices()
    if n_ici is None:
        n_ici = len(devices) // n_dcn
    grid = np.asarray(devices[: n_dcn * n_ici]).reshape(n_dcn, n_ici)
    return Mesh(grid, axis_names)


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))
