"""Mesh construction and canonical shardings.

The reference has no distribution at all (single GPU chosen by
``--device_id``; SURVEY.md §2.6). The TPU-native scaling story for this
model family is pure data parallelism over a 1-D ``('data',)`` mesh:

- parameters and optimizer state are replicated;
- batches are sharded over ``data``;
- the gradient all-reduce is inserted by GSPMD/XLA and rides ICI.

At ~19 M parameters there is nothing to gain from tensor or pipeline
sharding (SURVEY.md §2.6 keeps that accounting honest), but the mesh is
N-D-ready: pass extra axes through ``make_mesh`` and extend the
PartitionSpecs here if a wider decoder ever warrants a ``model`` axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh; defaults to all devices on one 'data' axis."""
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),)
    assert int(np.prod(shape)) == len(devs), (shape, len(devs))
    return Mesh(np.asarray(devs).reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
