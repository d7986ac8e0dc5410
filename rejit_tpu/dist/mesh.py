"""Device mesh construction for data-parallel corpus sharding.

The reference has no distributed layer at all (SURVEY.md §2.4: single
-process, single-threaded); this subsystem is new capability mandated by
BASELINE.json:5 (corpus shards data-parallel, tables replicated, ICI
collectives). One 1-D mesh axis ("data") spans all chips across all hosts;
within-shard parallelism is the block/sequence axis handled by the engine
itself (SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    devices: Optional[Sequence] = None, axis: str = "data"
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
