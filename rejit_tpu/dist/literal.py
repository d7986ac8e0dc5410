"""Sharded literal counting: halo windows + ICI psum reduction.

The bounded-window fast path of BASELINE.json:5/:11 ("boundary-window
handling and ICI count reduction"): for overlap-free literal sets
(rejit_tpu/compile/analysis.py), MatchAllCount == total hit count, so each
shard counts hits *starting* in its own range — using a ppermute halo of the
next shard's first (max_len - 1) bytes for hits straddling the boundary —
and a single psum over the "data" axis reduces the global count over ICI.

Unbounded/general patterns use the exact suffix-scan path instead
(rejit_tpu/dist/sharded.py); this module is the cheap bounded-width route.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec


def _shard_count_fn(text_sh, n, *, lits, axis, num_shards):
    S = text_sh.shape[0]
    d = jax.lax.axis_index(axis)
    offset = (d * S).astype(jnp.int32)
    max_m = max(len(l) for l in lits)
    hw = max_m - 1

    if hw > 0:
        # Halo: next shard's first hw bytes (left-shift ppermute).
        head = text_sh[:hw]
        halo = jax.lax.ppermute(
            head, axis, [(i + 1, i) for i in range(num_shards - 1)]
        )
        ext = jnp.concatenate([text_sh, halo])
    else:
        ext = text_sh

    pos = offset + jnp.arange(S, dtype=jnp.int32)
    total = jnp.zeros((), dtype=jnp.int32)
    for lit in lits:
        eq = ext[0:S] == lit[0]
        for j in range(1, len(lit)):
            eq = jnp.logical_and(eq, ext[j : j + S] == lit[j])
        eq = eq & (pos <= n - len(lit))
        total = total + jnp.sum(eq, dtype=jnp.int32)
    return jax.lax.psum(total, axis)


@functools.partial(
    jax.jit, static_argnames=("lits", "axis", "num_shards", "mesh")
)
def sharded_literal_count_device(
    text_sharded: jnp.ndarray,
    n: jnp.ndarray,
    *,
    mesh: Mesh,
    lits: Tuple[bytes, ...],
    axis: str = "data",
    num_shards: int = 1,
) -> jnp.ndarray:
    fn = jax.shard_map(
        functools.partial(
            _shard_count_fn, lits=lits, axis=axis, num_shards=num_shards
        ),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(text_sharded, n)


def sharded_literal_count(
    lits: Tuple[bytes, ...], text: np.ndarray, mesh: Mesh, axis: str = "data"
) -> int:
    """Host wrapper: shard + pad, count. Exact for overlap-free literal
    sets (caller must have verified analysis.literals_overlap_free)."""
    D = mesh.devices.size
    n = len(text)
    # Shard size must cover the longest literal so the one-neighbour halo
    # suffices (a hit spans at most two shards).
    shard = max(-(-n // D), max(len(l) for l in lits), 1)
    Pld = D * shard
    pad = np.zeros(Pld, dtype=np.uint8)
    pad[:n] = text
    sharding = NamedSharding(mesh, P(axis))
    text_dev = jax.device_put(jnp.asarray(pad), sharding)
    cnt = sharded_literal_count_device(
        text_dev, jnp.int32(n), mesh=mesh, lits=tuple(lits),
        axis=axis, num_shards=D,
    )
    return int(cnt)
