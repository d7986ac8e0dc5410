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
    from ..kernels.literal import _hit_mask

    for lit in lits:
        eq = _hit_mask(ext, S, lit) & (pos <= n - len(lit))
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


def _shard_spans_fn(text_sh, n, *, lits, axis, num_shards, row_w, cap):
    """Per-shard bitpacked spans (engine/spans.extract_rows_bitmask over
    kernels/literal.literal_mask_packed_device): each shard emits the
    match STARTS beginning in its own range (absolute positions) plus
    exact per-row candidate counts. Overlap-free sets only: every
    candidate start is a match start, widths/pids decode from the text
    at the starts (api.match_all_arrays bitmask branch); a one-neighbour
    ppermute halo of max_len-1 bytes covers boundary straddles exactly."""
    from ..engine import spans as spans_mod
    from ..kernels import literal as lk

    S = text_sh.shape[0]
    d = jax.lax.axis_index(axis)
    offset = (d * S).astype(jnp.int32)
    W = max(len(l) for l in lits)
    hw = W - 1
    if hw > 0:
        head = text_sh[:hw]
        halo = jax.lax.ppermute(
            head, axis, [(i + 1, i) for i in range(num_shards - 1)]
        )
        ext = jnp.concatenate([text_sh, halo])
    else:
        ext = text_sh
    # Local validity: start p in this shard iff offset + p <= n - W.
    words = lk.literal_mask_packed_device(
        ext, n - offset, lits=lits, P=S, row_w=row_w
    )
    pos, cnt = spans_mod.extract_rows_bitmask(
        words, row_w=row_w, row_cap=cap
    )
    pos = jnp.where(pos >= 0, pos + offset, -1)
    return pos, cnt


@functools.partial(
    jax.jit,
    static_argnames=("lits", "axis", "num_shards", "mesh", "row_w", "cap"),
)
def sharded_literal_spans_device(
    text_sharded: jnp.ndarray,
    n: jnp.ndarray,
    *,
    mesh: Mesh,
    lits: Tuple[bytes, ...],
    axis: str = "data",
    num_shards: int = 1,
    row_w: int = 32,
    cap: int = 4,
):
    fn = jax.shard_map(
        functools.partial(
            _shard_spans_fn, lits=lits, axis=axis,
            num_shards=num_shards, row_w=row_w, cap=cap,
        ),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(text_sharded, n)


def sharded_literal_spans(
    lits: Tuple[bytes, ...], text: np.ndarray, mesh: Mesh, axis: str = "data"
):
    """Host wrapper: shard + pad + two-phase cap sizing; returns sorted
    absolute match starts (np.int64). Overlap-free literal sets (the
    bitpacked headline program, sharded)."""
    D = mesh.devices.size
    n = len(text)
    W = max(len(l) for l in lits)
    # Shard size: multiple of 32 (packing), covers the halo width.
    shard = max(-(-n // D), W, 1)
    shard = -(-shard // 32) * 32
    Pld = D * shard
    pad = np.zeros(Pld, dtype=np.uint8)
    pad[:n] = text
    sharding = NamedSharding(mesh, P(axis))
    text_dev = jax.device_put(jnp.asarray(pad), sharding)
    cap = 4
    while True:
        pos, cnt = sharded_literal_spans_device(
            text_dev, jnp.int32(n), mesh=mesh, lits=tuple(lits),
            axis=axis, num_shards=D, row_w=32, cap=cap,
        )
        mx = int(jnp.max(cnt)) if cnt.shape[0] else 0
        if mx <= cap:
            break
        while cap < mx:
            cap *= 2
    sp = np.asarray(pos).ravel()
    return np.sort(sp[sp >= 0]).astype(np.int64)
