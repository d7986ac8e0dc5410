"""Sharded (multi-device / multi-host) match execution.

New capability vs the reference (which is single-threaded — SURVEY.md §2.4),
per BASELINE.json:5: corpus sharded along the "data" mesh axis, DFA tables
replicated, cross-shard semantics handled *exactly* by extending the engine's
suffix scan across shards (SURVEY.md §5.7b):

  1. one-byte halo via ppermute gives each shard its predecessor's last byte
     (start-state context for boundary 0 of the shard);
  2. each shard computes local block summaries and reduces them to a shard
     summary (Q-sized, tiny);
  3. shard summaries are all-gathered over ICI and every device computes its
     exclusive cross-shard suffix — no bounded-window assumption, so
     unbounded quantifiers straddling shards are exact;
  4. local phase 3 emits globally-correct (L, I) for the shard's boundaries.

Collective cost per step: one ppermute of 1 byte + one all_gather of
3*Q*D int32 — O(KB), riding ICI (BASELINE.json:5 "ICI collectives").
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..engine import pipeline
from ..engine.pipeline import DeviceTables

P = PartitionSpec


def _identity_summary(Q: int):
    return (
        jnp.arange(Q, dtype=jnp.int32),
        jnp.full(Q, -1, jnp.int32),
        jnp.full(Q, -1, jnp.int32),
    )


def _local_shard_fn(ct, text_sh, n, *, block, axis, num_shards,
                    use_pallas=False, interpret=False):
    """Runs inside shard_map. text_sh: (S,) local shard bytes."""
    S = text_sh.shape[0]
    K = block
    nb = S // K
    d = jax.lax.axis_index(axis)
    offset = (d * S).astype(jnp.int32)

    cls, ctx = pipeline.classify(ct, text_sh)

    # Halo: previous shard's last byte context (for boundary 0 start state).
    # ppermute shifts each shard's last-byte ctx to its right neighbour.
    last_ctx = ctx[-1:]
    prev_ctx = jax.lax.ppermute(
        last_ctx, axis, [(i, i + 1) for i in range(num_shards - 1)]
    )
    first_start = jnp.where(
        d == 0,
        ct.start_by_ctx[0],               # CTX_BEGIN at text start
        ct.start_by_ctx[prev_ctx[0]],
    )
    starts = jnp.concatenate(
        [first_start[None], ct.start_by_ctx[ctx[:-1]]]
    )

    pos = offset + jnp.arange(S, dtype=jnp.int32)
    clsb = pipeline.block_views(cls, nb, K)
    posb = pipeline.block_views(pos, nb, K)
    startsb = pipeline.block_views(starts, nb, K)

    # Local block summaries + local shard reduction.
    if use_pallas:
        from ..kernels import dfa_pallas

        f1, m1, i1 = dfa_pallas.phase1_pallas(
            ct.packed, ct.n_classes, clsb, n, K=K, interpret=interpret
        )
    else:
        f1, m1, i1 = pipeline.phase1_summaries(ct, clsb, posb, n)
    Q = ct.n_states
    loc_suf = pipeline.suffix_scan((f1, m1, i1), _identity_summary(Q))
    shard_sum = pipeline.combine(
        (f1[0], m1[0], i1[0]),
        (loc_suf[0][0], loc_suf[1][0], loc_suf[2][0]),
    )

    # Cross-shard suffix: all_gather shard summaries (tiny), every device
    # computes the same exclusive suffix and picks its own row.
    g = tuple(
        jax.lax.all_gather(x, axis, axis=0) for x in shard_sum
    )                                                   # each (D, Q)
    suf_shards = pipeline.suffix_scan(g, pipeline.eot_seed(ct, n))
    my_tail = tuple(x[d] for x in suf_shards)           # (Q,) each

    # Local suffix including the cross-shard tail, then emission.
    suf = pipeline.suffix_scan((f1, m1, i1), my_tail)
    if use_pallas:
        from ..kernels import dfa_pallas

        L, I = dfa_pallas.phase3_pallas(
            ct.packed, ct.n_classes, suf, clsb, startsb, n,
            posbase=posb[0], K=K, interpret=interpret,
        )
    else:
        L, I = pipeline.phase3_emit(ct, suf, clsb, posb, startsb, n)

    # Mask boundaries > n (global padding area).
    bidx = offset + jnp.arange(S, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


@functools.partial(
    jax.jit,
    static_argnames=(
        "block", "axis", "num_shards", "mesh", "use_pallas", "interpret"
    ),
)
def sharded_l_arrays_device(
    ct: DeviceTables,
    text_sharded: jnp.ndarray,
    n: jnp.ndarray,
    *,
    mesh: Mesh,
    block: int = 32,
    axis: str = "data",
    num_shards: int = 1,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """(L, I) for a corpus sharded over `axis`. text_sharded: (P,) uint8 with
    P a multiple of num_shards*block and P > n (so every real boundary incl.
    n is emitted by some shard). Output is sharded the same way.
    use_pallas runs the fused byte-stepping kernels per shard (shard size
    must be a multiple of block*dfa_pallas.CHUNK)."""
    fn = jax.shard_map(
        functools.partial(
            _local_shard_fn,
            block=block,
            axis=axis,
            num_shards=num_shards,
            use_pallas=use_pallas,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(ct, text_sharded, n)


def sharded_l_arrays(
    tables,
    text: np.ndarray,
    mesh: Mesh,
    *,
    block: int = 32,
    axis: str = "data",
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: shard + pad a host text, run, trim to n+1."""
    ct = (
        pipeline.device_tables(tables)
        if not isinstance(tables, DeviceTables)
        else tables
    )
    D = mesh.devices.size
    n = len(text)
    chunk = D * block
    if use_pallas:
        from ..kernels.dfa_pallas import CHUNK

        chunk = D * block * CHUNK
    Pld = ((n + 1 + chunk - 1) // chunk) * chunk   # P > n strictly
    pad = np.zeros(Pld, dtype=np.uint8)
    pad[:n] = text
    sharding = NamedSharding(mesh, P(axis))
    text_dev = jax.device_put(jnp.asarray(pad), sharding)
    L, I = sharded_l_arrays_device(
        ct,
        text_dev,
        jnp.int32(n),
        mesh=mesh,
        block=block,
        axis=axis,
        num_shards=D,
        use_pallas=use_pallas,
        interpret=interpret,
    )
    return np.asarray(L)[: n + 1], np.asarray(I)[: n + 1]


def sharded_match_all(
    tables, text: np.ndarray, mesh: Mesh, *, block: int = 32, **kw
):
    """Sharded MatchAll: exact cross-shard L + host selection.

    Returns (starts, ends, pids) numpy arrays."""
    from ..engine import select

    L, I = sharded_l_arrays(tables, text, mesh, block=block, **kw)
    pos = np.flatnonzero(L >= 0).astype(np.int64)
    return select.match_all_candidates(pos, L[pos], I[pos])


def sharded_match_count(
    tables, text: np.ndarray, mesh: Mesh, *, block: int = 32, **kw
) -> int:
    return len(sharded_match_all(tables, text, mesh, block=block, **kw)[0])
