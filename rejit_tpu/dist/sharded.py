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


def _local_fused_fn(st, n_patterns, text_sh, n, *, block, chl, axis,
                    num_shards, interpret, use_ff, rolled=False):
    """Fused select-chain kernel per shard (the production engine) with an
    exact cross-shard splice: ONE kernel pass per shard. The kernel runs
    with a neutral (identity) right-edge seed and packs each boundary's
    shard-end state above its local L; shard summaries (the kernel's final
    carry G) are all-gathered, every device computes its exclusive suffix
    tail, and a Q-term select chain applies the tail per boundary. No
    second sweep, no bounded-window assumption.

    Positions inside the kernel are shard-relative (shard <=
    schain_pallas.max_p(Q) bytes); this wrapper re-bases to global int32."""
    from ..engine import schain as schain_mod
    from ..kernels import schain_pallas as sp

    S = text_sh.shape[0]
    d = jax.lax.axis_index(axis)
    offset = (d * S).astype(jnp.int32)
    n_loc = jnp.clip(n - offset, 0, S)

    staged = sp.stage_text(st, text_sh, block=block, chl=chl)
    # Halo: the previous shard's last byte fixes boundary 0's start state.
    last_b = text_sh[-1:]
    prev_b = jax.lax.ppermute(
        last_b, axis, [(i, i + 1) for i in range(num_shards - 1)]
    )
    accept_eot = st[5]
    start_prev = sp.start_states_for(st, prev_b)[0]
    sk0_t = staged[1]
    sk00 = jnp.where(d == 0, sk0_t[0, 0], start_prev)
    staged = (staged[0], sk0_t.at[0, 0].set(sk00), staged[2])

    Q = len(st[2][0])
    Lpk_t, I_t, G, plan, (nb, nbc, K, CHL) = sp.call_fused(
        st, n_patterns, staged, n_loc, block=block, chl=chl,
        interpret=interpret, use_ff=use_ff, rolled=rolled,
        seed=sp.neutral_seed(Q), emit_f=True,
    )
    Lpk = sp.untile(Lpk_t, nbc, K, CHL)

    # Shard summaries -> exclusive per-shard suffix tails (global m).
    Gm_g = jnp.where(G[1] >= 0, G[1] + offset, -1)
    gf = jax.lax.all_gather(G[0], axis, axis=0)          # (D, Q)
    gm = jax.lax.all_gather(Gm_g, axis, axis=0)
    gi = jax.lax.all_gather(G[2], axis, axis=0)
    ae = jnp.asarray(accept_eot, jnp.int32)
    eot_tail = (
        jnp.arange(Q, dtype=jnp.int32),
        jnp.where(ae >= 0, n, -1).astype(jnp.int32),
        ae,
    )
    suf = schain_mod._suffix_scan_schain((gf, gm, gi), eot_tail)
    tail_m = suf[1][d]                                   # (Q,)
    tail_i = suf[2][d]

    # Per-boundary tail splice via Q-term selects.
    ms = sp.m_shift(Q)
    F = Lpk >> ms
    L_loc = (Lpk & ((1 << ms) - 1)) - 1
    mt = jnp.full(F.shape, -1, jnp.int32)
    it = jnp.full(F.shape, -1, jnp.int32)
    for q in range(Q):
        mt = jnp.where(F == q, tail_m[q], mt)
        it = jnp.where(F == q, tail_i[q], it)
    later = mt >= 0
    L = jnp.where(later, mt, jnp.where(L_loc >= 0, L_loc + offset, -1))
    if I_t is not None:
        I = sp.untile(I_t, nbc, K, CHL)
        I = jnp.where(later, it, I)
    else:
        I = jnp.where(L >= 0, 0, -1)

    bidx = offset + jnp.arange(S, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


@functools.partial(
    jax.jit,
    static_argnames=(
        "st", "n_patterns", "block", "chl", "axis", "num_shards", "mesh",
        "interpret", "use_ff", "rolled"
    ),
)
def sharded_l_arrays_device_fused(
    st,
    n_patterns: int,
    text_sharded: jnp.ndarray,
    n: jnp.ndarray,
    *,
    mesh: Mesh,
    block: int = 128,
    chl: int = 128,
    axis: str = "data",
    num_shards: int = 1,
    interpret: bool = False,
    use_ff: bool = True,
    rolled: bool = False,
):
    """Sharded (L, I) via the fused select-chain kernel per shard.

    st = schain.static_tables(tables); shard size must be a multiple of
    block*8*chl and <= schain_pallas.max_p(Q); P > n so boundary n lands
    a shard."""
    fn = jax.shard_map(
        functools.partial(
            _local_fused_fn,
            st,
            n_patterns,
            block=block,
            chl=chl,
            axis=axis,
            num_shards=num_shards,
            interpret=interpret,
            use_ff=use_ff,
            rolled=rolled,
        ),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(text_sharded, n)


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
    engine: str = "pipeline",
    chl: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: shard + pad a host text, run, trim to n+1.

    engine='fused' runs the production VMEM-fused select-chain kernel per
    shard (exact cross-shard splice, see _local_fused_fn); 'pipeline' the
    jnp gather formulation (use_pallas for its fused byte-step kernels)."""
    D = mesh.devices.size
    n = len(text)
    if engine == "fused":
        from ..engine import schain as schain_mod

        st = schain_mod.static_tables(tables)
        chunk = D * block * 8 * chl
        Pld = ((n + 1 + chunk - 1) // chunk) * chunk   # P > n strictly
        pad = np.zeros(Pld, dtype=np.uint8)
        pad[:n] = text
        sharding = NamedSharding(mesh, P(axis))
        text_dev = jax.device_put(jnp.asarray(pad), sharding)
        L, I = sharded_l_arrays_device_fused(
            st,
            tables.n_patterns,
            text_dev,
            jnp.int32(n),
            mesh=mesh,
            block=block,
            chl=chl,
            axis=axis,
            num_shards=D,
            interpret=interpret,
        )
        return np.asarray(L)[: n + 1], np.asarray(I)[: n + 1]
    ct = (
        pipeline.device_tables(tables)
        if not isinstance(tables, DeviceTables)
        else tables
    )
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
