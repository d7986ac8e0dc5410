"""Streaming (chunked) exact MatchAll with checkpoint/resume.

Capability the reference lacks outright (single pass over an in-memory
string — SURVEY.md §5.3/§5.4 list "failure detection" and "checkpoint /
resume" as new-framework subsystems): match a corpus far larger than device
memory by scanning fixed-size chunks, with per-chunk retry and a state
directory that lets a killed job resume at the chunk where it stopped.

Chunks are processed from the END of the corpus backward.  Each chunk run is
seeded with the carried (Q,)-summary `tail` of everything to its right — the
same state-map algebra the sharded path uses across shards
(rejit_tpu/dist/sharded.py) — so leftmost-longest spans crossing chunk
boundaries are exact with no bounded-window assumption.  Per-chunk
candidates are compacted on device (host transfer is O(#candidates), not
O(chunk)); the final greedy non-overlap selection runs once over the sparse
global candidate list.

Positions: device arrays are chunk-local int32 (the engine pins x64 off);
the host rebase into global int64 happens on candidate/tail arrays, so the
corpus size is unbounded.  A single match span longer than 2**31-2 bytes
would clamp — documented limit.
"""
from __future__ import annotations

import functools
import hashlib
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile.dfa import DFATables, ctx_of_byte
from . import pipeline, select
from .pipeline import DeviceTables

_CLAMP = np.int64(2**31 - 2)


@functools.partial(
    jax.jit, static_argnames=("block", "use_pallas", "interpret")
)
def chunk_l_arrays_device(
    ct: DeviceTables,
    text: jnp.ndarray,
    n_local: jnp.ndarray,
    tail: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    first_start: jnp.ndarray,
    *,
    block: int = pipeline.DEFAULT_BLOCK,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """(L, I, total) for one chunk, positions chunk-local.

    text: (P,) uint8, P a multiple of `block`; n_local: valid byte count
    (== P for interior chunks, < P only for the final corpus chunk, whose
    padding must leave P > n_local so boundary n_local is emitted).
    tail: (f, m, i) each (Q,) — suffix summary of everything after the
    chunk, m already rebased to this chunk's coordinates.
    first_start: start state for boundary 0 (from the byte preceding the
    chunk, or CTX_BEGIN at corpus start).

    Returns L, I over the chunk's P boundaries (local 0..P-1; boundaries
    > n_local are -1) and `total`, the (f, m, i) summary of
    [chunk start, corpus end) in this chunk's coordinates — the tail for
    the chunk to the left.
    """
    P = text.shape[0]
    K = block
    nb = P // K

    cls, ctx = pipeline.classify(ct, text)
    starts = jnp.concatenate(
        [first_start[None], ct.start_by_ctx[ctx[:-1]]]
    )
    pos = jnp.arange(P, dtype=jnp.int32)
    cls_kb = pipeline.block_views(cls, nb, K)
    pos_kb = pipeline.block_views(pos, nb, K)
    startsb = pipeline.block_views(starts, nb, K)

    if use_pallas:
        from ..kernels import dfa_pallas

        summ = dfa_pallas.phase1_pallas(
            ct.packed, ct.n_classes, cls_kb, n_local, K=K,
            interpret=interpret,
        )
        suf = pipeline.suffix_scan(summ, tail)
        L, I = dfa_pallas.phase3_pallas(
            ct.packed, ct.n_classes, suf, cls_kb, startsb, n_local,
            K=K, interpret=interpret,
        )
    else:
        summ = pipeline.phase1_summaries(ct, cls_kb, pos_kb, n_local)
        suf = pipeline.suffix_scan(summ, tail)
        L, I = pipeline.phase3_emit(ct, suf, cls_kb, pos_kb, startsb, n_local)
    total = pipeline.combine(
        (summ[0][0], summ[1][0], summ[2][0]),
        (suf[0][0], suf[1][0], suf[2][0]),
    )

    L = jnp.where(pos <= n_local, L, -1)
    I = jnp.where(pos <= n_local, I, -1)
    return L, I, total


@functools.partial(
    jax.jit,
    static_argnames=("st", "n_patterns", "block", "chl", "interpret",
                     "use_ff", "rolled"),
)
def chunk_l_arrays_device_fused(
    st,
    n_patterns: int,
    text: jnp.ndarray,
    n_local: jnp.ndarray,
    tail_has: jnp.ndarray,
    first_start: jnp.ndarray,
    *,
    block: int = 128,
    chl: int = 128,
    interpret: bool = False,
    use_ff: bool = True,
    rolled: bool = False,
):
    """One chunk via the production fused kernel (packed outputs).

    The fused kernel's packed positions cannot hold a global tail
    m (corpora are unbounded), so the kernel runs with a NEUTRAL seed and
    packs each boundary's chunk-end state above its local L (emit_f, as
    the sharded path does); `tail_has` is a (Q,) 0/1 vector saying
    whether the global tail (host-side, int64) has a match from state q.
    Returns (Lpk, I|None, cand, G): packed L, pids, the candidate mask
    (local match OR live tail state), and the chunk's own state-map
    summary G (3, Q) chunk-local — the host composes it with its int64
    tail to carry leftward.
    """
    from ..kernels import schain_pallas as sp

    Q = len(st[2][0])
    staged = sp.stage_text(st, text, block=block, chl=chl)
    staged = (staged[0], staged[1].at[0, 0].set(first_start), staged[2])
    Lpk_t, I_t, G, _plan, (nb, nbc, K, CHL) = sp.call_fused(
        st, n_patterns, staged, n_local, block=block, chl=chl,
        interpret=interpret, use_ff=use_ff, rolled=rolled,
        seed=sp.neutral_seed(Q), emit_f=True,
    )
    Lpk = sp.untile(Lpk_t, nbc, K, CHL)
    I = sp.untile(I_t, nbc, K, CHL) if I_t is not None else None
    ms = sp.m_shift(Q)
    F = Lpk >> ms
    L_loc = (Lpk & ((1 << ms) - 1)) - 1
    th = jnp.zeros(F.shape, jnp.bool_)
    for q in range(Q):
        th = jnp.where(F == q, tail_has[q] > 0, th)
    pos = jnp.arange(Lpk.shape[0], dtype=jnp.int32)
    cand = (th | (L_loc >= 0)) & (pos <= n_local)
    return Lpk, I, cand, G


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_packed(cand, Lpk, I, *, cap: int):
    (pos,) = jnp.nonzero(cand, size=cap, fill_value=-1)
    pos = pos.astype(jnp.int32)
    valid = pos >= 0
    safe = jnp.where(valid, pos, 0)
    lpk = jnp.where(valid, Lpk[safe], 0)
    pid = jnp.where(valid, I[safe], -1) if I is not None else jnp.where(
        valid, 0, -1
    )
    return pos, lpk, pid


def _fingerprint(
    t: DFATables, source, n: int, chunk_bytes: int, block: int
) -> str:
    h = hashlib.sha1()
    for a in (t.class_of, t.next, t.accept, t.accept_eot, t.start_states):
        h.update(np.ascontiguousarray(a).tobytes())
    h.update(f"{n}:{chunk_bytes}:{block}".encode())
    # Corpus identity sample: head + tail KB, so a reused state_dir against
    # a different (or rewritten same-length) corpus restarts instead of
    # silently returning the old corpus's candidates. Mid-file edits that
    # keep head/tail/length identical are not detected — use a fresh
    # state_dir when regenerating a corpus in place.
    h.update(np.asarray(source[:1024], dtype=np.uint8).tobytes())
    h.update(np.asarray(source[max(0, n - 1024):n], dtype=np.uint8).tobytes())
    return h.hexdigest()


class _State:
    """Checkpoint directory: meta.json + tail.npz + cands_<i>.npz."""

    def __init__(self, path: Optional[str], fp: str):
        self.path = path
        self.fp = fp
        self.mem = {}  # chunk -> (pos, end, pid), also mirrors disk saves
        if path:
            os.makedirs(path, exist_ok=True)

    def load(self):
        """-> (next_chunk, tail_global) or None if absent/mismatched."""
        if not self.path:
            return None
        meta_p = os.path.join(self.path, "meta.json")
        if not os.path.exists(meta_p):
            return None
        try:
            with open(meta_p) as f:
                meta = json.load(f)
            if meta.get("fingerprint") != self.fp:
                return None
            z = np.load(os.path.join(self.path, "tail.npz"))
            # tail.npz and meta.json are written in sequence; a kill between
            # the two would pair meta's cursor with a newer tail and produce
            # silently wrong seeds, so the cursor is stored in BOTH and must
            # agree (a mismatch resumes one chunk earlier — the tail's own
            # cursor — which is always safe).
            if int(z["next_chunk"]) != int(meta["next_chunk"]):
                return int(z["next_chunk"]), (z["f"], z["m"], z["i"])
            return int(meta["next_chunk"]), (z["f"], z["m"], z["i"])
        except Exception:
            return None

    def save(self, next_chunk: int, tail_global) -> None:
        if not self.path:
            return
        f, m, i = tail_global
        tmp_t = os.path.join(self.path, "tail.npz.tmp")
        with open(tmp_t, "wb") as fh:
            np.savez(fh, f=f, m=m, i=i, next_chunk=np.int64(next_chunk))
        os.replace(tmp_t, os.path.join(self.path, "tail.npz"))
        tmp = os.path.join(self.path, "meta.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"fingerprint": self.fp, "next_chunk": next_chunk}, fh)
        os.replace(tmp, os.path.join(self.path, "meta.json"))

    def save_cands(self, i: int, pos, end, pid) -> None:
        self.mem[i] = (pos, end, pid)
        if not self.path:
            return
        final = os.path.join(self.path, f"cands_{i}.npz")
        with open(final + ".tmp", "wb") as fh:
            np.savez(fh, pos=pos, end=end, pid=pid)
        os.replace(final + ".tmp", final)

    def load_cands(self, i: int):
        if i in self.mem:
            return self.mem[i]
        z = np.load(os.path.join(self.path, f"cands_{i}.npz"))
        return z["pos"], z["end"], z["pid"]


def stream_candidates(
    tables: DFATables,
    source,
    *,
    chunk_bytes: int = 8 << 20,
    block: int = pipeline.DEFAULT_BLOCK,
    state_dir: Optional[str] = None,
    retries: int = 3,
    progress=None,
    use_pallas: bool = False,
    interpret: bool = False,
    engine: str = "pipeline",
    chl: int = 128,
    rolled: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global candidate (pos, end, pid) int64 arrays for a huge corpus.

    `source` is a uint8 array-like supporting len() and slicing — an
    np.memmap over a file works and is the intended use. Candidates are the
    per-boundary leftmost-longest L-array entries; feed them to
    select.match_all_candidates for MatchAll semantics (stream_match_all
    does both). engine='fused' scans each chunk with the production
    VMEM-fused kernel (chunk must be a multiple of block*8*chl and
    <= 128 MB); 'pipeline'/use_pallas are the gather formulations.
    """
    from . import spans

    grain = block
    if engine == "fused":
        from ..engine import schain as schain_mod

        st = schain_mod.static_tables(tables)
        grain = block * 8 * chl
    elif use_pallas:
        from ..kernels.dfa_pallas import CHUNK

        grain = block * CHUNK  # pallas grid needs whole CHUNK columns
    assert chunk_bytes % grain == 0 and chunk_bytes > 0, (
        f"chunk_bytes must be a multiple of {grain}"
    )
    ct = None
    if engine != "fused":
        ct = pipeline.device_tables(tables)
    Q = tables.n_states
    n = len(source)
    C = chunk_bytes
    nc = max(1, -(-n // C))  # last chunk may be empty-of-full-C but has EOT
    fp = _fingerprint(tables, source, n, C, block)
    state = _State(state_dir, fp)

    # Tail in GLOBAL int64 coordinates (host side).
    eot_tail = (
        np.arange(Q, dtype=np.int64),
        np.where(np.asarray(tables.accept_eot) >= 0, np.int64(n), -1),
        np.asarray(tables.accept_eot, dtype=np.int64),
    )
    tail_global = eot_tail
    start_chunk = nc - 1
    resumed = state.load()
    if resumed is not None:
        start_chunk, tail_global = resumed
        if start_chunk < 0:
            try:
                return _collect(state, nc)
            except Exception:
                # Damaged candidate files under a "complete" meta (e.g.
                # manual deletion): restart the scan rather than poisoning
                # every future call with this state_dir.
                start_chunk, tail_global = nc - 1, eot_tail

    for i in range(start_chunk, -1, -1):
        a = i * C
        b = min(n, a + C)
        n_local = b - a
        if i == nc - 1:
            P = (n_local // grain + 1) * grain  # strictly > n_local
        else:
            P = C
        buf = np.zeros(P, dtype=np.uint8)
        buf[:n_local] = np.asarray(source[a:b], dtype=np.uint8)

        if engine != "fused":
            # Rebase tail into chunk coordinates (clamped — module doc).
            tm = tail_global[1]
            m_local = np.where(
                tm >= 0, np.minimum(tm - a, _CLAMP), np.int64(-1)
            ).astype(np.int32)
            tail_dev = (
                jnp.asarray(tail_global[0].astype(np.int32)),
                jnp.asarray(m_local),
                jnp.asarray(tail_global[2].astype(np.int32)),
            )
        if a == 0:
            first_start = int(tables.start_states[0])  # CTX_BEGIN
        else:
            first_start = int(
                tables.start_states[ctx_of_byte(int(source[a - 1]))]
            )

        err = None
        for attempt in range(retries):
            try:
                if engine == "fused":
                    th = jnp.asarray(
                        (tail_global[1] >= 0).astype(np.int32)
                    )
                    Lpk, Ipk, cand, G = chunk_l_arrays_device_fused(
                        st,
                        tables.n_patterns,
                        jnp.asarray(buf),
                        jnp.int32(n_local),
                        th,
                        jnp.int32(first_start),
                        block=block,
                        chl=chl,
                        interpret=interpret,
                        rolled=rolled,
                    )
                    c = int(jnp.sum(cand, dtype=jnp.int32))
                    cap = 16
                    while cap < c:
                        cap *= 4
                    posl, lpk, pidl = (
                        np.asarray(x)[:c]
                        for x in _compact_packed(cand, Lpk, Ipk, cap=cap)
                    )
                    # Host splice in int64: live tail states take their
                    # global tail match; locals are rebased.
                    from ..kernels import schain_pallas as _sp

                    msb = _sp.m_shift(len(st[2][0]))
                    Fh = lpk >> msb
                    L_loc = (
                        (lpk & ((1 << msb) - 1)).astype(np.int64) - 1
                    )
                    tm64 = tail_global[1][Fh]
                    ti64 = tail_global[2][Fh]
                    later = tm64 >= 0
                    end = np.where(later, tm64, L_loc + a)
                    pid = np.where(later, ti64, pidl.astype(np.int64))
                    pos = posl
                    # keep only real candidates (live-tail states whose
                    # tail match is gone after clamping never happen: th
                    # came from tail_global, so later == th here)
                    keep = later | (L_loc >= 0)
                    pos, end, pid = pos[keep], end[keep], pid[keep]
                    # Compose chunk map with the int64 tail for the next
                    # (leftward) chunk.
                    Gf, Gm, Gi = (np.asarray(x) for x in G)
                    tf = tail_global[0][Gf]
                    tl = tail_global[1][Gf] >= 0
                    tm_ = np.where(
                        tl, tail_global[1][Gf],
                        np.where(Gm >= 0, Gm.astype(np.int64) + a, -1),
                    )
                    ti = np.where(
                        tl, tail_global[2][Gf], Gi.astype(np.int64)
                    )
                    pos_g = pos.astype(np.int64) + a
                    end_g = end.astype(np.int64)
                    tail_global = (tf, tm_, ti)
                    break
                L, I, total = chunk_l_arrays_device(
                    ct,
                    jnp.asarray(buf),
                    jnp.int32(n_local),
                    tail_dev,
                    jnp.int32(first_start),
                    block=block,
                    use_pallas=use_pallas,
                    interpret=interpret,
                )
                pos, end, pid = spans.candidates_host(L, I)
                tf, tm_, ti = (np.asarray(x) for x in total)
                # Rebase outputs to global coordinates.
                pos_g = pos.astype(np.int64) + a
                end_g = end.astype(np.int64) + a
                tail_global = (
                    tf.astype(np.int64),
                    np.where(
                        tm_ >= 0, tm_.astype(np.int64) + a, np.int64(-1)
                    ),
                    ti.astype(np.int64),
                )
                break
            except Exception as e:  # pragma: no cover - tunnel flakiness
                err = e
        else:  # pragma: no cover
            raise RuntimeError(
                f"chunk {i} failed after {retries} attempts"
            ) from err
        state.save_cands(i, pos_g, end_g, pid)
        state.save(i - 1, tail_global)
        if progress is not None:
            progress(i, nc)

    return _collect(state, nc)


def _collect(state: _State, nc: int):
    ps, es, ids = [], [], []
    for i in range(nc):
        p, e, d = state.load_cands(i)
        ps.append(p)
        es.append(e)
        ids.append(d)
    return (np.concatenate(ps), np.concatenate(es), np.concatenate(ids))


def stream_match_all(
    tables: DFATables, source, **kw
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Non-overlapping leftmost-longest (starts, ends, pids) over `source`."""
    pos, end, pid = stream_candidates(tables, source, **kw)
    return select.match_all_candidates(pos, end, pid)


def stream_match_count(tables: DFATables, source, **kw) -> int:
    return len(stream_match_all(tables, source, **kw)[0])


# ---------------------------------------------------------------------------
# Early-exit streaming MatchFirst / MatchAnywhere / MatchFull
# ---------------------------------------------------------------------------
#
# Forward doubling-window scan: each window is evaluated twice with the SAME
# chunk kernel but different suffix seeds —
#   pessimistic tail: nothing after the window accepts (m = -1 everywhere);
#     every candidate it reports is a real accept seen inside the window;
#   optimistic tail: every state that can still reach an accept (host
#     reachability over the tables) accepts "far away" (m = clamp);
#     a boundary with optimistic L < 0 provably never starts a match.
# First boundary where both agree (and all earlier boundaries are
# optimistically dead) is the exact leftmost-longest first match; if the
# window is inconclusive it doubles, and when it reaches end-of-text the
# real EOT seed makes it exact. Expected work is O(distance to the first
# match), not O(corpus) — the reference's early-exit MatchFirst analog
# (SURVEY.md §3.3) for corpora that don't fit in memory.


def _can_accept_states(t: DFATables) -> np.ndarray:
    """bool[Q]: acceptance (incl. at a future EOT) reachable from state."""
    can = (np.asarray(t.accept) >= 0).any(axis=1) | (
        np.asarray(t.accept_eot) >= 0
    )
    while True:
        new = can | can[t.next].any(axis=1)
        if (new == can).all():
            return can
        can = new


def _first_start_at(tables: DFATables, source, base: int) -> int:
    if base == 0:
        return int(tables.start_states[0])  # CTX_BEGIN
    return int(tables.start_states[ctx_of_byte(int(source[base - 1]))])


_DEV_CLAMP = 1 << 30   # device-side "could still grow" sentinel (> any L)


@functools.partial(
    jax.jit,
    static_argnames=("st", "n_patterns", "block", "chl", "interpret",
                     "at_eot", "rolled"),
)
def _window_verdict_device(
    st, n_patterns, staged, n_local, can_t, ae_t, *, at_eot,
    block, chl, interpret, rolled=False,
):
    """Whole-window MatchFirst verdict ON DEVICE: (s, L_s, Lo_s, I_s,
    any_proven). One fused pass with a neutral seed yields packed
    (end-state, local L) per boundary; the pessimistic and optimistic
    evaluations and the first-candidate scan reduce to five scalars, so
    the tunnel carries no window-sized arrays."""
    from ..kernels import schain_pallas as sp

    Q = len(st[2][0])
    Lpk_t, I_t, _G, _plan, (nb, nbc, K, CHL) = sp.call_fused(
        st, n_patterns, staged, n_local, block=block, chl=chl,
        interpret=interpret, rolled=rolled,
        seed=sp.neutral_seed(Q), emit_f=True,
    )
    Lpk = sp.untile(Lpk_t, nbc, K, CHL)
    I = sp.untile(I_t, nbc, K, CHL) if I_t is not None else None
    ms = sp.m_shift(Q)
    F = Lpk >> ms
    L = (Lpk & ((1 << ms) - 1)) - 1
    if I is None:
        I = jnp.where(L >= 0, 0, -1)
    # Q-term selects (gather-free) over the per-state vectors.
    can_f = jnp.zeros(F.shape, jnp.bool_)
    ae_f = jnp.full(F.shape, -1, jnp.int32)
    for q in range(Q):
        hit = F == q
        can_f = jnp.where(hit, can_t[q] > 0, can_f)
        ae_f = jnp.where(hit, ae_t[q], ae_f)
    if at_eot:
        em = ae_f >= 0
        L = jnp.where(em, n_local, L)
        I = jnp.where(em, ae_f, I)
        L_o = L
    else:
        L_o = jnp.where(can_f, jnp.int32(_DEV_CLAMP), L)
    idx = jnp.arange(L.shape[0], dtype=jnp.int32)
    om = (L_o >= 0) & (idx <= n_local)
    BIG = jnp.int32(1 << 30)
    s = jnp.min(jnp.where(om, idx, BIG))
    found = s < BIG
    sel = idx == s
    L_s = jnp.max(jnp.where(sel, L, -1))
    Lo_s = jnp.max(jnp.where(sel, L_o, -1))
    I_s = jnp.max(jnp.where(sel, I, -1))
    any_proven = jnp.any(om & (L >= 0))
    return (
        jnp.where(found, s, -1), L_s, Lo_s, I_s,
        any_proven.astype(jnp.int32),
    )


def _window_fused_verdict(st, tables, source, base, end, n, can_np,
                          block, chl, interpret, rolled=False):
    """Host wrapper: stage the window, run the device verdict, return
    python scalars (s, L_s, Lo_s, I_s, any_proven)."""
    from ..kernels import schain_pallas as sp

    n_local = end - base
    grain = block * 8 * chl
    at_eot = end >= n
    if at_eot:
        P = (n_local // grain + 1) * grain  # strictly > n_local
    else:
        P = -(-n_local // grain) * grain
    buf = np.zeros(P, dtype=np.uint8)
    buf[:n_local] = np.asarray(source[base:end], dtype=np.uint8)
    staged = sp.stage_text_device(
        st, jnp.asarray(buf), block=block, chl=chl
    )
    fs = jnp.int32(_first_start_at(tables, source, base))
    staged = (staged[0], staged[1].at[0, 0].set(fs), staged[2])
    out = _window_verdict_device(
        st, tables.n_patterns, staged, jnp.int32(n_local),
        jnp.asarray(can_np.astype(np.int32)),
        jnp.asarray(tables.accept_eot, jnp.int32),
        at_eot=at_eot, block=block, chl=chl, interpret=interpret,
        rolled=rolled,
    )
    return tuple(int(x) for x in out)


def _window_fused_verdict_staged(st, tables, staged_full, base, end, n,
                                 can_np, block, chl, interpret,
                                 rolled=False):
    """Window verdict from a FULLY STAGED corpus: the window's tiles and
    per-block start states are device slices of the one-time staging, so
    the doubling ladder moves NO window-sized data over the tunnel.

    `staged_full` = (tiles, sk0_t, start_eot, P_full) for the whole padded
    text with P_full strictly > n (the EOT window needs padding beyond n).
    No sk0 override is needed: block c0's start state was computed from
    the true previous byte source[base-1] during global staging (and block
    0 carries CTX_BEGIN), exactly what _first_start_at would inject."""
    tiles, sk0_t, start_eot, P_full = staged_full
    grain = block * 8 * chl
    at_eot = end >= n
    c0 = base // grain
    c1 = P_full // grain if at_eot else end // grain
    K8 = block * 8
    staged = (
        tiles[c0 * K8:c1 * K8],
        sk0_t[c0 * 8:c1 * 8],
        start_eot,
    )
    n_local = (n if at_eot else end) - base
    out = _window_verdict_device(
        st, tables.n_patterns, staged, jnp.int32(n_local),
        jnp.asarray(can_np.astype(np.int32)),
        jnp.asarray(tables.accept_eot, jnp.int32),
        at_eot=at_eot, block=block, chl=chl, interpret=interpret,
        rolled=rolled,
    )
    return tuple(int(x) for x in out)


def _window_l(ct, tables, source, base, end, n, tail_np, block,
              use_pallas, interpret, grain):
    """(L, I) local arrays for window [base, end) with the given tail."""
    n_local = end - base
    if end >= n:
        P = (n_local // grain + 1) * grain  # strictly > n_local: EOT inside
    else:
        P = -(-n_local // grain) * grain
    buf = np.zeros(P, dtype=np.uint8)
    buf[:n_local] = np.asarray(source[base:end], dtype=np.uint8)
    tail_dev = tuple(jnp.asarray(x.astype(np.int32)) for x in tail_np)
    L, I, _ = chunk_l_arrays_device(
        ct, jnp.asarray(buf), jnp.int32(n_local), tail_dev,
        jnp.int32(_first_start_at(tables, source, base)),
        block=block, use_pallas=use_pallas, interpret=interpret,
    )
    return np.asarray(L), np.asarray(I), n_local


def stream_match_first(
    tables: DFATables,
    source,
    *,
    chunk_bytes: int = 8 << 20,
    block: int = pipeline.DEFAULT_BLOCK,
    max_window: int = 1 << 28,
    use_pallas: bool = False,
    interpret: bool = False,
    anywhere: bool = False,
    engine: str = "pipeline",
    chl: int = 128,
    staged_full=None,
    rolled: bool = False,
):
    """Exact leftmost-longest first match (start, end, pid) or None.

    With anywhere=True, returns True/False as soon as ANY accept is proven
    (without waiting for the longest end) — the MatchAnywhere semantics.
    engine='fused' evaluates each window with ONE fused-kernel pass (the
    packed boundary end-states give the pessimistic and optimistic
    answers together).

    staged_full: (tiles, sk0_t, start_eot, P_full) of the WHOLE padded
    text (P_full > n) — every window is then a device slice and the ladder
    uploads nothing (the DeviceCorpus serving path). None = stage the full
    text once up front when the text is in-memory and small enough that
    one staging beats the ladder's re-uploads; False = never full-stage
    (per-window upload, the path for huge file-backed sources).
    """
    fused = engine == "fused"
    st_ = None
    ct = None
    if fused:
        from ..engine import schain as schain_mod2

        st_ = schain_mod2.static_tables(tables)
    else:
        ct = pipeline.device_tables(tables)
    Q = tables.n_states
    n = len(source)
    grain = block
    if fused:
        from ..kernels import schain_pallas as sp2

        grain = block * 8 * chl
        # Window P is padded one grain past W at EOT; keep every window
        # within the packed-position limit (beyond it, the code falls
        # back to the exact chunked full scan).
        max_window = min(
            max_window, (sp2.max_p(Q) - grain) // grain * grain
        )
        # Auto full-stage (lazily): one n-byte staging replaces the
        # ladder's ~2.5n of window re-uploads, but only pays off when the
        # ladder actually needs more than one window — so the first
        # window uploads as before (an early match stays O(W0)) and the
        # SECOND window triggers the one-time staging. Skipped when the
        # text is huge relative to the first window (16x bounds the
        # worst-case staging overhead) or exceeds the packed limit.
        P_full = (n // grain + 1) * grain
        auto_stage = (
            staged_full is None
            and P_full <= sp2.max_p(Q)
            and n <= 16 * max(chunk_bytes, grain)
        )
        if not staged_full:
            staged_full = None
    elif use_pallas:
        from ..kernels.dfa_pallas import CHUNK

        grain = block * CHUNK

    ident = np.arange(Q, dtype=np.int64)
    pess = (ident, np.full(Q, -1, np.int64), np.full(Q, -1, np.int64))
    can = _can_accept_states(tables)
    opt = (
        ident,
        np.where(can, np.int64(_CLAMP), -1),
        np.where(can, 0, -1).astype(np.int64),
    )

    base = 0
    W = -(-max(chunk_bytes, grain) // grain) * grain
    W0 = W
    windows = 0
    while True:
        end = min(base + W, n)
        at_eot = end >= n
        if fused:
            if staged_full is None and auto_stage and windows >= 1:
                buf = np.zeros(P_full, dtype=np.uint8)
                buf[:n] = np.asarray(source[:n], dtype=np.uint8)
                sf = sp2.stage_text_device(
                    st_, jnp.asarray(buf), block=block, chl=chl
                )
                staged_full = (sf[0], sf[1], sf[2], P_full)
            windows += 1
            if staged_full is not None:
                s_, L_s, Lo_s, I_s, any_p = _window_fused_verdict_staged(
                    st_, tables, staged_full, base, end, n, can, block,
                    chl, interpret, rolled,
                )
            else:
                s_, L_s, Lo_s, I_s, any_p = _window_fused_verdict(
                    st_, tables, source, base, end, n, can, block, chl,
                    interpret, rolled,
                )
            if s_ < 0:
                if at_eot:
                    return False if anywhere else None
                base = end  # provably no match starts in this window
                W = W0
                continue
            if anywhere and any_p:
                return True
            if L_s == Lo_s or at_eot:
                return (base + s_, base + L_s, I_s)
            if W >= max_window:
                st2, en2, pid2 = stream_match_all(
                    tables, source, chunk_bytes=chunk_bytes, block=block,
                    engine="fused", chl=chl, interpret=interpret,
                    rolled=rolled,
                )
                if anywhere:
                    return len(st2) > 0
                if len(st2) == 0:
                    return None
                return (int(st2[0]), int(en2[0]), int(pid2[0]))
            W *= 2
            continue
        elif at_eot:
            eot = (
                ident,
                np.where(np.asarray(tables.accept_eot) >= 0,
                         np.int64(end - base), -1),
                np.asarray(tables.accept_eot, dtype=np.int64),
            )
            L, I, n_local = _window_l(
                ct, tables, source, base, end, n, eot, block,
                use_pallas, interpret, grain,
            )
            L_o = L  # exact: optimistic == pessimistic at EOT
        else:
            L, I, n_local = _window_l(
                ct, tables, source, base, end, n, pess, block,
                use_pallas, interpret, grain,
            )
            L_o, _, _ = _window_l(
                ct, tables, source, base, end, n, opt, block,
                use_pallas, interpret, grain,
            )
        cand_o = np.flatnonzero(L_o[: n_local + 1] >= 0)
        if len(cand_o) == 0:
            if at_eot:
                return False if anywhere else None
            base = end  # provably no match starts in this window
            W = W0
            continue
        if anywhere and (L[cand_o] >= 0).any():
            return True
        s = int(cand_o[0])
        if L[s] == L_o[s]:  # longest end cannot grow with more text
            return (base + s, base + int(L[s]), int(I[s]))
        if at_eot:  # cannot happen (EOT seed makes both equal) — safety
            return (base + s, base + int(L[s]), int(I[s]))
        if W >= max_window:
            # A single match span wider than max_window: fall back to the
            # exact full scan.
            st, en, pid = stream_match_all(
                tables, source, chunk_bytes=chunk_bytes, block=block,
                use_pallas=use_pallas, interpret=interpret,
                **({"engine": "fused", "chl": chl} if fused else {}),
            )
            if anywhere:
                return len(st) > 0
            if len(st) == 0:
                return None
            return (int(st[0]), int(en[0]), int(pid[0]))
        W *= 2


def stream_match_anywhere(tables: DFATables, source, **kw) -> bool:
    return bool(stream_match_first(tables, source, anywhere=True, **kw))


def stream_match_full(
    tables: DFATables,
    source,
    *,
    chunk_bytes: int = 8 << 20,
    block: int = pipeline.DEFAULT_BLOCK,
    use_pallas: bool = False,
    interpret: bool = False,
) -> bool:
    """MatchFull (pattern spans the whole corpus) with early-exit False.

    Only boundary 0 matters; windows double from the start and the scan
    stops as soon as the boundary-0 thread provably dies.
    """
    ct = pipeline.device_tables(tables)
    Q = tables.n_states
    n = len(source)
    grain = block
    if use_pallas:
        from ..kernels.dfa_pallas import CHUNK

        grain = block * CHUNK
    ident = np.arange(Q, dtype=np.int64)
    can = _can_accept_states(tables)
    opt = (
        ident,
        np.where(can, np.int64(_CLAMP), -1),
        np.where(can, 0, -1).astype(np.int64),
    )
    W = -(-max(chunk_bytes, grain) // grain) * grain
    while True:
        end = min(W, n)
        if end >= n:
            eot = (
                ident,
                np.where(np.asarray(tables.accept_eot) >= 0,
                         np.int64(end), -1),
                np.asarray(tables.accept_eot, dtype=np.int64),
            )
            L, _, _ = _window_l(
                ct, tables, source, 0, end, n, eot, block,
                use_pallas, interpret, grain,
            )
            return int(L[0]) == n
        L_o, _, _ = _window_l(
            ct, tables, source, 0, end, n, opt, block,
            use_pallas, interpret, grain,
        )
        if L_o[0] < 0:
            return False  # boundary-0 thread provably dead
        W *= 2
