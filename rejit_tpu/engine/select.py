"""Match selection: (L, I) arrays -> MatchType results.

Implements the docs/SEMANTICS.md selection rules (non-overlapping,
leftmost-longest, empty-match advance). This is the "lightweight sequential
pass over the sparse match list" of SURVEY.md §7.2.5 — it walks matches, not
bytes: each iteration jumps to the next match end. A C++ fast path
(rejit_tpu/native) replaces the Python loop for match-dense workloads.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

Span = Tuple[int, int]


def _next_candidate(L: np.ndarray, pos: int) -> int:
    """Smallest s >= pos with L[s] >= 0, else -1. O(gap) via argmax on a
    boolean view (numpy scans in C)."""
    view = L[pos:] >= 0
    if not view.any():
        return -1
    return pos + int(view.argmax())


def match_all(L: np.ndarray, I: np.ndarray) -> List[Tuple[int, int, int]]:
    """All non-overlapping leftmost-longest matches as (start, end, pid)."""
    try:
        from ..native import lib as _native
    except Exception:  # pragma: no cover - native lib is optional
        _native = None
    if _native is not None and _native.available():
        return _native.select_matches(L, I)
    return _match_all_py(L, I)


def _match_all_py(L: np.ndarray, I: np.ndarray) -> List[Tuple[int, int, int]]:
    # Walk the sparse candidate list, not the text: O(#matches log #cands).
    cands = np.flatnonzero(L >= 0)
    out: List[Tuple[int, int, int]] = []
    pos = 0
    while True:
        idx = int(np.searchsorted(cands, pos))
        if idx >= len(cands):
            break
        s = int(cands[idx])
        e = int(L[s])
        out.append((s, e, int(I[s])))
        pos = e if e > s else s + 1
    return out


def match_all_candidates(
    pos: np.ndarray, end: np.ndarray, pid: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy non-overlap selection over compacted candidates (pos sorted
    ascending). Returns (starts, ends, pids) arrays."""
    try:
        from ..native import lib as _native
    except Exception:  # pragma: no cover
        _native = None
    fits_i32 = len(pos) == 0 or (
        int(np.max(end, initial=0)) < 2**31
        and int(np.max(pos, initial=0)) < 2**31
    )
    if (
        _native is not None
        and hasattr(_native, "select_candidates")
        and _native.available()
        and fits_i32  # the C helper takes int32 positions; streaming
        # corpora >2GB (engine/stream.py) must use the int64 Python path
    ):
        return _native.select_candidates(pos, end, pid)
    starts: List[int] = []
    ends: List[int] = []
    pids: List[int] = []
    cur = 0
    k = len(pos)
    i = 0
    while i < k:
        s = int(pos[i])
        e = int(end[i])
        starts.append(s)
        ends.append(e)
        pids.append(int(pid[i]))
        cur = e if e > s else s + 1
        i = int(np.searchsorted(pos, cur))
    return (
        np.asarray(starts, dtype=np.int64),
        np.asarray(ends, dtype=np.int64),
        np.asarray(pids, dtype=np.int64),
    )


def match_first(L: np.ndarray, I: np.ndarray) -> Optional[Tuple[int, int, int]]:
    s = _next_candidate(L, 0)
    if s < 0:
        return None
    return (s, int(L[s]), int(I[s]))


def match_anywhere(L: np.ndarray) -> bool:
    return bool((L >= 0).any())


def match_full(L: np.ndarray) -> bool:
    return bool(L[0] == len(L) - 1)


def match_all_count(L: np.ndarray, I: np.ndarray) -> int:
    return len(match_all(L, I))
