"""ctypes loader for the native helper library (librejit_tpu_native.so).

Falls back gracefully (available() -> False) when the library has not been
built; all callers keep a pure-Python path.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_NAME = "librejit_tpu_native.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), _SO_NAME)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.rtn_select_matches.restype = ctypes.c_int64
        lib.rtn_select_matches.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # L, len n+1
            ctypes.POINTER(ctypes.c_int64),  # I
            ctypes.c_int64,                  # n (text length)
            ctypes.POINTER(ctypes.c_int64),  # out starts
            ctypes.POINTER(ctypes.c_int64),  # out ends
            ctypes.POINTER(ctypes.c_int64),  # out pids
            ctypes.c_int64,                  # out capacity
        ]
        lib.rtn_select_candidates.restype = ctypes.c_int64
        lib.rtn_select_candidates.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # pos
            ctypes.POINTER(ctypes.c_int32),  # end
            ctypes.POINTER(ctypes.c_int32),  # pid
            ctypes.c_int64,                  # k
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.rtn_line_of_offsets.restype = None
        lib.rtn_line_of_offsets.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rtn_dfa_longest.restype = ctypes.c_int64
        lib.rtn_dfa_longest.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # text
            ctypes.c_int64,                   # n
            ctypes.c_int64,                   # start pos
            ctypes.POINTER(ctypes.c_uint8),   # class_of[256]
            ctypes.POINTER(ctypes.c_int32),   # next[Q*C]
            ctypes.POINTER(ctypes.c_int16),   # accept[Q*C]
            ctypes.POINTER(ctypes.c_int16),   # accept_eot[Q]
            ctypes.c_int32,                   # n_classes
            ctypes.c_int32,                   # start state
            ctypes.c_int32,                   # dead state
            ctypes.POINTER(ctypes.c_int32),   # out pattern id
        ]
        try:
            lib.rtn_replace_splice.restype = ctypes.c_int64
            lib.rtn_replace_splice.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # text
                ctypes.c_int64,                   # n
                ctypes.POINTER(ctypes.c_int64),   # starts
                ctypes.POINTER(ctypes.c_int64),   # ends
                ctypes.c_int64,                   # k
                ctypes.POINTER(ctypes.c_uint8),   # rep
                ctypes.c_int64,                   # replen
                ctypes.POINTER(ctypes.c_uint8),   # out
            ]
        except AttributeError:
            # .so built before this symbol existed; python fallback used.
            pass
        try:
            lib.rtn_replace_splice_multi.restype = ctypes.c_int64
            lib.rtn_replace_splice_multi.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # text
                ctypes.c_int64,                   # n
                ctypes.POINTER(ctypes.c_int64),   # starts
                ctypes.POINTER(ctypes.c_int64),   # ends
                ctypes.POINTER(ctypes.c_int64),   # pids
                ctypes.c_int64,                   # k
                ctypes.POINTER(ctypes.c_uint8),   # reps (concat)
                ctypes.POINTER(ctypes.c_int64),   # rep_off
                ctypes.POINTER(ctypes.c_int64),   # rep_len
                ctypes.POINTER(ctypes.c_uint8),   # out
            ]
        except AttributeError:
            pass
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def select_matches(L: np.ndarray, I: np.ndarray) -> List[Tuple[int, int, int]]:
    """C++ greedy non-overlap selection (docs/SEMANTICS.md MatchAll)."""
    lib = _load()
    assert lib is not None
    Lc = np.ascontiguousarray(L, dtype=np.int64)
    Ic = np.ascontiguousarray(I, dtype=np.int64)
    n = len(Lc) - 1
    cap = int((Lc >= 0).sum())
    starts = np.empty(cap, dtype=np.int64)
    ends = np.empty(cap, dtype=np.int64)
    pids = np.empty(cap, dtype=np.int64)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    cnt = lib.rtn_select_matches(
        p(Lc, ctypes.c_int64), p(Ic, ctypes.c_int64), n,
        p(starts, ctypes.c_int64), p(ends, ctypes.c_int64),
        p(pids, ctypes.c_int64), cap,
    )
    return list(zip(starts[:cnt].tolist(), ends[:cnt].tolist(), pids[:cnt].tolist()))


def select_matches_arrays(
    L: np.ndarray, I: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Array-returning variant (no per-match Python objects)."""
    lib = _load()
    assert lib is not None
    Lc = np.ascontiguousarray(L, dtype=np.int64)
    Ic = np.ascontiguousarray(I, dtype=np.int64)
    n = len(Lc) - 1
    cap = int((Lc >= 0).sum())
    starts = np.empty(cap, dtype=np.int64)
    ends = np.empty(cap, dtype=np.int64)
    pids = np.empty(cap, dtype=np.int64)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    cnt = lib.rtn_select_matches(
        p(Lc, ctypes.c_int64), p(Ic, ctypes.c_int64), n,
        p(starts, ctypes.c_int64), p(ends, ctypes.c_int64),
        p(pids, ctypes.c_int64), cap,
    )
    return starts[:cnt], ends[:cnt], pids[:cnt]


def select_candidates(
    pos: np.ndarray, end: np.ndarray, pid: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """C++ greedy non-overlap selection over compacted candidates."""
    lib = _load()
    assert lib is not None
    posc = np.ascontiguousarray(pos, dtype=np.int32)
    endc = np.ascontiguousarray(end, dtype=np.int32)
    pidc = np.ascontiguousarray(pid, dtype=np.int32)
    k = len(posc)
    starts = np.empty(k, dtype=np.int64)
    ends = np.empty(k, dtype=np.int64)
    pids = np.empty(k, dtype=np.int64)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    cnt = lib.rtn_select_candidates(
        p(posc, ctypes.c_int32), p(endc, ctypes.c_int32),
        p(pidc, ctypes.c_int32), k,
        p(starts, ctypes.c_int64), p(ends, ctypes.c_int64),
        p(pids, ctypes.c_int64), k,
    )
    return starts[:cnt], ends[:cnt], pids[:cnt]


def line_of_offsets(
    text: np.ndarray, offsets: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(line_no, line_start, line_end) for each offset (offsets sorted)."""
    lib = _load()
    assert lib is not None
    t = np.ascontiguousarray(text, dtype=np.uint8)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    k = len(off)
    line_no = np.empty(k, dtype=np.int64)
    line_start = np.empty(k, dtype=np.int64)
    line_end = np.empty(k, dtype=np.int64)
    p = lambda a, ty: a.ctypes.data_as(ctypes.POINTER(ty))
    lib.rtn_line_of_offsets(
        p(t, ctypes.c_uint8), len(t), p(off, ctypes.c_int64), k,
        p(line_no, ctypes.c_int64), p(line_start, ctypes.c_int64),
        p(line_end, ctypes.c_int64),
    )
    return line_no, line_start, line_end


def dfa_longest(
    text: np.ndarray, s: int, tables, start_state: int
) -> Tuple[int, int]:
    """Scalar anchored longest-match from position s (C++). Returns (end, pid)
    or (-1, -1). Used for spot verification / fallback."""
    lib = _load()
    assert lib is not None
    t = np.ascontiguousarray(text, dtype=np.uint8)
    nxt = np.ascontiguousarray(tables.next, dtype=np.int32)
    acc = np.ascontiguousarray(tables.accept, dtype=np.int16)
    eot = np.ascontiguousarray(tables.accept_eot, dtype=np.int16)
    cls = np.ascontiguousarray(tables.class_of, dtype=np.uint8)
    pid = ctypes.c_int32(-1)
    p = lambda a, ty: a.ctypes.data_as(ctypes.POINTER(ty))
    end = lib.rtn_dfa_longest(
        p(t, ctypes.c_uint8), len(t), s,
        p(cls, ctypes.c_uint8), p(nxt, ctypes.c_int32),
        p(acc, ctypes.c_int16), p(eot, ctypes.c_int16),
        tables.n_classes, start_state, tables.dead, ctypes.byref(pid),
    )
    return int(end), int(pid.value)


def has_replace_splice() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "rtn_replace_splice")


def has_replace_splice_multi() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "rtn_replace_splice_multi")


def replace_splice_multi(
    text: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    pids: np.ndarray,
    reps,
) -> bytes:
    """C++ splice with a per-pattern replacement (reps[pid] per span)."""
    lib = _load()
    assert lib is not None
    t = np.ascontiguousarray(text, dtype=np.uint8)
    s = np.ascontiguousarray(starts, dtype=np.int64)
    e = np.ascontiguousarray(ends, dtype=np.int64)
    pid = np.ascontiguousarray(pids, dtype=np.int64)
    rep_len = np.array([len(r) for r in reps], dtype=np.int64)
    rep_off = np.concatenate([[0], np.cumsum(rep_len)[:-1]]).astype(np.int64)
    cat = b"".join(reps)
    reps_b = np.frombuffer(cat, dtype=np.uint8)
    if len(reps_b) == 0:
        reps_b = np.zeros(1, dtype=np.uint8)
    k = len(s)
    out_n = len(t) + int(np.sum(rep_len[pid])) - int(np.sum(e - s))
    out = np.empty(max(out_n, 1), dtype=np.uint8)
    p = lambda a, ty: a.ctypes.data_as(ctypes.POINTER(ty))
    wrote = lib.rtn_replace_splice_multi(
        p(t, ctypes.c_uint8), len(t), p(s, ctypes.c_int64),
        p(e, ctypes.c_int64), p(pid, ctypes.c_int64), k,
        p(reps_b, ctypes.c_uint8), p(rep_off, ctypes.c_int64),
        p(rep_len, ctypes.c_int64), p(out, ctypes.c_uint8),
    )
    assert wrote == out_n, (wrote, out_n)
    return out[:out_n].tobytes()


def replace_splice(
    text: np.ndarray, starts: np.ndarray, ends: np.ndarray, rep: bytes
) -> bytes:
    """C++ splice of `rep` over sorted non-overlapping [start, end) spans."""
    lib = _load()
    assert lib is not None
    t = np.ascontiguousarray(text, dtype=np.uint8)
    s = np.ascontiguousarray(starts, dtype=np.int64)
    e = np.ascontiguousarray(ends, dtype=np.int64)
    r = np.frombuffer(rep, dtype=np.uint8)
    if len(r) == 0:
        r = np.zeros(1, dtype=np.uint8)  # valid pointer; replen=len(rep)
    k = len(s)
    out_n = len(t) + k * len(rep) - int(np.sum(e - s))
    out = np.empty(max(out_n, 1), dtype=np.uint8)
    p = lambda a, ty: a.ctypes.data_as(ctypes.POINTER(ty))
    wrote = lib.rtn_replace_splice(
        p(t, ctypes.c_uint8), len(t), p(s, ctypes.c_int64),
        p(e, ctypes.c_int64), k, p(r, ctypes.c_uint8), len(rep),
        p(out, ctypes.c_uint8),
    )
    assert wrote == out_n, (wrote, out_n)
    return out[:out_n].tobytes()
