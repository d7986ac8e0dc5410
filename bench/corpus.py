"""Deterministic benchmark/test corpus generator (SURVEY.md §4.3 fixtures).

Seeded English-like ASCII text with controllable planted-needle density.
Mirrors the role of rejit's benchmark corpus under tools/benchmarks/resources
(reference: rejit:tools/benchmarks, unverified recall — SURVEY.md §2.1/C11).
"""
from __future__ import annotations

import numpy as np

_WORDS = (
    b"the quick brown fox jumps over lazy dog packet stream regex engine "
    b"table state scan match vector lane byte block shard mesh chip host "
    b"text corpus filter kernel device memory fast slow alpha beta gamma "
    b"delta sigma result value branch merge window offset length count"
).split()


def make_corpus(
    size: int,
    seed: int = 0,
    needle: bytes = b"",
    density: float = 0.0,
) -> bytes:
    """~`size` bytes of space-separated words; `density` fraction of words
    replaced by `needle` (uniformly at random, seeded)."""
    rng = np.random.default_rng(seed)
    avg = sum(len(w) + 1 for w in _WORDS) / len(_WORDS)
    n_words = int(size / avg) + 1
    idx = rng.integers(0, len(_WORDS), size=n_words)
    words = [_WORDS[i] for i in idx]
    if needle and density > 0:
        plant = rng.random(n_words) < density
        for i in np.flatnonzero(plant):
            words[i] = needle
    out = b" ".join(words)
    if len(out) < size:
        out += b" " * (size - len(out))
    return out[:size]


def make_lines_corpus(size: int, seed: int = 0, line_len: int = 60) -> bytes:
    """Corpus with newlines every ~line_len bytes (for anchor benchmarks)."""
    text = bytearray(make_corpus(size, seed))
    for i in range(line_len, size, line_len):
        text[i] = 0x0A
    return bytes(text)
