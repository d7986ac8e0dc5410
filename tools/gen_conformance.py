#!/usr/bin/env python
"""Generate the frozen conformance corpus (tests/conformance/corpus.json).

Covers the BASELINE.json:6-12 config families plus boundary/pathological
cases (SURVEY.md §4.2 "Conformance corpus"). Expected spans come from the
oracle (the executable spec, docs/SEMANTICS.md); the file is frozen in git so
engine regressions diff loudly.
"""
import base64
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rejit_tpu import oracle  # noqa: E402

CASES = []


def add(patterns, text, note=""):
    if isinstance(patterns, (str, bytes)):
        patterns = [patterns]
    pats = [p.encode() if isinstance(p, str) else p for p in patterns]
    orc = oracle.OraclePattern(pats)
    CASES.append(
        {
            "patterns": [p.decode("latin-1") for p in pats],
            "text_b64": base64.b64encode(text).decode(),
            "note": note,
            "match_all_ids": orc.match_all_ids(text),
            "match_first": orc.match_first(text),
            "match_full": orc.match_full(text),
            "match_anywhere": orc.match_anywhere(text),
        }
    )


BASE = b"the quick brown fox jumps over the lazy dog packet stream\n"

# Config 1: literals
add("packet", BASE * 3, "literal")
add("packet", b"packetpacket packet", "adjacent literals")
add("aa", b"aaaaaaa", "self-overlapping literal")
add("dog", b"", "empty text")
add("fox", b"fo", "truncated")

# Config 2: classes + alternations
add("[a-z]+", BASE, "class run")
add("foo|bar|baz", b"a foo of bar near bazbar bazfoo", "alt literals")
add("ba[rz]", b"bar baz bat", "alt class")
add("[^aeiou ]+", BASE, "negated class")

# Config 3: quantifiers/anchors/word boundaries
add(r"\b\w+ing\b", b"singing or winging it, kingly king ing", "wb quantifier")
add(r"^\w+", b"first line\nsecond line\n\nfourth", "line anchor start")
add(r"\w+$", b"first line\nsecond line\n\nfourth", "line anchor end")
add(r"^$", b"a\n\nb\n", "empty line")
add(r"x{2,4}", b"x xx xxx xxxx xxxxx xxxxxx", "bounded repeat")
add(r"a.*b", b"a123b zzz a\nb ab", "unbounded dot star")
add(r"(ab)+c?", b"ababab ababc abc", "group repeat")

# Config 4: tokenizer multi-pattern
add([r"\w+", r"\s+", r"[^\w\s]+"], b"hi, there! 2 go\nnow", "tokenizer")
add([r"\d+\.\d+", r"\d+", r"[a-z]+"], b"pi=3.14 and e=2 xs", "tok priority")
add([r"ab|xy", r"ab"], b"ab xy abxy", "tie lowest id")

# Boundary-window cases: matches exactly on 8/64/256-block edges
edge = bytearray(b"." * 600)
for off in (6, 62, 63, 64, 255, 256, 257, 511):
    edge[off : off + 6] = b"needle"
add("needle", bytes(edge), "block-edge straddles")
runtext = b"A" + b"z" * 300 + b"B" + b"z" * 10
add("[a-z]+", runtext, "run across many blocks")

# Pathological
add("a*", b"baac", "empty matches")
add("", b"ab", "empty pattern")
add(".*", b"ab\ncd\n", "dotstar lines")
add(r"\d{3,}", b"12 123 1234567890", "open repeat")
add("[^a]*", b"aaa", "nullable negated")
add(r"\B.\B", b"abcd efg", "non-boundary")
add("a|ab|abc", b"abc ab a", "longest alternative")

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "conformance",
    "corpus.json",
)
with open(out, "w") as f:
    json.dump(CASES, f, indent=1)
print(f"wrote {len(CASES)} cases to {out}")
