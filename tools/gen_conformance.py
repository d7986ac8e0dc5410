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

# --- Round-2 expansion: SURVEY.md §4.2 pathological list, systematically --

# Literals: positions, overlaps, absence, binary bytes
add("a", b"a", "single char whole text")
add("a", b"bbb", "absent literal")
add("ab", b"ababab", "overlapped literal tiling")
add("aba", b"ababababa", "self-overlap aba")
add("the", BASE, "common word")
add("stream\n", BASE * 2, "literal with newline")
add(b"\x00\x01", b"\x00\x01\x02\x00\x01", "binary literal")
add("longneedlelongneedle", b"x" * 40 + b"longneedlelongneedle" + b"y" * 10,
    "long literal")
add("edge", b"edge" + b"." * 50, "literal at start")
add("edge", b"." * 50 + b"edge", "literal at end")

# Classes: ranges, negation incl. \n, escapes inside classes
add("[0-9]+", b"a1b22c333d", "digit runs")
add("[^0-9]+", b"a1b22c333d", "negated digit runs")
add("[^a\n]+", b"aa\nbb\ncc", "negated class excludes nl")
add(r"[\d]+", b"x12 007", "escape in class")
add(r"[a-fA-F0-9]+", b"DeadBeef 123 xyz", "hex class")
add(r"[-a-c]+", b"a-b-c-d", "literal dash in class")
add(r"[]a]+", b"]a]]aa", "bracket as first member")
add(r"[a^]+", b"a^b^^", "caret not first")
add(".", b"ab\ncd", "dot excludes newline")
add(r"\s+", b" a\t\tb \n c", "whitespace class")
add(r"\S+", b" a\t\tb \n c", "negated whitespace")
add(r"\W+", b"ab, cd!! ef", "nonword runs")

# Quantifiers at limits
add("a?", b"aab", "optional empty matches")
add("a+", b"baaab aa", "plus runs")
add("a{0,2}", b"aaaa", "bounded from zero")
add("a{2}", b"a aa aaa aaaa", "exact count")
add("a{3,}", b"aa aaa aaaaaa", "open lower bound")
add("a{1,1}", b"aaa", "degenerate bounds")
add("(ab){2,3}", b"ab abab ababab abababab", "group bounded repeat")
add("(a|b){2}", b"ab ba aa bb ac", "alt group repeat")
add("x{2,4}y", b"xy xxy xxxxy xxxxxy", "bounded repeat then literal")
add("a{10,12}", b"a" * 30, "long bounded run")
add("a{12}", b"a" * 11, "bound exceeds text")
add("(a*)*", b"aaab", "nested star")
add("(a+)+b", b"aaab aab b", "nested plus")

# Anchors and boundaries: ^ $ \b \B interplay with \n
add("^", b"ab\ncd", "bare bol")
add("$", b"ab\ncd", "bare eol")
add("^a", b"a\nba\nab", "bol literal")
add("a$", b"a\nba\nab", "eol literal")
add("^ab$", b"ab\nab\nabc", "full-line match")
add("^$", b"\n\n", "empty lines only")
add("^.*$", b"one\ntwo\n\nthree", "whole lines")
add(r"\bword\b", b"word sword words word.", "word boundary literal")
add(r"\b", b"ab cd", "bare word boundary")
add(r"\B", b"ab cd", "bare non-boundary")
add(r"\ba", b"a ba ab", "wb before")
add(r"a\b", b"a ba ab", "wb after")
add(r"^\s*$", b"  \n\t\n x \n", "blank lines")
add("a^b", b"a^b ab", "impossible caret mid-pattern")
add("a$b", b"a$b ab", "impossible dollar mid-pattern")
add("^a|b$", b"ab\nba", "anchored alternation")
add(r"ing\b", b"singing ringing ingot", "suffix with wb")
add(r"\n", b"a\nb\n", "escaped newline")

# Escapes and metachars
add(r"\x41+", b"AAAB", "hex escape")
add(r"\.", b"a.b.c", "escaped dot")
add(r"\*", b"a*b", "escaped star")
add(r"\\", b"a\\b", "escaped backslash")
add(r"a\tb", b"a\tb a b", "tab escape")
add(r"\{2\}", b"x{2} y", "escaped braces")
add("a{,3}", b"a{,3} aaa", "malformed brace literal")
add("{abc}", b"x{abc}y", "bare braces literal")

# Alternation structure
add("abc|abd|abe", b"abc abd abe abf", "shared-prefix alts")
add("cat|category", b"category cat", "prefix alt longest")
add("a||b", b"ab", "empty alternative")
add("(foo|bar)+", b"foobarfoo bar foo", "repeated alt group")
add("x(a|ab)y", b"xay xaby", "alt inside context")

# Multi-pattern: ties, priority, overlap, many patterns
add([r"a+", r"a"], b"aaa b a", "multi same start tie")
add([r"ab", r"b"], b"abab", "multi overlapping starts")
add([r"\d+", r"\w+"], b"abc 123 a1b2", "multi class overlap")
add([r"if|else|while", r"[a-z_]\w*", r"\d+", r"\s+", r"[^\w\s]+"],
    b"if x1 > 99 while else_ y\n", "keyword tokenizer")
add([str(i) for i in range(10)], b"9081726354", "ten patterns")
add([r"aa", r"aaa"], b"aaaaaa", "tie lowest id wins")

# Empty matches at block/shard edges (block sizes 8/16/32 in CI)
em = bytearray(b"b" * 40)
for off in (7, 8, 15, 16, 31, 32):
    em[off:off + 1] = b"a"
add("a*", bytes(em), "empty matches at block edges")
add("b*", bytes(em), "runs broken at block edges")

# Matches straddling every CI block size (8/16/32) and the sharded split
for blk in (8, 16, 32, 64):
    s = bytearray(b"." * (4 * blk))
    s[blk - 3:blk + 3] = b"needle"[:6]
    add("needle", bytes(s), f"straddle block {blk}")
wide = b"z" * 7 + b"a" * 113 + b"z" * 8
add("a+", wide, "single run spans shards")
add(r"\ba+\b", wide, "wb run spans shards")

# Long-range dependence: unbounded quantifier across many blocks
add("a.*z", b"a" + b"m" * 257 + b"z", "dotstar long bridge")
add("a[^\n]*z", b"a" + b"m" * 100 + b"\n" + b"m" * 50 + b"az", "bridge cut by nl")
add("(ab)*", b"ab" * 130 + b"a", "long even tiling")

# EOT acceptance
add("a+$", b"baaa", "accept at eot")
add(r"x\b", b"zx", "wb at eot")
add("a*", b"", "nullable on empty text")
add("^$", b"", "anchors on empty text")
add("$", b"", "bare eol empty text")

# Round-2 machinery: large-Q patterns (parametric packed-bit split) and
# silent-chunk textures (the fused kernel's fast-forward skip branch).
add(r"(abcdefgh|ijklmnop|qrstuvwx)\d{2}",
    b"..abcdefgh12..ijklmnop34..qrstuvwx5x..abcdefgh99",
    "large-Q alternation (Q>16)")
add(r"(abcdefgh|ijklmnop|qrstuvwx)\d{2}", b"." * 300,
    "large-Q all-silent text")
add(r"\b\w+ing\b", b"." * 200 + b"singing" + b"." * 200,
    "silent chunks around one island")
add(r"\b\w+ing\b", b"." * 249 + b"singing" + b" " * 250,
    "match accepting byte at silent-region start")
add(r"[a-z]+", b"0123456789" * 40, "digits only: all silent for [a-z]+")
add(r"\w+", b" . , ; " * 60 + b"word" + b" . , ; " * 60,
    "sparse word in punctuation")

# Bounded-quantifier state blowup: Q above the fused auto-gate (the XLA
# select-chain engine is the production path there; the fused kernel's
# rolled form covers it under schain_fused='on' — kernels/schain_pallas).
add(r"\b[a-z]{8,16}\b",
    b"zz abcdefghij k abcdefghijklmnop " * 3 + b"tiny word hugewordhere",
    "Q=18 bounded quantifier")
add(r"\b[a-z]{24,48}\b",
    b"x " + b"a" * 30 + b" " + b"b" * 24 + b"." + b"c" * 23 + b" "
    + b"d" * 48 + b" " + b"e" * 49,
    "Q=50 bounded quantifier at limits")
add(r"[A-Za-z]{30,60}ing",
    b"." * 40 + b"A" * 35 + b"ing." + b"b" * 29 + b"ing " + b"C" * 57
    + b"ing",
    "Q=152 beyond fused MAX_Q (XLA engine only)")

# Round-3 additions: DFA-blowup fallback patterns (the oracle fallback
# must return identical spans through the public API — api._blowup
# _fallback) and bounded quantifiers at the raised rolled-kernel bounds
# (Q up to MAX_Q_ROLLED = 256; auto engine rolled-fused on TPU, XLA
# select-chain on CPU CI — all paths must agree with the oracle).
add(r"(a|b)*a(a|b){9}",
    b"abbaabbabababbaaab mbba bbbbbbbbbbab aaaaaaaaaaaa",
    "DFA blowup: oracle fallback (Q ~ 2^10)")
add(r"\b[a-z]{62,124}\b",
    b"x " + b"q" * 80 + b" " + b"r" * 61 + b" " + b"s" * 124 + b"."
    + b"t" * 125,
    "Q=126 bounded quantifier (rolled auto range)")
add(r"\b[a-z]{66,132}\b",
    b"m" * 132 + b" " + b"n" * 65 + b" " + b"o" * 100,
    "Q=134 above the old 128 cap")

# Round-4 additions: ASCII case-insensitive matching — the '(?i)' prefix
# flag (docs/SEMANTICS.md "Inline flags"); negated classes fold the
# positive set BEFORE negation.
add("(?i)packet", b"A Packet PACKET pAcKeT packet!", "(?i) literal")
add("(?i)foo|bar", b"FOO Bar bAz fOo", "(?i) alt literals")
add("(?i)[a-f]+", b"AbC dEf GHI xyz abf", "(?i) class run")
add(r"(?i)\bING\b", b"ing ING InG kings", "(?i) wb literal")
add("(?i)[^a-y]+", b"aBcZz!Qq", "(?i) negated class folds pre-negation")
add("(?i)x{2,4}", b"xX XXX xxxxx XxXxXx", "(?i) bounded repeat")
add([r"(?i)if|else", r"(?i)[a-z]+", r"\d+", r"\s+"],
    b"IF x1 Else 99 WHILE", "(?i) tokenizer mix")
add(r"(?i)\x41+", b"aAbBAa", "(?i) folds escaped letter bytes")

# Binary-safe scanning: NUL and high bytes are ordinary input bytes.
add(r"\w+", b"ab\x00cd\x00\x00ef", "NUL bytes split words")
add("a", b"\x00a\x00a\x00", "literal among NULs")
add(r"[^\x00]+", b"\x00ab\x00\xffzz\x00", "negated-NUL class, high bytes")
add(r"\xff+", b"a\xff\xff\xffb\xff", "high-byte escape run")

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "conformance",
    "corpus.json",
)
with open(out, "w") as f:
    json.dump(CASES, f, indent=1)
print(f"wrote {len(CASES)} cases to {out}")
