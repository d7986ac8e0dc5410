#!/usr/bin/env python
"""API demo (parity with rejit:sample/basic.cc, SURVEY.md §2.1/C12)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even where a sitecustomize force-prepends
# a TPU plugin (it merges rather than replaces the platform list).
import jax
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import rejit_tpu
from rejit_tpu import Pattern

text = "the quick brown fox jumps over the lazy dog"

# One-shot free functions.
print(rejit_tpu.match_anywhere("qu.ck", text))        # True
print(rejit_tpu.match_first(r"\b\w{5}\b", text))      # (4, 9)
print(rejit_tpu.match_all("o", text))                 # every 'o'
print(rejit_tpu.match_all_count(r"\w+", text))        # 9 words
print(rejit_tpu.replace("lazy", text, "energetic"))

# Reusable compiled pattern (Regej equivalent).
p = Pattern(r"[a-z]+")
for s, e in p.match_all(text)[:3]:
    print(text[s:e])

# Tokenizer mode: ordered pattern list, ids in results.
tok = Pattern([r"\w+", r"\s+", r"[^\w\s]+"])
print(tok.tokenize("hi, there!")[:5])

# Case-insensitive matching: '(?i)' prefix or Config(ignore_case=True).
print(rejit_tpu.match_all("(?i)FOX", text))            # [(16, 19)]
print(Pattern("THE", rejit_tpu.Config(ignore_case=True)).match_all_count(text))

# Split (python re.split semantics, byte pieces).
print(rejit_tpu.split(r"\s+", "a b  c"))               # [b'a', b'b', b'c']
