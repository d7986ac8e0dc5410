"""Native (C++) runtime helpers.

The reference is ~20k LoC of C++ (SURVEY.md §2.1); our compute path is
JAX/XLA/Pallas on TPU, and the host-side hot paths that remain CPU-bound
(match selection over candidate arrays, corpus IO, scalar DFA verification)
are implemented in C++ here, loaded via ctypes with pure-Python fallbacks.

Build with:  python -m rejit_tpu.native.build
"""
