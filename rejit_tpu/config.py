"""Framework configuration (flags-system analog).

Capability parity with rejit's macro flag system (reference: rejit:src/flags.h
FLAG_* incl. fast-forward toggles and debug printing, unverified recall —
SURVEY.md §2.1/C8), redesigned as a single immutable dataclass with env-var
overrides and no global mutable state (SURVEY.md §5.6).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Optional


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() not in ("0", "false", "no", "")


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return default if v is None else int(v)


@dataclass(frozen=True)
class Config:
    # Engine selection: None = auto (analysis-driven); or one of
    # 'literal', 'classrun' (\b?[class]{lo,hi}\b? runs), 'classlit'
    # (\b?[class]{lo,hi}LIT\b? run + literal suffix), 'dfa', 'oracle'.
    engine: Optional[str] = None

    # ASCII case-insensitive matching: equivalent to prefixing every
    # pattern with '(?i)' (docs/SEMANTICS.md "Inline flags").
    ignore_case: bool = False

    # Text block size for the blocked DFA scan (bytes per block).
    block_size: int = 32

    # Fast-forward prefilter (rejit use_fast_forward / force_ff analogs).
    use_ff: bool = True
    force_ff: bool = False

    # Compiler limits.
    max_nfa_states: int = 20000
    max_dfa_states: int = 4096

    # Use the native C++ helpers when built ('auto'|'native'|'python').
    selection: str = "auto"

    # When subset construction exceeds the state budget on an auto-selected
    # engine, retry with a 4x budget and then fall back to the
    # NFA-simulation oracle (slow but correct — the reference's state-ring
    # behavior class: any supported pattern runs, SURVEY.md §2.1/C6).
    # 'on' (default) or 'off' (hard-fail with StateBlowupError).
    oracle_fallback: str = "on"

    # Device-speed engine for DFA-blowup patterns: the position-NFA
    # bit-set engine (compile/posnfa.py + engine/nfaset.py), tried BEFORE
    # the pure-Python oracle when subset construction blows up. Memory
    # and per-byte cost are linear in pattern size — the reference's
    # state-ring scaling class (SURVEY.md §2.1/C6). 'auto' (default) or
    # 'off' (skip straight to the oracle fallback). 'on' forces it as
    # the engine regardless of DFA viability (engine='posnfa' works too).
    posnfa: str = "auto"

    # Position budget for the posnfa engine (bit-set width = Q positions;
    # packed-word select chains cost ~Q*W per byte, so this caps per-byte
    # device work, not memory).
    max_pos_states: int = 224

    # Text block size for the posnfa engine (threads per block; must be a
    # multiple of 32 — thread occupancy is tracked in packed uint32s).
    # None = auto by packed-word count (the K knob trades the suffix
    # scan's per-byte cost ~Q^2*W*log(nb)/K against phase 3's ~10*Q*K/32;
    # measured sweep in bench/NOTES.md round 5).
    posnfa_block: Optional[int] = None

    # Single-call size cap for the posnfa engine: larger texts run the
    # exact chunked sweep at this chunk size (past ~2 MB the scan-carry
    # working set leaves VMEM and the single-call rate drops ~3x —
    # bench/NOTES.md round 5).
    posnfa_chunk_bytes: int = 2 << 20

    # Persist compiled DFA tables to ~/.cache/rejit_tpu (SURVEY.md §5.4).
    disk_cache: bool = False

    # In-memory MatchFirst/MatchAnywhere on DFA patterns route through the
    # early-exit doubling-window scan (engine/stream.py) above this size,
    # so work scales with the first-match distance, not the text length
    # (rejit MatchFirst semantics, SURVEY.md §3.3).
    first_window: int = 1 << 20

    # Above this many candidates, MatchAll selection runs on device
    # (pointer doubling, engine/select_device.py) so host transfer stays
    # O(#matches) instead of O(#candidates). Measured on v5e (round 2,
    # bench/results_r2_fast.json config4_spans_device): the doubling's
    # per-level gathers cost ~620 ns/candidate while host transfer +
    # native C++ greedy selection costs ~0.1-0.2 us/candidate including
    # the tunnel — the device path never wins at current gather speeds,
    # so it is opt-in (lower this threshold to re-enable).
    device_select_threshold: int = 1 << 31

    # Bitpacked spans-out program for FIXED-WIDTH overlap-free literal
    # sets (kernels/literal.literal_mask_packed_device +
    # engine/spans.extract_rows_bitmask): the candidate mask is packed
    # 32 starts/uint32 inside the match fusion and matches are peeled
    # with popcount bit tricks — measured 119 GB/s on-chip vs the fused
    # Pallas kernel's 2.9 (bench/NOTES.md round 4). Pure XLA, works on
    # every backend. 'auto' (= on), or 'off'.
    bitmask: str = "auto"

    # Fused Pallas kernels for the DFA byte-stepping phases:
    # 'auto' (on TPU backends), 'on', or 'off'.
    pallas: str = "auto"

    # MXU matmul formulation of the DFA sweep (engine/matmul.py): 'on',
    # 'off', or 'auto' (on for non-CPU backends when the tables are small
    # enough that one-hot algebra is profitable). Takes precedence over the
    # Pallas gather kernels when active.
    matmul: str = "off"

    # Gather-free select-chain DFA engine (engine/schain.py): 'auto' (on
    # for non-CPU backends when C*Q is small), 'on', or 'off'. Dynamic
    # gathers measured ~100x slower than compare/select chains on v5e.
    schain: str = "auto"

    # VMEM-fused select-chain kernel (kernels/schain_pallas.py): the
    # round-2 performance engine — the select-chain scan with carries
    # resident in VMEM across all K byte-steps. 'auto' (preferred on
    # non-CPU backends when the tables fit), 'on', or 'off'.
    schain_fused: str = "auto"

    # Block size (K) and lane-columns (CHL) for the fused kernel. None =
    # auto: K=128, CHL=128 (measured fastest on v5e, bench/NOTES.md) when
    # compiled; under interpret the generic block_size is used so CI
    # traces stay small.
    fused_block: Optional[int] = None
    fused_chl: Optional[int] = None

    # Rolled (fori_loop) form of the fused kernel's in-chunk doubling
    # scan: 'auto' (on above Q ~ the measured Mosaic compile knee), 'on',
    # or 'off'. The unrolled scan traces log2(CH)*Q^2 selects and stops
    # compiling in reasonable time at moderate Q (bench/NOTES.md
    # "large-Q"); the rolled form trades a small runtime overhead for a
    # ~5x smaller trace. Bit-equal (tests/kernels: test_rolled_scan_*;
    # on-chip: tools/verify_tpu.py --rolled).
    schain_rolled: str = "auto"

    # Run Pallas kernels in interpreter mode (debugging).
    interpret: bool = False

    # Debug prints: compile-time IR/NFA/DFA dumps (SURVEY.md §5.1).
    print_tree: bool = False
    print_tables: bool = False

    # Mesh axis name for data-parallel corpus sharding.
    mesh_axis: str = "data"

    @staticmethod
    def from_env(**overrides) -> "Config":
        base = Config(
            engine=os.environ.get("REJIT_TPU_ENGINE") or None,
            ignore_case=_env_bool("REJIT_TPU_IGNORE_CASE", False),
            block_size=_env_int("REJIT_TPU_BLOCK_SIZE", 32),
            use_ff=_env_bool("REJIT_TPU_USE_FF", True),
            force_ff=_env_bool("REJIT_TPU_FORCE_FF", False),
            max_nfa_states=_env_int("REJIT_TPU_MAX_NFA_STATES", 20000),
            max_dfa_states=_env_int("REJIT_TPU_MAX_DFA_STATES", 4096),
            selection=os.environ.get("REJIT_TPU_SELECTION", "auto"),
            oracle_fallback=os.environ.get("REJIT_TPU_ORACLE_FALLBACK", "on"),
            disk_cache=_env_bool("REJIT_TPU_DISK_CACHE", False),
            device_select_threshold=_env_int(
                "REJIT_TPU_DEVICE_SELECT_THRESHOLD", 1 << 31
            ),
            first_window=_env_int("REJIT_TPU_FIRST_WINDOW", 1 << 20),
            bitmask=os.environ.get("REJIT_TPU_BITMASK", "auto"),
            pallas=os.environ.get("REJIT_TPU_PALLAS", "auto"),
            matmul=os.environ.get("REJIT_TPU_MATMUL", "off"),
            schain=os.environ.get("REJIT_TPU_SCHAIN", "auto"),
            schain_fused=os.environ.get("REJIT_TPU_SCHAIN_FUSED", "auto"),
            schain_rolled=os.environ.get("REJIT_TPU_SCHAIN_ROLLED", "auto"),
            fused_block=(
                int(os.environ["REJIT_TPU_FUSED_BLOCK"])
                if "REJIT_TPU_FUSED_BLOCK" in os.environ else None
            ),
            fused_chl=(
                int(os.environ["REJIT_TPU_FUSED_CHL"])
                if "REJIT_TPU_FUSED_CHL" in os.environ else None
            ),
            interpret=_env_bool("REJIT_TPU_INTERPRET", False),
            print_tree=_env_bool("REJIT_TPU_PRINT_TREE", False),
            print_tables=_env_bool("REJIT_TPU_PRINT_TABLES", False),
            mesh_axis=os.environ.get("REJIT_TPU_MESH_AXIS", "data"),
        )
        return dataclasses.replace(base, **overrides)


DEFAULT = Config()
