"""Public API: compiled patterns + one-shot match functions.

Capability parity with rejit's public surface (reference: rejit:include/rejit.h
— free functions MatchFull/MatchAnywhere/MatchFirst/MatchAll/MatchAllCount,
Replace/ReplaceFirst/ReplaceAll, reusable `Regej` class; unverified recall —
SURVEY.md §2.1/C1). `Pattern` is the Regej equivalent: compile once (AOT table
build + device placement), match many. One-shot free functions use an LRU
compile cache (SURVEY.md §5.4).

Matches are half-open byte spans (start, end); see docs/SEMANTICS.md.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .compile import analysis, parser
from .compile import ir as ir_mod
from .compile.dfa import compile_patterns
from .errors import CompileError, StateBlowupError
from .config import Config, DEFAULT
from .engine import pipeline, select, select_device, spans
from .kernels import classrun as classrun_kernel
from .kernels import literal as literal_kernel
from .utils.stats import MatchStats, Timer

Span = Tuple[int, int]
TextLike = Union[str, bytes, bytearray, np.ndarray]
PatternLike = Union[str, bytes]


def text_to_u8(text: TextLike) -> np.ndarray:
    if isinstance(text, DeviceCorpus):
        return text.host
    if isinstance(text, str):
        text = text.encode("utf-8")
    if isinstance(text, (bytes, bytearray)):
        return np.frombuffer(bytes(text), dtype=np.uint8)
    arr = np.asarray(text)
    if arr.dtype != np.uint8 or arr.ndim != 1:
        raise TypeError(
            f"text must be str/bytes or a 1-D uint8 array, got "
            f"{arr.dtype} array of rank {arr.ndim}"
        )
    return arr


class DeviceCorpus:
    """A corpus staged on device for repeated scanning (BASELINE protocol:
    device-resident corpus, staged once, scanned by many patterns/calls).

    Pass it anywhere a text is accepted; the fused DFA engine then skips
    the host->device copy and the tiling transpose on every call. Staged
    forms are cached per (pattern, kernel geometry); the raw bytes stay
    available for host paths.
    """

    def __init__(self, text: TextLike):
        self.host = text_to_u8(text)
        self.n = len(self.host)
        self._padded = {}     # (grain, P) -> device uint8
        self._tiles = {}      # (K, CHL) -> corpus-size tile array
        self._meta = {}       # (static tables, K, CHL) -> (sk0, start_eot)

    def _padded_dev(self, grain: int, beyond_n: bool = False):
        blocks = max(1, -(-self.n // grain))
        if beyond_n and blocks * grain <= self.n:
            blocks += 1  # window-ladder EOT needs padding strictly past n
        P = _bucket_blocks(blocks) * grain
        key = (grain, P)
        if key not in self._padded:
            import jax

            pad = np.zeros(P, dtype=np.uint8)
            pad[:self.n] = self.host
            self._padded[key] = jax.device_put(jnp.asarray(pad))
        return self._padded[key], P

    def padded_ext(self, min_tail: int, grain: int = 1024):
        """Device uint8 padded to a bucketed multiple of `grain` with at
        least `min_tail` zero bytes past n — the literal engine's staged
        form (kernels/literal.py callers pass P = len - min_tail)."""
        blocks = max(1, -(-(self.n + min_tail) // grain))
        P = _bucket_blocks(blocks) * grain
        key = (grain, P)
        if key not in self._padded:
            import jax

            pad = np.zeros(P, dtype=np.uint8)
            pad[: self.n] = self.host
            self._padded[key] = jax.device_put(jnp.asarray(pad))
        return self._padded[key], P

    def staged_for(self, pattern: "Pattern", K: int, CHL: int,
                   beyond_n: bool = False):
        """(tiles, sk0, start_eot, P) with the corpus-size tile array
        shared across patterns; only the tiny start-state meta is
        per-pattern (keyed by the static TABLES — the same source under
        different Config limits can compile different tables)."""
        from .kernels import schain_pallas

        td, P = self._padded_dev(K * 8 * CHL, beyond_n=beyond_n)
        tk = (K, CHL, P)
        if tk not in self._tiles:
            self._tiles[tk] = schain_pallas.tile_text_device(
                td, block=K, chl=CHL
            )
        st = pattern._schain_static
        mk = (st, K, CHL, P)
        if mk not in self._meta:
            self._meta[mk] = schain_pallas.stage_meta_device(
                st, td, block=K, chl=CHL
            )
        sk0_t, start_eot = self._meta[mk]
        return (self._tiles[tk], sk0_t, start_eot, P)


def stage(text: TextLike) -> DeviceCorpus:
    """Stage a corpus on device for repeated scanning."""
    return DeviceCorpus(text)


def _unwrap(text):
    """(host uint8 array, DeviceCorpus | None)."""
    if isinstance(text, DeviceCorpus):
        return text.host, text
    return text_to_u8(text), None


def _bucket_blocks(nb: int) -> int:
    """Smallest 2^k or 3*2^(k-1) >= nb (bounds jit recompiles, <=33% slack)."""
    if nb <= 1:
        return 1
    k = 1
    while True:
        if nb <= (3 << (k - 1)):
            if nb <= (1 << k):
                return 1 << k
            return 3 << (k - 1)
        k += 1


class Pattern:
    """A compiled, reusable pattern (rejit `Regej` equivalent).

    `patterns` may be a single pattern or an ordered list (tokenizer mode,
    docs/SEMANTICS.md "Multi-pattern"); match results then carry pattern ids
    through `tokenize`.
    """

    def __init__(
        self,
        patterns: Union[PatternLike, Sequence[PatternLike]],
        config: Config = DEFAULT,
    ):
        if isinstance(patterns, (str, bytes)):
            patterns = [patterns]
        self.config = config
        self.source = tuple(
            p.encode("utf-8") if isinstance(p, str) else bytes(p)
            for p in patterns
        )
        if config.ignore_case:
            # Normalize to the '(?i)' prefix form so every downstream path
            # (oracle fallback, streaming, compile caches keyed on source)
            # sees the case-folded pattern.
            self.source = tuple(
                p if p.startswith(b"(?i)") else b"(?i)" + p
                for p in self.source
            )
        self.irs = [parser.parse(p) for p in self.source]
        if config.print_tree:
            for p, node in zip(self.source, self.irs):
                print(f"--- {p!r}\n{ir_mod.format_tree(node)}")
        self.info = analysis.analyze(self.irs)
        self.engine = self._select_engine()
        self.tables = None
        self.ct = None
        self._schain_static = None
        self._classrun = None
        self._classlit = None
        self._chl_fallback = None  # set to 128 after a fused VMEM OOM
        self._oracle = None
        self._posnfa = None
        self.last_stats: MatchStats = MatchStats()
        if self.engine == "classrun":
            bitmap, lo, hi, lead_wb, trail_wb = classrun_kernel.detect(
                self.irs[0]
            )
            self._classrun = (
                jnp.asarray(classrun_kernel.member_lut(bitmap)),
                jnp.asarray(classrun_kernel.member_lut(ir_mod.WORD)),
                lo,
                hi,
                lead_wb,
                trail_wb,
            )
            self._class_runs = classrun_kernel.bitmap_runs(bitmap)
            self._word_runs = classrun_kernel.bitmap_runs(ir_mod.WORD)
        if self.engine == "classlit":
            from .kernels import classlit as classlit_kernel

            (bitmap, lo, hi, sfx, lead_wb, trail_wb) = (
                classlit_kernel.detect(self.irs[0])
            )
            self._classlit = (
                jnp.asarray(classrun_kernel.member_lut(bitmap)),
                jnp.asarray(classrun_kernel.member_lut(ir_mod.WORD)),
                lo,
                hi,
                sfx,
                lead_wb,
                trail_wb,
            )
            self._class_runs = classrun_kernel.bitmap_runs(bitmap)
            self._word_runs = classrun_kernel.bitmap_runs(ir_mod.WORD)
        if self.engine == "posnfa":
            from .compile.posnfa import compile_posnfa

            self._posnfa = compile_posnfa(
                self.irs,
                max_nfa_states=config.max_nfa_states,
                max_positions=config.max_pos_states,
            )
        if self.engine == "dfa":
            try:
                self.tables = self._compile_tables_cached()
            except StateBlowupError as err:
                self.tables = self._blowup_fallback(err)
            if self.tables is not None:
                if config.print_tables:
                    from .compile import debug

                    print(debug.format_tables(self.tables))
                self.ct = pipeline.device_tables(self.tables)
        if self.engine == "oracle" and self._oracle is None:
            from .oracle import OraclePattern

            self._oracle = OraclePattern(list(self.source))

    def _blowup_fallback(self, err: StateBlowupError):
        """A supported pattern must never hard-fail (the reference's
        state-ring runs any supported pattern in memory linear in pattern
        size — SURVEY.md §2.1/C6). On a state-budget blowup under auto
        engine selection: retry subset construction once with a 4x budget;
        if that blows up too, switch this Pattern to the NFA-simulation
        oracle with a logged warning. Forced engines and
        Config(oracle_fallback='off') keep the hard error."""
        cfg = self.config
        if cfg.engine is not None or cfg.oracle_fallback == "off":
            raise err
        try:
            return compile_patterns(
                self.irs,
                max_nfa_states=cfg.max_nfa_states * 4,
                max_dfa_states=cfg.max_dfa_states * 4,
            )
        except StateBlowupError:
            pass
        if cfg.posnfa != "off":
            # Device-speed escape hatch: the position-NFA bit-set engine
            # runs any supported pattern in per-byte work linear in
            # pattern size — the reference state-ring's scaling class
            # (SURVEY.md §2.1/C6) — so DFA blowups stay on device.
            from .compile.posnfa import compile_posnfa

            try:
                self._posnfa = compile_posnfa(
                    self.irs,
                    max_nfa_states=cfg.max_nfa_states * 4,
                    max_positions=cfg.max_pos_states,
                )
            except StateBlowupError:
                pass
            else:
                import warnings

                warnings.warn(
                    f"DFA construction exceeded {cfg.max_dfa_states * 4} "
                    f"states for "
                    f"{[p.decode('latin-1') for p in self.source]}; using "
                    "the position-NFA bit-set engine (device-speed, "
                    "per-byte cost linear in pattern size).",
                    RuntimeWarning,
                    stacklevel=3,
                )
                self.engine = "posnfa"
                return None
        from .oracle import OraclePattern

        try:
            self._oracle = OraclePattern(
                list(self.source), max_states=cfg.max_nfa_states * 4
            )
        except StateBlowupError:
            raise err  # NFA itself is over budget: genuinely too large
        import warnings

        warnings.warn(
            f"DFA construction exceeded {cfg.max_dfa_states * 4} states for "
            f"{[p.decode('latin-1') for p in self.source]}; falling back to "
            "the NFA-simulation oracle engine (correct but slow). Raise "
            "Config(max_dfa_states=...) for a table-driven engine.",
            RuntimeWarning,
            stacklevel=3,
        )
        self.engine = "oracle"
        return None

    def _compile_tables_cached(self):
        """Compile DFA tables, consulting the disk cache when enabled."""
        config = self.config
        tables = None
        if config.disk_cache:
            from .engine import cache as diskcache

            tables = diskcache.load_cached(
                self.source, config.max_nfa_states, config.max_dfa_states
            )
        if tables is None:
            tables = compile_patterns(
                self.irs,
                max_nfa_states=config.max_nfa_states,
                max_dfa_states=config.max_dfa_states,
            )
            if config.disk_cache:
                from .engine import cache as diskcache

                diskcache.store_cached(
                    self.source,
                    config.max_nfa_states,
                    config.max_dfa_states,
                    tables,
                )
        return tables

    def _select_engine(self) -> str:
        cfg = self.config
        if cfg.engine is not None:
            eng = cfg.engine
            if eng not in ("literal", "classrun", "classlit", "dfa",
                           "oracle", "posnfa"):
                raise CompileError(f"unknown engine {eng!r}")
            if eng == "literal" and not self.info.literals:
                raise CompileError(
                    "pattern is not a literal alternation; cannot force "
                    "the literal engine"
                )
            if eng == "classrun" and not (
                len(self.irs) == 1 and classrun_kernel.detect(self.irs[0])
            ):
                raise CompileError(
                    "pattern is not a (\\b-wrapped) char-class repetition; "
                    "cannot force the classrun engine"
                )
            if eng == "classlit":
                from .kernels import classlit as classlit_kernel

                if not (
                    len(self.irs) == 1
                    and classlit_kernel.detect(self.irs[0])
                ):
                    raise CompileError(
                        "pattern is not a (\\b-wrapped) char-class "
                        "repetition + literal suffix; cannot force the "
                        "classlit engine"
                    )
            return eng
        if cfg.posnfa == "on":
            return "posnfa"
        if self.info.literals:
            return "literal"
        if len(self.irs) == 1:
            cr = classrun_kernel.detect(self.irs[0])
            if cr:
                import jax

                _, _, hi, _, _ = cr
                if jax.default_backend() in ("cpu",):
                    return "classrun"
                if self.config.schain_fused == "off":
                    return "classrun"
                if self.config.schain_fused == "on":
                    return "dfa"  # explicit fused-DFA opt-in
                # On accelerators the fused select-chain DFA beats the
                # classrun formulation at small Q (48 vs 2.8 GB/s on
                # [a-z]+) but its rolled form falls ~Q^1.5 while classrun
                # is Q-independent: measured crossover near Q~50 (rolled
                # 2.9 GB/s at Q=50, 0.71 at Q=126; classrun measured
                # 2.78 GB/s at the Q=126-equivalent pattern —
                # bench/NOTES.md "large-Q knee"). Bounded runs have
                # Q ~ hi+2, so route hi >= 46 to classrun; unbounded
                # runs stay on the DFA.
                if hi is not None and hi + 2 >= 48:
                    return "classrun"
                return "dfa"
            from .kernels import classlit as classlit_kernel

            cl = classlit_kernel.detect(self.irs[0])
            if cl:
                import jax

                _, lo, hi, sfx, _, _ = cl
                if (
                    jax.default_backend() not in ("cpu",)
                    and self.config.schain_fused == "on"
                ):
                    return "dfa"  # explicit fused-DFA opt-in
                # Same crossover logic as classrun: the run+suffix DFA
                # has Q >~ hi + |S| (measured: [A-Za-z]{30,60}ing ->
                # Q=152, ~0.6 GB/s rolled), while the classlit
                # formulation is Q-independent. Below the knee the fused
                # DFA wins.
                q_est = (hi if hi is not None else lo) + len(sfx) + 2
                if q_est >= 48:
                    return "classlit"
                if jax.default_backend() in ("cpu",):
                    return "classlit"
                return "dfa"
        return "dfa"

    # -- internals ----------------------------------------------------------

    def _scan_kernel_mode(self, n: int):
        """(pallas_scan, interpret, padded_len) for the elementwise
        engines. The one-pass Pallas scan kernel (kernels/scan1d.py,
        14x the lax cummin/cummax lowering) runs on accelerators unless
        Config.pallas == 'off'; it needs the padded length to be a
        multiple of scan1d.STEP."""
        import jax

        from .kernels import scan1d

        cfg = self.config
        ps = cfg.pallas != "off" and (
            cfg.interpret or jax.default_backend() not in ("cpu",)
        )
        if ps:
            blocks = -(-max(1, n) // scan1d.STEP)
            return ps, cfg.interpret, _bucket_blocks(blocks) * scan1d.STEP
        return False, False, _bucket_blocks(max(1, -(-n // 1024))) * 1024

    def _l_i_device(self, text: np.ndarray, corpus=None):
        """Compute (L, I) device arrays (length P+1, -1 past n) for `text`."""
        n = len(text)
        if self.engine in ("classrun", "classlit"):
            ps, interp, P = self._scan_kernel_mode(n)
            pad = np.zeros(P, dtype=np.uint8)
            pad[:n] = text
            if self.engine == "classrun":
                lut, wlut, lo, hi, lead_wb, trail_wb = self._classrun
                return classrun_kernel.classrun_l_arrays_device(
                    lut,
                    wlut,
                    jnp.asarray(pad),
                    jnp.int32(n),
                    lo=lo,
                    has_hi=hi is not None,
                    hi=hi if hi is not None else 0,
                    lead_wb=lead_wb,
                    trail_wb=trail_wb,
                    pallas_scan=ps,
                    interpret=interp,
                    class_runs=self._class_runs,
                    word_runs=self._word_runs,
                )
            from .kernels import classlit as classlit_kernel

            lut, wlut, lo, hi, sfx, lead_wb, trail_wb = self._classlit
            return classlit_kernel.classlit_l_arrays_device(
                lut,
                wlut,
                jnp.asarray(pad),
                jnp.int32(n),
                lo=lo,
                has_hi=hi is not None,
                hi=hi if hi is not None else 0,
                sfx=sfx,
                lead_wb=lead_wb,
                trail_wb=trail_wb,
                pallas_scan=ps,
                interpret=interp,
                class_runs=self._class_runs,
                word_runs=self._word_runs,
            )
        if self.engine == "posnfa":
            from .engine import nfaset

            K = self.config.posnfa_block or (
                64 if self._posnfa.W == 1 else 128
            )
            P = _bucket_blocks(max(1, -(-n // K))) * K
            pad = np.zeros(P, dtype=np.uint8)
            pad[:n] = text
            return nfaset.l_arrays_device_nfaset(
                self._posnfa, jnp.asarray(pad), jnp.int32(n), block=K
            )
        if self.engine == "literal":
            max_m = max(len(l) for l in self.info.literals)
            P = _bucket_blocks(max(1, -(-n // 1024))) * 1024
            ext = literal_kernel.extend_pad(text, P, max_m)
            return literal_kernel.literal_l_arrays_device(
                jnp.asarray(ext),
                jnp.int32(n),
                lits=self.info.literals,
                pids=self.info.literal_pids,
                P=P,
            )
        block = self.config.block_size
        if self._use_schain_fused():
            from .kernels import schain_pallas

            out = self._fused_run(
                text, corpus,
                lambda staged, n_, fblock, fchl:
                schain_pallas.l_arrays_device_staged(
                    self._schain_static,
                    self.tables.n_patterns,
                    staged,
                    jnp.int32(n_),
                    block=fblock,
                    chl=fchl,
                    interpret=self.config.interpret,
                    use_ff=self.config.use_ff,
                    rolled=self._fused_rolled(),
                ),
            )
            if out is not None:
                return out
            # One kernel call can't hold these packed positions (text
            # beyond max_p for this Q): fall through to the XLA
            # select-chain engine, which has no packed limit; truly huge
            # corpora use the streaming API (match_all_stream).
        if self._use_schain():
            from .engine import schain as schain_engine

            if self._schain_static is None:
                self._schain_static = schain_engine.static_tables(self.tables)
            P = _bucket_blocks(max(1, -(-n // block))) * block
            pad = np.zeros(P, dtype=np.uint8)
            pad[:n] = text
            return schain_engine.l_arrays_device_schain(
                self._schain_static, jnp.asarray(pad), jnp.int32(n),
                block=block,
            )
        if self._use_matmul():
            from .engine import matmul as matmul_engine

            P = _bucket_blocks(max(1, -(-n // block))) * block
            pad = np.zeros(P, dtype=np.uint8)
            pad[:n] = text
            return matmul_engine.l_arrays_device_matmul(
                self.ct, jnp.asarray(pad), jnp.int32(n), block=block
            )
        use_pallas = self._use_pallas()
        if use_pallas:
            from .kernels.dfa_pallas import CHUNK

            chunk_bytes = block * CHUNK
            P = _bucket_blocks(max(1, -(-n // chunk_bytes))) * chunk_bytes
        else:
            P = _bucket_blocks(max(1, -(-n // block))) * block
        pad = np.zeros(P, dtype=np.uint8)
        pad[:n] = text
        if self.config.use_ff:
            return pipeline.l_arrays_device_ff(
                self.ct,
                jnp.asarray(pad),
                jnp.int32(n),
                block=block,
                force=self.config.force_ff,
                pallas=use_pallas,
            )
        if use_pallas:
            return pipeline.l_arrays_device_pallas(
                self.ct,
                jnp.asarray(pad),
                jnp.int32(n),
                block=block,
                interpret=self.config.interpret,
            )
        return pipeline.l_arrays_device(
            self.ct, jnp.asarray(pad), jnp.int32(n), block=block
        )

    def _fused_staged(self, t: np.ndarray, corpus):
        """(staged, n, fblock, fchl) for the fused kernel, or None when
        the padded text exceeds the packed-position limit. Shared by the
        L/I and count paths (one gating/staging implementation)."""
        from .engine import schain as schain_engine
        from .kernels import schain_pallas

        if self._schain_static is None:
            self._schain_static = schain_engine.static_tables(self.tables)
        fblock, fchl = self._fused_params()
        grain = fblock * 8 * fchl
        n = len(t)
        P = _bucket_blocks(max(1, -(-n // grain))) * grain
        if P > schain_pallas.max_p(self.tables.n_states):
            return None
        if corpus is not None:
            staged = corpus.staged_for(self, fblock, fchl)[:3]
        else:
            pad = np.zeros(P, dtype=np.uint8)
            pad[:n] = t
            staged = schain_pallas.stage_text_device(
                self._schain_static, jnp.asarray(pad),
                block=fblock, chl=fchl,
            )
        return staged, n, fblock, fchl

    def _fused_chunk_bytes(self) -> int:
        """Largest streaming chunk the fused kernel can hold for this Q
        (multiple of the kernel grain, chunk + grain <= max_p; 0 = none).
        Texts beyond max_p route through chunked-fused streaming instead
        of the XLA select-chain, which collapses at large Q (measured
        0.01 GB/s at Q=134 vs 0.66 rolled — bench/NOTES.md round 3)."""
        from .kernels import schain_pallas

        fblock, fchl = self._fused_params()
        grain = fblock * 8 * fchl
        mp = schain_pallas.max_p(self.tables.n_states)
        k = (mp - grain) // grain
        return max(0, k) * grain

    def _fused_params(self):
        """(K, CHL) for the fused kernel: config override or the measured
        v5e optimum — K=128 with CHL=512 at small Q (round-4 sweep:
        +15-26% over CHL=128 across dense/sparse/pattern families;
        CHL=1024 fails server-side compile) and CHL=128 above the
        unrolled-Q knee (large-Q carries scale with Q*CHL — keep the
        round-2/3-validated geometry there); under interpret the generic
        block_size keeps CI traces small."""
        K = self.config.fused_block or (
            self.config.block_size if self.config.interpret else 128
        )
        # CHL=512 measured +15-26% for single-pattern small-Q (round-4
        # sweep; the kernel raises its scoped-VMEM budget to fit the
        # wide tiles). Multi-pattern measured neutral (17.8 vs 18.0) —
        # keep the round-2-validated narrow geometry there. _fused_run
        # retries at CHL=128 if a VMEM OOM slips through on other
        # hardware generations.
        wide_ok = (
            not self.config.interpret
            and self.tables is not None
            and self.tables.n_states <= 16
            and self.tables.n_patterns == 1
        )
        chl = (
            self.config.fused_chl
            or self._chl_fallback
            or (512 if wide_ok else 128)
        )
        return K, chl

    def _fused_run(self, t, corpus, run):
        """Stage + run a fused-kernel call, retrying once at CHL=128 on
        a scoped-VMEM OOM (the wide default is validated on v5e only).
        Returns None when the text exceeds the packed-position limit."""
        fs = self._fused_staged(t, corpus)
        if fs is None:
            return None
        try:
            return run(*fs)
        except Exception as err:  # jax.errors.JaxRuntimeError
            msg = str(err).lower()
            if self._chl_fallback is not None or "vmem" not in msg:
                raise
            self._chl_fallback = 128
            fs = self._fused_staged(t, corpus)
            if fs is None:
                return None
            return run(*fs)

    def _use_matmul(self) -> bool:
        # Explicit opt-in only: measured slower than schain at small Q
        # (MXU utilization ~ Q^2/128^2 — bench/NOTES.md).
        mode = self.config.matmul
        if mode != "on" or self.tables is None:
            return False
        from .engine.matmul import MAX_BLOCK

        Q, C = self.tables.n_states, self.tables.n_classes
        fits = (
            Q <= MAX_BLOCK
            and self.config.block_size <= MAX_BLOCK
            and C * Q * Q <= 1 << 20
        )
        if not fits:
            raise CompileError(
                f"pattern too large for the matmul engine "
                f"(Q={Q}, C={C}, block={self.config.block_size}); use "
                "Config(matmul='off') to fall back to the DFA engines"
            )
        return True

    def _use_schain_fused(self) -> bool:
        """VMEM-fused select-chain kernel (kernels/schain_pallas.py): the
        preferred accelerator engine — the select-chain scan without the
        per-byte HBM carry round-trip (bench/NOTES.md round-2 lever)."""
        mode = self.config.schain_fused
        if mode == "off" or self.tables is None:
            return False
        from .kernels.schain_pallas import (
            AUTO_MAX_Q, MAX_Q, MAX_Q_ROLLED,
        )

        Q, C = self.tables.n_states, self.tables.n_classes
        mb = (self._fused_params()[0] + 1).bit_length()
        q_cap = MAX_Q_ROLLED if self._fused_rolled() else MAX_Q
        fits = (
            Q <= q_cap
            and (Q - 1) < (1 << (31 - mb))
            and C * Q <= 4096
            and self.tables.n_patterns < 255
        )
        if mode == "on":
            if not fits:
                raise CompileError(
                    f"tables too large for the fused select-chain kernel "
                    f"(Q={Q}, C={C})"
                )
            return True
        if self.config.matmul == "on" or self.config.schain == "on":
            return False
        if self.config.pallas != "auto":  # explicit engine choice wins
            return False
        # Auto selection additionally respects the measured Mosaic COMPILE
        # knee: an UNROLLED Q=18 kernel at the default geometry did not
        # compile in 900 s on v5e, while the ROLLED (fori_loop) form
        # compiles the same DFA in ~19 s and runs 10+ GB/s
        # (bench/NOTES.md "large-Q"), so auto routes Q above the unrolled
        # knee to the rolled form up to its own measured knee, and only
        # beyond that to the XLA select-chain engine. schain_fused='on'
        # overrides (documented slow compile up to the form's MAX_Q).
        from .kernels.schain_pallas import AUTO_MAX_Q_ROLLED

        auto_cap = (
            AUTO_MAX_Q_ROLLED if self._fused_rolled() else AUTO_MAX_Q
        )
        if not self.config.interpret and Q > auto_cap:
            return False
        import jax

        return fits and (
            jax.default_backend() not in ("cpu",) or self.config.interpret
        )

    def _fused_rolled(self) -> bool:
        """Rolled (fori_loop, O(Q)-trace) form of the fused kernel.

        'auto': on above the unrolled compile knee (only reachable with
        schain_fused='on' today); 'on'/'off' force. The first rolled
        formulation miscompiled under jitted XLA CPU interpret
        (bench/NOTES.md); the scratch-band form does not — CI validates
        it jitted (tests/kernels/test_rolled_*), so interpret mode is
        allowed."""
        mode = self.config.schain_rolled
        if mode == "off" or self.tables is None:
            return False
        if mode == "on":
            return True
        from .kernels.schain_pallas import AUTO_MAX_Q

        return self.tables.n_states > AUTO_MAX_Q

    def _use_schain(self) -> bool:
        """Gather-free select-chain engine (engine/schain.py): the auto
        choice on accelerator backends — every dynamic-gather formulation
        measured 100x+ slower on v5e (bench/NOTES.md)."""
        mode = self.config.schain
        if mode == "off" or self.tables is None:
            return False
        Q, C = self.tables.n_states, self.tables.n_classes
        fits = C * Q <= 4096  # select-chain cost ~3*C*Q ops/byte
        if mode == "on":
            return True
        if self.config.matmul == "on":
            return False
        import jax

        return fits and jax.default_backend() not in ("cpu",)

    def _use_pallas(self) -> bool:
        mode = self.config.pallas
        if mode == "on":
            return True
        if mode == "off":
            return False
        import jax

        return jax.default_backend() not in ("cpu",)

    def _l_i(self, text: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host (L, I) arrays trimmed to n+1 (test/debug aid)."""
        L, I = self._l_i_device(text)
        n = len(text)
        return np.asarray(L)[: n + 1], np.asarray(I)[: n + 1]

    def _candidates(self, text: np.ndarray, corpus=None):
        """Device-compacted (pos, end, pid) host arrays (spans.py)."""
        L, I = self._l_i_device(text, corpus=corpus)
        return spans.candidates_host(
            L, I, max_w=self.info.max_len, n_patterns=len(self.irs)
        )

    # -- MatchType API ------------------------------------------------------

    _ORACLE_WARN_BYTES = 1 << 20

    def _oracle_guard(self, n: int) -> None:
        """Call-time cost warning for oracle-engine scans: the compile-time
        fallback warning may have scrolled away long before a multi-megabyte
        scan is issued, and the oracle runs at Python speed (~100 KB/s)."""
        if n > self._ORACLE_WARN_BYTES:
            import warnings

            warnings.warn(
                f"pattern {[p.decode('latin-1') for p in self.source]} is "
                f"served by the pure-Python NFA oracle engine; scanning "
                f"{n} bytes may take minutes to hours. Raise "
                "Config(max_dfa_states=...) for a device engine, or "
                "pre-filter the corpus.",
                RuntimeWarning,
                stacklevel=4,
            )

    def _record(self, op, n_bytes, n_matches, t_dev, t_all, n_cand=0,
                t_sel=0.0):
        self.last_stats = MatchStats(
            engine=self.engine,
            op=op,
            n_bytes=n_bytes,
            n_candidates=n_cand,
            n_matches=n_matches,
            device_time_s=t_dev,
            select_time_s=t_sel,
            total_time_s=t_all,
        )

    def _bitmask_ok(self) -> bool:
        """Does this pattern route through the bitpacked literal spans
        program (kernels/literal.literal_mask_packed_device)?

        Capped at 8 literals: the peel's win is sparse candidates packed
        32/word; a MANY-literal set (e.g. regexdna's 11 IUB classes) is
        typically dense, where the peel re-runs at growing caps and the
        fused 2k-compare+peel program stresses the TPU compile service
        (observed round 5: the 11-class IUB program hung/OOMed remote
        compiles that the plain L/I claim chain sails through)."""
        return (
            self.engine == "literal"
            and self.info.overlap_free
            and self.config.bitmask != "off"
            and len(self.info.literals) <= 8
        )

    def _bitmask_words(self, t: np.ndarray, corpus, row_w: int = 32):
        """Packed candidate-start words for `t` (staged corpus reused
        when available — the serving model)."""
        from .kernels import literal as lk

        n = len(t)
        Wd = self.info.max_len
        if corpus is not None:
            ext, P_arr = corpus.padded_ext(Wd)
            P_s = P_arr - Wd
        else:
            # Bucket P (static jit arg) like the count path: without it
            # every distinct text length triggers a fresh trace+compile
            # (jrep batched flushes have near-unique lengths).
            P_s = _bucket_blocks(max(1, -(-n // 1024))) * 1024
            ext = jnp.asarray(lk.extend_pad(t, P_s, Wd))
        return lk.literal_mask_packed_device(
            ext, jnp.int32(n), lits=self.info.literals, P=P_s, row_w=row_w
        )

    def _literal_end_at(self, t: np.ndarray, s: int):
        """(end, pid) of the match starting at s: longest-literal-first
        / lowest-pid (the L-array claim order)."""
        n = len(t)
        order = sorted(
            range(len(self.info.literals)),
            key=lambda i: (
                -len(self.info.literals[i]),
                self.info.literal_pids[i],
                i,
            ),
        )
        for i in order:
            lit = self.info.literals[i]
            if s + len(lit) > n:
                continue
            if isinstance(lit, bytes):
                ok = t[s : s + len(lit)].tobytes() == lit
            else:  # class-literal: per-position membership
                ok = all(
                    int(t[s + j]) in allowed
                    for j, allowed in enumerate(lit)
                )
            if ok:
                return s + len(lit), self.info.literal_pids[i]
        raise AssertionError("candidate start with no literal match")

    def matches_may_contain_byte(self, b: int) -> bool:
        """Conservative containment test: False ONLY when no match of
        this pattern can CONSUME byte `b` (assertions like ^ $ \\b may
        still look at it as context). Used for batched multi-text
        scanning (tools/jrep.py): texts joined with a separator byte the
        pattern cannot consume yield exactly the per-text matches in one
        device call — a span crossing a join would have to consume the
        separator."""
        if self.engine == "literal" and self.info.literals:
            from .compile.analysis import _clit_sets

            return any(
                any(b in s for s in _clit_sets(lit))
                for lit in self.info.literals
            )
        if self.engine == "classrun" and self._classrun is not None:
            return bool(np.asarray(self._classrun[0])[b])
        if self.engine == "classlit" and self._classlit is not None:
            lut, _w, _lo, _hi, sfx, _lw, _tw = self._classlit
            return bool(np.asarray(lut)[b]) or bytes([b]) in sfx
        if self.tables is not None:
            c = int(self.tables.class_of[b])
            dead = self.tables.dead
            if dead < 0:
                return True
            consumes = self.tables.next[:, c] != dead
            ends_on_b = self.tables.accept[:, c] >= 0
            return bool(consumes.any() or ends_on_b.any())
        return True  # oracle / unknown: assume it may

    def match_full(self, text: TextLike) -> bool:
        t, corpus = _unwrap(text)
        if self._oracle:
            self._oracle_guard(len(t))
            with Timer() as t_all:
                got = self._oracle.match_full(t.tobytes())
            self._record("match_full", len(t), int(got), 0.0, t_all.elapsed)
            return got
        with Timer() as t_all:
            with Timer() as t_dev:
                L, _ = self._l_i_device(t, corpus=corpus)
            got = int(L[0]) == len(t)
        self._record("match_full", len(t), int(got), t_dev.elapsed,
                     t_all.elapsed)
        return got

    def match_anywhere(self, text: TextLike) -> bool:
        t, corpus = _unwrap(text)
        if self._oracle:
            self._oracle_guard(len(t))
            with Timer() as t_all:
                got = self._oracle.match_anywhere(t.tobytes())
            self._record("match_anywhere", len(t), int(got), 0.0,
                         t_all.elapsed)
            return got
        if self.engine == "dfa" and len(t) > self.config.first_window:
            with Timer() as t_all:
                got = self.match_anywhere_stream(
                    t, chunk_bytes=self.config.first_window, corpus=corpus
                )
            self._record("match_anywhere", len(t), int(got), 0.0,
                         t_all.elapsed)
            return got
        if self._bitmask_ok():
            with Timer() as t_all:
                with Timer() as t_dev:
                    words = self._bitmask_words(t, corpus)
                    found = int(spans.first_candidate_bitmask(words)) < len(
                        t
                    )
            self._record("match_anywhere", len(t), int(found),
                         t_dev.elapsed, t_all.elapsed, n_cand=int(found))
            return found
        with Timer() as t_all:
            with Timer() as t_dev:
                L, _ = self._l_i_device(t, corpus=corpus)
            c = int(spans.candidate_count(L))
        self._record("match_anywhere", len(t), int(c > 0), t_dev.elapsed,
                     t_all.elapsed, n_cand=c)
        return c > 0

    def match_first(self, text: TextLike, mesh=None) -> Optional[Span]:
        t, corpus = _unwrap(text)
        m_ = self._resolve_mesh(mesh)
        if m_ is not None:
            s, e, _ = self._sharded_arrays(t, m_)
            self.last_stats.op = "match_first"
            return (int(s[0]), int(e[0])) if len(s) else None
        if self._oracle:
            self._oracle_guard(len(t))
            with Timer() as t_all:
                m = self._oracle.match_first(t.tobytes())
            self._record("match_first", len(t), int(m is not None), 0.0,
                         t_all.elapsed)
            return m
        # Early exit: work scales with the distance to the first match
        # (doubling windows, engine/stream.py), not the text length —
        # rejit's MatchFirst stops at the first verified hit
        # (SURVEY.md §3.3). A DeviceCorpus input makes the ladder slice
        # the staged tiles on device (no window uploads at all).
        if self.engine == "dfa" and len(t) > self.config.first_window:
            with Timer() as t_all:
                m = self.match_first_stream(
                    t, chunk_bytes=self.config.first_window, corpus=corpus
                )
            self._record("match_first", len(t), int(m is not None), 0.0,
                         t_all.elapsed)
            return m
        if self._bitmask_ok():
            # One O(1)-output device reduction over the packed candidate
            # words; end/pid decode from the text at the start.
            with Timer() as t_all:
                with Timer() as t_dev:
                    words = self._bitmask_words(t, corpus)
                    first = int(spans.first_candidate_bitmask(words))
                found = first < len(t)
            self._record("match_first", len(t), int(found),
                         t_dev.elapsed, t_all.elapsed, n_cand=int(found))
            if not found:
                return None
            end, _pid = self._literal_end_at(t, first)
            return (first, end)
        with Timer() as t_all:
            with Timer() as t_dev:
                pos, end, _ = self._candidates(t, corpus=corpus)
        self._record("match_first", len(t), int(len(pos) > 0),
                     t_dev.elapsed, t_all.elapsed, n_cand=len(pos))
        if len(pos) == 0:
            return None
        return (int(pos[0]), int(end[0]))

    def _decode_ends_pids(self, t: np.ndarray, sp: np.ndarray):
        """(starts, ends, pids) from candidate starts of an OVERLAP-FREE
        literal set: every start IS a match start; the width and pattern
        id decode uniquely from the text bytes, longest-literal-first /
        lowest-pid (the claim order of literal_l_arrays_device). O(k *
        max_len) vectorized ops over #matches only."""
        n = len(t)
        lits = self.info.literals
        lpids = self.info.literal_pids
        if len(lits) == 1:
            ends = sp + len(lits[0])
            pids = np.full(len(sp), lpids[0], dtype=np.int64)
            return sp, ends, pids
        ends = np.full(len(sp), -1, dtype=np.int64)
        pids = np.full(len(sp), -1, dtype=np.int64)
        order = sorted(
            range(len(lits)),
            key=lambda i: (-len(lits[i]), lpids[i], i),
        )
        for i in order:
            lit = lits[i]
            hit = (pids < 0) & (sp <= n - len(lit))
            by_pos = (
                [np.uint8(b) for b in lit]
                if isinstance(lit, bytes)
                else [np.asarray(a, np.uint8) for a in lit]
            )
            for j, allowed in enumerate(by_pos):
                tj = t[np.minimum(sp + j, n - 1)]
                ok = (
                    tj == allowed
                    if allowed.ndim == 0
                    else np.isin(tj, allowed)
                )
                np.logical_and(hit, ok, out=hit)
            ends[hit] = sp[hit] + len(lit)
            pids[hit] = lpids[i]
        return sp, ends, pids

    # -- Sharded (multi-device) execution ------------------------------------

    def _resolve_mesh(self, mesh):
        """None -> single-device; 'auto' -> all-devices data mesh (when
        more than one device exists); a jax.sharding.Mesh passes through."""
        if mesh is None:
            return None
        if isinstance(mesh, str):
            if mesh != "auto":
                raise CompileError(f"unknown mesh spec {mesh!r}")
            import jax

            if len(jax.devices()) <= 1:
                return None
            from .dist.mesh import make_mesh

            return make_mesh(axis=self.config.mesh_axis)
        return mesh

    def _sharded_kw(self):
        """Engine kwargs for dist.sharded.sharded_l_arrays: the fused
        VMEM kernel per shard on accelerators, the jnp pipeline on CPU."""
        import jax

        if self.tables is not None and (
            jax.default_backend() not in ("cpu",) or self.config.interpret
        ):
            K, chl = self._fused_params()
            return dict(
                engine="fused", block=K, chl=chl,
                interpret=self.config.interpret,
            )
        return dict(
            engine="pipeline", block=self.config.block_size,
            interpret=self.config.interpret,
        )

    def _sharded_arrays(self, t: np.ndarray, mesh):
        """MatchAll arrays over a device mesh (round-4 VERDICT missing #2:
        the distributed layer reachable from the public API). Literal
        overlap-free sets ride the bitpacked sharded spans program
        (dist/literal.py, ppermute halo); everything table-compilable
        rides the fused per-shard kernel with the exact cross-shard
        splice (dist/sharded.py)."""
        axis = self.config.mesh_axis
        if self.engine == "literal" and self.info.overlap_free:
            from .dist import literal as dlit

            with Timer() as t_all:
                with Timer() as t_dev:
                    sp = dlit.sharded_literal_spans(
                        self.info.literals, t, mesh, axis=axis
                    )
                with Timer() as t_sel:
                    out = self._decode_ends_pids(t, sp)
            self.last_stats = MatchStats(
                engine=self.engine, op="match_all", n_bytes=len(t),
                n_candidates=len(sp), n_matches=len(out[0]),
                device_time_s=t_dev.elapsed, select_time_s=t_sel.elapsed,
                total_time_s=t_all.elapsed,
            )
            return out
        if self._oracle or self.engine == "posnfa":
            raise CompileError(
                "sharded execution needs DFA tables; this pattern runs on "
                f"the {self.engine} engine (DFA blowup). Drop mesh= or "
                "raise Config(max_dfa_states=...)."
            )
        from .dist import sharded as dsh
        from .engine import select as select_mod

        with Timer() as t_all:
            with Timer() as t_dev:
                L, I = dsh.sharded_l_arrays(
                    self._dfa_tables(), t, mesh, axis=axis,
                    **self._sharded_kw(),
                )
            with Timer() as t_sel:
                pos = np.flatnonzero(L >= 0).astype(np.int64)
                out = select_mod.match_all_candidates(pos, L[pos], I[pos])
        self.last_stats = MatchStats(
            engine=self.engine, op="match_all", n_bytes=len(t),
            n_candidates=len(pos), n_matches=len(out[0]),
            device_time_s=t_dev.elapsed, select_time_s=t_sel.elapsed,
            total_time_s=t_all.elapsed,
        )
        return out

    def _sharded_count(self, t: np.ndarray, mesh) -> int:
        axis = self.config.mesh_axis
        if self.engine == "literal" and self.info.overlap_free:
            from .dist import literal as dlit

            with Timer() as t_all:
                cnt = dlit.sharded_literal_count(
                    self.info.literals, t, mesh, axis=axis
                )
            self._record("match_all_count", len(t), cnt, t_all.elapsed,
                         t_all.elapsed)
            return cnt
        cnt = len(self._sharded_arrays(t, mesh)[0])
        self.last_stats.op = "match_all_count"
        return cnt

    def match_all(self, text: TextLike, mesh=None) -> List[Span]:
        starts, ends, _ = self.match_all_arrays(text, mesh=mesh)
        return list(zip(starts.tolist(), ends.tolist()))

    def match_all_arrays(
        self, text: TextLike, mesh=None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """MatchAll as (starts, ends, pattern_ids) numpy arrays — the
        no-Python-objects path for large result sets. `text` may be a
        DeviceCorpus (see `stage`) to skip per-call staging. Pass a
        jax.sharding.Mesh (or 'auto') to shard the scan over devices
        (dist/, exact cross-shard semantics)."""
        t, corpus = _unwrap(text)
        m_ = self._resolve_mesh(mesh)
        if m_ is not None:
            return self._sharded_arrays(t, m_)
        if (
            self.engine == "posnfa"
            and len(t) > self.config.posnfa_chunk_bytes
        ):
            # Past ~2 MB the scan-carry working set falls out of VMEM
            # and the single-call rate drops ~3x (bench/NOTES.md round
            # 5); the exact chunked sweep keeps each chunk in the fast
            # regime and carries the suffix element across chunks.
            with Timer() as t_all:
                out = self.match_all_stream(
                    t, chunk_bytes=self.config.posnfa_chunk_bytes
                )
            self._record("match_all", len(t), len(out[0]), t_all.elapsed,
                         t_all.elapsed)
            return out
        if self._oracle:
            self._oracle_guard(len(t))
            with Timer() as t_all:
                triples = self._oracle.match_all_ids(t.tobytes())
            arr = np.array(triples, dtype=np.int64).reshape(-1, 3)
            self._record("match_all", len(t), len(triples), 0.0,
                         t_all.elapsed)
            return arr[:, 0], arr[:, 1], arr[:, 2]
        if (
            self.engine == "dfa"
            and self.tables is not None
            and corpus is None
            and self._use_schain_fused()
        ):
            # Text too large for one fused call at this Q? Chunked-fused
            # streaming is exact and far faster than the XLA select-chain
            # fallthrough at large Q (see _fused_chunk_bytes).
            fblock, fchl = self._fused_params()
            grain = fblock * 8 * fchl
            from .kernels import schain_pallas

            P = _bucket_blocks(max(1, -(-len(t) // grain))) * grain
            cb = self._fused_chunk_bytes()
            if P > schain_pallas.max_p(self.tables.n_states) and cb > 0:
                out = self.match_all_stream(t, chunk_bytes=cb)
                self.last_stats.op = "match_all"
                return out
        if self._bitmask_ok():
            # Bitpacked spans-out program (the headline bench path): the
            # candidate-start mask is packed 32 positions/uint32 inside
            # the match fusion and peeled with popcount bit tricks
            # (engine/spans.extract_rows_bitmask). Overlap-freedom means
            # every candidate start IS a match start, so the mask fully
            # describes the result; the matched width and pattern id
            # decode uniquely from the text bytes at each start,
            # longest-literal-first (the L-array claim order). Measured
            # 175 GB/s on-chip vs the fused Pallas kernel's 2.9
            # (bench/NOTES.md round 4); pure XLA, every backend.
            # One word per row: the peel is pure elementwise bit math
            # (no cross-word row-min) and cap scales with the 32-byte
            # row — measured 175 GB/s vs 119 at ROW_W=256 (bench/NOTES.md
            # round 4).
            ROW_W = 32
            with Timer() as t_all:
                n = len(t)
                with Timer() as t_dev:
                    words = self._bitmask_words(t, corpus, row_w=ROW_W)
                    cap = 4
                    while True:
                        pos_d, cnt = spans.extract_rows_bitmask(
                            words, row_w=ROW_W, row_cap=cap
                        )
                        mx = int(jnp.max(cnt)) if cnt.shape[0] else 0
                        if mx <= cap:
                            break
                        # pos_d is truncated at the cap used for THIS
                        # call; enlarge and re-run before decoding.
                        while cap < mx:
                            cap *= 2
                    n_cand = int(jnp.sum(cnt))
                with Timer() as t_sel:
                    sp = np.asarray(pos_d).ravel().astype(np.int64)
                    sp = sp[sp >= 0]
                    out = self._decode_ends_pids(t, sp)
            self.last_stats = MatchStats(
                engine=self.engine,
                op="match_all",
                n_bytes=len(t),
                n_candidates=n_cand,
                n_matches=len(sp),
                device_time_s=t_dev.elapsed,
                select_time_s=t_sel.elapsed,
                total_time_s=t_all.elapsed,
            )
            return out
        if (
            self.engine == "literal"
            and self.info.overlap_free
            and corpus is None
            and self.config.pallas != "off"
            and (self.config.interpret or self._use_pallas())
            and max(len(l) for l in self.info.literals) <= 128
            and max(self.info.literal_pids) < 16
            and all(isinstance(l, bytes) for l in self.info.literals)
        ):
            # Fused match->spans Pallas kernel (kernels/extract_pallas.py):
            # ONE pass over the text produces the compacted per-row span
            # keys — no (L, I) materialization, no extraction passes.
            # Overlap-free, so every candidate is a match.
            from .kernels import extract_pallas as xp

            with Timer() as t_all:
                n = len(t)
                max_m = max(len(l) for l in self.info.literals)
                with Timer() as t_dev:
                    rows = jnp.asarray(xp.pad_rows(t, n, max_m))
                    cap = 4
                    while True:
                        keys, cnt = xp.literal_spans_pallas(
                            rows, jnp.int32(n),
                            lits=self.info.literals,
                            pids=self.info.literal_pids,
                            cap=cap, interpret=self.config.interpret,
                        )
                        mx = int(jnp.max(cnt))  # exact even past cap
                        if mx <= cap:
                            break
                        # keys is truncated at the cap used for THIS call;
                        # enlarge and re-run the kernel before decoding.
                        while cap < mx:
                            cap *= 2
                    n_cand = int(jnp.sum(cnt))
                with Timer() as t_sel:
                    out = xp.spans_host(keys)
            self.last_stats = MatchStats(
                engine=self.engine,
                op="match_all",
                n_bytes=len(t),
                n_candidates=n_cand,
                n_matches=len(out[0]),
                device_time_s=t_dev.elapsed,
                select_time_s=t_sel.elapsed,
                total_time_s=t_all.elapsed,
            )
            return out
        with Timer() as t_all:
            with Timer() as t_dev:
                L, I = self._l_i_device(t, corpus=corpus)
                n_cand = int(spans.candidate_count(L))
            if (
                self.engine in ("dfa", "classrun")
                and self.info.run_partition
                and n_cand * 8 > len(t)
            ):
                # Dense run-partition results (tokenizers): selection is
                # elementwise (spans.partition_select_mask) and the
                # host materialization is ONE uint8 per position — the
                # dense-output transfer floor on this rig's ~25 MB/s
                # tunnel (bench/NOTES.md round-3 e2e roofline) — instead
                # of the 8-byte (L, I) pair.
                with Timer() as t_sel:
                    pid_u8 = np.asarray(spans.partition_pid_bytes(L, I))
                    out = spans.partition_arrays_host(pid_u8, len(t))
            elif n_cand > self.config.device_select_threshold:
                with Timer() as t_sel:
                    out = select_device.match_all_device(L, I)
                pos = out[0]
            else:
                pos, end, pid = spans.candidates_host(
                    L, I, max_w=self.info.max_len,
                    n_patterns=len(self.irs),
                )
                with Timer() as t_sel:
                    out = select.match_all_candidates(pos, end, pid)
        self.last_stats = MatchStats(
            engine=self.engine,
            op="match_all",
            n_bytes=len(t),
            n_candidates=n_cand,
            n_matches=len(out[0]),
            device_time_s=t_dev.elapsed,
            select_time_s=t_sel.elapsed,
            total_time_s=t_all.elapsed,
        )
        return out

    def tokenize(self, text: TextLike, mesh=None) -> List[Tuple[int, int, int]]:
        """MatchAll with pattern ids: (start, end, pattern_id) triples."""
        starts, ends, pids = self.match_all_arrays(text, mesh=mesh)
        return list(zip(starts.tolist(), ends.tolist(), pids.tolist()))

    def match_all_count(self, text: TextLike, mesh=None) -> int:
        t, corpus = _unwrap(text)
        m_ = self._resolve_mesh(mesh)
        if m_ is not None:
            return self._sharded_count(t, m_)
        if self._oracle:
            self._oracle_guard(len(t))
            with Timer() as t_all:
                cnt = self._oracle.match_all_count(t.tobytes())
            self._record("match_all_count", len(t), cnt, 0.0, t_all.elapsed)
            return cnt
        if self.engine == "literal" and self.info.overlap_free:
            # Pure device-side reduction; no span materialization.
            with Timer() as t_all:
                n = len(t)
                max_m = max(len(l) for l in self.info.literals)
                if corpus is not None:
                    ext_d, P_arr = corpus.padded_ext(max_m)
                    P = P_arr - max_m
                else:
                    P = _bucket_blocks(max(1, -(-n // 1024))) * 1024
                    ext_d = jnp.asarray(
                        literal_kernel.extend_pad(t, P, max_m)
                    )
                cnt = int(literal_kernel.literal_count_device(
                    ext_d, jnp.int32(n),
                    lits=self.info.literals, P=P,
                ))
            self._record("match_all_count", len(t), cnt, t_all.elapsed,
                         t_all.elapsed)
            return cnt
        if self.engine in ("dfa", "classrun") and self.info.run_partition:
            # Elementwise selection makes the count a pure device
            # reduction over the (L, I) arrays (spans.partition_count).
            with Timer() as t_all:
                with Timer() as t_dev:
                    L, I = self._l_i_device(t, corpus=corpus)
                cnt = int(spans.partition_count(L, I))
            self._record("match_all_count", len(t), cnt, t_dev.elapsed,
                         t_all.elapsed)
            return cnt
        if (
            self.engine == "dfa"
            and self.info.overlap_free
            and self._use_schain_fused()
        ):
            # Overlap-free: every candidate is a match, so MatchAllCount
            # is a pure device reduction — no L/I arrays materialize
            # (kernels/schain_pallas.count_device_staged).
            from .kernels import schain_pallas

            with Timer() as t_all:
                cnt = self._fused_run(
                    t, corpus,
                    lambda staged, n_, fblock, fchl:
                    schain_pallas.count_device_staged(
                        self._schain_static,
                        self.tables.n_patterns,
                        staged,
                        jnp.int32(n_),
                        block=fblock,
                        chl=fchl,
                        interpret=self.config.interpret,
                        use_ff=self.config.use_ff,
                        rolled=self._fused_rolled(),
                    ),
                )
            if cnt is not None:
                self._record("match_all_count", len(t), int(cnt),
                             t_all.elapsed, t_all.elapsed)
                return int(cnt)
        cnt = len(self.match_all_arrays(text)[0])
        self.last_stats.op = "match_all_count"
        return cnt

    def match_all_count_each(self, text: TextLike) -> np.ndarray:
        """Per-pattern MatchAllCount, each pattern counted INDEPENDENTLY.

        Unlike `tokenize`/`match_all` (which resolve cross-pattern overlap
        by longest-then-lowest-id priority), every pattern id is scanned as
        if it were alone — the regexdna shootout semantics (reference:
        rejit:sample/regexdna.cc runs one MatchAllCount per variant —
        SURVEY.md §2.1/C12). On the literal engine all patterns run in ONE
        fused device pass (kernels/literal.literal_mask_packed_by_pid_device)
        with exact non-overlap selection host-side over the sparse
        candidate bits; other engines fall back to one count per pattern.
        Returns an (n_patterns,) int64 array.
        """
        t, corpus = _unwrap(text)
        k = len(self.irs)
        # Which pattern ids can ride the fused literal pass? The UNION
        # engine may be 'dfa' (the class-literal term budget caps the
        # union's per-call cost for match_all/tokenize), but count_each's
        # whole point is running the per-pattern scans simultaneously —
        # so route per PATTERN, from each pattern's own analysis.
        if self.engine == "literal":
            lits = list(self.info.literals)
            pids = list(self.info.literal_pids)
            slow = []
        else:
            lits, pids, slow = [], [], []
            for i, src in enumerate(self.source):
                sub = _cached((src,), self.config)
                if sub.engine == "literal":
                    lits.extend(sub.info.literals)
                    pids.extend([i] * len(sub.info.literals))
                else:
                    slow.append(i)
        with Timer() as t_all:
            n = len(t)
            counts = np.zeros(k, dtype=np.int64)
            n_cand = 0
            t_dev = Timer()
            t_sel = Timer()
            t_dev.elapsed = t_sel.elapsed = 0.0
            if lits:
                max_m = max(len(l) for l in lits)
                with t_dev:
                    if corpus is not None:
                        ext, P_arr = corpus.padded_ext(max_m)
                        P = P_arr - max_m
                    else:
                        P = _bucket_blocks(max(1, -(-n // 1024))) * 1024
                        ext = jnp.asarray(
                            literal_kernel.extend_pad(t, P, max_m)
                        )
                    words = np.asarray(
                        literal_kernel.literal_mask_packed_by_pid_device(
                            ext, jnp.int32(n),
                            lits=tuple(lits), pids=tuple(pids),
                            n_pat=k, P=P,
                        )
                    )
                with t_sel:
                    lits_of = [
                        [l for l, p in zip(lits, pids) if p == i]
                        for i in range(k)
                    ]
                    fused_pids = sorted(set(pids))
                    for p in fused_pids:
                        bits = np.unpackbits(
                            words[p].view(np.uint8), bitorder="little"
                        )
                        sp = np.nonzero(bits)[0].astype(np.int64)
                        n_cand += len(sp)
                        counts[p] = self._nonoverlap_count(
                            t, sp, lits_of[p]
                        )
            for i in slow:
                counts[i] = _cached(
                    (self.source[i],), self.config
                ).match_all_count(t)
        self.last_stats = MatchStats(
            engine=self.engine,
            op="match_all_count_each",
            n_bytes=len(t),
            n_candidates=n_cand,
            n_matches=int(counts.sum()),
            device_time_s=t_dev.elapsed,
            select_time_s=t_sel.elapsed,
            total_time_s=t_all.elapsed,
        )
        return counts

    @staticmethod
    def _nonoverlap_count(t: np.ndarray, sp: np.ndarray, lits) -> int:
        """Exact leftmost-longest non-overlap count over candidate starts
        `sp` (sorted) for one pattern's literal set. Width at each start =
        the longest literal matching there (the L-array claim order); the
        greedy suppression loop runs over the sparse match list only
        (SURVEY.md §7.2.5)."""
        if len(sp) == 0:
            return 0
        n = len(t)
        lens = {len(l) for l in lits}
        if len(lens) == 1:
            widths = np.full(len(sp), lens.pop(), dtype=np.int64)
        else:
            widths = np.full(len(sp), -1, dtype=np.int64)
            for lit in sorted(lits, key=len, reverse=True):
                und = widths < 0
                ok = und & (sp <= n - len(lit))
                by_pos = (
                    [np.uint8(b) for b in lit] if isinstance(lit, bytes)
                    else [np.asarray(a, np.uint8) for a in lit]
                )
                for j, allowed in enumerate(by_pos):
                    tj = t[np.minimum(sp + j, n - 1)]
                    hit = (
                        tj == allowed if allowed.ndim == 0
                        else np.isin(tj, allowed)
                    )
                    np.logical_and(ok, hit, out=ok)
                widths[ok] = len(lit)
        cnt = 0
        prev_end = 0
        for s, w in zip(sp.tolist(), widths.tolist()):
            if s >= prev_end:
                cnt += 1
                prev_end = s + w
        return cnt

    # -- Streaming API (corpora larger than device memory) ------------------

    def _dfa_tables(self):
        """DFA tables, compiled on demand (the literal/classrun engines skip
        table compilation, but streaming always runs the DFA path)."""
        if self.tables is None:
            self.tables = self._compile_tables_cached()
        return self.tables

    @staticmethod
    def _stream_source(source):
        import os

        if isinstance(source, (str, os.PathLike)):
            # str means a file path here (the corpus is by definition too
            # big to pass as a Python string); bytes/arrays are raw data.
            return np.memmap(source, dtype=np.uint8, mode="r")
        return text_to_u8(source)

    def match_all_stream(
        self,
        source,
        *,
        chunk_bytes: int = 8 << 20,
        state_dir: Optional[str] = None,
        progress=None,
    ):
        """Exact chunked MatchAll over a huge corpus.

        `source` is a file path (memory-mapped) or a uint8 array; the corpus
        never needs to fit in device memory. `state_dir` checkpoints
        per-chunk progress for resume after interruption
        (engine/stream.py). Returns (starts, ends, pids) int64 arrays.
        """
        with Timer() as t_all:
            out = self._match_all_stream_impl(
                source, chunk_bytes=chunk_bytes, state_dir=state_dir,
                progress=progress,
            )
        self._record(
            "match_all_stream", len(self._stream_source(source)),
            len(out[0]), 0.0, t_all.elapsed,
        )
        return out

    def _match_all_stream_impl(
        self,
        source,
        *,
        chunk_bytes: int = 8 << 20,
        state_dir: Optional[str] = None,
        progress=None,
    ):
        from .engine import stream
        from .kernels.dfa_pallas import CHUNK

        if self._oracle:
            data = self._stream_source(source)
            triples = self._oracle.match_all_ids(bytes(data.tobytes()))
            arr = np.array(triples, dtype=np.int64).reshape(-1, 3)
            return arr[:, 0], arr[:, 1], arr[:, 2]
        if self.engine == "posnfa":
            # Exact chunked sweep with the carried suffix element — the
            # DFA stream's architecture over position SETS
            # (nfaset.stream_match_all_nfaset). Device positions are
            # global int32: 2 GiB corpus cap on this engine.
            from .engine import nfaset

            K = self.config.posnfa_block or (
                64 if self._posnfa.W == 1 else 128
            )
            return nfaset.stream_match_all_nfaset(
                self._posnfa,
                self._stream_source(source),
                chunk_bytes=chunk_bytes,
                block=K,
            )
        tables = self._dfa_tables()
        if self._use_schain_fused():
            from .kernels import schain_pallas

            fblock, fchl = self._fused_params()
            grain = fblock * 8 * fchl
            if (
                chunk_bytes % grain == 0
                # the final chunk is padded to chunk_bytes + grain
                # (engine/stream.py sizes it strictly > n_local)
                and chunk_bytes + grain
                <= schain_pallas.max_p(tables.n_states)
            ):
                # Production chunk engine: fused kernel per chunk
                # (engine/stream.py chunk_l_arrays_device_fused).
                return stream.stream_match_all(
                    tables,
                    self._stream_source(source),
                    chunk_bytes=chunk_bytes,
                    block=fblock,
                    chl=fchl,
                    rolled=self._fused_rolled(),
                    engine="fused",
                    state_dir=state_dir,
                    progress=progress,
                    interpret=self.config.interpret,
                )
        use_pallas = (
            self._use_pallas()
            and chunk_bytes % (self.config.block_size * CHUNK) == 0
        )
        return stream.stream_match_all(
            tables,
            self._stream_source(source),
            chunk_bytes=chunk_bytes,
            block=self.config.block_size,
            state_dir=state_dir,
            progress=progress,
            use_pallas=use_pallas,
            interpret=self.config.interpret,
        )

    def match_all_count_stream(self, source, **kw) -> int:
        cnt = len(self.match_all_stream(source, **kw)[0])
        self.last_stats.op = "match_all_count_stream"
        return cnt

    def _stream_first_kw(self, chunk_bytes: int) -> dict:
        """Window-scan kwargs: the fused kernel evaluates each doubling
        window in one pass when it fits (engine/stream.py
        _window_l_fused); gather engines otherwise."""
        tables = self._dfa_tables()
        if self._use_schain_fused():
            from .kernels import schain_pallas

            fblock, fchl = self._fused_params()
            grain = fblock * 8 * fchl
            if (
                chunk_bytes % grain == 0
                and chunk_bytes + grain
                <= schain_pallas.max_p(tables.n_states)
            ):
                return dict(
                    chunk_bytes=chunk_bytes,
                    block=fblock,
                    chl=fchl,
                    engine="fused",
                    interpret=self.config.interpret,
                    rolled=self._fused_rolled(),
                )
        return self._stream_kw(chunk_bytes)

    def _stream_kw(self, chunk_bytes: int) -> dict:
        from .kernels.dfa_pallas import CHUNK

        use_pallas = (
            self._use_pallas()
            and chunk_bytes % (self.config.block_size * CHUNK) == 0
        )
        return dict(
            chunk_bytes=chunk_bytes,
            block=self.config.block_size,
            use_pallas=use_pallas,
            interpret=self.config.interpret,
        )

    def _first_kw_with_corpus(self, chunk_bytes: int, corpus) -> dict:
        """_stream_first_kw plus the corpus's full staging when the fused
        window ladder can slice it on device (zero ladder uploads)."""
        kw = self._stream_first_kw(chunk_bytes)
        if corpus is not None and kw.get("engine") == "fused":
            from .engine import schain as schain_engine
            from .kernels import schain_pallas

            if self._schain_static is None:
                self._schain_static = schain_engine.static_tables(
                    self.tables
                )
            K, chl = kw["block"], kw["chl"]
            sf = corpus.staged_for(self, K, chl, beyond_n=True)
            if sf[3] <= schain_pallas.max_p(self.tables.n_states):
                kw["staged_full"] = sf
        return kw

    def match_first_stream(
        self, source, *, chunk_bytes: int = 8 << 20, corpus=None
    ) -> Optional[Tuple[int, int]]:
        """MatchFirst over a huge corpus with early exit: work scales with
        the distance to the first match (doubling windows), not corpus
        size (engine/stream.py)."""
        from .engine import stream

        with Timer() as t_all:
            if self._oracle:
                m = self._oracle.match_first(
                    bytes(self._stream_source(source).tobytes())
                )
            elif self.engine == "posnfa":
                m = self.match_first(
                    np.asarray(self._stream_source(source))
                )
            else:
                m = stream.stream_match_first(
                    self._dfa_tables(),
                    self._stream_source(source),
                    **self._first_kw_with_corpus(chunk_bytes, corpus),
                )
        self._record(
            "match_first_stream", len(self._stream_source(source)),
            int(m is not None), 0.0, t_all.elapsed,
        )
        return None if m is None else (m[0], m[1])

    def match_anywhere_stream(
        self, source, *, chunk_bytes: int = 8 << 20, corpus=None
    ) -> bool:
        from .engine import stream

        with Timer() as t_all:
            if self._oracle:
                got = self._oracle.match_anywhere(
                    bytes(self._stream_source(source).tobytes())
                )
            elif self.engine == "posnfa":
                got = self.match_anywhere(
                    np.asarray(self._stream_source(source))
                )
            else:
                got = stream.stream_match_anywhere(
                    self._dfa_tables(),
                    self._stream_source(source),
                    **self._first_kw_with_corpus(chunk_bytes, corpus),
                )
        self._record(
            "match_anywhere_stream", len(self._stream_source(source)),
            int(got), 0.0, t_all.elapsed,
        )
        return got

    def match_full_stream(
        self, source, *, chunk_bytes: int = 8 << 20
    ) -> bool:
        from .engine import stream

        with Timer() as t_all:
            if self._oracle:
                got = self._oracle.match_full(
                    bytes(self._stream_source(source).tobytes())
                )
            elif self.engine == "posnfa":
                got = self.match_full(
                    np.asarray(self._stream_source(source))
                )
            else:
                got = stream.stream_match_full(
                    self._dfa_tables(),
                    self._stream_source(source),
                    **self._stream_kw(chunk_bytes),
                )
        self._record(
            "match_full_stream", len(self._stream_source(source)),
            int(got), 0.0, t_all.elapsed,
        )
        return got

    # -- Replace API --------------------------------------------------------

    def replace(self, text: TextLike, repl: Union[str, bytes]) -> bytes:
        """Replace every MatchAll span with `repl` (no group refs — the
        engine has no captures, docs/SEMANTICS.md)."""
        t = text_to_u8(text)
        r = repl.encode("utf-8") if isinstance(repl, str) else bytes(repl)
        with Timer() as t_all:
            got = None
            if self.config.selection != "python":
                from .native import lib as native

                if native.has_replace_splice():
                    starts, ends, _ = self.match_all_arrays(t)
                    got = native.replace_splice(t, starts, ends, r)
                    n_m = len(starts)
            if got is None:
                data = t.tobytes()
                out = []
                pos = 0
                n_m = 0
                for s, e in self.match_all(t):
                    out.append(data[pos:s])
                    out.append(r)
                    pos = e
                    n_m += 1
                out.append(data[pos:])
                got = b"".join(out)
        self._record("replace", len(t), n_m,
                     self.last_stats.device_time_s, t_all.elapsed)
        return got

    def replace_each(
        self, text: TextLike, repls: Sequence[Union[str, bytes]]
    ) -> bytes:
        """Replace each match with the replacement for its pattern id
        (multi-pattern extension of Replace: one pass over the text for
        the whole pattern list — the regexdna IUB phase is the canonical
        use, SURVEY.md §2.1/C12)."""
        t = text_to_u8(text)
        rs = [
            r.encode("utf-8") if isinstance(r, str) else bytes(r)
            for r in repls
        ]
        if len(rs) != len(self.irs):
            raise ValueError(
                f"need {len(self.irs)} replacements, got {len(rs)}"
            )
        with Timer() as t_all:
            starts, ends, pids = self.match_all_arrays(t)
            got = None
            if self.config.selection != "python":
                from .native import lib as native

                if native.has_replace_splice_multi():
                    got = native.replace_splice_multi(
                        t, starts, ends, pids, rs
                    )
            if got is None:
                data = t.tobytes()
                out = []
                pos = 0
                for s, e, pid in zip(
                    starts.tolist(), ends.tolist(), pids.tolist()
                ):
                    out.append(data[pos:s])
                    out.append(rs[pid])
                    pos = e
                out.append(data[pos:])
                got = b"".join(out)
        self._record("replace_each", len(t), len(starts),
                     self.last_stats.device_time_s, t_all.elapsed)
        return got

    def replace_first(self, text: TextLike, repl: Union[str, bytes]) -> bytes:
        t = text_to_u8(text)
        r = repl.encode("utf-8") if isinstance(repl, str) else bytes(repl)
        with Timer() as t_all:
            data = t.tobytes()
            m = self.match_first(t)
            got = (
                data if m is None else data[: m[0]] + r + data[m[1] :]
            )
        self._record("replace_first", len(t), int(m is not None),
                     self.last_stats.device_time_s, t_all.elapsed)
        return got

    def split(self, text: TextLike, maxsplit: int = 0) -> List[bytes]:
        """Split `text` by MatchAll spans (python re.split without
        captures). Zero-width matches split too (re >= 3.7 semantics);
        `maxsplit > 0` caps the number of splits."""
        t = text_to_u8(text)
        with Timer() as t_all:
            data = t.tobytes()
            out = []
            pos = 0
            n_m = 0
            for s, e in self.match_all(t):
                if maxsplit and n_m >= maxsplit:
                    break
                out.append(data[pos:s])
                pos = e
                n_m += 1
            out.append(data[pos:])
        self._record("split", len(t), n_m,
                     self.last_stats.device_time_s, t_all.elapsed)
        return out


@functools.lru_cache(maxsize=256)
def _cached(source: Tuple[bytes, ...], config: Config) -> Pattern:
    return Pattern(list(source), config)


def compile(pattern, config: Config = DEFAULT) -> Pattern:  # noqa: A001
    if isinstance(pattern, (str, bytes)):
        pattern = [pattern]
    key = tuple(
        p.encode("utf-8") if isinstance(p, str) else bytes(p) for p in pattern
    )
    return _cached(key, config)


# One-shot free functions (rejit:include/rejit.h parity).


def match_full(pattern, text, config: Config = DEFAULT) -> bool:
    return compile(pattern, config).match_full(text)


def match_anywhere(pattern, text, config: Config = DEFAULT) -> bool:
    return compile(pattern, config).match_anywhere(text)


def match_first(pattern, text, config: Config = DEFAULT) -> Optional[Span]:
    return compile(pattern, config).match_first(text)


def match_all(pattern, text, config: Config = DEFAULT) -> List[Span]:
    return compile(pattern, config).match_all(text)


def match_all_count(pattern, text, config: Config = DEFAULT) -> int:
    return compile(pattern, config).match_all_count(text)


def replace(pattern, text, repl, config: Config = DEFAULT) -> bytes:
    return compile(pattern, config).replace(text, repl)


def replace_first(pattern, text, repl, config: Config = DEFAULT) -> bytes:
    return compile(pattern, config).replace_first(text, repl)


def replace_each(patterns, text, repls, config: Config = DEFAULT) -> bytes:
    return compile(patterns, config).replace_each(text, repls)


def split(pattern, text, maxsplit: int = 0, config: Config = DEFAULT):
    return compile(pattern, config).split(text, maxsplit)


# rejit names the all-spans variant ReplaceAll (rejit:include/rejit.h,
# unverified recall — SURVEY.md §2.1/C1); `replace` already has those
# semantics, so alias it for exact naming parity.
replace_all = replace


# CamelCase aliases matching the reference naming.
MatchFull = match_full
MatchAnywhere = match_anywhere
MatchFirst = match_first
MatchAll = match_all
MatchAllCount = match_all_count
Replace = replace
ReplaceFirst = replace_first
ReplaceAll = replace_all
Regej = Pattern
