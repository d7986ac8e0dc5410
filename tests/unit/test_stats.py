"""MatchStats coverage: every public op records last_stats (SURVEY.md §5.5;
PARITY.md 5.5 claims stats for every MatchType — this test enforces it)."""
import numpy as np
import pytest

from rejit_tpu import Config, Pattern

TEXT = b"singing or winging it, kingly king ing " * 8


def _check(p, op, fn):
    p.last_stats.op = ""
    fn()
    st = p.last_stats
    assert st.op == op, (op, st.op)
    assert st.n_bytes > 0
    assert st.total_time_s > 0
    assert st.engine == p.engine
    d = st.as_dict()
    assert d["bytes_per_sec"] > 0


@pytest.mark.parametrize("engine", [None, "oracle"])
def test_all_ops_record_stats(engine):
    p = Pattern(r"\b\w+ing\b", Config(engine=engine))
    _check(p, "match_full", lambda: p.match_full(TEXT))
    _check(p, "match_anywhere", lambda: p.match_anywhere(TEXT))
    _check(p, "match_first", lambda: p.match_first(TEXT))
    _check(p, "match_all", lambda: p.match_all(TEXT))
    _check(p, "match_all_count", lambda: p.match_all_count(TEXT))
    _check(p, "replace", lambda: p.replace(TEXT, b"X"))
    _check(p, "replace_first", lambda: p.replace_first(TEXT, b"X"))
    _check(p, "split", lambda: p.split(TEXT))
    _check(p, "match_all_stream", lambda: p.match_all_stream(TEXT))
    _check(
        p, "match_all_count_stream", lambda: p.match_all_count_stream(TEXT)
    )
    _check(p, "match_first_stream", lambda: p.match_first_stream(TEXT))
    _check(
        p, "match_anywhere_stream", lambda: p.match_anywhere_stream(TEXT)
    )
    _check(p, "match_full_stream", lambda: p.match_full_stream(TEXT))


def test_fused_overlap_free_count_records_stats():
    """The fused MatchAllCount reduction (overlap-free DFA engine) must
    record MatchStats like every other op — round-4 VERDICT weak #1."""
    cfg = Config(engine="dfa", schain_fused="on", interpret=True,
                 block_size=8, fused_block=8, fused_chl=2)
    p = Pattern("foo|bar|baz", cfg)
    assert p.info.overlap_free and p._use_schain_fused()
    text = b"foo bar baz foofoo barbar bazbaz xfoox"
    _check(p, "match_all_count", lambda: p.match_all_count(text))
    assert p.last_stats.n_matches == 10


def test_literal_and_partition_count_stats():
    lit = Pattern("king")
    _check(lit, "match_all_count", lambda: lit.match_all_count(TEXT))
    tok = Pattern([r"\w+", r"\s+", r"[^\w\s]+"])
    _check(tok, "match_all_count", lambda: tok.match_all_count(TEXT))
    _check(tok, "match_all", lambda: tok.match_all(TEXT))
    assert tok.last_stats.n_matches == tok.match_all_count(TEXT)
