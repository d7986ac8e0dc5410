"""Device-side pointer-doubling selection vs host selection."""
import numpy as np
import jax.numpy as jnp
import pytest

from rejit_tpu import oracle
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import pipeline, select_device

CASES = [
    (rb"[a-z]+", b"Make it SO, number one."),
    (rb"a*", b"baac"),
    (rb"aa", b"aaaaaaa"),
    (rb"foo", b"no hits at all"),
    (rb"foo", b"foofoofoo xfoo"),
    (rb"\w+|\s+|[^\w\s]+", b"hi, there! go\nnow"),
    (rb"", b"abc"),
    (rb"a|ab|abc", b"abcabc ab"),
]


@pytest.mark.parametrize("pat,text", CASES, ids=[c[0].decode() for c in CASES])
def test_device_selection_equals_oracle(pat, text):
    pats = pat.split(b"|") if pat == rb"\w+|\s+|[^\w\s]+" else [pat]
    t = compile_patterns([parser.parse(p) for p in pats])
    orc = oracle.OraclePattern(pats)
    ct = pipeline.device_tables(t)
    n = len(text)
    K = 8
    P = max(K, ((n + K) // K) * K)  # strictly > n
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = np.frombuffer(text, np.uint8)
    L, I = pipeline.l_arrays_device(ct, jnp.asarray(pad), jnp.int32(n), block=K)
    s, e, p = select_device.match_all_device(L, I)
    want = orc.match_all_ids(text)
    assert list(zip(s.tolist(), e.tolist(), p.tolist())) == want
    assert select_device.match_all_count_device(L, I) == len(want)


def test_dense_random_texts():
    rng = np.random.default_rng(3)
    t = compile_patterns([parser.parse(rb"[ab]+")])
    orc = oracle.OraclePattern(rb"[ab]+")
    ct = pipeline.device_tables(t)
    for _ in range(10):
        n = int(rng.integers(1, 120))
        text = bytes(rng.choice(np.frombuffer(b"abcab ", np.uint8), size=n))
        K = 8
        P = ((n + K) // K) * K
        pad = np.zeros(P, np.uint8)
        pad[:n] = np.frombuffer(text, np.uint8)
        L, I = pipeline.l_arrays_device(
            ct, jnp.asarray(pad), jnp.int32(n), block=K
        )
        s, e, p = select_device.match_all_device(L, I)
        assert list(zip(s.tolist(), e.tolist(), p.tolist())) == orc.match_all_ids(
            text
        ), text
