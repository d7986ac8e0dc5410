"""Pallas kernel tests (interpret mode on CPU; real lowering in bench)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rejit_tpu.compile import analysis, parser
from rejit_tpu.kernels import pallas_kernels as pk


def test_overlap_rows_layout():
    n = 3000
    text = jnp.asarray(np.arange(n, dtype=np.uint8))
    rows = pk.overlap_rows(text, hw=5, row_w=pk.ROW_W)
    R = rows.shape[0]
    assert rows.shape == (R, pk.ROW_W + 5)
    host = np.asarray(rows)
    # Row 0 halo = first 5 bytes of row 1.
    np.testing.assert_array_equal(host[0, pk.ROW_W :], host[1, :5])
    flat = np.arange(n, dtype=np.uint8)
    np.testing.assert_array_equal(
        host[0, : pk.ROW_W], flat[: pk.ROW_W].astype(np.int32)
    )


def test_ff_row_mask_interpret():
    info = analysis.analyze([parser.parse(rb"foo|bar")])
    lut = pk.first_byte_lut(info.first_bytes)
    n = pk.ROW_W * pk.ROW_BLOCK * 2
    text = np.full(n, ord("."), dtype=np.uint8)
    text[5] = ord("f")
    text[pk.ROW_W * 40 + 3] = ord("b")
    rows, _ = pk.pad_rows(jnp.asarray(text))
    mask = pk.ff_row_mask(rows, lut, interpret=True)
    hits = np.flatnonzero(np.asarray(mask)[:, 0])
    assert hits.tolist() == [0, 40]


@pytest.mark.parametrize("lits", [(b"packet",), (b"foo", b"bazz")])
def test_literal_count_rows_interpret(lits):
    rng = np.random.default_rng(0)
    n = pk.ROW_W * pk.ROW_BLOCK + 777
    text = rng.choice(
        np.frombuffer(b"packetfobazz .", np.uint8), size=n
    ).astype(np.uint8)
    hw = max(len(l) for l in lits) - 1
    rows = pk.overlap_rows(jnp.asarray(text), hw=hw)
    got = int(
        pk.literal_count_rows(
            rows, jnp.int32(n), lits=lits, interpret=True
        )
    )
    data = text.tobytes()
    want = sum(
        1
        for lit in lits
        for i in range(n - len(lit) + 1)
        if data[i : i + len(lit)] == lit
    )
    assert got == want


def test_literal_count_rows_boundary_straddle():
    # Hit exactly straddling a row boundary.
    n = pk.ROW_W * pk.ROW_BLOCK
    text = np.full(n, ord("."), dtype=np.uint8)
    start = pk.ROW_W - 3
    text[start : start + 6] = np.frombuffer(b"needle", np.uint8)
    rows = pk.overlap_rows(jnp.asarray(text), hw=5)
    got = int(
        pk.literal_count_rows(
            rows, jnp.int32(n), lits=(b"needle",), interpret=True
        )
    )
    assert got == 1
