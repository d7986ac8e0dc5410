


def test_extract_rows_packed_equals_generic():
    """Packed-key extraction (width-bounded single pattern) == generic."""
    import numpy as np

    import jax.numpy as jnp

    from rejit_tpu.engine import spans

    rng = np.random.default_rng(4)
    for n in (5, 1000, 70001):
        L = np.full(n, -1, np.int32)
        k = max(1, n // 40)
        hits = rng.choice(n, size=k, replace=False)
        L[hits] = (hits + rng.integers(0, 7, k)).astype(np.int32)  # w<=6
        I = np.where(L >= 0, 0, -1).astype(np.int32)
        ebits = (256 + 6).bit_length()
        p1, e1, c1 = spans.extract_rows_packed(
            jnp.asarray(L), row_w=256, row_cap=8, ebits=ebits
        )
        p2, e2, i2, c2 = spans.extract_rows_device(
            jnp.asarray(L), jnp.asarray(I), row_w=256, row_cap=8
        )
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_candidates_host_packed_path():
    """candidates_host with width/pattern hints matches the plain call."""
    import numpy as np

    import jax.numpy as jnp

    from rejit_tpu.engine import spans

    rng = np.random.default_rng(5)
    n = 9001
    L = np.full(n, -1, np.int32)
    hits = rng.choice(n, size=140, replace=False)
    L[hits] = (hits + rng.integers(1, 5, 140)).astype(np.int32)
    I = np.where(L >= 0, 0, -1).astype(np.int32)
    a = spans.candidates_host(jnp.asarray(L), jnp.asarray(I))
    b = spans.candidates_host(
        jnp.asarray(L), jnp.asarray(I), max_w=4, n_patterns=1
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_extract_rows_fixed_matches_packed():
    """Fixed-width mask peel (round-4 headline program) == the packed-key
    extraction on the same candidates, across row widths and caps."""
    import numpy as np

    import jax.numpy as jnp

    from rejit_tpu.engine import spans
    from rejit_tpu.kernels import literal as lk

    rng = np.random.default_rng(11)
    n = 7003
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    for p in rng.integers(0, n - 6, size=200):
        text[p : p + 6] = np.frombuffer(b"packet", np.uint8)
    ext = jnp.asarray(lk.extend_pad(text, n, 6))
    mask = lk.literal_mask_device(
        ext, jnp.int32(n), lits=(b"packet",), P=n
    )
    L, I = lk.literal_l_arrays_device(
        ext, jnp.int32(n), lits=(b"packet",), pids=(0,), P=n
    )
    np.testing.assert_array_equal(
        np.asarray(mask), np.asarray(L)[:n] >= 0
    )
    for row_w in (32, 64, 256):
        mx = int(spans.row_max_count(L, row_w=row_w))
        cap = 2
        while cap < mx:
            cap *= 2
        pos_f, cnt_f = spans.extract_rows_fixed(
            mask, row_w=row_w, row_cap=cap
        )
        s_p, _e, cnt_p = spans.extract_rows_packed(
            L, row_w=row_w, row_cap=cap, ebits=(row_w + 6).bit_length()
        )
        np.testing.assert_array_equal(
            np.asarray(pos_f).ravel(), np.asarray(s_p).ravel()
        )
        np.testing.assert_array_equal(
            np.asarray(cnt_f), np.asarray(cnt_p)[: len(np.asarray(cnt_f))]
        )


def test_extract_rows_bitmask_matches_fixed():
    """Bitpacked peel == the bool-mask peel on random masks across
    densities, row widths, and caps (incl. counts past cap)."""
    import numpy as np

    import jax.numpy as jnp

    from rejit_tpu.engine import spans

    rng = np.random.default_rng(7)
    for density in (0.0, 0.01, 0.3, 1.0):
        for row_w in (32, 64, 256):
            n = 4 * row_w + row_w  # multiple of row_w
            m = rng.random(n) < density
            words = np.zeros(n // 32, dtype=np.uint32)
            for i in np.flatnonzero(m):
                words[i // 32] |= np.uint32(1) << np.uint32(i % 32)
            for cap in (1, 4, 8):
                pos_b, cnt_b = spans.extract_rows_bitmask(
                    jnp.asarray(words), row_w=row_w, row_cap=cap
                )
                pos_f, cnt_f = spans.extract_rows_fixed(
                    jnp.asarray(m), row_w=row_w, row_cap=cap
                )
                np.testing.assert_array_equal(
                    np.asarray(pos_b), np.asarray(pos_f)
                )
                np.testing.assert_array_equal(
                    np.asarray(cnt_b), np.asarray(cnt_f)
                )


def test_literal_mask_packed_matches_bool():
    import numpy as np

    import jax.numpy as jnp

    from rejit_tpu.engine import spans
    from rejit_tpu.kernels import literal as lk

    rng = np.random.default_rng(3)
    n = 5000  # not a multiple of row_w: exercises the pad
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    for p in rng.integers(0, n - 6, size=120):
        text[p : p + 6] = np.frombuffer(b"packet", np.uint8)
    ext = jnp.asarray(lk.extend_pad(text, n, 6))
    words = lk.literal_mask_packed_device(
        ext, jnp.int32(n), lits=(b"packet",), P=n, row_w=256
    )
    mask = np.asarray(
        lk.literal_mask_device(ext, jnp.int32(n), lits=(b"packet",), P=n)
    )
    got = np.zeros(len(np.asarray(words)) * 32, dtype=bool)
    w = np.asarray(words)
    for i in range(32):
        got[i::32] = (w >> np.uint32(i)) & 1
    ref = np.zeros_like(got)
    ref[:n] = mask
    np.testing.assert_array_equal(got, ref)
    # End-to-end: packed peel == host spans (cap sized from exact counts)
    _, cnt0 = spans.extract_rows_bitmask(words, row_w=256, row_cap=1)
    cap = int(np.asarray(cnt0).max())
    pos, cnt = spans.extract_rows_bitmask(words, row_w=256, row_cap=cap)
    sp = np.asarray(pos).ravel()
    sp = sp[sp >= 0]
    np.testing.assert_array_equal(sp, np.flatnonzero(mask))


def test_extract_rows_fixed_counts_exact_past_cap():
    import numpy as np

    import jax.numpy as jnp

    from rejit_tpu.engine import spans

    mask = jnp.asarray(np.ones(64, dtype=bool))
    pos, cnt = spans.extract_rows_fixed(mask, row_w=32, row_cap=2)
    assert np.asarray(cnt).tolist() == [32, 32]  # exact beyond cap
    np.testing.assert_array_equal(np.asarray(pos), [[0, 1], [32, 33]])
