


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
