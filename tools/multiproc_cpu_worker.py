#!/usr/bin/env python
"""Worker for the REAL 2-process jax.distributed bring-up test.

Round-4 VERDICT missing #3: everything distributed had only ever run as a
single process with an 8-device CPU mesh — process-group formation, the
DCN-path collectives, and per-process sharding were untested code. This
worker runs under `tests/distributed/test_multiprocess.py` (or by hand):

  JAX_COORDINATOR_ADDRESS=localhost:<port> JAX_NUM_PROCESSES=2 \
  JAX_PROCESS_ID=<0|1> python tools/multiproc_cpu_worker.py

Each process exposes 4 virtual CPU devices; the global "data" mesh spans
8. It verifies, ACROSS THE PROCESS BOUNDARY:
  * jax.distributed group formation (process_count == 2);
  * the sharded literal count (ppermute halo + psum) with needles placed
    on every shard edge, incl. the edge between the two processes;
  * the sharded DFA engine (all_gather shard summaries + exact suffix
    splice) against the oracle, with a match straddling the process
    boundary.
Prints "MULTIPROC OK <pid>" on success; any assertion kills the run.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The machine sitecustomize force-prepends the axon TPU plugin; this test
# is about the process group, not the chip — pin CPU (CLAUDE.md gotcha).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    from rejit_tpu.runtime import init as rt

    rt.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec
    from jax.experimental import multihost_utils

    from rejit_tpu import oracle
    from rejit_tpu.compile import parser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.dist import literal as dlit
    from rejit_tpu.dist.mesh import make_mesh
    from rejit_tpu.dist.sharded import sharded_l_arrays_device
    from rejit_tpu.engine import pipeline

    mesh = make_mesh()
    sharding = NamedSharding(mesh, PartitionSpec("data"))

    # --- sharded literal count: needles on every shard edge -------------
    D = 8
    shard = 64
    text = bytearray(b"." * (D * shard))
    for k in range(1, D):          # shard k-1 / k edges, incl. the
        off = k * shard            # process boundary at k = 4
        text[off - 3 : off + 3] = b"needle"
    text[:6] = b"needle"
    n = len(text)
    pad = np.frombuffer(bytes(text), np.uint8)

    garr = jax.make_array_from_callback(
        (n,), sharding, lambda idx: pad[idx]
    )
    cnt = int(
        dlit.sharded_literal_count_device(
            garr, jnp.int32(n), mesh=mesh, lits=(b"needle",),
            axis="data", num_shards=D,
        )
    )
    want = oracle.OraclePattern(rb"needle").match_all_count(bytes(text))
    assert cnt == want == 8, (cnt, want)

    # --- sharded DFA engine: run straddling the process boundary --------
    pat = rb"[a-z]+"
    block = 8
    t2 = bytearray(b"." * (D * shard))
    mid = 4 * shard                # exactly the process-0/1 boundary
    t2[mid - 17 : mid + 23] = b"q" * 40
    t2[5:9] = b"abcd"
    n2 = len(t2) - 8               # real n below padded P, P > n
    tables = compile_patterns([parser.parse(pat)])
    ct = pipeline.device_tables(tables)
    pad2 = np.frombuffer(bytes(t2), np.uint8)
    garr2 = jax.make_array_from_callback(
        (len(t2),), sharding, lambda idx: pad2[idx]
    )
    L, I = sharded_l_arrays_device(
        ct, garr2, jnp.int32(n2), mesh=mesh, block=block,
        num_shards=D,
    )
    Lh = multihost_utils.process_allgather(L, tiled=True)
    orc = oracle.OraclePattern(pat)
    want_L = np.full(n2 + 1, -1, np.int64)
    for s in range(n2 + 1):
        e, _ = orc.longest_end(bytes(t2)[:n2], s)
        if e is not None:
            want_L[s] = e
    got = np.asarray(Lh)[: n2 + 1]
    assert np.array_equal(got, want_L), (
        np.flatnonzero(got != want_L)[:10]
    )

    print(f"MULTIPROC OK {jax.process_index()} "
          f"(procs={jax.process_count()}, devices={len(jax.devices())}, "
          f"literal_count={cnt}, dfa_boundaries={n2 + 1})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
