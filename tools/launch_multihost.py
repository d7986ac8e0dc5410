#!/usr/bin/env python
"""Multi-host launch helper (SURVEY.md §2.4; BASELINE config 5 at N hosts).

Each host runs the SAME program; only env differs:

  JAX_COORDINATOR_ADDRESS=host0:8082   # one of the relay ports
  JAX_NUM_PROCESSES=N
  JAX_PROCESS_ID=<0..N-1>
  python tools/launch_multihost.py --pattern 'foo' --file corpus.bin

rejit_tpu.runtime.init.initialize() picks these up, jax.distributed forms
the slice, and the data mesh spans all chips on all hosts; the sharded
engine code is unchanged (dist/sharded.py). On this rig only one host/chip
is reachable, so this doubles as the single-host entry point.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pattern", required=True)
    ap.add_argument("--file", required=True)
    ap.add_argument("--block", type=int, default=32)
    args = ap.parse_args()

    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.dist.mesh import make_mesh
    from rejit_tpu.dist.sharded import sharded_l_arrays
    from rejit_tpu.engine import select
    from rejit_tpu.runtime import init as rt

    rt.initialize()
    rt.enable_compilation_cache()
    print(rt.device_summary(), file=sys.stderr)

    data = np.fromfile(args.file, dtype=np.uint8)
    tables = compile_patterns([rparser.parse(args.pattern)])
    mesh = make_mesh()
    L, I = sharded_l_arrays(tables, data, mesh, block=args.block)
    pos = np.flatnonzero(L >= 0).astype(np.int64)
    starts, ends, _ = select.match_all_candidates(pos, L[pos], I[pos])
    import jax

    if jax.process_index() == 0:
        print(f"{len(starts)} matches")
        for s, e in list(zip(starts.tolist(), ends.tolist()))[:20]:
            print(s, e)


if __name__ == "__main__":
    main()
