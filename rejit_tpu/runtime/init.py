"""Runtime bootstrap: device/mesh init for single- and multi-host runs.

Layer N0 of the new framework (SURVEY.md §1): the reference has no runtime
layer at all (single-threaded library); here we wrap jax.distributed
initialization so multi-host corpus sharding (BASELINE.json:5) is a config
change, not a code change (SURVEY.md §7.2.6).

Failure handling (SURVEY.md §5.3): fail-fast — jax.distributed's default.
Match jobs are stateless, so recovery is shard-level retry at the driver
(tools/jrep.py / bench harness re-run a failed file/shard); there is no
training-style elastic state to restore. Checkpointing of *compiled
patterns* is rejit_tpu/engine/cache.py.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def _host_cpu_tag() -> str:
    """Short fingerprint of the host's CPU feature flags. XLA:CPU AOT
    cache entries target the COMPILE host's features, and the jax cache
    key does not include them — loading an entry produced on a different
    host generation logs 'could lead to execution errors such as SIGILL'
    (cpu_aot_loader.cc; observed round 4 after a host migration).
    Partitioning the cache dir by this tag makes stale-host entries
    unreachable. TPU executables are compiled server-side, so for them
    this only costs a one-time recompile after a migration."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nohost"


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (compiles survive process
    restarts — important on shared/tunneled TPU frontends where the compile
    service has time-varying latency)."""
    path = path or os.environ.get(
        "REJIT_TPU_JAX_CACHE", os.path.expanduser("~/.cache/jax_comp")
    )
    path = os.path.join(path, _host_cpu_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host.

    No-ops for single-process runs (the common single-host case) and when
    already initialized. Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID), so
    launchers only set the environment.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or num_processes in (None, 1):
        _INITIALIZED = True  # single process: nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def device_summary() -> str:
    devs = jax.devices()
    kinds = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    kindstr = ", ".join(f"{v}x {k}" for k, v in kinds.items())
    return (
        f"{jax.process_count()} process(es), {len(devs)} device(s): {kindstr}"
    )
