"""Runtime bootstrap tests (single-process paths)."""
from rejit_tpu.runtime import init as rt


def test_initialize_single_process_noop():
    rt.initialize()  # no coordinator env => no-op
    rt.initialize()  # idempotent


def test_device_summary():
    s = rt.device_summary()
    assert "device" in s and "process" in s


def test_enable_compilation_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("REJIT_TPU_JAX_CACHE", str(tmp_path / "jc"))
    rt.enable_compilation_cache()
    import jax

    # Partitioned by host CPU fingerprint (stale-host XLA:CPU AOT
    # entries must be unreachable — see runtime/init._host_cpu_tag).
    got = jax.config.jax_compilation_cache_dir
    assert got == str(tmp_path / "jc" / rt._host_cpu_tag())
    import os

    assert os.path.isdir(got)
