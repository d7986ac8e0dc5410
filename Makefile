# Convenience targets (build system parity: reference used SCons — SURVEY.md §2.1/C9)
.PHONY: test native bench bench-matrix conformance verify-tpu clean

# On-TPU parity gate: fused/schain/pipeline bit-equality + conformance
# subset on the real chip. Run before every bench round (VERDICT r1 #7).
verify-tpu:
	python tools/verify_tpu.py

# Same gate with the rolled (fori_loop, large-Q) kernel form in stage A.
verify-tpu-rolled:
	python tools/verify_tpu.py --rolled

test:
	python -m pytest tests/ -x -q

native:
	python -m rejit_tpu.native.build

bench:
	python bench.py

bench-matrix:
	python bench/harness.py --configs 1,2,3,4,5

conformance:
	python tools/gen_conformance.py && python -m pytest tests/conformance -q

clean:
	rm -rf rejit_tpu/native/*.so .pytest_cache $(find . -name __pycache__)
