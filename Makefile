# Developer entry points (the reference's GNUmakefile role).

.PHONY: test test-full bench native run run-cornell clean

native:
	$(MAKE) -C pathtrace_tpu/native

# fast tier (<5 min): parser/oracle/math/gradient regressions.
# `-m "not slow"` skips the interpret-mode kernel, AOT-compile and
# example-smoke tests (conftest auto-marks the heavy modules).
test:
	python -m pytest tests/ -x -q -m "not slow"

# everything — what CI and the driver run
test-full:
	python -m pytest tests/ -q

bench:
	python bench.py

# smoke run, mirroring `make run` -> cis565_path_tracer scenes/sphere.txt
run:
	python -m pathtrace_tpu.cli scenes/sphere.txt --spp 64 --res 256 256

run-cornell:
	python -m pathtrace_tpu.cli scenes/cornell.txt --spp 500 --stats

clean:
	$(MAKE) -C pathtrace_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
