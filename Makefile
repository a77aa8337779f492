# Developer entry points (the reference's GNUmakefile role).

.PHONY: test bench native run run-cornell clean

native:
	$(MAKE) -C pathtrace_tpu/native

test:
	python -m pytest tests/ -x -q

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
