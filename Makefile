# Build the native host-side corpus ops and run the test suite
# (counterpart of the reference's Makefile: build_ext + nosetests).

.PHONY: all native test bench parity clean

# Round number for the kernel-parity artifact (override: make parity R=06).
R ?= 05

all: native

native:
	$(MAKE) -C segmentalist_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

# Hardware kernel-parity run (real TPU required); writes the per-round
# machine-readable artifact next to the bench JSONs.
parity:
	python benchmarks/kernel_parity_tpu.py --out PARITY_r$(R).json

clean:
	$(MAKE) -C segmentalist_tpu/native clean 2>/dev/null || true
	rm -rf build dist *.egg-info
