# Build the native host-side corpus ops and run the test suite
# (counterpart of the reference's Makefile: build_ext + nosetests).

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C segmentalist_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C segmentalist_tpu/native clean 2>/dev/null || true
	rm -rf build dist *.egg-info
