# regenie-tpu top-level targets (reference analog: /root/reference/Makefile)

.PHONY: all native test bench clean

all: native

# OpenMP decode/render library (auto-built on first use too —
# regenie_tpu/io/native.py)
native:
	$(MAKE) -C native

# full suite on the CPU x64 backend + virtual 8-device mesh
test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
