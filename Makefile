# Top-level convenience targets (role of the reference's snappy/Makefile).

.PHONY: all native test test-full test-corpus bench warm-cache clean

all: native

native:
	$(MAKE) -C pim_compression_tpu/native

# Fast tier (measured 9:39 quiet on this 4-core VM): every engine's
# correctness gates + one pallas parity test per kernel family. The
# reference's `make test` is a seconds-scale cmp harness
# (snappy/Makefile:44-60); our full matrix of interpret-mode
# kernel-parity tests runs ~33-38 min, so it lives in `test-full`
# (tiering: tests/conftest.py SLOW_TESTS).
test: native
	python -m pytest tests/ -x -q -m "not slow"

test-full: native
	python -m pytest tests/ -x -q

# Golden-file corpus check via the CLI, mirroring the reference's
# `make test` cmp harness (snappy/Makefile:44-60).
test-corpus: native
	@tmp=$$(mktemp -d); \
	for f in /root/reference/test/*.snappy; do \
	  n=$$(basename $$f .snappy); \
	  python -m pim_compression_tpu.cli -i $$f -o $$tmp/$$n.out || exit 1; \
	  if [ -f /root/reference/test/$$n.txt ]; then \
	    cmp $$tmp/$$n.out /root/reference/test/$$n.txt && echo "OK $$n" || exit 1; \
	  fi; \
	done; rm -rf $$tmp

# Same harness through the pallas TPU engine on the real device, single
# process (one remote compile, reused across files). With COMPRESS=1 the
# re-compressed streams must be oracle-valid and <= the reference sizes.
test-corpus-pallas: native
	python scripts/corpus_check.py --engine pallas $(if $(COMPRESS),--compress)

bench: native
	python bench.py

# Populate the persistent JAX compilation cache (JAX_COMPILATION_CACHE_DIR,
# default /root/.cache/jax) with the flagship encode+decode programs at the
# bench geometry, so subsequent `make bench` / CLI runs skip the Mosaic
# compile (~60 s at 32 K first run, ~0 when warm — tpu_validation.json).
warm-cache: native
	PIM_BENCH_ITERS=1 python bench.py

clean:
	$(MAKE) -C pim_compression_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
