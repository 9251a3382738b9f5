# Developer entry points (see README "Tests").

.PHONY: test-fast test native bench

# Fast lane: unit + oracle tests only. Compile-bound (~23 CPU-min of XLA
# compiles, cold): measured 12m07s on a 2-core host with 2 workers; ~4 min
# on a 4-core laptop. Repeat runs hit the persistent compile cache.
test-fast:
	python -m pytest tests/ -q -m "not slow" -n 2 --dist loadscope

# Full suite, including full-solve / multi-host / HBM-guard tests (~40 min).
test:
	python -m pytest tests/ -q -n 2 --dist loadscope

native:
	$(MAKE) -C native

bench:
	python bench.py
