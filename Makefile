# Developer entry points (see README "Tests").

.PHONY: test-fast test native bench

# Fast lane: unit + oracle tests only (<5 min on a laptop-class CPU).
test-fast:
	python -m pytest tests/ -q -m "not slow"

# Full suite, including full-solve / multi-host / HBM-guard tests (~30 min).
test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py
