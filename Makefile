# Developer entry points (see README "Tests").

.PHONY: test-fast test native bench

# Fast lane: unit + oracle tests only. Two workers (loadscope keeps
# module-scoped solver fixtures on one worker); ~7 min on a 2-core host.
test-fast:
	python -m pytest tests/ -q -m "not slow" -n 2 --dist loadscope

# Full suite, including full-solve / multi-host / HBM-guard tests (~40 min).
test:
	python -m pytest tests/ -q -n 2 --dist loadscope

native:
	$(MAKE) -C native

bench:
	python bench.py
