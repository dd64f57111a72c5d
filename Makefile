# CI entry points (SURVEY §5.2: the reference ships no tests or CI; the
# rebuild's own gates live here and in .github/workflows/ci.yml).

PY ?= python

.PHONY: ci test test-slow nan-check multichip bench native

ci: test nan-check multichip

# fast suite (slow-marked full-size structural tests excluded by pytest.ini)
test:
	$(PY) -m pytest tests/ -q

# weekly: full-size structural + full-graph torch-parity tests
test-slow:
	$(PY) -m pytest tests/ -q -m slow

# jax_debug_nans smoke job: run the tiny end-to-end pipeline with NaN
# trapping enabled — any NaN produced anywhere under jit raises immediately
nan-check:
	$(PY) scripts/nan_smoke.py

# the driver-equivalent multi-chip dryrun (8-device virtual CPU mesh)
multichip:
	$(PY) __graft_entry__.py 8

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native
