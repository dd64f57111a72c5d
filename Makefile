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

# bench-after-touch (docs/ROADMAP.md): ANY commit touching nn/, ops/,
# models/vae.py, models/unet_video.py or pipeline/pipeline.py re-runs the
# headline stage before the round ends and records the fps in ROADMAP.md.
bench-headline:
	timeout 2400 $(PY) bench.py --stage e2e 320 fp32 T32

# compile-time peak-HBM gate for the flagship programs (real TPU required):
# would have caught the round-3 RESOURCE_EXHAUSTED before it hit the driver
hbm-gate:
	timeout 1500 $(PY) scripts/hbm_gate.py

native:
	$(MAKE) -C native
