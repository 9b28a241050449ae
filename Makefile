# Convenience targets. PYTHONPATH must keep the environment's existing
# entries (the TPU backend bootstrap lives there).

PY := PYTHONPATH=$(CURDIR):$$PYTHONPATH python

.PHONY: test test-fast bench native demo clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py

native:
	g++ -O3 -march=native -shared -fPIC -o native/libtileio.so native/tileio.cpp -lpthread

demo:  ## synthetic end-to-end pipeline into /tmp/tempo_demo (needs DATA_DIR for --overwrite)
	$(PY) -c "from pathlib import Path; from tempo_tpu.data.synthetic import make_granule_corpus; \
	make_granule_corpus(Path('/tmp/tempo_demo/data'), n_granules=6, n_mirror=72, n_track=80, \
	n_spectral=32, l2_products=['NO2','O3TOT','HCHO','CLDO4'], seed=7)"
	@echo "granules in /tmp/tempo_demo/data — see tests/test_e2e.py for the full recipe"

clean:
	rm -rf native/libtileio.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
