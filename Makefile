# Dev harness (the analog of the reference's Makefile, reference Makefile:42-221).

PY ?= python

.PHONY: test test-fast test-doc test-docs coverage lint bench eval eval-all demo docs wheel clean

test:            ## full suite: unit/property/regression/integration/sharded/docs
	$(PY) -m pytest tests/ -q

test-fast:       ## skip the slower property sweeps
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_properties.py

test-doc:        ## run docstring examples (the `cargo test --doc` analog, ref Makefile:48-51)
	$(PY) -m pytest tests/test_doctests.py -q

test-docs:       ## execute every docs/README python block (rundoc analog, ref Makefile:203-221)
	$(PY) -m pytest tests/test_docs.py -q

coverage:        ## line coverage (reference `make coverage`, ref Makefile:53-56)
	@$(PY) -c "import pytest_cov" 2>/dev/null \
	  || { echo "pytest-cov not installed (CI runs it; pip install pytest-cov)"; exit 1; }
	$(PY) -m pytest tests/ -q --cov=vq_tpu --cov=pyvq --cov-report=term-missing

lint:            ## ruff if available, else stdlib syntax/tab checks (ref Makefile:115-123)
	@if command -v ruff >/dev/null 2>&1; then \
	  ruff check vq_tpu pyvq tests examples benchmarks; \
	else \
	  echo "ruff not installed; falling back to compileall + tabnanny"; \
	  $(PY) -m compileall -q vq_tpu pyvq tests examples benchmarks && \
	  $(PY) -m tabnanny vq_tpu pyvq tests examples benchmarks; \
	fi

bench:           ## headline JSON metric (PQ 8x256 encode throughput)
	$(PY) bench.py

ALG ?= pq
eval:            ## reference-style eval harness: make eval ALG=pq
	$(PY) -m vq_tpu.cli.eval_$(ALG)

eval-all:        ## all four algorithms (reference Makefile:149-155)
	$(PY) -m vq_tpu.cli.eval_bq
	$(PY) -m vq_tpu.cli.eval_sq
	$(PY) -m vq_tpu.cli.eval_pq
	$(PY) -m vq_tpu.cli.eval_tsvq

demo:            ## image-quantization demo on a synthetic image
	$(PY) examples/image_quantization_demo.py

wheel:           ## build sdist + wheel (the reference `make wheel` analog)
	$(PY) -m build --no-isolation --outdir dist/

docs: test-docs  ## alias: validated docs are the docs build

clean:
	rm -rf vq_tpu/native/_cache .pytest_cache .hypothesis
	find . -name __pycache__ -type d -exec rm -rf {} +
