# Dev harness (the analog of the reference's Makefile, reference Makefile:42-221).

PY ?= python

.PHONY: test test-fast lint bench eval eval-all demo docs clean

test:            ## full suite: unit/property/regression/integration/sharded
	$(PY) -m pytest tests/ -q

test-fast:       ## skip the slower property sweeps
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_properties.py

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

clean:
	rm -rf vq_tpu/native/_cache .pytest_cache .hypothesis
	find . -name __pycache__ -type d -exec rm -rf {} +
