"""Eval CLI harnesses mirroring the reference's 4 eval binaries
(reference: src/bin/eval_{bq,sq,pq,tsvq}.rs, driven by `make eval ALG=...`).

Run as modules: ``python -m vq_tpu.cli.eval_pq --sizes 1000 10000``.
"""
