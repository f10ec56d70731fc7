"""Standard ANN-benchmark dataset readers (fvecs / bvecs / ivecs).

The texmex format used by SIFT-1M / GIST-1M (BASELINE.json configs 2-4):
every row is a little-endian ``int32`` dimension ``d`` followed by ``d``
values — ``float32`` (``.fvecs``), ``uint8`` (``.bvecs``), or ``int32``
(``.ivecs``, the ground-truth neighbor-id files). All rows in a file share
one ``d``; readers validate that and fail loudly on corruption.

The reference repo names these datasets but ships only a stale download
target pointing at a script that does not exist
(reference Makefile:157-160, tests/testdata absent) — so this loader is
strictly ahead of it: the eval CLIs (``--data sift1m.fvecs``) and
``benchmarks/parity.py`` run the named configs the moment the files exist,
and every artifact row carries an explicit ``data`` tag ("synthetic" or
the file's basename) either way.

Reads are bounded (``max_rows``) and avoid loading the tail of huge files:
``np.fromfile`` with an element count, then a strided reinterpret — no
per-row Python loop.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from vq_tpu.errors import InvalidData, InvalidParameter

__all__ = ["read_fvecs", "read_bvecs", "read_ivecs", "load_dataset"]


def _read_vecs(
    path: str,
    value_dtype: np.dtype,
    max_rows: Optional[int],
) -> np.ndarray:
    """Shared texmex reader: ``[int32 d][d x value_dtype]`` per row."""
    value_dtype = np.dtype(value_dtype)
    if max_rows is not None and int(max_rows) < 1:
        raise InvalidParameter("max_rows", "must be >= 1")
    size = os.path.getsize(path)
    if size < 4:
        raise InvalidData(f"{path}: too short for a texmex header")
    with open(path, "rb") as f:
        d = int(np.fromfile(f, dtype="<i4", count=1)[0])
        if d <= 0 or 4 + d * value_dtype.itemsize > size:
            raise InvalidData(
                f"{path}: implausible leading dimension {d} for file "
                f"size {size}"
            )
        row_bytes = 4 + d * value_dtype.itemsize
        if size % row_bytes != 0:
            raise InvalidData(
                f"{path}: size {size} is not a multiple of the row "
                f"stride {row_bytes} (d={d}) — truncated or not a "
                f"{value_dtype.name} texmex file"
            )
        n = size // row_bytes
        if max_rows is not None:
            n = min(n, int(max_rows))
        f.seek(0)
        raw = np.fromfile(f, dtype=np.uint8, count=n * row_bytes)
    rows = raw.reshape(n, row_bytes)
    dims = rows[:, :4].copy().view("<i4").reshape(n)
    if not (dims == d).all():
        bad = int(np.argmax(dims != d))
        raise InvalidData(
            f"{path}: row {bad} declares dimension {int(dims[bad])}, "
            f"expected {d}"
        )
    vals = rows[:, 4:].copy().view(value_dtype.newbyteorder("<"))
    return np.ascontiguousarray(vals.astype(value_dtype)).reshape(n, d)


def read_fvecs(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    """Read an ``.fvecs`` file -> ``[n, d] float32`` (SIFT/GIST corpora)."""
    return _read_vecs(path, np.float32, max_rows)


def read_bvecs(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    """Read a ``.bvecs`` file -> ``[n, d] uint8`` (SIFT1B-style corpora)."""
    return _read_vecs(path, np.uint8, max_rows)


def read_ivecs(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    """Read an ``.ivecs`` file -> ``[n, d] int32`` (ground-truth ids)."""
    return _read_vecs(path, np.int32, max_rows)


def load_dataset(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    """Dispatch on extension; ``.bvecs`` rows are upcast to float32 (the
    standard treatment — SIFT1B codebooks train in float)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".fvecs":
        return read_fvecs(path, max_rows)
    if ext == ".bvecs":
        return read_bvecs(path, max_rows).astype(np.float32)
    if ext == ".ivecs":
        return read_ivecs(path, max_rows)
    raise InvalidParameter(
        "path", f"unknown dataset extension {ext!r} "
        "(expected .fvecs, .bvecs, or .ivecs)"
    )
