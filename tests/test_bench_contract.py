"""Regression tests for bench.py's output contract (round-2 verdict weak #1).

The driver parses bench.py's stdout as exactly one JSON line. Round 2's
capture failed because a transient tunnel outage at the first device op
produced a raw traceback and no JSON at all. These tests pin the contract:
one parseable JSON line on success AND on persistent device failure, and
bounded (not infinite) retries.
"""

import importlib.util
import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.BACKOFF_S = (0.0, 0.0)  # no real sleeps in tests
    return mod


def _run_main(bench) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    return json.loads(lines[0])


def test_persistent_outage_still_emits_one_json_line(bench, monkeypatch, capsys):
    def down():
        raise ConnectionError("UNAVAILABLE: tunnel down")

    monkeypatch.setattr(bench, "_probe_backend", down)
    out = _run_main(bench)
    assert out["metric"] == "pq_8x256_128d_encode_throughput"
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert "UNAVAILABLE" in out["error"]


def test_transient_outage_recovers(bench, monkeypatch):
    calls = {"probe": 0}

    def flaky():
        calls["probe"] += 1
        if calls["probe"] < 2:
            raise ConnectionError("UNAVAILABLE: transient")
        return "cpu"

    monkeypatch.setattr(bench, "_probe_backend", flaky)
    monkeypatch.setattr(
        bench, "measure_device", lambda: (4.5e7, 1.5e7, {"rpc_ms": 25.0})
    )
    monkeypatch.setattr(bench, "measure_cpu_baseline", lambda: 1.5e5)
    out = _run_main(bench)
    assert out["value"] == 4.5e7  # scan-chained device rate
    assert out["per_dispatch_value"] == 1.5e7  # rounds-1/2 method
    assert out["vs_baseline"] == 300.0
    assert "error" not in out


def test_retries_are_bounded(bench, monkeypatch):
    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise ConnectionError("UNAVAILABLE")

    monkeypatch.setattr(bench, "_probe_backend", always_down)
    _run_main(bench)
    assert calls["n"] == bench.RETRIES


def test_device_failure_after_probe_still_emits_json(bench, monkeypatch):
    monkeypatch.setattr(bench, "_probe_backend", lambda: "cpu")

    def die():
        raise RuntimeError("compile failed mid-measurement")

    monkeypatch.setattr(bench, "measure_device", die)
    out = _run_main(bench)
    assert out["value"] is None
    assert "compile failed" in out["error"]
