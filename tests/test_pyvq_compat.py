"""pyvq drop-in compatibility: the reference bindings' contract.

Exercises the shim the way the reference's Python tests exercise pyvq
(reference pyvq/tests/): dtype contracts (u8 / f16 / f32 numpy outputs),
one-vector-at-a-time calls, defaults, reprs, and ValueError on bad input —
reference-API code must run unchanged.
"""

import numpy as np
import pytest

import pyvq


def test_module_surface():
    for name in (
        "BinaryQuantizer",
        "ScalarQuantizer",
        "ProductQuantizer",
        "TSVQ",
        "Distance",
        "get_simd_backend",
    ):
        assert hasattr(pyvq, name)
    assert isinstance(pyvq.get_simd_backend(), str)


def test_bq_contract():
    q = pyvq.BinaryQuantizer(0.5)
    x = np.array([0.1, 0.9, 0.5], dtype=np.float32)
    codes = q.quantize(x)
    assert isinstance(codes, np.ndarray) and codes.dtype == np.uint8
    np.testing.assert_array_equal(codes, [0, 1, 1])
    recon = q.dequantize(codes)
    assert recon.dtype == np.float32
    assert (q.threshold, q.low, q.high) == (0.5, 0, 1)
    assert "BinaryQuantizer" in repr(q)
    with pytest.raises(ValueError):
        pyvq.BinaryQuantizer(0.5, low=5, high=5)


def test_sq_contract():
    q = pyvq.ScalarQuantizer(0.0, 1.0)
    assert q.levels == 256
    assert q.step == pytest.approx(1.0 / 255)
    x = np.array([0.0, 0.5, 1.0], dtype=np.float32)
    codes = q.quantize(x)
    assert codes.dtype == np.uint8
    # 0.5 / float32(1/255) = 127.49998...: rounds to 127 — the identical f32
    # expression the reference evaluates (src/sq.rs:94,123-127).
    np.testing.assert_array_equal(codes, [0, 127, 255])
    assert q.dequantize(codes).dtype == np.float32
    with pytest.raises(ValueError):
        pyvq.ScalarQuantizer(1.0, 0.0)


def test_pq_contract(rng):
    data = rng.random((200, 16), dtype=np.float32)
    q = pyvq.ProductQuantizer(data, 4, 8)  # defaults: iters=10, seed=42
    assert (q.num_subspaces, q.sub_dim, q.dim) == (4, 4, 16)
    v = data[0]
    f16 = q.quantize(v)  # one vector, like the reference API
    assert isinstance(f16, np.ndarray) and f16.dtype == np.float16
    assert f16.shape == (16,)
    back = q.dequantize(f16)
    assert back.dtype == np.float32
    with pytest.raises(ValueError):
        pyvq.ProductQuantizer(data, 5, 8)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        q.quantize(np.zeros(12, dtype=np.float32))


def test_tsvq_contract(rng):
    data = rng.random((100, 8), dtype=np.float32)
    q = pyvq.TSVQ(data, max_depth=3)
    assert q.dim == 8
    f16 = q.quantize(data[0])
    assert f16.dtype == np.float16 and f16.shape == (8,)
    assert q.dequantize(f16).dtype == np.float32


def test_distance_contract():
    a = np.array([1.0, 2.0], dtype=np.float32)
    b = np.array([3.0, 4.0], dtype=np.float32)
    d = pyvq.Distance.euclidean()
    assert d.compute(a, b) == pytest.approx(2.8284271)
    assert pyvq.Distance("manhattan").compute(a, b) == pytest.approx(4.0)
    with pytest.raises(ValueError):
        pyvq.Distance("nonsense")
    with pytest.raises(ValueError):
        d.compute(a, np.zeros(3, dtype=np.float32))


def test_reference_doc_example(rng):
    # The reference README's PQ usage, verbatim shape-wise.
    training = rng.random((1000, 128)).astype(np.float32)
    pq = pyvq.ProductQuantizer(training, num_subspaces=8, num_centroids=256)
    vec = training[0]
    quantized = pq.quantize(vec)
    restored = pq.dequantize(quantized)
    rmse = float(np.sqrt(np.mean((vec - restored) ** 2)))
    assert rmse < 0.3


def test_empty_vectors_pass_through():
    # reference pyvq/tests/test_regressions.py:246-257
    bq = pyvq.BinaryQuantizer(0.0)
    sq = pyvq.ScalarQuantizer(0.0, 1.0)
    empty = np.array([], dtype=np.float32)
    assert len(bq.quantize(empty)) == 0
    assert len(sq.quantize(empty)) == 0


def test_empty_training_rejected():
    # reference pyvq/tests/test_regressions.py:260-274
    empty = np.zeros((0, 4), dtype=np.float32)
    with pytest.raises(ValueError):
        pyvq.ProductQuantizer(empty, 2, 4)
    with pytest.raises(ValueError):
        pyvq.TSVQ(empty, max_depth=3)


def test_extreme_values():
    # reference pyvq/tests/test_regressions.py:283-303
    bq = pyvq.BinaryQuantizer(0.0)
    out = bq.quantize(np.array([1e10, -1e10, 1e-10, -1e-10], np.float32))
    assert set(np.unique(out)).issubset({0, 1})
    sq = pyvq.ScalarQuantizer(-1.0, 1.0)
    out = sq.quantize(np.array([1e10, -1e10, 1.5, -1.5], np.float32))
    np.testing.assert_array_equal(out, [255, 0, 255, 0])


def test_float64_input_accepted():
    # reference pyvq/tests/test_regressions.py:322-339 — f64 either works or
    # raises a clear type error; our shim converts.
    bq = pyvq.BinaryQuantizer(0.0)
    out = bq.quantize(np.array([0.5, -0.3, 0.8], dtype=np.float64))
    np.testing.assert_array_equal(out, [1, 0, 1])


def test_stub_matches_runtime_surface():
    """The .pyi stub (reference analog: pyvq/pyvq.pyi) must not drift from
    the shim: every stubbed class/function/method/property exists at runtime,
    and every public runtime name is stubbed."""
    import ast
    import inspect
    import pathlib

    import pyvq

    stub_path = pathlib.Path(pyvq.__file__).with_suffix(".pyi")
    tree = ast.parse(stub_path.read_text())

    stub_names = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            stub_names.add(node.name)
            cls = getattr(pyvq, node.name, None)
            assert cls is not None, f"stubbed class {node.name} missing"
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and not item.name.startswith("__"):
                    assert hasattr(cls, item.name), (
                        f"{node.name}.{item.name} stubbed but missing at runtime"
                    )
                    # Plain methods: parameter names must agree. Skip
                    # properties/staticmethods/slot descriptors.
                    decorators = {
                        d.id for d in item.decorator_list
                        if isinstance(d, ast.Name)
                    }
                    runtime = inspect.getattr_static(cls, item.name)
                    if not decorators and inspect.isfunction(runtime):
                        stub_params = [a.arg for a in item.args.args]
                        run_params = list(
                            inspect.signature(runtime).parameters
                        )
                        assert stub_params == run_params, (
                            f"{node.name}.{item.name}: stub {stub_params} "
                            f"!= runtime {run_params}"
                        )
        elif isinstance(node, ast.FunctionDef):
            stub_names.add(node.name)
            assert hasattr(pyvq, node.name)

    for name in pyvq.__all__:
        assert name in stub_names, f"public name {name!r} not in stub"
