"""Doctest tier: run every ``>>>`` example in the library docstrings.

The analog of the reference's ``cargo test --doc`` (reference
Makefile:48-51 runs each doc-comment example). Examples live in the
public docstrings (package root, the four quantizers, Distance, lloyd,
FlatIndex, index_factory, Kmeans, ...); this walks every ``vq_tpu`` and
``pyvq`` module and executes them under the suite's CPU-mesh conftest.
"""

import doctest
import importlib
import pkgutil

import pytest

import pyvq
import vq_tpu


def _iter_module_names():
    yield "vq_tpu"
    yield "pyvq"
    for info in pkgutil.walk_packages(vq_tpu.__path__, "vq_tpu."):
        yield info.name


MODULES = sorted(set(_iter_module_names()))


@pytest.mark.parametrize("name", MODULES)
def test_module_doctests(name):
    mod = importlib.import_module(name)
    results = doctest.testmod(
        mod, verbose=False, optionflags=doctest.NORMALIZE_WHITESPACE
    )
    assert results.failed == 0, f"{results.failed} doctest(s) failed in {name}"


def test_doctest_tier_not_vacuous():
    """The tier must actually execute examples — if every ``>>>`` were
    ever stripped from the docstrings, this trips instead of the suite
    silently passing an empty tier."""
    attempted = 0
    for name in MODULES:
        mod = importlib.import_module(name)
        finder = doctest.DocTestFinder(exclude_empty=True)
        attempted += sum(len(t.examples) for t in finder.find(mod))
    assert attempted >= 30, f"only {attempted} doctest examples found"
