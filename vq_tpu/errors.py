"""Error taxonomy for vq_tpu.

Mirrors the reference's ``VqError`` enum (reference: src/core/error.rs:5-31) as a
Python exception hierarchy. Every concrete error subclasses both ``VqError`` and
``ValueError`` so that code written against the reference's Python bindings
(which map all ``VqError`` variants to ``ValueError``, e.g. pyvq/src/pq.rs:86)
keeps working unchanged with ``except ValueError``.
"""

from __future__ import annotations


class VqError(Exception):
    """Base class for all vq_tpu errors (reference: src/core/error.rs:5)."""


class DimensionMismatch(VqError, ValueError):
    """Input dimension differs from the expected dimension.

    Reference: ``VqError::DimensionMismatch {expected, found}``
    (src/core/error.rs:8-12).
    """

    def __init__(self, expected: int, found: int):
        self.expected = int(expected)
        self.found = int(found)
        super().__init__(
            f"dimension mismatch: expected {self.expected}, found {self.found}"
        )


class EmptyInput(VqError, ValueError):
    """An operation received empty input (reference: src/core/error.rs:14-16)."""

    def __init__(self, message: str = "input must not be empty"):
        super().__init__(message)


class InvalidParameter(VqError, ValueError):
    """A parameter failed validation.

    Reference: ``VqError::InvalidParameter {parameter, reason}``
    (src/core/error.rs:18-22). The parameter name is kept introspectable
    (cf. tests/regression_tests.rs:317-328 in the reference).
    """

    def __init__(self, parameter: str, reason: str):
        self.parameter = parameter
        self.reason = reason
        super().__init__(f"invalid parameter '{parameter}': {reason}")


class InvalidData(VqError, ValueError):
    """Input data is invalid (reference: src/core/error.rs:24-26)."""

    def __init__(self, message: str):
        super().__init__(message)


class NativeLibraryError(VqError, RuntimeError):
    """The native (C++) kernel library failed to build or load.

    Analog of ``VqError::FfiError`` (src/core/error.rs:28-30) for the C++
    parity-kernel library that replaces the reference's hsdlib C FFI.
    """

    def __init__(self, message: str):
        super().__init__(message)
