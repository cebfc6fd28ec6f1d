"""Pure-Python/pandas per-document kernels.

These functions run *inside* the engine's vectorized pandas UDFs (one
Arrow batch of pages / one grouped document at a time). They carry the
reference's documented cell-level semantics (cited per function) but are
written for batch execution — no Spark imports here so they are unit-
testable standalone and importable by the test oracle's fixtures.
"""
