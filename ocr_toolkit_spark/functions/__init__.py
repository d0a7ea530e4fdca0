"""Vectorized (pandas/NumPy) parser kernels used inside the Arrow batch stage.

These are the Spark engine's implementations of docs/SPANS.md — written
independently from `ocr_toolkit_spark.oracle` (the per-doc ground truth) so the
golden span-equality tests compare two implementations, not one with itself.
"""
