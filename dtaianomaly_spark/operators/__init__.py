"""Spark operator layer: DataFrame transforms mirroring the reference's
preprocessors, thresholders, evaluation metrics and windowing ops.

Every operator here is pure DataFrame/SQL (Catalyst-optimizable); Arrow
kernels are used only where semantics are inherently sequential (EMA) or
array-local (per-series model scoring). Float columns derive from exact
integer partials with shared formulas so a DuckDB oracle reproduces them
bit-for-bit (see rollup/tiers.py docstring for the discipline).
"""
