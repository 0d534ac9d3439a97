"""Rollup / downsample / retention engine."""
