"""Per-window statistics kernels for the rollup tiers.

A rollup "point" is the stats struct
``(count, sum, sumsq, min, max, first, last)`` over one window/bucket of a
token sequence. Sums are exact int64 over int32 tokens (|token| <= ~2^20,
bucket <= 3600 points => sumsq < 2^53 << int64), so higher tiers compose
from lower-tier partials *exactly* — the partial+final pattern that makes
the 1h tier byte-match a direct aggregation over raw tokens.

Derived floats (mean, population std) are computed from the exact integer
partials with one formula shared by every tier and by the SQL oracle:
``mean = sum / count``; ``var_pop = sumsq / count - mean**2`` (clamped at 0).

The windowed-stat semantics mirror the reference's per-window aggregates
(sliding-window detectors consume exactly these stats — e.g. SUSS local
stats at windowing_utils.py:340-346 and MedianMethod's neighborhood
mean/std at MedianMethod.py:99-106).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

STAT_FIELDS = ("count", "sum", "sumsq", "min", "max", "first", "last")


def bucket_stats(values: np.ndarray, bucket_ids: np.ndarray, n_buckets: int) -> Dict[str, np.ndarray]:
    """Exact integer partials per bucket. ``bucket_ids`` must be sorted
    ascending (positions are naturally ordered); empty buckets get
    count=0 and are the gap-fill targets."""
    v = np.asarray(values, dtype=np.int64)
    b = np.asarray(bucket_ids, dtype=np.int64)
    cnt = np.bincount(b, minlength=n_buckets).astype(np.int64)
    s = np.bincount(b, weights=v, minlength=n_buckets).astype(np.int64)
    sq = np.bincount(b, weights=v * v, minlength=n_buckets).astype(np.int64)

    mn = np.full(n_buckets, np.iinfo(np.int64).max, dtype=np.int64)
    mx = np.full(n_buckets, np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(mn, b, v)
    np.maximum.at(mx, b, v)

    first = np.zeros(n_buckets, dtype=np.int64)
    last = np.zeros(n_buckets, dtype=np.int64)
    # sorted bucket_ids: boundaries give first/last directly
    if v.shape[0]:
        starts = np.searchsorted(b, np.arange(n_buckets), side="left")
        ends = np.searchsorted(b, np.arange(n_buckets), side="right")
        nonempty = ends > starts
        first[nonempty] = v[starts[nonempty]]
        last[nonempty] = v[ends[nonempty] - 1]
    empty = cnt == 0
    mn[empty] = 0
    mx[empty] = 0
    return {
        "count": cnt, "sum": s, "sumsq": sq,
        "min": mn, "max": mx, "first": first, "last": last,
    }


def tumbling_stats(values: np.ndarray, bucket_size: int) -> Dict[str, np.ndarray]:
    """Stats over tumbling buckets of ``bucket_size`` positions (the raw
    tier: every position belongs to bucket ``pos // bucket_size``)."""
    v = np.asarray(values, dtype=np.int64)
    n = v.shape[0]
    n_buckets = -(n // -bucket_size) if n else 0
    ids = np.arange(n, dtype=np.int64) // bucket_size
    return bucket_stats(v, ids, n_buckets)


def merge_stats(parts: Dict[str, np.ndarray], group_ids: np.ndarray, n_groups: int) -> Dict[str, np.ndarray]:
    """Compose lower-tier partials into a higher tier (1m -> 1h). Exact:
    integer sums re-sum, min/max re-extreme, first/last by bucket order
    (``group_ids`` sorted ascending)."""
    g = np.asarray(group_ids, dtype=np.int64)
    cnt = np.bincount(g, weights=parts["count"], minlength=n_groups).astype(np.int64)
    s = np.bincount(g, weights=parts["sum"], minlength=n_groups).astype(np.int64)
    sq = np.bincount(g, weights=parts["sumsq"], minlength=n_groups).astype(np.int64)

    nonempty_src = parts["count"] > 0
    mn = np.full(n_groups, np.iinfo(np.int64).max, dtype=np.int64)
    mx = np.full(n_groups, np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(mn, g[nonempty_src], parts["min"][nonempty_src])
    np.maximum.at(mx, g[nonempty_src], parts["max"][nonempty_src])

    first = np.zeros(n_groups, dtype=np.int64)
    last = np.zeros(n_groups, dtype=np.int64)
    idx_ne = np.flatnonzero(nonempty_src)
    if idx_ne.shape[0]:
        g_ne = g[idx_ne]
        starts = np.searchsorted(g_ne, np.arange(n_groups), side="left")
        ends = np.searchsorted(g_ne, np.arange(n_groups), side="right")
        has = ends > starts
        first[has] = parts["first"][idx_ne[starts[has]]]
        last[has] = parts["last"][idx_ne[ends[has] - 1]]
    empty = cnt == 0
    mn[empty] = 0
    mx[empty] = 0
    return {
        "count": cnt, "sum": s, "sumsq": sq,
        "min": mn, "max": mx, "first": first, "last": last,
    }


def contiguous_stats(values: np.ndarray, starts: np.ndarray) -> Dict[str, np.ndarray]:
    """Stats over *contiguous, non-empty* bucket ranges: bucket ``k`` spans
    ``values[starts[k] : starts[k+1]]`` (last bucket runs to the end).

    This is the hot-path variant of :func:`bucket_stats` for dense tumbling
    windows (the map rollup): ``np.add.reduceat`` keeps accumulation in
    **exact int64** (no float64 round-trip, valid beyond 2**53) and touches
    each value once per statistic. Requires every bucket non-empty — true
    for tumbling buckets over dense position grids."""
    v = np.ascontiguousarray(values)
    if v.dtype.kind not in "iu":
        v = v.astype(np.int64)
    s = np.asarray(starts, dtype=np.intp)
    n = v.shape[0]
    ends = np.empty_like(s)
    ends[:-1] = s[1:]
    ends[-1] = n
    # dtype=int64 makes reduceat *accumulate* in int64 while *reading* the
    # native (int32) buffer — exact sums at half the memory traffic
    sq = np.multiply(v, v, dtype=np.int64)
    return {
        "count": (ends - s).astype(np.int64),
        "sum": np.add.reduceat(v, s, dtype=np.int64),
        "sumsq": np.add.reduceat(sq, s),
        "min": np.minimum.reduceat(v, s).astype(np.int64),
        "max": np.maximum.reduceat(v, s).astype(np.int64),
        "first": v[s].astype(np.int64),
        "last": v[ends - 1].astype(np.int64),
    }


def merge_contiguous(parts: Dict[str, np.ndarray], starts: np.ndarray) -> Dict[str, np.ndarray]:
    """Compose contiguous non-empty lower-tier partials into a higher tier
    (exact-int64 counterpart of :func:`merge_stats` for the dense path)."""
    s = np.asarray(starts, dtype=np.intp)
    n = parts["count"].shape[0]
    ends = np.empty_like(s)
    ends[:-1] = s[1:]
    ends[-1] = n
    return {
        "count": np.add.reduceat(parts["count"], s),
        "sum": np.add.reduceat(parts["sum"], s),
        "sumsq": np.add.reduceat(parts["sumsq"], s),
        "min": np.minimum.reduceat(parts["min"], s),
        "max": np.maximum.reduceat(parts["max"], s),
        "first": parts["first"][s],
        "last": parts["last"][ends - 1],
    }


def derive_mean_std(count: np.ndarray, total: np.ndarray, sumsq: np.ndarray):
    """The one shared float derivation: mean and population std from exact
    integer partials. Empty buckets -> NaN."""
    cnt = np.asarray(count, dtype=np.float64)
    s = np.asarray(total, dtype=np.float64)
    sq = np.asarray(sumsq, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, s / cnt, np.nan)
        var = np.where(cnt > 0, sq / cnt - mean * mean, np.nan)
    return mean, np.sqrt(np.maximum(var, 0.0))
