"""Skewed-key aggregation: two-phase salted groupBy.

A groupBy whose key distribution is heavy-tailed (one event type, one
customer, one shingle carrying most rows) ships every row of the hot
key to ONE reduce task — the straggler that caps cluster utilization no
matter how many executors exist. Salting splits each hot key into
``n_salts`` synthetic sub-keys for a PARTIAL aggregate, then reduces the
tiny per-salt partials in a second exact pass. Works for any algebraic
aggregate (the same partial+final composition the rollup tiers use).

When to use which tool:
* AQE's skew-join handling splits oversized JOIN partitions — it does
  NOT help a skewed aggregate, because a hash aggregate's hot key still
  lands in one task after the map-side combine.
* Map-side combine alone is enough when the hot key's rows are spread
  over many input partitions (each emits one partial). Salting matters
  when upstream processing (e.g. an explode from few source rows)
  concentrates the hot key in few partitions.
* The LPT weight-balanced repartition (plans/lineage.py) balances
  per-SERIES work; salting balances per-KEY reduction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``aggs`` maps output column -> (phase1 aggregate over the input
    column, phase2 aggregate over the partial). Supported tags:
    "sum"/"count"/"min"/"max": e.g. ``{"cnt": ("count", "value"),
    "vsum": ("sum", "value")}``. Phase 1 groups by (keys..., salt) —
    the hot key spreads over ``n_salts`` reduce tasks; phase 2 groups by
    keys over at most ``n_salts`` rows per key.

    Exactness note: the salt uses ``monotonically_increasing_id`` so its
    assignment varies with partition layout — harmless for INTEGER
    sums/counts/min/max (associative and exact in any order), but a
    float ``sum`` would become order-sensitive; quantize floats to
    integers first (the engine-wide discipline)."""
    phase1_fns = {
        "sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
    }
    phase2_fns = {
        "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
    }
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(n_salts))
    )
    p1 = salted.groupBy(*keys, "_salt").agg(
        *[
            phase1_fns[tag](col).alias(out)
            for out, (tag, col) in aggs.items()
        ]
    )
    return p1.groupBy(*keys).agg(
        *[
            phase2_fns[tag](out).alias(out)
            for out, (tag, _col) in aggs.items()
        ]
    )
