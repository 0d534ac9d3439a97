"""Invalidation-driven incremental refresh of a materialized rollup —
the continuous-aggregate maintenance step (TimescaleDB's "refresh
continuous aggregate", Materialize's delta application) expressed as
plain DataFrame ops.

Model: a rollup tier is materialized; then some base-table regions are
invalidated (late/updated source rows). Instead of recomputing the
whole tier, the refresh (a) recomputes the rollup ONLY over the
invalidated region of the new base data and (b) keeps every
materialized row outside that region. Correctness contract:
``refresh(old, new_base, pred) == full recompute over new_base`` —
pinned by the driver's DuckDB oracle (full recompute) and by
tests/test_refresh.py inside Spark.

Scale: the recompute side scans only the invalidated fraction (the
predicate is pushed to the base scan — doc_id is a partition-friendly
key, so on a partitioned store this is partition pruning, not a
filter), and the kept side is a metadata-only anti-filter of the
materialization. Cost is O(invalidated), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtaianomaly_spark.rollup.tiers import rollup_relational

__all__ = ["incremental_refresh", "refresh_tail"]


def incremental_refresh(
    materialized: DataFrame,
    new_long_form: DataFrame,
    invalid_pred_sql: str,
    bucket_ticks: int,
    tier: str,
) -> DataFrame:
    """Merge a stale materialized rollup with a recompute of only the
    invalidated region.

    ``invalid_pred_sql`` must reference only columns present in BOTH
    the materialization and the long form (here: ``doc_id``) so the
    same predicate selects invalidated base rows and drops their stale
    rollup rows.
    """
    recomputed = rollup_relational(
        new_long_form.filter(F.expr(invalid_pred_sql)), bucket_ticks, tier
    )
    kept = materialized.filter(~F.expr(invalid_pred_sql))
    return kept.unionByName(recomputed)


def refresh_tail(
    materialized: DataFrame,
    new_long_form: DataFrame,
    from_pos: int,
    bucket_ticks: int,
    tier: str,
) -> DataFrame:
    """Time-range refresh — the LATE-DATA shape of continuous-aggregate
    maintenance (TimescaleDB's refresh window): everything at or after
    ``from_pos`` is invalidated (late/corrected points landed there),
    everything strictly before stays materialized.

    The invalidation boundary is snapped DOWN to a bucket edge: the
    bucket containing ``from_pos`` straddles old and new data, so it
    must be recomputed from base rows starting at ITS start, not at
    ``from_pos`` — the classic off-by-one of windowed refresh. Kept
    rows are ``bucket < from_pos div bucket_ticks``; recomputed rows
    scan base ``pos >= bucket_start`` (a pushed-down range predicate —
    partition pruning on a time-partitioned store).
    """
    boundary_bucket = from_pos // bucket_ticks
    recomputed = rollup_relational(
        new_long_form.filter(F.col("pos") >= boundary_bucket * bucket_ticks),
        bucket_ticks,
        tier,
    )
    kept = materialized.filter(F.col("bucket") < boundary_bucket)
    return kept.unionByName(recomputed)
