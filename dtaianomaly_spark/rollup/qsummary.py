"""Mergeable quantile summary tier for UNBOUNDED value domains.

The histogram tier (tiers.hist_rollup) serves percentiles only when the
value range is known a priori; this summary needs no bounds: the fine
tier keeps at most ``m`` weighted order statistics per (series, fine
bucket) — element i of the sorted bucket goes to run
``np.array_split(range(n), m)``-style, the run's LAST (= max) element
represents it with the run size as weight — and the coarse tier merges
by weighted value-sort + re-pruning to ``m`` at balanced integer
cumulative-weight targets ``t_i = (i*N) div m``. This is the classic
mergeable ε-approximate quantile construction (cf. Greenwald–Khanna /
Manku–Rajagopalan–Lindsay lineage; Agarwal et al., "Mergeable
Summaries", PODS'12 frame the merge property itself).

Error contract (pytest-verified over random + adversarial data): for
every value v, the summary's weighted CDF estimate satisfies

    |est_cdf(v) - true_cdf(v)| <= err

with ``err`` = Σ_b (ceil(n_b/m_b)-1)  (one partial run per fine bucket)
           + (ceil(N/m')-1) + (max merge weight - 1)   (the re-prune),

reported per coarse bucket in the ``err`` column. Everything is
integer arithmetic over rank/count windows — no UDF, deterministic
under any partitioning (ties between equal values are interchangeable),
and therefore bit-reproducible by the DuckDB oracle
(``rollup_qsummary``).

Scale shape: the fine pass is the only full-data shuffle (rank window
per (doc_id, fine bucket) — the same clustering every other tier uses);
the merge pass runs on <= m rows per fine bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quantile_summary", "summary_quantile"]


def quantile_summary(
    long_form: DataFrame, fine_ticks: int = 64, factor: int = 15, m: int = 32
) -> DataFrame:
    """(doc_id, pos, value) -> per-(series, coarse bucket) weighted
    quantile summary rows (value, weight, err); Σ weight = bucket count,
    <= m rows per bucket."""
    base = long_form.select(
        "doc_id",
        (F.col("pos") / fine_ticks).cast("long").alias("fbucket"),
        "value",
    )
    wr = Window.partitionBy("doc_id", "fbucket").orderBy("value")
    wa = Window.partitionBy("doc_id", "fbucket")
    n = F.count("*").over(wa)
    me = F.least(F.lit(m), n)
    i = F.row_number().over(wr) - F.lit(1)
    q = F.expr(f"_n div least({m}, _n)")
    rem = F.expr(f"_n % least({m}, _n)")
    ranked = base.withColumn("_i", i).withColumn("_n", n)
    run = F.when(
        F.col("_i") < rem * (q + 1), F.expr("_i div (_q + 1)")
    ).otherwise(rem + F.expr("(_i - _rem * (_q + 1)) div _q"))
    ranked = (
        ranked.withColumn("_q", q).withColumn("_rem", rem)
        .withColumn("_run", run)
    )
    fine = ranked.groupBy("doc_id", "fbucket", "_run").agg(
        F.max("value").alias("value"),
        F.count("*").alias("weight"),
        # per-fine-bucket deficit, same on every run of the bucket:
        # ceil(n/m_eff) - 1  (the one possible partial run)
        F.expr(
            f"((max(_n) + least({m}, max(_n)) - 1) div least({m}, max(_n))) - 1"
        ).alias("_deficit"),
    )

    bucket = (F.col("fbucket") / factor).cast("long").alias("bucket")
    tagged = fine.select("doc_id", bucket, "fbucket", "_run", "value", "weight",
                         "_deficit")
    # total fine deficit per coarse bucket (one carrier row per fbucket)
    dsum = (
        tagged.filter(F.col("_run") == 0)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("_deficit").alias("_dsum"))
    )
    wm = Window.partitionBy("doc_id", "bucket").orderBy(
        "value", "fbucket", "_run"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wb = Window.partitionBy("doc_id", "bucket")
    merged = tagged.select(
        "doc_id", "bucket", "value", "weight",
        F.sum("weight").over(wm).alias("_cum"),
        F.sum("weight").over(wb).alias("_N"),
        F.least(F.lit(m), F.count("*").over(wb)).alias("_me"),
        F.max("weight").over(wb).alias("_maxw"),
    )
    # hi(c) = #targets t_i = (i*N div me), i=1..me, with t_i <= c
    hi_cum = F.least(F.col("_me"), F.expr("((_cum + 1) * _me - 1) div _N"))
    hi_prev = F.least(
        F.col("_me"), F.expr("((_cum - weight + 1) * _me - 1) div _N")
    )
    pruned = (
        merged.withColumn("_hc", hi_cum).withColumn("_hp", hi_prev)
        .filter(F.col("_hc") > F.col("_hp"))
        .join(dsum, ["doc_id", "bucket"])
        .select(
            "doc_id", "bucket", "value",
            F.expr("(_hc * _N div _me) - (_hp * _N div _me)").alias("weight"),
            F.expr(
                "_dsum + ((_N + _me - 1) div _me) - 1 + _maxw - 1"
            ).alias("err"),
        )
    )
    return pruned


def summary_quantile(summary: DataFrame, q_num: int, q_den: int) -> DataFrame:
    """Read the q = q_num/q_den quantile off a :func:`quantile_summary`
    frame: the first summary value whose cumulative weight reaches
    ceil(q*N) — integer-only ranks, one window pass over the <= m-row
    summaries, raw data untouched. True rank of the reported value is
    within ``err`` of the target (the summary's CDF contract)."""
    wm = Window.partitionBy("doc_id", "bucket").orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wb = Window.partitionBy("doc_id", "bucket")
    cum = summary.select(
        "doc_id", "bucket", "value", "err",
        F.sum("weight").over(wm).alias("_cum"),
        F.sum("weight").over(wb).alias("_N"),
    )
    rank = F.expr(f"(_N * {q_num} + {q_den} - 1) div {q_den}")
    return cum.groupBy("doc_id", "bucket").agg(
        F.max("_N").alias("cnt"),
        F.min(F.when(F.col("_cum") >= rank, F.col("value"))).alias("q_value"),
        F.max("err").alias("err"),
    )


# ---------------------------------------------------------------- NumPy form
# The same construction as plain arrays, for the STREAMING state operator
# (streaming/quantile.py) and for tests that need a driver-side oracle.

def np_fine_summary(values, m: int):
    """Sorted batch -> (reps, weights, deficit): balanced runs with the
    REMAINDER FRONT-LOADED (np.array_split layout — the first n%m runs
    take the extra element), run max as representative, deficit =
    ceil(n/m_eff) - 1 (one partial run). Identical run layout to the
    relational fine tier (quantile_summary), so this IS a driver-side
    oracle for one fine bucket.

    INTEGER DOMAIN: the summary tracks the token domain (int64 values,
    int64 ranks — that's what makes the read-off oracle-exact).
    Non-integral float input raises instead of silently truncating;
    callers with real-valued scores quantize first (fixed-point scale)
    and own the scale factor."""
    import numpy as np

    a = np.asarray(values)
    if a.dtype.kind == "f" and (
        not np.all(np.isfinite(a)) or np.any(a != np.trunc(a))
    ):
        raise ValueError(
            "quantile summary is integer-domain (token values / integer"
            " ranks); quantize real-valued scores to fixed-point before"
            " feeding the tracker instead of relying on truncation"
        )
    a = np.sort(a.astype(np.int64))
    n = a.shape[0]
    me = min(m, n)
    q, rem = divmod(n, me)
    ws = np.full(me, q, dtype=np.int64)
    ws[:rem] += 1
    ends = np.cumsum(ws)
    reps = a[ends - 1]
    return reps, ws, (n + me - 1) // me - 1


def np_merge_prune(parts, m: int):
    """Weighted merge of summaries + re-prune to m at balanced integer
    cumulative-weight targets. Returns (reps, weights, prune_slack)
    where prune_slack = (ceil(N/m_eff)-1) + (max merged weight - 1) —
    the additive CDF-error cost of THIS merge step."""
    import numpy as np

    v = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    N = int(w.sum())
    me = min(m, v.shape[0])
    cum = np.cumsum(w)
    targets = np.array([(i * N) // me for i in range(1, me + 1)])
    idx = np.searchsorted(cum, targets, side="left")
    reps = v[idx]
    ws = np.diff(np.concatenate([[0], targets]))
    slack = (N + me - 1) // me - 1 + int(w.max()) - 1
    return reps, ws.astype(np.int64), slack
