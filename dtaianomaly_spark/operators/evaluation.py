"""Thresholding + evaluation-metric operators (per-series, DataFrame-only).

Reference semantics (citations into /root/reference/):
* FixedCutoff — thresholding/thresholding.py:50-74 (label = score >= c).
* ContaminationRate — thresholding/thresholding.py:102-127: cutoff =
  np.quantile(scores, 1-rate) with linear interpolation. Implemented from
  the order-statistic DEFINITION (floor/ceil ranks + interpolation) with
  one shared SQL text, because builtin percentile implementations differ
  in interpolation op-order across engines and that breaks byte-match.
* TopN — thresholding/thresholding.py:153-182: cutoff = n-th largest.
* Precision/Recall/FBeta — evaluation/simple_binary_metrics.py:7-118
  (sklearn zero_division -> 0).
* AreaUnderROC — evaluation/simple_proba_metrics.py:7-30: rank statistic
  with tie midranks.
* point_adjust — evaluation/point_adjusted_binary_metrics.py:9-40: any hit
  inside a ground-truth event run marks the whole run predicted.
* BestThresholdMetric — evaluation/BestThresholdMetric.py:58-118: max
  metric over candidate thresholds; one sorted pass over distinct scores
  yields every threshold's confusion matrix at once (the cumulative-count
  trick), so no per-threshold rescan.

All metrics are integer-count arithmetic + one shared float formula —
exact across engines. Per-series grouping means the only shuffle is the
hash aggregate / window partitioning on ``doc_id``; at cluster scale the
scores already live partitioned by series, making these map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

F1_SQL = (
    "CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0 "
    "ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END"
)
PRECISION_SQL = "CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END"
RECALL_SQL = "CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END"


def fixed_cutoff(scored: DataFrame, cutoff: float) -> DataFrame:
    """label = (score >= cutoff). (thresholding.py:50-74)"""
    return scored.select(
        "doc_id", "pos",
        (F.col("score") >= cutoff).cast("int").alias("label"),
    )


def contamination_rate(scored: DataFrame, rate: float) -> DataFrame:
    """Per-series cutoff = linear-interp quantile(1-rate) of the scores,
    computed from order statistics: idx = (1-rate)*(n-1), cutoff =
    v[floor(idx)] + (v[ceil(idx)] - v[floor(idx)]) * frac(idx).
    (thresholding.py:102-127)

    Single pass: one sort-within-series gives ranks, and the two boundary
    order statistics are pulled out with conditional window maxes — no
    join back, no second shuffle. Extra input columns pass through."""
    q = 1.0 - rate
    w = Window.partitionBy("doc_id").orderBy("score")
    wall = Window.partitionBy("doc_id")
    ranked = (
        scored.withColumn("_rk", F.row_number().over(w) - 1)
        .withColumn("_idx", F.expr(f"{q!r} * (count(*) OVER (PARTITION BY doc_id) - 1)"))
    )
    cut = ranked.withColumn(
        "_lo", F.max(F.when(F.col("_rk") == F.floor("_idx"), F.col("score"))).over(wall)
    ).withColumn(
        "_hi", F.max(F.when(F.col("_rk") == F.ceil("_idx"), F.col("score"))).over(wall)
    ).withColumn(
        "_cutoff",
        F.expr(
            "CAST(_lo AS DOUBLE) + (CAST(_hi AS DOUBLE) - CAST(_lo AS DOUBLE))"
            " * (_idx - floor(_idx))"
        ),
    )
    out_cols = [c for c in scored.columns] + [
        (F.col("score").cast("double") >= F.col("_cutoff")).cast("int").alias("label")
    ]
    return cut.select(*out_cols)


def top_n(scored: DataFrame, n: int) -> DataFrame:
    """label = score >= n-th largest score of the series; single pass via
    a conditional window max of the rank-n score, extra columns pass
    through. (thresholding.py:153-182)"""
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc())
    wall = Window.partitionBy("doc_id")
    ranked = scored.withColumn("_rk", F.row_number().over(w))
    cut = ranked.withColumn(
        "_cutoff", F.max(F.when(F.col("_rk") == n, F.col("score"))).over(wall)
    )
    out_cols = [c for c in scored.columns] + [
        (F.col("score") >= F.col("_cutoff")).cast("int").alias("label")
    ]
    return cut.select(*out_cols)


def confusion_metrics(labeled: DataFrame) -> DataFrame:
    """Per-series tp/fp/fn/tn + precision/recall/f1 from columns
    ``label`` (prediction) and ``truth``. (simple_binary_metrics.py:7-118)"""
    agg = labeled.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN label = 1 AND truth = 1 THEN 1 ELSE 0 END")).alias("tp"),
        F.sum(F.expr("CASE WHEN label = 1 AND truth = 0 THEN 1 ELSE 0 END")).alias("fp"),
        F.sum(F.expr("CASE WHEN label = 0 AND truth = 1 THEN 1 ELSE 0 END")).alias("fn"),
        F.sum(F.expr("CASE WHEN label = 0 AND truth = 0 THEN 1 ELSE 0 END")).alias("tn"),
    )
    return agg.select(
        "doc_id", "tp", "fp", "fn", "tn",
        F.expr(PRECISION_SQL).alias("precision"),
        F.expr(RECALL_SQL).alias("recall"),
        F.expr(F1_SQL).alias("f1"),
    )


def auc_roc(scored_truth: DataFrame) -> DataFrame:
    """Per-series ROC AUC via the Mann-Whitney rank statistic with tie
    midranks: AUC = (sum_pos_midrank - P(P+1)/2) / (P*N). Midranks kept in
    doubled-integer form (2*midrank = 2*rank + ties - 1) so the numerator
    stays exact. Series with one class only are dropped (sklearn raises).
    (simple_proba_metrics.py:7-30)"""
    w = Window.partitionBy("doc_id").orderBy("score")
    wt = Window.partitionBy("doc_id", "score")
    ranked = scored_truth.select(
        "doc_id", "truth",
        (2 * F.rank().over(w) + F.count("*").over(wt) - 1).alias("mr2"),
    )
    agg = ranked.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN truth = 1 THEN mr2 ELSE 0 END")).alias("sum_mr2"),
        F.sum(F.expr("CASE WHEN truth = 1 THEN 1 ELSE 0 END")).alias("p"),
        F.sum(F.expr("CASE WHEN truth = 0 THEN 1 ELSE 0 END")).alias("neg"),
    )
    return agg.filter("p > 0 AND neg > 0").select(
        "doc_id",
        F.expr(
            "(CAST(sum_mr2 AS DOUBLE) / 2 - CAST(p AS DOUBLE) * (p + 1) / 2)"
            " / (CAST(p AS DOUBLE) * neg)"
        ).alias("auc"),
    )


def auc_pr(scored_truth: DataFrame) -> DataFrame:
    """Per-series area under the precision-recall curve, trapezoidal
    (the reference's precision_recall_curve + metrics.auc composition,
    evaluation/simple_proba_metrics.py:33-55): one sorted pass over
    distinct scores descending gives (recall_i, precision_i) per
    threshold; the curve is anchored at (recall=0, precision=1). All
    counts integer; the trapezoid sum is the shared float formula."""
    per_score = scored_truth.groupBy("doc_id", "score").agg(
        F.count("*").alias("cnt"),
        F.sum("truth").alias("pos_cnt"),
    )
    wd = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("doc_id")
    wlag = Window.partitionBy("doc_id").orderBy(F.col("score").desc())
    cum = per_score.select(
        "doc_id", "score",
        F.sum("pos_cnt").over(wd).alias("tp"),
        (F.sum("cnt").over(wd) - F.sum("pos_cnt").over(wd)).alias("fp"),
        F.sum("pos_cnt").over(wall).alias("p"),
    ).filter("p > 0")
    seg = cum.select(
        "doc_id",
        F.expr(
            "(CAST(tp AS DOUBLE) / p - CAST(coalesce(lag(tp) OVER (PARTITION BY doc_id"
            " ORDER BY score DESC), 0) AS DOUBLE) / p)"
        ).alias("dr"),
        F.expr(
            "(CAST(tp AS DOUBLE) / (tp + fp)"
            " + CASE WHEN lag(tp) OVER (PARTITION BY doc_id ORDER BY score DESC) IS NULL"
            " THEN 1.0 ELSE CAST(lag(tp) OVER (PARTITION BY doc_id ORDER BY score DESC) AS DOUBLE)"
            " / (lag(tp) OVER (PARTITION BY doc_id ORDER BY score DESC)"
            " + lag(fp) OVER (PARTITION BY doc_id ORDER BY score DESC)) END) / 2.0"
        ).alias("ptrap"),
    )
    return seg.groupBy("doc_id").agg(
        F.sum(F.expr("dr * ptrap")).alias("auc_pr")
    )


def point_adjust(labeled: DataFrame) -> DataFrame:
    """Point-adjusted predictions: ground-truth events are maximal runs of
    consecutive truth=1; if any prediction falls inside a run the whole
    run becomes predicted. (point_adjusted_binary_metrics.py:9-40)"""
    w = Window.partitionBy("doc_id").orderBy("pos")
    ev = labeled.select(
        "doc_id", "pos", "label", "truth",
        F.sum(
            F.expr("CASE WHEN truth != coalesce(lag(truth) over "
                   "(partition by doc_id order by pos), -1) THEN 1 ELSE 0 END")
        ).over(w).alias("event"),
    )
    return ev.select(
        "doc_id", "pos", "truth",
        F.expr(
            "CASE WHEN truth = 1 THEN max(label) OVER "
            "(PARTITION BY doc_id, event) ELSE label END"
        ).alias("label"),
    )


def point_adjusted_metrics(labeled: DataFrame) -> DataFrame:
    """point_adjust ∘ confusion_metrics.
    (point_adjusted_binary_metrics.py:43-147)"""
    return confusion_metrics(point_adjust(labeled))


def best_threshold_f1(scored_truth: DataFrame) -> DataFrame:
    """Max F1 over every candidate threshold in ONE sorted pass: group by
    distinct score desc, cumulative positives give tp at each cut
    (label = score >= cut); fp/fn follow from totals.
    (BestThresholdMetric.py:58-118)"""
    per_score = scored_truth.groupBy("doc_id", "score").agg(
        F.count("*").alias("cnt"),
        F.sum("truth").alias("pos_cnt"),
    )
    wd = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("doc_id")
    cum = per_score.select(
        "doc_id",
        F.sum("pos_cnt").over(wd).alias("tp"),
        (F.sum("cnt").over(wd) - F.sum("pos_cnt").over(wd)).alias("fp"),
        (F.sum("pos_cnt").over(wall) - F.sum("pos_cnt").over(wd)).alias("fn"),
    )
    return cum.groupBy("doc_id").agg(
        F.max(F.expr(F1_SQL)).alias("best_f1")
    )
