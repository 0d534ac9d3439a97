"""Importance-based training-data selection over the ``documents``
table — DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023), the hashed-n-gram counterpart of
the quality / fluency screens in :mod:`.text`.

The method: fit two bag-of-hashed-n-grams unigram-over-buckets models —
one on the TARGET distribution (the domain you want more of), one on
the RAW pool — and resample raw examples with Gumbel-perturbed log
importance weights ``log p_target(x) - log p_raw(x)``; the Gumbel
trick turns weighted sampling WITHOUT replacement into a deterministic
top-k over perturbed scores.

Everything is expression-only DataFrame ops:

* features: word unigrams + bigrams hashed into ``n_buckets`` md5
  buckets map-side (the fixed 60-bit md5-prefix integer the drift /
  packing ops already use — portable across engines);
* the two models: one groupBy over bucket ids (``n_buckets``-bounded
  keys, map-side combined), add-one smoothed;
* per-doc log-weights: doc bucket counts join the broadcast
  ``n_buckets``-row log-ratio table, folded in sorted bucket order
  (float addition is not associative — the repo's deterministic-fold
  discipline);
* Gumbel noise: seeded per-doc from the md5 of ``doc_id`` —
  reproducible across engines and runs, no RNG state;
* selection: global top-``n_keep`` by perturbed score →
  TakeOrderedAndProject, never a full sort.

Scale shape at 100 TB: the gram stream is map-side exploded and
immediately bucket-hashed (no vocabulary-sized key space anywhere —
the bucket tables are ``n_buckets`` rows), per-doc fold sizes are
bounded by min(doc grams, n_buckets), and the only global ordering is
the top-k heap. No reference counterpart (dtaianomaly has no text
pipeline); pinned in pytest against an independent Python oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_DSIR_BUCKETS = 512

# 60-bit md5-prefix integer of a gram string — the engine-portable hash
# (DuckDB: ('0x' || substr(md5(gram), 1, 15))::BIGINT).
_MD5_60 = "CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"

# Gumbel(0,1) noise from the per-doc md5 integer: u = (h + 1) / (2^60 + 1)
# lies strictly inside (0,1), g = -ln(-ln(u)).  ln is libm (last-ulp
# engine-dependent), which is why DSIR is pytest-pinned, not SQL-oracled.
_GUMBEL_SQL = (
    "-ln(-ln((CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
    " AS DOUBLE) + 1.0) / 1152921504606846977.0))"
)

_SORTED_FOLD = (
    "aggregate(transform(array_sort(collect_list(struct(bucket, x))),"
    " s -> s.x), CAST(0 AS DOUBLE), (a, x) -> a + x)"
)


def _doc_buckets(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, source, bucket, n) — hashed unigram+bigram counts per
    document; the explode and the hash are both map-side."""
    ws = docs.select(
        "doc_id", "source", F.expr("split(text, ' ')").alias("ws")
    )
    grams = ws.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "concat(ws, CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(1, size(ws) - 1),"
                " i -> concat(ws[i - 1], ' ', ws[i]))"
                " ELSE array() END)"
            )
        ).alias("gram"),
    )
    return grams.select(
        "doc_id",
        "source",
        F.expr(
            _MD5_60.format(s="gram") + f" % {int(n_buckets)}"
        ).alias("bucket"),
    ).groupBy("doc_id", "source", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )


def dsir_select(
    docs: DataFrame,
    target_source: str = "src0",
    n_keep: int = 64,
    n_buckets: int = N_DSIR_BUCKETS,
) -> DataFrame:
    """Select ``n_keep`` raw documents by DSIR importance resampling:
    target model fit on ``source == target_source`` docs, raw model on
    every other doc, Gumbel-top-k over the raw pool.

    Output: (doc_id, source, logw, score, rk) — the kept documents with
    their unperturbed log importance weight, perturbed score, and rank
    (score DESC, doc_id tiebreak)."""
    db = _doc_buckets(docs, n_buckets)
    is_t = F.col("source") == target_source
    bucket_counts = db.groupBy("bucket").agg(
        F.sum(F.when(is_t, F.col("n")).otherwise(0)).alias("tc"),
        F.sum(F.when(~is_t, F.col("n")).otherwise(0)).alias("rc"),
    )
    totals = bucket_counts.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    # add-one smoothed log-ratio per bucket:
    #   llr[b] = ln((tc+1)/(tt+B)) - ln((rc+1)/(rt+B))
    llr = (
        bucket_counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"ln(CAST(tc + 1 AS DOUBLE) / CAST(tt + {int(n_buckets)} AS DOUBLE))"
                f" - ln(CAST(rc + 1 AS DOUBLE) / CAST(rt + {int(n_buckets)} AS DOUBLE))"
            ).alias("llr"),
        )
    )
    raw = db.filter(~is_t)
    weights = (
        raw.join(F.broadcast(llr), "bucket")
        .select(
            "doc_id",
            "source",
            "bucket",
            (F.col("n").cast("double") * F.col("llr")).alias("x"),
        )
        .groupBy("doc_id", "source")
        .agg(F.expr(_SORTED_FOLD).alias("logw"))
    )
    scored = weights.select(
        "doc_id",
        "source",
        "logw",
        (F.col("logw") + F.expr(_GUMBEL_SQL)).alias("score"),
    )
    # global top-k first (TakeOrderedAndProject — never a full sort);
    # the rank window then runs over the n_keep survivors only
    topk = scored.orderBy(F.col("score").desc(), "doc_id").limit(int(n_keep))
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return topk.select(
        "doc_id",
        "source",
        "logw",
        "score",
        F.row_number().over(w).cast("long").alias("rk"),
    )


# --------------------------------------------------------------------------
# Hashed-n-gram logistic-regression quality classifier — the
# fastText-style filter (Joulin et al. 2017; the GPT-3 / LLaMA-lineage
# "quality classifier": train target-vs-pool on bag-of-hashed-n-grams,
# score the whole corpus, keep high-scoring documents).  TRAINING runs
# IN Spark: full-batch gradient descent where each round is two bounded
# jobs — a per-doc score pass and a per-bucket gradient aggregate — and
# only the n_buckets-float weight vector ever reaches the driver (the
# BPE-trainer economics: bounded per-round collects, features
# localCheckpoint'ed once so later rounds read materialized rows).

_SORTED_FOLD_KEY = (
    "aggregate(transform(array_sort(collect_list(struct({key}, x))),"
    " s -> s.x), CAST(0 AS DOUBLE), (a, x) -> a + x)"
)

N_GRAD_GROUPS = 32  # md5 doc-hash subgroups of the two-level gradient fold


def classifier_features(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, source, y, bucket, x) — L1-normalized hashed
    unigram+bigram counts per document (x sums to 1 within a doc), with
    the binary label carried alongside. Pure expression ops; the
    normalizing total is a doc-level window-free groupBy join."""
    db = _doc_buckets(docs, n_buckets)
    tot = db.groupBy("doc_id").agg(F.sum("n").alias("tot"))
    return db.join(tot, "doc_id").select(
        "doc_id",
        "source",
        "bucket",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("x"),
    )


def classifier_train(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = N_DSIR_BUCKETS,
    n_iters: int = 12,
    lr: float = 4.0,
) -> list:
    """Train the logistic regression w (length ``n_buckets``, bias-free
    — L1-normalized features make a bias redundant up to class prior)
    by full-batch GD:  w <- w - lr * (1/N) Σ_d x_d (σ(w·x_d) - y_d).

    Round shape: the per-doc margin folds bucket contributions in
    sorted-bucket order; the per-bucket gradient folds doc
    contributions with the TWO-LEVEL deterministic fold (sorted fold
    inside fixed md5 doc-hash subgroups, then a sorted fold over the
    ≤``N_GRAD_GROUPS`` partials) — the same discipline as
    ``source_drift``, so no fold ever collects an unbounded row and the
    learned weights are bit-reproducible run to run. Per round exactly
    ONE n_buckets-row collect hits the driver.

    Returns the weight vector as a Python list (bucket k -> w[k])."""
    feats = classifier_features(docs, n_buckets).localCheckpoint(eager=True)
    return _train_on_feats(feats, target_source, n_buckets, n_iters, lr)


def _train_on_feats(
    feats: DataFrame,
    target_source: str,
    n_buckets: int,
    n_iters: int,
    lr: float,
) -> list:
    """GD rounds over an already-materialized feature frame (see
    :func:`classifier_train` for the round shape and determinism
    contract) — split out so :func:`quality_classifier` can reuse ONE
    checkpointed extraction for both training and scoring."""
    spark = feats.sparkSession
    n_docs = feats.select("doc_id").distinct().count()
    is_t = F.col("source") == target_source
    w = [0.0] * n_buckets
    for _ in range(int(n_iters)):
        w_df = spark.createDataFrame(
            list(enumerate(w)), schema="bucket long, w double"
        )
        margins = (
            feats.join(F.broadcast(w_df), "bucket")
            .select(
                "doc_id", "source", F.col("bucket").alias("k"),
                (F.col("x") * F.col("w")).alias("x"),
            )
            .groupBy("doc_id", "source")
            .agg(F.expr(_SORTED_FOLD_KEY.format(key="k")).alias("m"))
        )
        resid = margins.select(
            "doc_id",
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
                - F.when(is_t, 1.0).otherwise(0.0)
            ).alias("r"),
        )
        contrib = feats.join(resid, "doc_id").select(
            "bucket",
            F.expr(
                "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
                f" AS BIGINT) % {N_GRAD_GROUPS}"
            ).alias("h"),
            "doc_id",
            (F.col("x") * F.col("r")).alias("v"),
        )
        lvl1 = contrib.groupBy("bucket", "h").agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(doc_id, v))),"
                " s -> s.v), CAST(0 AS DOUBLE), (a, x) -> a + x)"
            ).alias("x")
        )
        grad_rows = (
            lvl1.groupBy("bucket")
            .agg(F.expr(_SORTED_FOLD_KEY.format(key="h")).alias("g"))
            .collect()
        )
        g = [0.0] * n_buckets
        for row in grad_rows:
            g[row["bucket"]] = row["g"]
        w = [wi - lr * gi / n_docs for wi, gi in zip(w, g)]
    return w


def classifier_score(
    docs: DataFrame,
    weights: list,
    target_source: str = "src0",
    n_buckets: int | None = None,
) -> DataFrame:
    """Score every document under a trained weight vector:
    (doc_id, source, y, score) with score = σ(w·x). One broadcast join
    + one per-doc sorted fold — the corpus-wide scoring pass is fully
    distributed and map-side-bounded."""
    if n_buckets is None:
        n_buckets = len(weights)
    return _score_on_feats(
        classifier_features(docs, n_buckets), weights, target_source
    )


def _score_on_feats(
    feats: DataFrame, weights: list, target_source: str
) -> DataFrame:
    spark = feats.sparkSession
    w_df = spark.createDataFrame(
        list(enumerate([float(v) for v in weights])),
        schema="bucket long, w double",
    )
    margins = (
        feats.join(F.broadcast(w_df), "bucket")
        .select(
            "doc_id", "source", F.col("bucket").alias("k"),
            (F.col("x") * F.col("w")).alias("x"),
        )
        .groupBy("doc_id", "source")
        .agg(F.expr(_SORTED_FOLD_KEY.format(key="k")).alias("m"))
    )
    return margins.select(
        "doc_id",
        "source",
        F.when(F.col("source") == target_source, 1).otherwise(0)
        .cast("long")
        .alias("y"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias("score"),
    )


def quality_classifier(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = N_DSIR_BUCKETS,
    n_iters: int = 12,
    lr: float = 4.0,
) -> DataFrame:
    """Train + corpus-wide score in one call (the driver-query surface).
    Training is an ACTION (n_iters bounded rounds run at construction,
    the BPE-trainer convention); the returned frame is the lazy scoring
    pass, reading the SAME checkpointed feature frame the trainer
    materialized — the corpus-wide split/gram/hash extraction runs
    exactly once."""
    feats = classifier_features(docs, n_buckets).localCheckpoint(eager=True)
    w = _train_on_feats(feats, target_source, n_buckets, n_iters, lr)
    return _score_on_feats(feats, w, target_source)
