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
