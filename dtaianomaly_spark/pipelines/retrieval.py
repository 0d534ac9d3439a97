"""Lexical retrieval: BM25-style top-k document search over the corpus —
the inverted-index complement to the vector-ANN family
(pipelines/similarity.py). A training-data pipeline needs both: ANN for
embedding-space dedup/search, lexical retrieval for decontamination
lookups, eval-set mining, and quality auditing ("which documents contain
this benchmark phrase").

Scoring is the BM25 shape (k1 = 6/5, b = 3/4) with a LOG-FREE rational
idf: ``idf(t) = (N - df + 0.5) / (df + 0.5)`` — the Robertson/Sparck
Jones ratio WITHOUT the ln. Per term this is a strictly monotone
transform of canonical BM25 idf (ln is monotone), so single-term
rankings are identical; multi-term sums weight rare terms more
aggressively than the ln form. The trade is deliberate: ln is a libm
call whose last-ulp rounding differs across engines, while this form
needs only IEEE +-*/ over integer aggregates — so the whole score is
bit-reproducible between Spark and any oracle engine (the repo's
float-formula discipline). With k1 = 6/5 and b = 3/4 the per-term
contribution reduces to an integer-ratio expression:

    contrib = (2N - 2df + 1)/(2df + 1) * 22*tf*W / (10*W*tf + 3*W + 9*dl*N)

(derived by multiplying tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
through by 10*W, with avgdl = W/N; all symbols integer corpus
aggregates). Per-document scores fold the per-term contributions in
SORTED TERM ORDER — float addition is not associative, so a fixed fold
order is what makes the sum reproducible.

Physical shape at 100 TB: tf/df/dl are map-side-combined hash
aggregates; candidate generation joins query terms against the tf table
on the term (inverted-index join — only documents containing at least
one query term are ever scored, never a corpus scan per query); the
1-row corpus-scalar frame broadcasts; top-k is a per-query window over
the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ONE shared formula, used verbatim by the Spark plan and embedded in the
# DuckDB oracle: integer inputs, IEEE +-*/ only, fully parenthesized so
# both engines build the identical expression tree. No bare decimal
# literals (Spark parses `2.0` as DECIMAL).
BM25_CONTRIB_SQL = (
    "(CAST(2*N - 2*df + 1 AS DOUBLE) / (2*df + 1))"
    " * (CAST(22 * tf AS DOUBLE) * W)"
    " / (CAST(10 * W AS DOUBLE) * tf + CAST(3 * W AS DOUBLE)"
    " + CAST(9 AS DOUBLE) * dl * N)"
)


def bm25_topk_frame(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query for an ARBITRARY query frame — the
    real retrieval API. ``queries`` is any (qid, term) DataFrame: one
    row per (query, term) pair, duplicate terms within a query are
    deduplicated here (BM25 query-side weights are binary in this
    engine, matching :func:`bm25_topk`).

    Fully lazy: building the result DataFrame triggers NO Spark jobs
    (no driver collects anywhere — the query vocabulary reaches the
    corpus word stream as a broadcast left-semi join, so plan audits
    and lazy composition see the whole DAG).

    Physical shape at 100 TB: the corpus word stream is pruned to the
    query vocabulary BEFORE any aggregation (broadcast semi-join — a
    map-side hash probe, no shuffle), so tf/df are built over
    query-term postings only, never the full corpus vocabulary; df
    semantics are unchanged (docs containing the word), just computed
    for the words that matter. Candidates come from the inverted-index
    join of query terms against the pruned tf table; the 1-row corpus
    scalar frame broadcasts; top-k is a per-qid window.

    Output: (qid, rnk, doc_id, score) — rank 1..k per query, ties on
    score broken by doc_id for full determinism."""
    words = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("word")
    )
    dl = words.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    scalars = dl.agg(
        F.count("*").cast("long").alias("N"),
        F.sum("dl").cast("long").alias("W"),
    )
    qterms = queries.select(
        "qid", F.col("term").alias("word")
    ).distinct()
    vocab = qterms.select("word").distinct()
    wq = words.join(F.broadcast(vocab), "word", "left_semi")
    tf = wq.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = tf.groupBy("word").agg(F.count("*").cast("long").alias("df"))
    cand = (
        qterms.join(tf, "word")
        .join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "qid", "doc_id", F.col("word").alias("term"),
            F.expr(BM25_CONTRIB_SQL).alias("contrib"),
        )
    )
    scored = cand.groupBy("qid", "doc_id").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(term,"
            " contrib))), s -> s.contrib), CAST(0 AS DOUBLE),"
            " (a, x) -> a + x)"
        ).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.select(
            "qid", F.row_number().over(w).cast("long").alias("rnk"),
            "doc_id", "score",
        )
        .filter(F.col("rnk") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    n_queries: int = 8,
    query_terms: int = 5,
    k: int = 10,
) -> DataFrame:
    """Corpus-derived-query convenience wrapper over
    :func:`bm25_topk_frame`: the ``n_queries`` LOWEST doc_ids (not
    ``doc_id < n_queries`` — corpora whose ids don't start at 0 must
    still yield n_queries queries) each contribute their first
    ``query_terms`` distinct words as the query bag. The query docs are
    selected with a lazy global ``orderBy().limit()`` (physical
    TakeOrderedAndProject), so this wrapper, like the frame API, runs
    NO Spark jobs at construction time."""
    qdocs = docs.select("doc_id", "text").orderBy("doc_id").limit(
        int(n_queries)
    )
    queries = qdocs.select(
        F.col("doc_id").alias("qid"),
        F.explode(
            F.expr(
                "array_distinct(slice(split(text, ' '), 1,"
                f" {int(query_terms)}))"
            )
        ).alias("term"),
    )
    return bm25_topk_frame(docs, queries, k=k)


def hard_negatives(
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int = 8,
    query_terms: int = 5,
    k: int = 10,
    cos_threshold: float = 0.8,
) -> DataFrame:
    """Contrastive hard-negative mining (the DPR recipe, Karpukhin et
    al. 2020: BM25-retrieved passages that are NOT semantic matches
    make the best training negatives): take each query's BM25 top-k,
    attach the EXACT integer cosine between query and candidate
    embeddings (``vec_id`` aligns 1:1 with ``doc_id``), and flag
    candidates below ``cos_threshold`` as hard negatives — lexically
    confusable, semantically distant.

    Fully lazy composition of two oracle-pinned stages: the BM25 frame
    (inverted-index candidate join) and the quantized-cosine join
    (int64 dots + the ONE shared IEEE formula), so scores AND cosines
    are bit-reproducible. Physical shape: the BM25 top-k output is
    n_queries x k rows — both embedding joins hash on its tiny key set,
    the corpus-sized embedding table is never re-scanned per query.

    Output: (qid, rnk, doc_id, score, cos, is_hard); the query document
    itself never appears (BM25 already excludes self-hits only if
    ranked — it does rank them, so self pairs are filtered here: a
    query is trivially its own semantic match, never a negative)."""
    from dtaianomaly_spark.pipelines.similarity import COS_SQL, quantized

    topk = bm25_topk(docs, n_queries=n_queries, query_terms=query_terms, k=k)
    qv = quantized(emb)
    pairs = (
        topk.filter(F.col("qid") != F.col("doc_id"))
        .join(
            qv.select(
                F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
                F.col("norm2").alias("na"),
            ),
            "qid",
        )
        .join(
            qv.select(
                F.col("vec_id").alias("doc_id"), F.col("q").alias("cq"),
                F.col("norm2").alias("nb"),
            ),
            "doc_id",
        )
        .select(
            "qid", "rnk", "doc_id", "score", "na", "nb",
            F.expr(
                "aggregate(zip_with(qq, cq, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dot"),
        )
        .select(
            "qid", "rnk", "doc_id", "score",
            F.expr(COS_SQL).alias("cos"),
        )
    )
    return pairs.select(
        "qid", "rnk", "doc_id", "score", "cos",
        (F.col("cos") < F.lit(float(cos_threshold))).alias("is_hard"),
    )
