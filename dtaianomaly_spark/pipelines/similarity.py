"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Exactness discipline: embeddings are quantized to int64
(``floor(double(e) * 10000)`` — float32→float64 widening and floor are
bit-identical across engines), dot products and norms stay integer, and
the cosine is ONE shared float formula over the exact integer triple —
so the DuckDB oracle byte-matches scores and, therefore, rankings.

Two physical strategies:
* :func:`cosine_topk` — brute force: broadcast the (small) query set
  against all candidates; dot products via ``zip_with`` + ``aggregate``
  HOFs (JVM-side, no Python). The correctness baseline.
* :func:`srp_lsh_topk` — the scale path: multi-table sign-random-
  projection (4 tables x 4 deterministic ±1 hyperplanes) computed
  map-side per vector; the join shuffles on (table, bucket) so only
  same-bucket candidates pair up — at N vectors the scored pair count
  drops from O(N·Q) to O(T · N·Q / 2^bits), deduplicated across tables
  before the exact cosine pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DIM = 64
SRP_BITS = 4

QUANT_EXPR = "transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 10000) AS BIGINT))"
_SELF_DOT = "aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"

COS_SQL = (
    "CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q array<bigint>, norm2 bigint). |e| ~ O(1) → |q| <= ~10^5,
    per-dim square <= 10^10, 64-dim sum < 2^40 — exact int64."""
    return emb.select(
        "vec_id", F.expr(QUANT_EXPR).alias("q")
    ).select("vec_id", "q", F.expr(_SELF_DOT).alias("norm2"))


def cosine_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Brute-force exact cosine top-k: queries (vec_id < n_queries)
    broadcast against every other vector; ties broken by vec_id."""
    qv = quantized(emb)
    queries = qv.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
        F.col("norm2").alias("na"),
    )
    cands = qv.select(
        F.col("vec_id").alias("vid"), F.col("q").alias("cq"),
        F.col("norm2").alias("nb"),
    )
    pairs = F.broadcast(queries).crossJoin(cands).filter(F.col("qid") != F.col("vid"))
    scored = pairs.select(
        "qid", "vid", "na", "nb",
        F.expr(
            "aggregate(zip_with(qq, cq, (a, b) -> a * b), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x)"
        ).alias("dot"),
    ).select("qid", "vid", "dot", "na", "nb", F.expr(COS_SQL).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "vid", F.col("rk").cast("long").alias("rk"), "dot", "cos")
    )


SRP_TABLES = 4  # multi-table LSH: union candidates over 4 hash tables


def _srp_buckets(qv: DataFrame) -> DataFrame:
    """(vec_id, t, bucket): SRP_BITS sign-random-projection bits per
    vector per hash table t. Hyperplane (t, b) gives dim d weight ±1 by
    the parity of ``((t*7561 + b*2654435761 + d*40503) % 97)``. Computed
    as posexplode + map-side partial sums — a giant nested-HOF bucket
    expression falls out of whole-stage codegen (measured ~10x slower).

    Multi-table is what makes SRP-LSH usable: one 8-bit table recalls
    ~2% of true top-5 here; 4 tables x 4 bits recall the large majority
    while still pruning most of the candidate space."""
    qd = qv.select(
        "vec_id", F.posexplode("q").alias("d0", "qval")
    ).select(
        "*", F.explode(F.expr(f"sequence(0, {SRP_TABLES - 1})")).alias("t")
    )
    aggs = [
        F.sum(
            F.expr(
                f"qval * (CASE WHEN ((t * 7561 + {b} * 2654435761 + (d0 + 1)"
                " * 40503) % 97) % 2 = 0 THEN 1 ELSE -1 END)"
            )
        ).alias(f"s{b}")
        for b in range(SRP_BITS)
    ]
    wide = qd.groupBy("vec_id", "t").agg(*aggs)
    combine = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN CAST({1 << b} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(SRP_BITS)
    )
    return wide.select("vec_id", F.col("t").cast("long").alias("t"), F.expr(combine).alias("bucket"))


def ivf_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5,
    n_cells: int = 16, n_probe: int = 4, seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the coarse-
    quantizer ANN path: a seeded k-means over L2-NORMALIZED vectors
    (driver-fit on a bounded sample, the fit-broadcast-score pattern)
    partitions the space into ``n_cells`` Voronoi cells; every vector is
    assigned to its nearest centroid map-side (one Arrow pass, centroids
    in the task closure); a query probes its ``n_probe`` nearest cells
    and re-scores ONLY those cells' members with the exact integer
    cosine. Cosine top-k over normalized vectors == dot-product top-k,
    so assigning on the normalized sphere makes cell residency
    consistent with the metric.

    At scale this is the textbook IVF trade: the cell index shuffles
    once at build, queries touch n_probe/n_cells of the data, and recall
    follows the probe count. k-means is float-iterative, so no SQL
    oracle — the driver records a rows-only check and pytest pins recall
    against the exact brute force."""
    import numpy as np
    import pandas as pd

    from dtaianomaly_spark.kernels.detectors import kmeans_fit

    sample = np.asarray(
        [
            # deterministic training sample: an unordered limit() is not
            # stable across runs/partition layouts once the input exceeds
            # the cap; the vec_id top-k is a TakeOrderedAndProject (heap
            # scan, no full sort) and makes the centroids reproducible
            r["embedding"]
            for r in emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(4096)
            .collect()
        ],
        dtype=np.float64,
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    centers = kmeans_fit(sample, n_cells, seed=seed)

    from pyspark.sql.types import LongType, StructField, StructType

    assign_schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("cell", LongType(), False)]
    )

    def assign(batches):
        for pdf in batches:
            X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(X @ centers.T, axis=1)  # nearest on the sphere
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype(np.int64), "cell": cells})

    cells = emb.select("vec_id", "embedding").mapInPandas(assign, assign_schema)

    def probe(batches):
        for pdf in batches:
            X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(X @ centers.T), axis=1)[:, :n_probe]
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(np.int64), n_probe),
                    "cell": order.reshape(-1),
                }
            )
            yield out

    q_cells = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .mapInPandas(probe, assign_schema)
        .withColumnRenamed("vec_id", "qid")
    )

    qv = quantized(emb)
    cand = (
        F.broadcast(q_cells)
        .join(cells, "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", F.col("vec_id").alias("vid"))
        .distinct()
    )
    scored = (
        cand.join(
            F.broadcast(
                qv.filter(F.col("vec_id") < n_queries).select(
                    F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
                    F.col("norm2").alias("na"),
                )
            ),
            "qid",
        )
        .join(
            qv.select(F.col("vec_id").alias("vid"), F.col("q").alias("cq"),
                      F.col("norm2").alias("nb")),
            "vid",
        )
        .select(
            "qid", "vid", "na", "nb",
            F.expr(
                "aggregate(zip_with(qq, cq, (a, b) -> a * b), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x)"
            ).alias("dot"),
        )
        .select("qid", "vid", "dot", "na", "nb", F.expr(COS_SQL).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "vid", F.col("rk").cast("long").alias("rk"), "dot", "cos")
    )


def ivfpq_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5,
    n_cells: int = 16, n_probe: int = 4,
    m_sub: int = 16, n_codes: int = 64,
    rerank: int = 4, seed: int = 42,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k (Jégou, Douze, Schmid: "Product
    Quantization for Nearest Neighbor Search", PAMI 2011) — the
    memory-scale ANN path: on top of the IVF coarse cells, every vector
    is PRODUCT-QUANTIZED — its L2-normalized form is split into
    ``m_sub`` subvectors, each encoded as the id of its nearest
    per-subspace k-means codeword — so a 64-dim float32 vector (256 B)
    stores as ``m_sub`` single-byte codes (16x compression at the
    defaults), which is what lets a 10^12-vector index live in cluster
    memory. Defaults (16 subspaces x 64 codes) are tuned for the
    near-random synthetic embeddings here — PQ's hardest case (real
    embeddings have low intrinsic dimension and quantize far better);
    measured mean reconstruction error 0.36 on unit vectors, ADC
    shortlist recall@5 = 0.975 at depth 4k.

    Query path = classic ADC (asymmetric distance computation): the
    query stays full-precision and precomputes one ``m_sub x n_codes``
    table of subspace dot products; a candidate's approximate dot is
    ``sum_j table[j, code_j]`` — a table lookup per subspace, no float
    math per dimension. The top ``rerank * k`` by ADC score are
    re-scored with the exact integer cosine (the standard re-rank that
    recovers recall lost to quantization), ties broken by vec_id.

    Fit is the bounded driver sample (fit-broadcast-score): coarse
    centroids + per-subspace codebooks broadcast in task closures;
    encoding is one map-side Arrow pass; the probe join touches
    ``n_probe / n_cells`` of the codes. Float-iterative k-means -> no
    SQL oracle; pytest pins recall against the exact brute force."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    from dtaianomaly_spark.kernels.detectors import kmeans_fit

    sample = np.asarray(
        [
            # deterministic training sample: an unordered limit() is not
            # stable across runs/partition layouts once the input exceeds
            # the cap; the vec_id top-k is a TakeOrderedAndProject (heap
            # scan, no full sort) and makes the centroids reproducible
            r["embedding"]
            for r in emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(4096)
            .collect()
        ],
        dtype=np.float64,
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    dim = sample.shape[1]
    if dim % m_sub != 0:
        raise ValueError(f"m_sub={m_sub} must divide the dimension {dim}")
    d_sub = dim // m_sub
    centers = kmeans_fit(sample, n_cells, seed=seed)
    codebooks = np.stack(
        [
            kmeans_fit(
                np.ascontiguousarray(sample[:, j * d_sub : (j + 1) * d_sub]),
                n_codes, seed=seed + 1 + j,
            )
            for j in range(m_sub)
        ]
    )  # (m_sub, n_codes, d_sub)

    code_schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("cell", LongType(), False),
            StructField("codes", ArrayType(IntegerType()), False),
        ]
    )

    def encode(batches):
        for pdf in batches:
            X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(X @ centers.T, axis=1)
            codes = np.empty((X.shape[0], m_sub), dtype=np.int32)
            for j in range(m_sub):
                sub = X[:, j * d_sub : (j + 1) * d_sub]
                d2 = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * sub @ codebooks[j].T
                    + (codebooks[j] * codebooks[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype(np.int64),
                    "cell": cells,
                    "codes": list(codes),
                }
            )

    coded = emb.select("vec_id", "embedding").mapInPandas(encode, code_schema)

    # query-side: n_probe nearest cells + the full-precision normalized query
    probe_schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("cell", LongType(), False),
            StructField("qnorm", ArrayType(DoubleType()), False),
        ]
    )

    def probe(batches):
        for pdf in batches:
            X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(X @ centers.T), axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(pdf["vec_id"].to_numpy(np.int64), n_probe),
                    "cell": order.reshape(-1),
                    "qnorm": [x for x in X for _ in range(n_probe)],
                }
            )

    q_cells = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .mapInPandas(probe, probe_schema)
    )

    adc_schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("vid", LongType(), False),
            StructField("adc", DoubleType(), False),
        ]
    )

    def adc(batches):
        tables: dict = {}
        for pdf in batches:
            qids = pdf["qid"].to_numpy(np.int64)
            vids = pdf["vec_id"].to_numpy(np.int64)
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            out = np.empty(qids.shape[0])
            for qid in np.unique(qids):
                sel = qids == qid
                qn = np.asarray(
                    pdf.loc[sel, "qnorm"].iloc[0], dtype=np.float64
                )
                tab = tables.get(qid)
                if tab is None:
                    # (m_sub, n_codes) subspace dot-product table
                    tab = np.stack(
                        [
                            codebooks[j] @ qn[j * d_sub : (j + 1) * d_sub]
                            for j in range(m_sub)
                        ]
                    )
                    tables[qid] = tab
                c = codes[sel]
                out[sel] = tab[np.arange(m_sub)[None, :], c].sum(axis=1)
            yield pd.DataFrame({"qid": qids, "vid": vids, "adc": out})

    cand = (
        F.broadcast(q_cells)
        .join(coded, "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "qnorm", "vec_id", "codes")
    )
    approx = cand.mapInPandas(adc, adc_schema)
    wa = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("vid"))
    short = (
        approx.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= rerank * k)
        .select("qid", "vid")
    )

    qv = quantized(emb)
    scored = (
        short.join(
            F.broadcast(
                qv.filter(F.col("vec_id") < n_queries).select(
                    F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
                    F.col("norm2").alias("na"),
                )
            ),
            "qid",
        )
        .join(
            qv.select(F.col("vec_id").alias("vid"), F.col("q").alias("cq"),
                      F.col("norm2").alias("nb")),
            "vid",
        )
        .select(
            "qid", "vid", "na", "nb",
            F.expr(
                "aggregate(zip_with(qq, cq, (a, b) -> a * b), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x)"
            ).alias("dot"),
        )
        .select("qid", "vid", "dot", "na", "nb", F.expr(COS_SQL).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "vid", F.col("rk").cast("long").alias("rk"), "dot", "cos")
    )


def embed_neardup_pairs(
    emb: DataFrame, threshold: float = 0.4, probe_bits: int = 1
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-mode twin of
    the ANN search: ALL vector pairs sharing any (multi-probed) SRP
    bucket are candidates, deduplicated, then kept iff their EXACT
    integer cosine >= threshold. Output (va, vb, dot, cos), va < vb.

    Scale shape: the self-join shuffles on (table, bucket) — candidate
    volume is Σ per-bucket sizes², never N², and the probe expansion is
    applied to ONE side so each unordered pair is generated at most
    2T(1+bits) times before the dedup. Candidate generation is
    deterministic (the hyperplanes are hash-derived), so the DuckDB
    oracle reproduces the result bit-for-bit — including which
    near-dups the LSH recalls."""
    return _neardup_pairs_from_qv(quantized(emb), threshold, probe_bits)


def _neardup_pairs_from_qv(
    qv: DataFrame, threshold: float, probe_bits: int = 1
) -> DataFrame:
    """SRP-bucketed candidate pairs + exact integer-cosine filter over
    any pre-quantized (vec_id, q, norm2) frame — shared by the
    embedding near-dup pipeline and the correlated-series finder."""
    bk = _srp_buckets(qv)
    probes = [F.expr("bucket")]
    if probe_bits >= 1:
        probes += [
            F.expr(f"CAST(bucket ^ {1 << b} AS BIGINT)") for b in range(SRP_BITS)
        ]
    a_probed = bk.select(
        F.col("vec_id").alias("va"), "t",
        F.explode(F.array(*probes)).alias("pb"),
    ).distinct()
    ap = a_probed.alias("ap")
    bb = bk.select(F.col("vec_id").alias("vb"), "t", "bucket").alias("bb")
    cand = (
        ap.join(
            bb,
            (F.col("ap.t") == F.col("bb.t")) & (F.col("ap.pb") == F.col("bb.bucket")),
        )
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    scored = (
        cand.join(
            qv.select(F.col("vec_id").alias("va"), F.col("q").alias("qa"),
                      F.col("norm2").alias("na")),
            "va",
        )
        .join(
            qv.select(F.col("vec_id").alias("vb"), F.col("q").alias("qb"),
                      F.col("norm2").alias("nb")),
            "vb",
        )
        .select(
            "va", "vb", "na", "nb",
            F.expr(
                "aggregate(zip_with(qa, qb, (a, b) -> a * b), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x)"
            ).alias("dot"),
        )
        .select("va", "vb", "dot", F.expr(COS_SQL).alias("cos"))
    )
    return scored.filter(F.col("cos") >= threshold)


def srp_lsh_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5, probe_bits: int = 1
) -> DataFrame:
    """Approximate cosine top-k: candidates = vectors sharing ANY hash
    table's bucket with the query (deduplicated before scoring), then
    exact integer cosine within the candidate set.

    ``probe_bits=1`` enables MULTI-PROBE: each query also probes the
    buckets at Hamming distance 1 (each single bit flipped) — the
    standard trick for recall without more tables, since near neighbors
    that straddle one hyperplane land one bit away. Probing is
    query-side only: storage and build cost are unchanged, the probe
    list stays tiny (T x (1+bits) buckets per query), and the exact
    re-scoring pass bounds the cost of extra candidates. Measured on the
    sf0.01 embeddings (near-uniform vectors — the HARD case for SRP,
    where pruning lift is inherently weak): recall@5 0.425 -> 0.725 at
    4 tables; clustered real-world embeddings see far better
    pruning-at-recall from the same machinery."""
    qv = quantized(emb)
    bk = _srp_buckets(qv)
    probes = [F.expr("qb0")]
    if probe_bits >= 1:
        probes += [
            F.expr(f"CAST(qb0 ^ {1 << b} AS BIGINT)") for b in range(SRP_BITS)
        ]
    q_b = (
        bk.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("qid"), "t", F.col("bucket").alias("qb0"))
        .select("qid", "t", F.explode(F.array(*probes)).alias("qb"))
        .distinct()
    )
    qs_, cs_ = q_b.alias("qs"), bk.alias("cs")
    cand_pairs = (
        F.broadcast(qs_)
        .join(cs_, (F.col("qs.t") == F.col("cs.t")) & (F.col("qs.qb") == F.col("cs.bucket")))
        .filter(F.col("qs.qid") != F.col("cs.vec_id"))
        .select(F.col("qs.qid").alias("qid"), F.col("cs.vec_id").alias("vid"))
        .distinct()
    )
    scored = (
        cand_pairs.join(
            F.broadcast(
                qv.filter(F.col("vec_id") < n_queries).select(
                    F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
                    F.col("norm2").alias("na"),
                )
            ),
            "qid",
        )
        .join(
            qv.select(
                F.col("vec_id").alias("vid"), F.col("q").alias("cq"),
                F.col("norm2").alias("nb"),
            ),
            "vid",
        )
        .select(
            "qid", "vid", "na", "nb",
            F.expr(
                "aggregate(zip_with(qq, cq, (a, b) -> a * b), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x)"
            ).alias("dot"),
        )
        .select("qid", "vid", "dot", "na", "nb", F.expr(COS_SQL).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "vid", F.col("rk").cast("long").alias("rk"), "dot", "cos")
    )


def semdedup(
    emb: DataFrame, n_cells: int = 16, eps: float = 0.05, seed: int = 42
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") — semantic
    near-duplicate PRUNING, the curation step between exact/fuzzy text
    dedup and model training: cluster the embedding space, then inside
    each cluster drop every example whose cosine similarity to an
    earlier-ranked example exceeds ``1 - eps``, where the rank order is
    centroid-similarity DESCENDING — so of each semantic-duplicate
    group the example FARTHEST from the centroid survives (the paper's
    keep-hard rule).

    Physical shape, the IVF build reused as a dedup partitioner:

    * centroid fit — seeded k-means on a bounded normalized sample
      (driver-fit, broadcast in the task closure: the fit-broadcast-
      score pattern shared with :func:`ivf_topk`);
    * assignment + centroid similarity — ONE map-only Arrow pass;
    * the greedy scan — one shuffle on ``cell``, then a per-cluster
      O(c^2) Arrow kernel.  At 100 TB ``n_cells`` scales with the
      corpus (SemDeDup runs 50k clusters over LAION-440M) so the
      per-cluster pair matrix stays bounded; the cross-cluster pair
      space is never materialized.

    Determinism: the sample, k-means seed, and the (csim DESC, vec_id)
    scan order are all fixed, so keep/drop verdicts are reproducible;
    pytest pins them against an independent brute-force oracle.
    Output: (vec_id, cell, csim, keep) for every input vector."""
    import numpy as np
    import pandas as pd

    from dtaianomaly_spark.kernels.detectors import kmeans_fit

    sample = np.asarray(
        [
            # deterministic training sample: an unordered limit() is not
            # stable across runs/partition layouts once the input exceeds
            # the cap; the vec_id top-k is a TakeOrderedAndProject (heap
            # scan, no full sort) and makes the centroids reproducible
            r["embedding"]
            for r in emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(4096)
            .collect()
        ],
        dtype=np.float64,
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    centers = kmeans_fit(sample, n_cells, seed=seed)

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    assign_schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("cell", LongType(), False),
            StructField("csim", DoubleType(), False),
            StructField("embedding", emb.schema["embedding"].dataType, False),
        ]
    )

    def assign(batches):
        for pdf in batches:
            X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            sims = X @ centers.T
            cells = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype(np.int64),
                    "cell": cells.astype(np.int64),
                    "csim": sims[np.arange(len(cells)), cells],
                    "embedding": pdf["embedding"],
                }
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, assign_schema
    )

    out_schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("cell", LongType(), False),
            StructField("csim", DoubleType(), False),
            StructField("keep", BooleanType(), False),
        ]
    )

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["csim", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ X.T
        # drop i iff ANY earlier-ranked j has sim > 1 - eps (the public
        # implementation's strict upper-triangular max — j's own verdict
        # does not matter)
        # mask, don't zero: np.triu would leave literal 0.0 in the
        # excluded cells, clamping each column max at 0 — wrong for the
        # rank-0 item (no predecessors -> must be -inf) and for columns
        # whose true max similarity is negative
        n = len(pdf)
        iu = np.arange(n)
        tri = np.where(iu[:, None] < iu[None, :], sims, -np.inf)
        mx = tri.max(axis=0, initial=-np.inf)
        keep = ~(mx > 1.0 - eps)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].astype(np.int64),
                "cell": pdf["cell"].astype(np.int64),
                "csim": pdf["csim"],
                "keep": keep,
            }
        )

    return assigned.groupBy("cell").applyInPandas(prune, out_schema)


def kcenter_coreset(emb: DataFrame, k: int = 8) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal; Sener & Savarese 2018 use exactly this greedy as the
    active-learning/data-pruning coreset) under cosine distance
    ``1 - cos``: start from the lowest vec_id, then ``k - 1`` times pick
    the vector FARTHEST from the selected set — the classic 2-approx of
    the k-center cover, and the diversity-sampling step of a pruning
    pipeline (SemDeDup removes redundancy; k-center picks spread).

    Round shape (the BPE-trainer economics): selection is an ACTION at
    construction — per round ONE 1-row argmax collect and one lazy
    map-only min-distance update against the new center (its quantized
    vector enters the plan as a 64-literal array; ``localCheckpoint``
    bounds the k-deep lineage). The returned frame is the lazy
    assignment pass: broadcast the k centers, exact-integer-cosine to
    each, ``min_by`` per vector — (vec_id, center_id, center_rk, dist,
    is_center).

    Distances use the repo's exactness discipline: int64-quantized dot
    products and the ONE shared float formula (``COS_SQL``), so
    selections and distances are bit-reproducible — the pytest oracle
    reproduces them with exact equality, ties broken by vec_id."""
    qv = quantized(emb)
    state = qv.select(
        "vec_id", "q", "norm2", F.lit(2.0).alias("mindist")
    )
    centers = []  # (rk, vec_id, q, norm2, radius)
    for r in range(int(k)):
        if r == 0:
            row = qv.orderBy("vec_id").limit(1).collect()[0]
            radius = None  # no cover yet
        else:
            row = (
                state.orderBy(F.col("mindist").desc(), "vec_id")
                .limit(1)
                .collect()[0]
            )
            radius = float(row["mindist"])
            if radius == 0.0:
                # every vector coincides with a selected center (k
                # exceeds the number of distinct points) — stop early
                break
        centers.append(
            (r + 1, int(row["vec_id"]), list(row["q"]), int(row["norm2"]), radius)
        )
        qlit = F.array(*[F.lit(int(v)) for v in row["q"]])
        # alias the round's columns to the names COS_SQL expects so the
        # shared constant is used verbatim (substring-rewriting it is
        # fragile against future edits to the formula)
        dist = F.lit(1.0) - F.expr(COS_SQL)
        state = (
            state.select(
                "vec_id", "q", "norm2", "mindist",
                F.aggregate(
                    F.zip_with("q", qlit, lambda a, b: a * b),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ).alias("dot"),
                F.col("norm2").alias("na"),
                F.lit(int(row["norm2"])).alias("nb"),
            )
            .select(
                "vec_id", "q", "norm2",
                F.least("mindist", dist).alias("mindist"),
            )
            .localCheckpoint(eager=False)
        )
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(rk, vid, q, n2) for rk, vid, q, n2, _ in centers],
        schema="center_rk long, center_id long, cq array<bigint>, cn bigint",
    )
    scored = (
        qv.crossJoin(F.broadcast(cdf))
        .select(
            "vec_id",
            "center_rk",
            "center_id",
            F.expr(
                "aggregate(zip_with(q, cq, (a, b) -> a * b), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("norm2").alias("na"),
            F.col("cn").alias("nb"),
        )
        .select(
            "vec_id", "center_rk", "center_id",
            (F.lit(1.0) - F.expr(COS_SQL)).alias("dist"),
        )
    )
    best = scored.groupBy("vec_id").agg(
        F.min_by(
            F.struct("dist", "center_rk", "center_id"),
            F.struct("dist", "center_rk"),
        ).alias("s")
    )
    return best.select(
        "vec_id",
        F.col("s.center_id").alias("center_id"),
        F.col("s.center_rk").alias("center_rk"),
        F.col("s.dist").alias("dist"),
        (F.col("vec_id") == F.col("s.center_id")).alias("is_center"),
    )


def series_corr_pairs(
    long_form: DataFrame,
    bucket_ticks: int = 64,
    n_buckets: int = 16,
    threshold: float = 0.9,
    probe_bits: int = 1,
) -> DataFrame:
    """Correlated-series discovery (the classic TSDB "which metrics move
    together" feature): all series pairs whose PEARSON CORRELATION of
    bucket-mean profiles reaches ``threshold``, found with the
    embedding pipeline's SRP-LSH candidate machinery instead of the
    O(N^2) all-pairs scan.

    The exactness trick: over the first ``n_buckets`` FULL buckets
    (every bucket holds exactly ``bucket_ticks`` points, so means are
    sums / a shared constant), the centered profile
    ``v_i = B * sum_i - sum_j sum_j`` is an exact int64 vector, and
    Pearson(means) == cosine(v) IDENTICALLY — centering and the shared
    1/(B * ticks) scale cancel in the cosine. So the exact
    integer-cosine filter the near-dup pipeline already has IS the
    correlation test; one float divide at the end, bit-reproducible.
    Constant-profile series (norm2 = 0, undefined correlation) are
    excluded explicitly. Output (va, vb, dot, cos), va < vb, cos =
    the exact Pearson correlation.

    Scale shape: inherited from :func:`embed_neardup_pairs` — the
    self-join shuffles on (table, bucket); candidate volume is the sum
    of per-bucket sizes squared, never N^2. Series shorter than
    ``n_buckets * bucket_ticks`` ticks don't participate (documented
    contract: correlation needs aligned windows).

    Magnitude check for int64 exactness: |sum_i| <= ticks * max|value|,
    |v_i| <= 2 B ticks max|value| (~10^6 at the defaults), squares
    ~10^12, B-dim dots ~10^13 — comfortably exact."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    b = n_buckets
    sums = (
        long_form.filter(F.col("pos") < b * bucket_ticks)
        .groupBy(
            "doc_id",
            (F.col("pos") / bucket_ticks).cast("long").alias("bucket"),
        )
        .agg(
            F.sum("value").cast("long").alias("s"),
            F.count("*").alias("c"),
        )
    )
    prof = (
        sums.groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(bucket, s, c))),"
                " e -> e.s)"
            ).alias("sv"),
            F.count("*").alias("nb"),
            F.min("c").alias("minc"),
        )
        .filter((F.col("nb") == b) & (F.col("minc") == bucket_ticks))
    )
    qv = prof.select(
        F.col("doc_id").alias("vec_id"),
        F.expr(
            f"transform(sv, s -> {int(b)}L * s"
            " - aggregate(sv, 0L, (acc, x) -> acc + x))"
        ).alias("q"),
    ).select("vec_id", "q", F.expr(_SELF_DOT).alias("norm2"))
    qv = qv.filter(F.col("norm2") > 0)
    return _neardup_pairs_from_qv(qv, threshold, probe_bits)


DTW_PAA = 64     # PAA width before DTW (PDTW, Keogh & Pazzani 2000);
                 # == the corpus minimum series length, so EVERY series
                 # reduces to exactly DTW_PAA points and envelopes align
DTW_BAND = 8     # Sakoe-Chiba radius on PAA positions (12.5%)
DTW_PRUNE = 32   # LB_Keogh survivors per query that reach exact DTW


def series_dtw_topk(
    tokens: DataFrame,
    n_queries: int = 4,
    k: int = 8,
    paa: int = DTW_PAA,
    band: int = DTW_BAND,
    m: int = DTW_PRUNE,
) -> DataFrame:
    """DTW similarity search over token series — the UCR-Suite shape
    (Rakthanmanon et al. 2012) re-expressed in Spark: every series is
    PAA-reduced to ``paa`` points and z-normalized in ONE map-only
    Arrow pass (kernels/dtw.py:paa_znorm); each of the ``n_queries``
    lowest-doc_id series becomes a query whose Sakoe-Chiba envelope
    (U/L arrays) is built with array HOFs; the LB_Keogh lower bound —
    a cheap JVM-side fold over (candidate, envelope) — prunes the
    corpus to ``m`` candidates per query (rank by lb, doc_id), and only
    those survivors pay the exact banded-DTW DP in the second Arrow
    stage. Result: top ``k`` nearest neighbours per query by exact
    banded DTW (squared-cost domain), ties to the lower doc_id.

    The operator's CONTRACT is "top-k by exact DTW among the m-best
    LB_Keogh candidates" — a deterministic, well-defined approximate
    search (pytest replays the contract in NumPy bit-for-bit and pins
    the m >= corpus path against brute force). Recall at fixed m
    depends on how much structure the corpus has: LB_Keogh is tight on
    shaped series and loose on noise-like ones (this synthetic corpus
    is the worst case — raise m when the bound is loose). The
    admissible-bound guarantee LB_Keogh <= banded DTW is
    property-tested separately.

    Scale shape: the normalize pass is map-only over token_arrays; the
    LB stage crossJoins each candidate row against the BROADCAST
    ``n_queries``-row query frame (map-side, no candidate shuffle) and
    the only shuffles are the two tiny rank windows over (qid,
    bounded-candidate) rows. DTW cost is m * n_queries * O(paa * band)
    — independent of corpus size, which only pays the linear PAA pass
    and the LB fold. Deterministic: PAA/z-norm/LB all fold in fixed
    array order, the DP is sequential, ties break on doc_id."""
    import numpy as np
    import pandas as pd

    from dtaianomaly_spark.kernels import dtw as DTW

    if not (0 < k <= m):
        raise ValueError(f"need 0 < k <= m, got k={k} m={m}")

    znorm_schema = "doc_id long, z array<double>"

    def _znorm(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "z": [
                    DTW.paa_znorm(np.asarray(t, dtype=np.float64), paa).tolist()
                    for t in pdf["tokens"]
                ],
            })

    z = tokens.select("doc_id", "tokens").mapInPandas(_znorm, znorm_schema)
    z = z.persist()

    p = f"size(z)"
    qf = (
        z.orderBy("doc_id").limit(n_queries)
        .select(
            F.col("doc_id").alias("qid"),
            F.col("z").alias("qz"),
            F.expr(
                f"transform(sequence(0, {p} - 1), i ->"
                f" array_max(slice(z, greatest(i - {band}, 0) + 1,"
                f" least(i + {band} + 1, {p}) - greatest(i - {band}, 0))))"
            ).alias("u"),
            F.expr(
                f"transform(sequence(0, {p} - 1), i ->"
                f" array_min(slice(z, greatest(i - {band}, 0) + 1,"
                f" least(i + {band} + 1, {p}) - greatest(i - {band}, 0))))"
            ).alias("l"),
        )
    )
    # LB_Keogh fold in fixed position order (matches the kernel's cumsum)
    lb_sql = (
        "aggregate(transform(sequence(0, size(z) - 1), i ->"
        " CASE WHEN z[i] > u[i] THEN (z[i] - u[i]) * (z[i] - u[i])"
        "      WHEN z[i] < l[i] THEN (l[i] - z[i]) * (l[i] - z[i])"
        "      ELSE CAST(0 AS DOUBLE) END),"
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    scored = (
        z.crossJoin(F.broadcast(qf))
        .filter(F.col("doc_id") != F.col("qid"))
        .withColumn("lb", F.expr(lb_sql))
    )
    wlb = Window.partitionBy("qid").orderBy("lb", "doc_id")
    cand = (
        scored.withColumn("r", F.row_number().over(wlb))
        .filter(F.col("r") <= m)
        .select("qid", "qz", "doc_id", "z", "lb")
    )

    dtw_schema = "qid long, doc_id long, lb double, dtw double"

    def _exact(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "qid": pdf["qid"].astype("int64"),
                "doc_id": pdf["doc_id"].astype("int64"),
                "lb": pdf["lb"].astype("float64"),
                "dtw": [
                    DTW.dtw_banded(
                        np.asarray(q, dtype=np.float64),
                        np.asarray(c, dtype=np.float64),
                        band,
                    )
                    for q, c in zip(pdf["qz"], pdf["z"])
                ],
            })

    exact = cand.mapInPandas(_exact, dtw_schema)
    wk = Window.partitionBy("qid").orderBy("dtw", "doc_id")
    return (
        exact.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "rank", "lb", "dtw")
    )


def centroid_drift(emb: DataFrame) -> DataFrame:
    """Per-label centroid drift: for each label, the cosine similarity
    between the label's embedding centroid and the corpus-wide
    centroid — the cluster-coherence / distribution-shift monitor on
    the embedding side (the geometric sibling of tx_source_drift's
    vocabulary chi-square). Cosine is scale-invariant, so centroids
    are represented by their quantized SUM vectors: every coordinate
    sum is exact int64 (``QUANT_EXPR``), the three dot products are
    computed as deterministic idx-sorted folds of per-coordinate
    products in DOUBLE (the products may exceed int64 at corpus
    scale), and the one cosine formula is shared with the oracle
    bit-for-bit.

    Output: (label, n_vecs, dot_lg, norm_l, norm_g, cos_centroid).

    Scale shape: ONE (label, idx) hash aggregate over the exploded
    coordinates (map-side combined — the only corpus-sized stage),
    then label-level folds over d-length arrays; the global vector
    derives from the same cells (checkpointed, not re-scanned) and
    broadcasts as one row."""
    cells = (
        emb.select(
            "label", F.posexplode(F.expr(QUANT_EXPR)).alias("idx", "qe")
        )
        .groupBy("label", "idx")
        .agg(F.sum("qe").alias("s"))
        .localCheckpoint(eager=False)
    )
    counts = emb.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs")
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(idx, {t}))),"
        " s -> {expr}), CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    glob = (
        cells.groupBy("idx").agg(F.sum("s").alias("g"))
    )
    per_label = (
        cells.join(F.broadcast(glob), "idx")
        .groupBy("label")
        .agg(
            F.expr(fold.format(
                t="CAST(s AS DOUBLE) * CAST(g AS DOUBLE) AS v",
                expr="s.v",
            )).alias("dot_lg"),
            F.expr(fold.format(
                t="CAST(s AS DOUBLE) * CAST(s AS DOUBLE) AS v",
                expr="s.v",
            )).alias("dot_ll"),
            F.expr(fold.format(
                t="CAST(g AS DOUBLE) * CAST(g AS DOUBLE) AS v",
                expr="s.v",
            )).alias("dot_gg"),
        )
    )
    return per_label.join(F.broadcast(counts), "label").select(
        "label", "n_vecs", "dot_lg",
        F.expr("sqrt(dot_ll)").alias("norm_l"),
        F.expr("sqrt(dot_gg)").alias("norm_g"),
        F.expr(
            "CASE WHEN dot_ll > 0 AND dot_gg > 0"
            " THEN dot_lg / (sqrt(dot_ll) * sqrt(dot_gg))"
            " ELSE NULL END"
        ).alias("cos_centroid"),
    )


def label_silhouette(emb: DataFrame) -> DataFrame:
    """Simplified (centroid-based) silhouette per label — the
    clustering-quality report over the embedding labels: for each
    vector, a = squared distance to its OWN label centroid, b = the
    minimum squared distance to any OTHER label centroid, and the
    silhouette s = (b − a) / max(a, b); the report is each label's
    mean silhouette. The centroid form (Hruschka et al.'s simplified
    silhouette) replaces the O(n²) pairwise original with per-centroid
    distances — the variant that scales, and the one whose arithmetic
    can stay exact: with centroid c_j = s_j / n_j,

        dist²(x, j) = x·x − 2·(x·s_j)/n_j + (s_j·s_j)/n_j²

    where x·x, x·s_j and s_j·s_j are EXACT int64 dots of quantized
    vectors; the double formula above is shared with the oracle term
    by term, so every distance — and therefore every min, every
    silhouette and every idx-sorted mean fold — reproduces
    bit-for-bit.

    Output: (label, n_vecs, mean_sil).

    Scale shape: the only corpus-sized SHUFFLE is the (label, idx)
    centroid aggregate; scoring is a map-side pass — the ≤ |labels|
    centroid-array table broadcasts, each vector computes its
    |labels| exact integer dots inside the row via zip_with folds
    (integer addition is order-free, so no sorted fold is needed
    there), and only the |vecs|·1 silhouette rows and the final
    label fold shuffle. No vector ever meets another vector."""
    qv = emb.select(
        "vec_id", "label", F.expr(QUANT_EXPR).alias("q")
    )
    cells = (
        qv.select("label", F.posexplode("q").alias("idx", "qe"))
        .groupBy("label", "idx")
        .agg(F.sum("qe").alias("s"))
    )
    cent = (
        cells.groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(idx, s))),"
                " t -> t.s)"
            ).alias("sv"),
            F.sum(F.expr("s * s")).alias("ss"),
        )
        .join(
            qv.groupBy("label").agg(
                F.count("*").cast("long").alias("n")
            ),
            "label",
        )
        .select(
            F.col("label").alias("clabel"), "sv", "ss", "n"
        )
    )
    scored = (
        qv.join(F.broadcast(cent))
        .select(
            "vec_id", "label", "clabel", "ss", "n",
            F.expr(
                "aggregate(zip_with(q, sv, (x, y) -> x * y),"
                " CAST(0 AS BIGINT), (a, x) -> a + x)"
            ).alias("dot"),
            F.expr(
                "aggregate(transform(q, x -> x * x),"
                " CAST(0 AS BIGINT), (a, x) -> a + x)"
            ).alias("xx"),
        )
        .select(
            "vec_id", "label", "clabel",
            F.expr(
                "CAST(xx AS DOUBLE) - 2 * CAST(dot AS DOUBLE) / n"
                " + CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * n)"
            ).alias("d2"),
        )
    )
    ab = scored.groupBy("vec_id", F.col("label").alias("own")).agg(
        F.min(F.expr("CASE WHEN clabel = label THEN d2 END")).alias("a"),
        F.min(F.expr("CASE WHEN clabel != label THEN d2 END")).alias("b"),
    )
    sil = ab.select(
        "vec_id", "own",
        F.expr(
            "CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)"
            " ELSE CAST(0 AS DOUBLE) END"
        ).alias("sil"),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(vec_id,"
        " sil))), s -> s.sil), CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    return sil.groupBy(F.col("own").alias("label")).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.expr(f"{fold} / count(*)").alias("mean_sil"),
    )
