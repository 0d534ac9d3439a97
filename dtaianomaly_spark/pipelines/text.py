"""Text pipeline: dedup (exact, MinHash/LSH, SimHash, n-gram Jaccard),
language-ID heuristic, quality scoring, token counting, fingerprinting.

Portability discipline: shingle hashes are ``conv(md5) % (2^31-1)`` —
md5 hex is identical across engines, and all downstream arithmetic stays
in int64 with explicit bounds (documented per function), so the DuckDB
oracles in ``__spark_entry__`` reproduce every value bit-for-bit.

Scale notes: shingling, MinHash signatures and SimHash are computed with
array HOFs inside each row (``transform`` / ``aggregate`` /
``array_min``) — map-side, zero shuffle, whole-stage-codegen'd. Only the
pair-generation steps shuffle: LSH bucket join (the point of LSH — the
shuffle key is the band bucket, so only near-duplicates collide) and the
n-gram inverted-index join (bounded by shingle document frequency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SHINGLE_K = 8
# Default shingling scope. ``None`` = shingle the ENTIRE document body —
# the right default for near-dup detection (a head-prefix cap makes every
# fuzzy-dedup signal blind to body-level duplication). For corpora with
# multi-KB documents, bound cost with ``limit`` (hard prefix cap) or
# ``stride`` (see the whole body at 1/stride the shingles) — both are
# honest, documented cost/recall trades; stride keeps body coverage.
SHINGLE_LIMIT = None
SHINGLE_STRIDE = 1
P31 = 2147483647  # 2^31 - 1
N_HASHES = 16
BAND_ROWS = 4  # 4 bands x 4 rows

# shingle hash of the k-gram starting at 1-based position i (Spark SQL text)
_SHINGLE_HASH = (
    "CAST(conv(substr(md5(substr(text, i, {k})), 1, 15), 16, 10) AS BIGINT)"
    " % {p}"
)


def shingles_expr(
    limit: int | None = SHINGLE_LIMIT,
    stride: int = SHINGLE_STRIDE,
    k: int = SHINGLE_K,
) -> str:
    """Spark SQL text producing the k-gram shingle-hash array for a
    ``text`` column. ``limit=None`` shingles the full document;
    ``stride > 1`` samples every stride-th position (chunked full-text
    mode — body coverage at reduced cost)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    lim = "length(text)" if limit is None else f"least(length(text), {int(limit)})"
    bound = f"greatest({lim} - {k} + 1, 1)"
    seq = (
        f"sequence(1, {bound})" if stride == 1
        else f"sequence(1, {bound}, {int(stride)})"
    )
    return f"transform({seq}, i -> " + _SHINGLE_HASH.format(k=k, p=P31) + ")"


SHINGLES_EXPR = shingles_expr()


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents table, repartitioned up to the session parallelism when
    the source has fewer input splits than cores: every downstream text
    op multiplies per-doc work by ~300 (one md5 per shingle position), so
    a single-file scan would otherwise pin the whole map phase to ONE
    core (measured 8x on the shingle pass). The repartition shuffles only
    the raw docs (KBs per row); at cluster scale the table has thousands
    of splits and the guard is a no-op."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    if _input_splits(docs) < par:
        docs = docs.repartition(par)
    return docs


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct text,
    the smallest doc_id kept as representative. A plain hash aggregate —
    the canonical first dedup pass at any scale."""
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_cnt"),
        )
    )


def doc_shingles(
    docs: DataFrame,
    limit: int | None = SHINGLE_LIMIT,
    stride: int = SHINGLE_STRIDE,
) -> DataFrame:
    """(doc_id, shingles array<bigint>) — distinct k-gram hashes per doc,
    computed entirely inside the row (no explode). Full-body by default;
    ``limit``/``stride`` bound cost for long-document corpora."""
    return docs.select(
        "doc_id",
        F.expr(f"array_distinct({shingles_expr(limit, stride)})").alias("shingles"),
    )


def _input_splits(docs: DataFrame) -> int:
    """Input-split proxy for the window-vs-anti strategy switch, WITHOUT
    converting the plan to an RDD (``df.rdd.getNumPartitions()`` forces
    an RDD conversion of the whole query plan): the number of underlying
    input files. Derived frames with no file lineage fall back to the
    session default parallelism."""
    try:
        files = docs.inputFiles()
    except Exception:
        files = []
    if files:
        return len(files)
    return docs.sparkSession.sparkContext.defaultParallelism


MAX_SHINGLE_DF = 50  # drop shingles occurring in more docs (stop-shingles)


def informative_shingles(
    docs: DataFrame, max_df: int = MAX_SHINGLE_DF, strategy: str = "auto",
    limit: int | None = SHINGLE_LIMIT, stride: int = SHINGLE_STRIDE,
) -> DataFrame:
    """Long form (doc_id, s) restricted to shingles with document
    frequency <= max_df. Stop-shingle removal is what makes EVERY
    similarity op here meaningful and scalable: super-common shingles
    (a) dominate MinHash minima so unrelated docs collide, (b) blow the
    inverted-index join up quadratically in df, and (c) wash out SimHash
    majority votes.

    Two physical strategies, same result (verified row/hash-equal):

    * ``window`` — count-over-window on the exploded table: the md5
      shingle expression evaluates ONCE, but every (doc, s) row goes
      through a full sort shuffle. Wins while the input is small enough
      that shingle-hash CPU dominates (measured 1.9x faster at sf0.1 /
      1 input split).
    * ``anti`` — groupBy(s) partial counts -> tiny high-df stop set ->
      broadcast LEFT ANTI join. Shuffles only map-side-combined
      (s, partial_count) rows — orders of magnitude less than the full
      sort — at the price of evaluating the shingle expression on two
      plan branches (linear executor CPU, which scales out; the sort
      shuffle does not). The correct shape at cluster scale.

    ``auto`` picks by input parallelism: a many-split scan implies the
    sort shuffle would dominate -> ``anti``; a handful of splits is the
    CPU-bound regime -> ``window``."""
    all_long = doc_shingles(docs, limit, stride).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    if strategy == "auto":
        strategy = "window" if _input_splits(docs) <= 8 else "anti"
    if strategy == "window":
        return (
            all_long.withColumn(
                "df", F.count("*").over(Window.partitionBy("s"))
            )
            .filter(F.col("df") <= max_df)
            .select("doc_id", "s")
        )
    if strategy != "anti":
        raise ValueError(f"unknown strategy {strategy!r}")
    stop = (
        all_long.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("s")
    )
    return all_long.join(F.broadcast(stop), "s", "left_anti").select("doc_id", "s")


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """MinHash signature, long form (doc_id, seed, minhash).

    h_seed(s) = ((1 + 2*seed) * s + 7919 * seed) % (2^31-1); products are
    bounded by 33 * 2^31 < 2^36 (exact int64).

    Physical shape: explode the (already distinct) shingles and take the
    16 permutation minima as 16 map-side partial-min aggregates in ONE
    groupBy — the shingle md5 is computed exactly once per shingle.
    (A nested-HOF formulation re-evaluates the shingle expression per
    seed: Catalyst does no common-subexpression elimination inside
    lambdas — measured 16x slower.)"""
    return minhash_from_shingles(informative_shingles(docs), n_hashes)


def minhash_from_shingles(sh_long: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    aggs = [
        F.min(
            F.expr(f"((1 + {2 * i}) * s + {7919 * i}) % {P31}")
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    wide = sh_long.groupBy("doc_id").agg(*aggs)
    stacked = ", ".join(
        f"CAST({i} AS BIGINT), mh{i}" for i in range(n_hashes)
    )
    return wide.selectExpr(
        "doc_id", f"stack({n_hashes}, {stacked}) AS (seed, minhash)"
    )


_BAND_WEIGHT = (
    "CASE seed % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END"
)


def lsh_candidate_pairs(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """LSH banding over the MinHash signature (4 bands x 4 rows): docs
    sharing any band key become candidate near-duplicate pairs.

    The self-join shuffles on (band, key) — only colliding docs meet,
    which is what makes MinHash/LSH the scale path vs all-pairs Jaccard."""
    return lsh_pairs_from_signatures(minhash_signatures(docs, n_hashes))


def lsh_pairs_from_signatures(sigs: DataFrame) -> DataFrame:
    bands = (
        sigs.withColumn("band", (F.col("seed") / BAND_ROWS).cast("long"))
        .groupBy("doc_id", "band")
        .agg(F.sum(F.expr(f"minhash * ({_BAND_WEIGHT})")).alias("key"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash from the distinct shingle hashes: bit j is the sign
    of the majority vote of shingle bit j.

    Physical shape: one groupBy with 32 map-side partial-sum aggregates
    over the exploded shingles — the shingle md5 is computed once per
    shingle. (A nested-HOF formulation re-evaluates the shingle
    expression per bit: no CSE inside Catalyst lambdas — 30x slower.)"""
    return simhash_from_shingles(informative_shingles(docs), bits)


def simhash_from_shingles(sh_long: DataFrame, bits: int = 32) -> DataFrame:
    aggs = [
        F.sum(
            F.expr(f"CASE WHEN (s >> {j}) & 1 = 1 THEN 1 ELSE -1 END")
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    wide = sh_long.groupBy("doc_id").agg(*aggs)
    combine = " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return wide.select("doc_id", F.expr(combine).alias("simhash"))


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.2, max_df: int = MAX_SHINGLE_DF
) -> DataFrame:
    """n-gram Jaccard similarity over the *informative* shingle sets, via
    the inverted-index join (shuffle key = shingle hash); pairs below
    ``threshold`` are dropped. The float is derived from the exact
    integer (inter, na, nb) triple.

    Stop-shingle removal: shingles whose document frequency exceeds
    ``max_df`` are excluded from BOTH the pair generation and the set
    sizes — without it the inverted-index join is quadratic in the
    document frequency of common shingles (Σ df² blow-up), which is the
    standard failure mode of all-pairs similarity at scale; capping df
    bounds each shingle's contribution at max_df²."""
    return jaccard_from_shingles(informative_shingles(docs, max_df), threshold)


def jaccard_from_shingles(long: DataFrame, threshold: float = 0.2) -> DataFrame:
    sizes = long.groupBy("doc_id").agg(F.count("*").cast("long").alias("nsh"))
    a, b = long.alias("a"), long.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nsh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nsh", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b", "inter", "na", "nb",
            F.expr("CAST(inter AS DOUBLE) / (na + nb - inter)").alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def dedup_suite(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    threshold: float = 0.2,
    max_df: int = MAX_SHINGLE_DF,
) -> dict:
    """The production dedup pipeline: materializes the informative
    shingle stage ONCE (``persist``) and derives every similarity view
    from the same cached table — running MinHash + LSH + SimHash +
    Jaccard together costs one shingle pass instead of four (the
    per-query driver checks rebuild it each time; a real pipeline run
    should use this). Returns ``{"shingles", "exact", "minhash",
    "lsh_pairs", "simhash", "jaccard"}``; call
    ``result["shingles"].unpersist()`` when done.

    The cluster/funnel stages compose from the same cache (they iterate
    eagerly, so they are functions rather than suite entries):
    ``pairs = suite["jaccard"].select("doc_a", "doc_b")`` feeds both
    :func:`dedup_clusters` (transitive components) and
    :func:`curation_funnel` (per-stage keep accounting)."""
    sh = informative_shingles(docs, max_df).persist()
    sigs = minhash_from_shingles(sh, n_hashes)
    return {
        "shingles": sh,
        "exact": exact_dedup(docs),
        "minhash": sigs,
        "lsh_pairs": lsh_pairs_from_signatures(sigs),
        "simhash": simhash_from_shingles(sh),
        "jaccard": jaccard_from_shingles(sh, threshold),
    }


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Transitive near-duplicate CLUSTERS from a pair list: connected
    components with ``cluster_id = min(doc_id)`` of each component —
    the artifact a curation pipeline actually consumes (keep one doc
    per cluster); singleton docs are their own cluster.

    Physical shape: synchronous min-label propagation — per iteration,
    every node takes the min of its own label and its neighbors' labels
    (one join + one hash aggregate per round), stopping at fixpoint.
    Converges in graph-diameter rounds; near-dup components are
    small-diameter cliques-ish clusters, so a handful of rounds
    suffices in practice; an unconverged exit at ``max_iter`` RAISES —
    returning partial labels would split components silently (and
    diverge from the fully-recursive SQL oracle).

    Memory/plan discipline: each round persists its label table and
    unpersists the previous round's; every ``_CHECKPOINT_EVERY`` rounds
    the table is additionally ``localCheckpoint``ed — persist alone
    still GROWS the logical plan by one join+aggregate per round
    (measured: a 25-round persist-only plan carried 800+ Exchange
    nodes), while checkpointing every round pins one un-unpersistable
    block copy per round; the hybrid bounds BOTH plan depth and pinned
    copies at the checkpoint interval. localCheckpoint blocks are
    executor-local — a cluster run pointing at durable storage swaps in
    ``checkpoint()``. Only scalar convergence counts hit the driver. At
    larger diameters the public alternating small-star/large-star
    scheme (Kiveris et al., "Connected Components in MapReduce and
    Beyond") drops rounds to O(log n) — same join shape, so it slots
    into this loop; min-propagation is kept for its determinism and
    simplicity at the diameters dedup graphs exhibit."""
    _CHECKPOINT_EVERY = 5
    nodes = docs.select(F.col("doc_id").alias("doc"))
    und = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = (
        und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("doc", F.col("doc").alias("label")).localCheckpoint(
        eager=True
    )
    converged = False
    to_unpersist = None
    for it in range(max_iter):
        nb_min = (
            edges.join(labels, edges["a"] == labels["doc"])
            .groupBy("b")
            .agg(F.min("label").alias("nb_min"))
        )
        # carry the per-node "label shrank" flag IN the round's frame:
        # the convergence check is then one filter+count on the frame the
        # round materializes anyway, not an extra shuffle join of new
        # labels against old labels (labels only ever decrease, so
        # nb_min < label is exactly "this round changed this node")
        new_labels = labels.join(
            nb_min, labels["doc"] == nb_min["b"], "left"
        ).select(
            "doc",
            F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("label"),
            F.coalesce(
                F.col("nb_min") < F.col("label"), F.lit(False)
            ).alias("chg"),
        )
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = new_labels.filter("chg").count()
        if to_unpersist is not None:
            to_unpersist.unpersist()
        to_unpersist = new_labels if (it + 1) % _CHECKPOINT_EVERY else None
        labels = new_labels.select("doc", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter}"
            " rounds — the pair graph has a component of larger diameter;"
            " raise max_iter (rounds needed = component diameter)"
        )
    return labels.select(
        F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def curation_funnel(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    quality_min: float = 0.4,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Per-stage document/token accounting of the standard curation
    pipeline — the number a data team actually reports:

    0. ``raw``          — everything,
    1. ``exact_dedup``  — keep the min doc_id of each identical-text
                          (md5) group,
    2. ``near_dedup``   — keep the min SURVIVING doc_id of each
                          transitive near-dup component (Jaccard >=
                          0.2 graph; exact duplicates have identical
                          shingle sets, so clustering the full corpus
                          and keeping the min kept member equals
                          clustering the survivors),
    3. ``quality``      — drop docs with quality < ``quality_min``.

    Output: (stage_ord, stage, n_docs, n_tokens) — ws-token mass per
    stage, all integer counts (oracle-exact). Stages compose as
    semi-joins over the doc_id keep-sets, so the plan is a chain of
    hash aggregates + broadcast-size joins; the only heavyweight input
    is the near-dup pair list, which callers share from the persisted
    shingle stage (``dedup_suite``).

    The shared frames are MATERIALIZED (``localCheckpoint``, like the
    cluster loop this funnel already runs eagerly): ``wq`` feeds all
    four stage aggregates and ``keep1``/``keep2`` feed both their own
    stage and the next keep-set's build — left lazy, the four-stage
    union re-derives the quality scan and the whole dedup chain per
    stage (measured 53 exchanges unrolled; checkpointed, the final plan
    is four aggregates + semi-joins over materialized keep-sets, bounded
    in test_plan_hygiene.py). The checkpointed frames are one narrow row
    per document — the same footprint persist() would cache; a cluster
    deployment pointing at durable storage swaps in ``checkpoint()``."""
    if pairs is None:
        pairs = jaccard_from_shingles(
            informative_shingles(docs, max_df), threshold=0.2
        ).select("doc_a", "doc_b")
    wq = (
        with_quality(docs).select("doc_id", "ws_tokens", "quality")
        .localCheckpoint(eager=True)
    )
    keep1 = (
        exact_dedup(docs).select(F.col("keep_doc_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    clusters = dedup_clusters(docs, pairs)
    keep2 = (
        clusters.join(keep1, "doc_id")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    keep3 = keep2.join(wq, "doc_id").filter(
        F.col("quality") >= quality_min
    ).select("doc_id")

    def stage(ord_, name, keep):
        frame = wq if keep is None else wq.join(keep, "doc_id")
        return frame.agg(
            F.lit(ord_).cast("int").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("n_tokens"),
        )

    return (
        stage(0, "raw", None)
        .unionByName(stage(1, "exact_dedup", keep1))
        .unionByName(stage(2, "near_dedup", keep2))
        .unionByName(stage(3, "quality", keep3))
    )


def dup_ngram_rate(docs: DataFrame) -> DataFrame:
    """Per-document duplicate-n-gram rate: the fraction of a doc's
    DISTINCT 8-gram shingles that occur in at least one other document —
    the corpus-curation signal behind substring-dedup decisions (a doc
    whose shingles are mostly shared is boilerplate or a near-copy).
    Exact integer counts + one shared float formula.

    Same two physical strategies as :func:`informative_shingles` (the
    df computation is the shared subproblem): count-over-window keeps
    the shingle expression single-evaluation (wins while shingle-hash
    CPU dominates, few input splits); groupBy(s)+join avoids the full
    sort shuffle (wins at cluster scale, many splits)."""
    all_long = doc_shingles(docs).select("doc_id", F.explode("shingles").alias("s"))
    if _input_splits(docs) <= 8:
        counted = all_long.withColumn(
            "df", F.count("*").over(Window.partitionBy("s"))
        )
    else:
        df_tbl = all_long.groupBy("s").agg(F.count("*").alias("df"))
        counted = all_long.join(df_tbl, "s")
    per_doc = counted.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum(F.expr("CASE WHEN df >= 2 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_dup"),
    )
    return per_doc.select(
        "doc_id", "n_shingles", "n_dup",
        F.expr("CAST(n_dup AS DOUBLE) / n_shingles").alias("dup_rate"),
    )


# bigram-fluency probability: add-one-smoothed bigram model, rational
# (libm-free) so the float score is bit-reproducible across engines —
# integer inputs (c12 = bigram count, c1 = first-word unigram count,
# V = vocabulary size), one IEEE divide, shared verbatim with the oracle.
BIGRAM_P_SQL = "CAST(c12 + 1 AS DOUBLE) / CAST(c1 + V AS DOUBLE)"


def bigram_fluency(docs: DataFrame) -> DataFrame:
    """Language-model quality scoring — the CCNet/Gopher-style
    perplexity-filtering signal, rationalized for bit-exactness: each
    document is scored by its MEAN add-one-smoothed bigram probability
    under the corpus's own bigram model,

        p(b | a) = (c(a,b) + 1) / (c(a) + V)

    (c = corpus occurrence counts, V = vocabulary size). Canonical LM
    filtering uses mean log-prob (perplexity); the mean raw probability
    is a strictly different but monotone-comparable screen that needs
    only IEEE +-*/ over integer aggregates — no libm ln whose last-ulp
    rounding differs across engines — so Spark and DuckDB hash-match bit
    for bit (the repo's float-formula discipline, as BM25's rational
    idf). Per-document sums fold in POSITION order (float addition is
    not associative).

    Output: (doc_id, n_bigrams, fluency); documents with < 2 words get
    n_bigrams = 0 and NULL fluency.

    Scale shape at 100 TB: bigram and unigram counts are map-side-
    combined hash aggregates over reduced keys; the doc-bigram stream
    joins them on the bigram/word key (inverted-index shape — never a
    vocab x vocab grid); V is a 1-row broadcast scalar; the per-doc fold
    is bounded by document length."""
    ws = docs.select("doc_id", F.expr("split(text, ' ')").alias("ws"))
    words = ws.select("doc_id", F.explode("ws").alias("word"))
    bigrams = ws.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
                " ELSE array() END"
            )
        ).alias("p0", "bg"),
    ).select(
        "doc_id", (F.col("p0") + 1).alias("p"),
        F.col("bg.a").alias("a"), F.col("bg.b").alias("b"),
    )
    cbg = bigrams.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("c12")
    )
    cun = words.groupBy("word").agg(F.count("*").cast("long").alias("c1"))
    vocab = cun.agg(F.count("*").cast("long").alias("V"))
    contrib = (
        bigrams.join(cbg, ["a", "b"])
        .join(cun.withColumnRenamed("word", "a"), "a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "p", F.expr(BIGRAM_P_SQL).alias("pr"))
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(p, pr))),"
            " s -> s.pr), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("psum"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.expr("CAST(psum AS DOUBLE) / n_bigrams").alias("fluency"),
        )
    )


# Interpolated Kneser-Ney bigram probability with the standard fixed
# discount D = 3/4 (Chen & Goodman 1999 measure ~0.75 on English text;
# 3/4 keeps every term a ratio of integers so the formula needs only
# IEEE +-*/ — the same libm-free discipline as BIGRAM_P_SQL):
#
#   p_KN(b | a) = (c(a,b) - D) / c(a)  +  D * N1+(a,.) / c(a) * p_cont(b)
#   p_cont(b)   = N1+(.,b) / N1+(.,.)
#
# Every scored bigram occurs in the corpus (the model is fit on the
# corpus itself), so c(a,b) >= 1 and the max(c - D, 0) clamp is never
# active. Integer products are computed in DOUBLE (n1a * n1b and
# c1 * n1all overflow int64 at web-scale corpora); the expression is
# shared verbatim with any oracle so the float is bit-reproducible.
KN_P_SQL = (
    "CAST(4 * c12 - 3 AS DOUBLE) / (CAST(4 AS DOUBLE) * CAST(c1 AS DOUBLE))"
    " + (CAST(3 AS DOUBLE) * CAST(n1a AS DOUBLE) * CAST(n1b AS DOUBLE))"
    " / (CAST(4 AS DOUBLE) * CAST(c1 AS DOUBLE) * CAST(n1all AS DOUBLE))"
)


def kn_fluency(docs: DataFrame) -> DataFrame:
    """Kneser-Ney language-model quality scoring — the stronger sibling
    of :func:`bigram_fluency`: each document's MEAN interpolated
    Kneser-Ney bigram probability (``KN_P_SQL``) under the corpus's own
    bigram model. KN's continuation probability (how many DISTINCT
    contexts a word completes, not how often it occurs) is the standard
    fix for add-one's overestimate of frequent-but-context-bound words
    — the same screen CCNet-style perplexity filters apply, kept
    rational for bit-reproducibility.

    Output: (doc_id, n_bigrams, kn_fluency); documents with < 2 words
    get n_bigrams = 0 and NULL kn_fluency.

    Scale shape at 100 TB (same inverted-index discipline as
    :func:`bigram_fluency`): all four model tables — bigram counts,
    per-context totals + distinct-continuation counts, per-word
    distinct-context counts, and the 1-row N1+(.,.) scalar — are
    map-side-combined hash aggregates over reduced keys; the doc-bigram
    stream joins them on the bigram/word key (never a vocab x vocab
    grid); the per-doc fold is position-ordered and bounded by document
    length."""
    ws = docs.select("doc_id", F.expr("split(text, ' ')").alias("ws"))
    bigrams = ws.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
                " ELSE array() END"
            )
        ).alias("p0", "bg"),
    ).select(
        "doc_id", (F.col("p0") + 1).alias("p"),
        F.col("bg.a").alias("a"), F.col("bg.b").alias("b"),
    )
    cbg = bigrams.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("c12")
    )
    # per-context a: total bigram mass c(a) and distinct continuations
    # N1+(a,.) — both read off the already-reduced bigram-type table
    ctx = cbg.groupBy("a").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1a"),
    )
    cont = cbg.groupBy("b").agg(F.count("*").cast("long").alias("n1b"))
    n1all = cbg.agg(F.count("*").cast("long").alias("n1all"))
    contrib = (
        bigrams.join(cbg, ["a", "b"])
        .join(ctx, "a")
        .join(cont, "b")
        .crossJoin(F.broadcast(n1all))
        .select("doc_id", "p", F.expr(KN_P_SQL).alias("pr"))
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(p, pr))),"
            " s -> s.pr), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("psum"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.expr("CAST(psum AS DOUBLE) / n_bigrams").alias("kn_fluency"),
        )
    )


SPAN_WORDS = 8  # words per duplicated span (substring dedup granularity)


def substring_dedup(docs: DataFrame, w: int = SPAN_WORDS) -> DataFrame:
    """Span-level exact substring dedup — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    semantics at word granularity: every ``w``-word gram occurring MORE
    THAN ONCE in the corpus (in another document or again in the same
    one) marks all ``w`` word positions it covers; covered positions
    are removed and the survivors re-joined in order. This is the
    span-REMOVAL pass that doc-level dedup (exact/MinHash/SimHash)
    cannot express — a mostly-unique document keeps its unique prose
    and loses only the plagiarized/boilerplate spans.

    Output: (doc_id, n_words, n_covered, cleaned_text) — integer
    counts plus the exact cleaned text (oracle: string equality).

    Scale shape: gram construction is a map-side array HOF (the words
    array is materialized once per row — no CSE inside HOF lambdas);
    the shuffles are the gram-frequency aggregate (map-side partial,
    keyed on the gram), the coverage distinct, and the anti-join —
    the inverted-index shape of :func:`dup_ngram_rate`, which
    survives 100x. Unlike the fuzzy-dedup shingles there is NO df cap:
    the hottest grams are exactly the spans that most need removing.
    The dup-side of the gram join is one row per gram, so a mega-hot
    gram makes a classic one-row-build skew join — AQE's skew-join
    split handles it (the occurrences side splits across tasks). Single pass: removal can create new w-gram
    adjacencies, which a second pass would also remove; Lee et al.
    remove byte ranges found in the ORIGINAL corpus, as here."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    ws = docs.select("doc_id", F.expr("split(text, ' ')").alias("ws"))
    words = ws.select(
        "doc_id", F.posexplode("ws").alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "word")
    # sequence(1, 0) DESCENDS in Spark SQL — guard short docs explicitly
    gram_expr = (
        f"CASE WHEN size(ws) >= {w} THEN"
        f" transform(sequence(1, size(ws) - {w} + 1),"
        f" i -> array_join(slice(ws, i, {w}), ' '))"
        " ELSE array() END"
    )
    grams = ws.select(
        "doc_id", F.posexplode(F.expr(gram_expr)).alias("s0", "gram")
    ).select("doc_id", (F.col("s0") + 1).alias("start"), "gram")
    dup = (
        grams.groupBy("gram").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gram")
    )
    covered = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(w - 1))
            ).alias("p"),
        )
        .distinct()
    )
    return _remove_covered(words, covered)


def _remove_covered(words: DataFrame, covered: DataFrame) -> DataFrame:
    """Shared tail of the substring-dedup family: drop covered (doc_id,
    p) positions from the (doc_id, p, word) stream and rebuild
    (doc_id, n_words, n_covered, cleaned_text)."""
    kept = words.join(covered, ["doc_id", "p"], "left_anti")
    n = words.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words")
    )
    ncov = covered.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_covered")
    )
    cleaned = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(p, word))),"
                " s -> s.word)"
            ),
        ).alias("cleaned_text")
    )
    return (
        n.join(ncov, "doc_id", "left")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


SPAN_MIN_LEN = 2 * SPAN_WORDS  # minimum merged-span length to remove


def substring_dedup_spans(
    docs: DataFrame, w: int = SPAN_WORDS, min_len: int = SPAN_MIN_LEN
) -> DataFrame:
    """Variable-length substring dedup — the closer reading of Lee et
    al. 2022's MAXIMAL-duplicate-substring semantics (they remove
    duplicated substrings of >= 50 BPE tokens; suffix-array driven).
    The distributed approximation: every duplicated ``w``-gram marks
    its interval [start, start+w-1]; per document, overlapping OR
    adjacent intervals merge into maximal islands (gaps-and-islands
    over a running max-end window); only islands spanning at least
    ``min_len`` words are removed. A duplicated substring of length
    L >= max(w, min_len) has all its w-grams duplicated, so it always
    forms an island of length >= L and is removed — matching Lee et
    al.'s length threshold; the approximation error is over-removal
    when DISTINCT duplicated grams chain into one island (Lee et al.
    themselves merge overlapping duplicate ranges, so this is the same
    direction). ``min_len == w`` degenerates to :func:`substring_dedup`
    coverage. Cited contract: Lee et al. 2022 §4 (dedup threshold),
    reference has no substring dedup — this is pipeline-tier surface.

    Output: (doc_id, n_words, n_covered, cleaned_text), same schema as
    :func:`substring_dedup` (oracle: string equality).

    Scale shape: identical to :func:`substring_dedup` up to the gram
    join (inverted-index, AQE skew-split on the one-row dup side); the
    island pass adds ONE extra shuffle — a window over (doc_id, start)
    on intervals, whose row count is bounded by the duplicated-gram
    occurrences, far below the word stream. Island positions are
    disjoint by construction (islands merged), so no coverage
    ``distinct`` is needed at all — strictly cheaper than the fixed-w
    pass on that stage."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if min_len < w:
        raise ValueError(
            f"min_len must be >= w (islands are at least w long),"
            f" got min_len={min_len} < w={w}"
        )
    ws = docs.select("doc_id", F.expr("split(text, ' ')").alias("ws"))
    words = ws.select(
        "doc_id", F.posexplode("ws").alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "word")
    gram_expr = (
        f"CASE WHEN size(ws) >= {w} THEN"
        f" transform(sequence(1, size(ws) - {w} + 1),"
        f" i -> array_join(slice(ws, i, {w}), ' '))"
        " ELSE array() END"
    )
    grams = ws.select(
        "doc_id", F.posexplode(F.expr(gram_expr)).alias("s0", "gram")
    ).select("doc_id", (F.col("s0") + 1).alias("start"), "gram")
    dup = (
        grams.groupBy("gram").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gram")
    )
    iv = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.col("start").alias("s"),
            (F.col("start") + F.lit(w - 1)).alias("e"),
        )
        .distinct()
    )
    # gaps-and-islands: a new island starts where s jumps past the
    # running max end + 1 (adjacency merges); deterministic — s is
    # unique per doc after the distinct
    w1 = Window.partitionBy("doc_id").orderBy("s")
    prev_e = F.coalesce(
        F.max("e").over(w1.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(-1),
    )
    isl = (
        iv.withColumn(
            "new_isl",
            F.when(F.col("s") > prev_e + F.lit(1), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "isl",
            F.sum("new_isl").over(
                w1.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spans = (
        isl.groupBy("doc_id", "isl")
        .agg(F.min("s").alias("ss"), F.max("e").alias("se"))
        .filter(F.col("se") - F.col("ss") + F.lit(1) >= min_len)
    )
    covered = spans.select(
        "doc_id", F.explode(F.sequence("ss", "se")).alias("p")
    )
    return _remove_covered(words, covered)


# chi-square cell contribution for the source-drift statistic: integer
# inputs (o = observed count, st = source total, cw = corpus word count,
# ct = corpus total), IEEE +-*/ only — shared verbatim with the oracle.
CHI2_CONTRIB_SQL = (
    "((CAST(o AS DOUBLE) - CAST(st AS DOUBLE) * cw / ct)"
    " * (CAST(o AS DOUBLE) - CAST(st AS DOUBLE) * cw / ct))"
    " / (CAST(st AS DOUBLE) * cw / ct)"
)

# Closed-form mass of every ABSENT (source, word) cell: with o = 0 the
# contribution (0-e)^2/e collapses to e = st*cw/ct, and summing over the
# absent vocabulary gives (st/ct) * sum_absent(cw) where
# sum_absent(cw) = ct - pcw (pcw = integer sum of corpus counts of the
# words PRESENT in the source). Integer subtraction, then one shared
# IEEE multiply/divide — no per-absent-cell rows anywhere.
DRIFT_ABSENT_SQL = (
    "(CAST(st AS DOUBLE) * CAST(ct - pcw AS DOUBLE)) / CAST(ct AS DOUBLE)"
)

# Fixed word-hash bucket for the two-level deterministic fold, portable
# across engines (md5 hex prefix; DuckDB spells the same 60-bit integer
# as ('0x' || substr(md5(word), 1, 15))::BIGINT).
N_DRIFT_BUCKETS = 64
DRIFT_BUCKET_SQL = (
    "CAST(conv(substr(md5(word), 1, 15), 16, 10) AS BIGINT)"
    f" % {N_DRIFT_BUCKETS}"
)

# Deterministic sorted fold of (key, x) structs — 0.0 + x1 == x1 for the
# non-negative chi-square terms, so this is bit-equal to DuckDB's
# list_reduce(list(x ORDER BY key), (a, b) -> a + b).
_SORTED_FOLD = (
    "aggregate(transform(array_sort(collect_list(struct({key}, {x}))),"
    " s -> s.{x}), CAST(0 AS DOUBLE), (a, x) -> a + x)"
)


def source_drift(docs: DataFrame) -> DataFrame:
    """Per-source unigram distribution drift: Pearson's chi-square
    statistic of each source's word distribution against the corpus-wide
    distribution — the monitoring number behind "did source X's content
    shift this snapshot" in a mixture pipeline. Cells span the FULL
    corpus vocabulary per source (absent words contribute (0-e)²/e, as
    chi-square requires), but absent cells are never materialized: their
    total mass has the closed form (st/ct)·(ct − pcw) from two integer
    aggregates (``DRIFT_ABSENT_SQL``), so the plan touches only PRESENT
    (source, word) cells. The float statistic stays bit-reproducible
    against a SQL oracle via a two-level deterministic fold: cells fold
    in sorted word order within fixed md5 word-hash buckets
    (``N_DRIFT_BUCKETS``), then the ≤``N_DRIFT_BUCKETS`` bucket partials
    fold in bucket order, and the absent-cell mass is added last — every
    float op a single shared formula.

    Output: (source, n_tokens, n_cells, chi2); dof = n_cells - 1
    (n_cells = corpus vocabulary size, as chi-square requires).

    Scale shape: ONE corpus-wide (source, word) hash aggregate (map-side
    combined; its exchange is reused by every derived branch); vocab /
    per-source totals / the grand scalar all fold those cells, never the
    corpus. No |sources|×|vocab| grid, no |vocab|-sized collect_list row
    — the largest single collected list is one source's share of one
    hash bucket (~|vocab per source| / N_DRIFT_BUCKETS). Raising
    ``N_DRIFT_BUCKETS`` bounds that list at any vocabulary size; the
    bucket count participates in the fold grouping, so it is part of
    the reproducibility contract — pick it once per deployment."""
    words = docs.select(
        "source", F.explode(F.expr("split(text, ' ')")).alias("word")
    )
    # The one corpus-sized stage. Checkpointing it (lazily — no job at
    # construction time) makes every derived branch (vocab, totals,
    # grand, the present-cell join) read the materialized cell table
    # instead of re-scanning and re-shuffling the corpus per branch.
    sw = words.groupBy("source", "word").agg(
        F.count("*").cast("long").alias("o")
    ).localCheckpoint(eager=False)
    vocab = sw.groupBy("word").agg(F.sum("o").cast("long").alias("cw"))
    totals = sw.groupBy("source").agg(F.sum("o").cast("long").alias("st"))
    grand = vocab.agg(
        F.sum("cw").cast("long").alias("ct"),
        F.count("*").cast("long").alias("n_vocab"),
    )
    present = (
        sw.join(vocab, "word")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
        .withColumn("contrib", F.expr(CHI2_CONTRIB_SQL))
        .withColumn("bucket", F.expr(DRIFT_BUCKET_SQL))
    )
    by_bucket = present.groupBy("source", "bucket").agg(
        F.expr(_SORTED_FOLD.format(key="word", x="contrib")).alias("part"),
        F.sum("cw").cast("long").alias("pcw_b"),
        F.max("st").alias("st"),
    )
    per_source = by_bucket.groupBy("source").agg(
        F.max("st").alias("st"),
        F.sum("pcw_b").cast("long").alias("pcw"),
        F.expr(_SORTED_FOLD.format(key="bucket", x="part")).alias(
            "present_chi2"
        ),
    )
    return per_source.crossJoin(F.broadcast(grand)).select(
        "source",
        F.col("st").alias("n_tokens"),
        F.col("n_vocab").alias("n_cells"),
        F.expr(f"present_chi2 + {DRIFT_ABSENT_SQL}").alias("chi2"),
    )


SEG_WORDS = 8  # words per boilerplate segment
SEG_DF_THRESHOLD = 3  # C4's "line appears >= 3 times" rule


def boilerplate_segments(
    docs: DataFrame,
    seg_words: int = SEG_WORDS,
    df_threshold: int = SEG_DF_THRESHOLD,
) -> DataFrame:
    """C4-style boilerplate removal accounting, transplanted from lines
    to fixed-size word segments (this corpus has no newlines): split each
    document into consecutive non-overlapping ``seg_words``-word
    segments, count each segment's corpus frequency, and flag segments
    occurring ``df_threshold``-or-more times as boilerplate. Returns
    per-doc (n_seg, n_boiler, words_total, words_kept, boiler_rate) —
    the bookkeeping a curation pipeline needs to decide and size the
    removal pass. All counts integer-exact; one shared float formula.

    Scale: segmentation is a map-side array HOF (zero shuffle); the only
    shuffle is the segment-frequency aggregate, keyed on the segment
    hash — the same shape as exact dedup, so it survives 100x. The
    segment TEXT never shuffles, only its int64 hash."""
    if seg_words < 1:
        raise ValueError(f"seg_words must be >= 1, got {seg_words}")
    # materialize the words array BEFORE the lambda: Catalyst does not
    # CSE inside HOF lambdas, so an inline split() would re-tokenize the
    # document once per segment (see dd_minhash's 16x lesson)
    segs = (
        f"transform(sequence(0, (size(ws) + {seg_words - 1})"
        f" DIV {seg_words} - 1),"
        f" j -> array_join(slice(ws, j * {seg_words} + 1, {seg_words}), ' '))"
    )
    seg_long = docs.select(
        "doc_id", F.expr("split(text, ' ')").alias("ws")
    ).select(
        "doc_id", F.explode(F.expr(segs)).alias("seg")
    ).select(
        "doc_id",
        F.expr(
            f"CAST(conv(substr(md5(seg), 1, 15), 16, 10) AS BIGINT) % {P31}"
        ).alias("h"),
        F.expr(
            "CAST(length(seg) - length(replace(seg, ' ', '')) + 1 AS BIGINT)"
        ).alias("nw"),
    )
    if _input_splits(docs) <= 8:
        counted = seg_long.withColumn(
            "df", F.count("*").over(Window.partitionBy("h"))
        )
    else:
        df_tbl = seg_long.groupBy("h").agg(F.count("*").alias("df"))
        counted = seg_long.join(df_tbl, "h")
    per_doc = counted.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_seg"),
        F.sum(
            F.expr(f"CASE WHEN df >= {df_threshold} THEN 1 ELSE 0 END")
        ).cast("long").alias("n_boiler"),
        F.sum("nw").cast("long").alias("words_total"),
        F.sum(
            F.expr(f"CASE WHEN df >= {df_threshold} THEN 0 ELSE nw END")
        ).cast("long").alias("words_kept"),
    )
    return per_doc.select(
        "doc_id", "n_seg", "n_boiler", "words_total", "words_kept",
        F.expr("CAST(n_boiler AS DOUBLE) / n_seg").alias("boiler_rate"),
    )


RARE_BIGRAM_THRESHOLD = 16  # corpus occurrences at/below which a bigram is "rare"


def char_bigram_rarity(
    docs: DataFrame, rare_threshold: int = RARE_BIGRAM_THRESHOLD
) -> DataFrame:
    """Statistical-LM-flavoured quality signal with exact integer
    arithmetic: fit the unigram-of-character-bigrams model ON THE CORPUS
    ITSELF (global occurrence count per character bigram), then score
    each document by (a) its rare-bigram count — bigrams whose corpus
    count is <= ``rare_threshold``, the integer analog of low-likelihood
    n-grams — and (b) its total corpus-frequency mass. Documents with a
    high ``rare_rate`` are the ones a perplexity filter would flag
    (garbled text produces character combinations the corpus rarely
    emits), computed without any cross-engine float-log risk.

    Scale: the model IS the bigram count table — at most alphabet² rows
    (≈1k here, bounded ~64k for bytes), so the score join broadcasts;
    the only real shuffle is the count aggregate keyed on the bigram.
    ``freq_mass`` is bounded by doc_bigrams x corpus_bigrams — fits
    int64 through ~3x10^9 corpus bigrams; beyond that scale the mass
    column should move to DECIMAL(38,0)."""
    bigrams = (
        "CASE WHEN length(text) >= 2 THEN"
        " transform(sequence(1, length(text) - 1), i -> substr(text, i, 2))"
        " ELSE array() END"
    )
    long = docs.select("doc_id", F.explode(F.expr(bigrams)).alias("bg"))
    counts = long.groupBy("bg").agg(F.count("*").cast("long").alias("cnt"))
    per_doc = long.join(F.broadcast(counts), "bg").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(
            F.expr(f"CASE WHEN cnt <= {rare_threshold} THEN 1 ELSE 0 END")
        ).cast("long").alias("n_rare"),
        F.sum("cnt").cast("long").alias("freq_mass"),
    )
    return per_doc.select(
        "doc_id", "n_bigrams", "n_rare", "freq_mass",
        F.expr("CAST(n_rare AS DOUBLE) / n_bigrams").alias("rare_rate"),
    )


def source_mix(docs: DataFrame) -> DataFrame:
    """Corpus mixing statistics per (source, lang): document/char/token
    mass and the up/down-sampling weight that would equalize the mix
    (weight = total_tokens / (n_groups * group_tokens) — >1 means
    upsample). The data-mixing bookkeeping every training pipeline runs
    before sampling; one hash aggregate + a broadcast of the single
    totals row."""
    grp = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum(F.expr("(n_chars + 3) DIV 4")).cast("long").alias("est_tokens"),
    )
    totals = grp.agg(
        F.sum("est_tokens").alias("_tot"), F.count("*").alias("_groups")
    )
    return grp.crossJoin(F.broadcast(totals)).select(
        "source", "lang", "n_docs", "n_chars", "est_tokens",
        F.expr(
            "CAST(_tot AS DOUBLE) / (CAST(_groups AS DOUBLE) * est_tokens)"
        ).alias("mix_weight"),
    )


def lang_id_eval(docs: DataFrame) -> DataFrame:
    """Confusion counts of the language-ID heuristic against the
    corpus's ground-truth ``lang`` column, plus per-truth-label
    accuracy — the eval loop a real lang-ID filter ships with."""
    pred = lang_id(docs).select("doc_id", "lang_pred")
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    conf = joined.groupBy("lang", "lang_pred").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wall = Window.partitionBy("lang")
    return conf.select(
        "lang", "lang_pred", "cnt",
        F.expr("CASE WHEN lang = lang_pred THEN 1 ELSE 0 END").alias("is_hit"),
        (F.col("cnt").cast("double") / F.sum("cnt").over(wall)).alias("frac"),
    )


# --------------------------------------------------------------- analysis

_MARKERS = (("en", " the "), ("x1", " join "), ("x2", " data "))


def _occurrences(marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((length(text) - length(replace(text, '{m}', ''))) / {len(marker)} AS BIGINT)"
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-n-gram language-ID heuristic: count marker occurrences via
    the replace-length trick (portable across engines, no regex), argmax
    with deterministic tie-break (marker order)."""
    c_en, c_x1, c_x2 = (_occurrences(m) for _, m in _MARKERS)
    return docs.select(
        "doc_id",
        F.expr(c_en).alias("c_en"),
        F.expr(c_x1).alias("c_x1"),
        F.expr(c_x2).alias("c_x2"),
    ).select(
        "doc_id", "c_en", "c_x1", "c_x2",
        F.expr(
            "CASE WHEN c_en >= c_x1 AND c_en >= c_x2 THEN 'en' "
            "WHEN c_x1 >= c_x2 THEN 'x1' ELSE 'x2' END"
        ).alias("lang_pred"),
    )


def quality(docs: DataFrame) -> DataFrame:
    """Quality scoring from integer character-class counts: word count,
    digit/space ratios, average word length; score is one shared float
    formula over the exact counts."""
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("chars"),
        F.expr(
            "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)"
        ).alias("spaces"),
        F.expr(
            "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT)"
        ).alias("digits"),
    ).select(
        "doc_id", "chars", "spaces", "digits",
        (F.col("spaces") + 1).alias("words"),
        F.expr(
            "CAST(chars - spaces AS DOUBLE) / (spaces + 1)"
        ).alias("avg_word_len"),
        F.expr(
            "least(CAST(spaces + 1 AS DOUBLE) / 100.0, 1.0)"
            " * (1.0 - CAST(digits AS DOUBLE) / chars)"
        ).alias("quality"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish estimate (ceil(chars/4) — the
    usual ~4-chars-per-token heuristic), both exact integers."""
    return docs.select(
        "doc_id",
        F.expr(
            "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
        ).alias("ws_tokens"),
        F.expr("CAST((length(text) + 3) DIV 4 AS BIGINT)").alias("bpe_est"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted character
    sum ``Σ ascii(text[i]) * ((i * 2654435761) % 2^31)``. Bounds: ascii <
    2^8, weight < 2^31, length < 2^13 → sum < 2^52 (exact int64). Computed
    map-side with one aggregate HOF (no explode)."""
    expr = (
        "aggregate(sequence(1, length(text)), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + ascii(substr(text, i, 1))"
        " * ((i * 2654435761) % 2147483648))"
    )
    return docs.select("doc_id", F.expr(expr).alias("fp"))


def with_quality(docs: DataFrame) -> DataFrame:
    """APPEND quality + token-count columns to the input frame (same
    expressions as :func:`quality`/:func:`token_count`, but keeping the
    payload columns) — the streaming-friendly shape: map-only, no join,
    works identically on a batch or streaming DataFrame."""
    return docs.withColumns(
        {
            "chars": F.length("text").cast("long"),
            "spaces": F.expr(
                "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)"
            ),
            "digits": F.expr(
                "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT)"
            ),
        }
    ).withColumns(
        {
            "ws_tokens": F.expr("spaces + 1"),
            "quality": F.expr(
                "least(CAST(spaces + 1 AS DOUBLE) / 100.0, 1.0)"
                " * (1.0 - CAST(digits AS DOUBLE) / chars)"
            ),
        }
    )


# ------------------------------------------------- corpus curation ops

DECON_N_WORDS = 5  # word n-gram width for benchmark decontamination
DECON_EVAL_MOD = 97  # doc_id % mod == 0 plays the held-out benchmark


def decontaminate(
    docs: DataFrame,
    n_words: int = DECON_N_WORDS,
    eval_mod: int = DECON_EVAL_MOD,
) -> DataFrame:
    """Benchmark decontamination accounting: flag training documents
    that share word ``n_words``-grams with a held-out evaluation set
    (here the deterministic subset ``doc_id % eval_mod == 0`` stands in
    for the benchmark corpus). For every NON-eval document: its distinct
    n-gram count, how many of those occur anywhere in the eval set, and
    the contamination rate — the overlap report behind eval-leakage
    filtering in every training-data pipeline.

    Scale: n-grams are a map-side array HOF over the pre-split words
    array (no CSE inside lambdas — ``ws`` materialized first); each
    document's hashes are deduplicated map-side with ``array_distinct``
    (no per-doc-distinct shuffle), and only the int64 md5 hash of each
    n-gram ever shuffles, never the text. The eval n-gram set is tiny
    relative to the corpus (a benchmark, not a training set), so its
    distinct hashes BROADCAST to the train-side probe — the train
    corpus never shuffles at all. All counts integer; one shared float
    formula."""
    if n_words < 1:
        raise ValueError(f"n_words must be >= 1, got {n_words}")
    gram_hashes = (
        f"CASE WHEN size(ws) >= {n_words} THEN array_distinct("
        f"transform(sequence(1, size(ws) - {n_words - 1}),"
        f" j -> CAST(conv(substr(md5(array_join(slice(ws, j, {n_words}),"
        f" ' ')), 1, 15), 16, 10) AS BIGINT) % {P31}))"
        " ELSE array() END"
    )
    ngram_h = (
        docs.select("doc_id", F.expr("split(text, ' ')").alias("ws"))
        .select("doc_id", F.explode(F.expr(gram_hashes)).alias("h"))
    )
    eval_set = (
        ngram_h.where(F.expr(f"doc_id % {eval_mod} = 0"))
        .select("h").distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    per_doc = (
        ngram_h.where(F.expr(f"doc_id % {eval_mod} != 0"))
        .join(F.broadcast(eval_set), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
        )
    )
    return per_doc.select(
        "doc_id", "n_ngrams", "n_hits",
        F.expr("CAST(n_hits AS DOUBLE) / n_ngrams").alias("contam_rate"),
    )


# Gopher-style rule bounds (Rae et al. 2021, table A1 — adapted to this
# corpus's single-line space-separated text; each rule is an exact
# integer/flag computation so the filter decisions replay bit-identically)
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_DUP_RATE = 0.75
GOPHER_MIN_STOP_HITS = 1
_STOPWORDS = ("the", "a", "value", "and")


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style document-quality rule filter: word count bounds,
    mean-word-length bounds, duplicate-word rate cap (the repetition
    signal), and minimum stop-word evidence — each rule an integer
    count or a float derived from integer counts by one shared formula,
    plus the conjunctive ``keep`` decision. Map-only (zero shuffle):
    the whole filter is one projection over each document row, so it
    runs at scan speed on any corpus size."""
    stop_sum = " + ".join(
        "CAST((length(pt) - length(replace(pt, ' {w} ', ''))) / {n} AS BIGINT)".format(
            w=w, n=len(w) + 2
        )
        for w in _STOPWORDS
    )
    return (
        docs.select(
            "doc_id",
            F.expr("concat(' ', text, ' ')").alias("pt"),
            F.expr("size(split(text, ' '))").cast("long").alias("words"),
            F.expr("size(array_distinct(split(text, ' ')))")
            .cast("long")
            .alias("distinct_words"),
            F.expr(
                "CAST(length(text) - (size(split(text, ' ')) - 1) AS BIGINT)"
            ).alias("letters"),
        )
        .select(
            "doc_id", "words", "distinct_words",
            F.expr("CAST(letters AS DOUBLE) / words").alias("mean_word_len"),
            F.expr(
                "CAST(words - distinct_words AS DOUBLE) / words"
            ).alias("dup_word_rate"),
            F.expr(stop_sum).alias("stop_hits"),
        )
        .select(
            "doc_id", "words", "distinct_words", "mean_word_len",
            "dup_word_rate", "stop_hits",
            F.expr(
                f"CAST(words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
                " AS INT)"
            ).alias("pass_words"),
            F.expr(
                f"CAST(mean_word_len BETWEEN {GOPHER_MIN_MWL} AND"
                f" {GOPHER_MAX_MWL} AS INT)"
            ).alias("pass_mwl"),
            F.expr(
                f"CAST(dup_word_rate <= {GOPHER_MAX_DUP_RATE} AS INT)"
            ).alias("pass_dup"),
            F.expr(
                f"CAST(stop_hits >= {GOPHER_MIN_STOP_HITS} AS INT)"
            ).alias("pass_stop"),
        )
        .withColumn(
            "keep",
            F.expr(
                "CAST(pass_words = 1 AND pass_mwl = 1 AND pass_dup = 1"
                " AND pass_stop = 1 AS INT)"
            ),
        )
    )


def mixture_sample(docs: DataFrame) -> DataFrame:
    """Deterministic mixture resampling to EQUAL token mass per source:
    every source keeps documents with probability ``min_source_tokens /
    source_tokens`` (the heaviest sources are downsampled to the
    lightest), decided per document by the same coordinate-seeded md5
    uniform the RandomDetector uses — so the sample is reproducible
    under any partitioning, any cluster size, any retry. Returns the
    per-source audit row (docs/tokens before, keep rate, docs/tokens
    actually kept) a data-mixing pipeline publishes next to its config.

    Scale: one hash aggregate for the per-source mass (20 rows), a
    broadcast of those rates back onto the corpus (map-side), and one
    re-aggregate of the kept mass — no shuffle ever carries text."""
    per_doc = docs.select(
        "doc_id", "source",
        F.expr("CAST((n_chars + 3) DIV 4 AS BIGINT)").alias("toks"),
        F.expr(
            "CAST(conv(substr(md5(concat_ws(':', doc_id, 'mix')), 1, 13),"
            " 16, 10) AS BIGINT) / CAST(4503599627370496 AS DOUBLE)"
        ).alias("u"),
    )
    mass = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("est_tokens"),
    )
    floor = mass.agg(F.min("est_tokens").alias("_min_mass"))
    rates = mass.crossJoin(F.broadcast(floor)).select(
        "source", "n_docs", "est_tokens",
        F.expr("CAST(_min_mass AS DOUBLE) / est_tokens").alias("keep_rate"),
    )
    kept = (
        per_doc.join(F.broadcast(rates.select("source", "keep_rate")), "source")
        .where(F.expr("u < keep_rate"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("kept_docs"),
            F.sum("toks").cast("long").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source", "n_docs", "est_tokens", "keep_rate",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
    )


VOCAB_TOP_K = 25


def vocab_topk(docs: DataFrame, k: int = VOCAB_TOP_K) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent whitespace
    tokens with their total count and document frequency — the
    vocabulary/coverage report tokenizer training starts from. The
    classic word-count shape: explode is map-side, the aggregate
    partial-combines per partition before one shuffle keyed on the
    token, df comes from a distinct (token, doc) pre-aggregate rather
    than count(distinct) (no Expand blow-up), and the top-k is
    TakeOrderedAndProject (no global sort). Deterministic total order:
    count desc, then token asc."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    long = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("word")
    )
    cnt = long.groupBy("word").agg(F.count("*").cast("long").alias("cnt"))
    df_tbl = (
        long.select("word", "doc_id").distinct()
        .groupBy("word").agg(F.count("*").cast("long").alias("df"))
    )
    return (
        cnt.join(df_tbl, "word")
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(k)
    )


# ------------------------------------------------------ PII scrubbing
# The curation step every public LLM pipeline runs before training
# (Dolma, FineWeb, RedPajama all regex-scrub emails / phone numbers /
# IP addresses). The corpus text is synthetic word-soup with no natural
# PII, so — the multimodal-payload pattern — PII_TEXT_EXPR splices
# deterministic PII formed from doc_id into each doc with ONE shared
# SQL expression both engines evaluate verbatim; the oracle then
# re-runs the same regexes in DuckDB and md5-compares the redacted
# text, proving the scrub byte-exactly.
#
# Patterns stay in the Java-regex / RE2 common subset (character
# classes, +, alternation-free) so Spark and DuckDB match identically;
# replacement order (email, phone, ip) is pinned on both sides.

PII_TEXT_EXPR = (
    "concat(text,"
    " CASE WHEN doc_id % 3 > 0 THEN concat(' contact user', doc_id,"
    " '@mail', doc_id % 7, '.com') ELSE ' contact withheld' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' cc admin', doc_id % 97,"
    " '@backup', doc_id % 11, '.org') ELSE '' END,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' call 555-',"
    " 7000 + doc_id % 1000) ELSE '' END,"
    " ' from 10.', doc_id % 256, '.', (doc_id * 7) % 256, '.',"
    " (doc_id * 13) % 256)"
)

PII_PATTERNS = {
    "email": "[a-z0-9._]+@[a-z0-9.]+\\.[a-z][a-z]+",
    "phone": "555-[0-9]+",
    "ip": "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+",
}


def with_pii_text(docs: DataFrame) -> DataFrame:
    """Deterministically splice PII (0-2 emails, 0-1 phone, 1 IP per
    doc, all closed forms of doc_id) into the corpus text — expression
    only, no UDF."""
    return docs.select("doc_id", F.expr(PII_TEXT_EXPR).alias("ptext"))


def pii_redact(docs: DataFrame) -> DataFrame:
    """Count and redact emails / phone numbers / IP addresses: per doc
    the exact match counts plus md5 and length of the redacted text
    (emails -> [EMAIL], phones -> [PHONE], IPs -> [IP], replacement
    order pinned). Expression-only — the whole scrub is one codegen'd
    map stage, no shuffle, no Python."""
    p = with_pii_text(docs)
    red = F.col("ptext")
    for kind, tag in (("email", "[EMAIL]"), ("phone", "[PHONE]"),
                      ("ip", "[IP]")):
        red = F.regexp_replace(red, F.lit(PII_PATTERNS[kind]), F.lit(tag))
    return p.select(
        "doc_id",
        F.regexp_count("ptext", F.lit(PII_PATTERNS["email"]))
        .cast("long").alias("n_emails"),
        F.regexp_count("ptext", F.lit(PII_PATTERNS["phone"]))
        .cast("long").alias("n_phones"),
        F.regexp_count("ptext", F.lit(PII_PATTERNS["ip"]))
        .cast("long").alias("n_ips"),
        F.md5(red.cast("binary")).alias("redacted_md5"),
        F.length(red).cast("long").alias("redacted_len"),
    )


def split_assign(
    docs: DataFrame,
    weights: tuple = (("train", 98), ("val", 1), ("test", 1)),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training-data pipeline pins BEFORE any experiment: bucket =
    ``md5(doc_id || salt) mod total_weight`` (the pack-groups md5
    convention — reproducible bit-exactly by any engine, including the
    plain-Python pytest twin), mapped to splits by cumulative weight
    ranges in the GIVEN order.

    The contract that matters at 100 TB: assignment depends ONLY on
    (doc_id, salt) — growing the corpus never reassigns an existing
    document (no leakage of yesterday's val docs into today's train),
    and changing proportions means changing ``salt`` explicitly.
    Expression-only, zero Python, zero shuffle; composes with any
    downstream op as a plain column."""
    if not weights or any(int(w) < 1 for _, w in weights):
        raise ValueError(f"weights must be positive, got {weights}")
    total = sum(int(w) for _, w in weights)
    bucket = (
        f"CAST(conv(substr(md5(concat(CAST(doc_id AS STRING),"
        f" '|{salt}')), 1, 15), 16, 10) AS BIGINT) % {total}"
    )
    cases, lo = [], 0
    for name, w in weights:
        lo += int(w)
        cases.append((name, lo))
    expr = f"CASE WHEN b < {cases[0][1]} THEN '{cases[0][0]}' "
    for name, hi in cases[1:-1]:
        expr += f"WHEN b < {hi} THEN '{name}' "
    expr += f"ELSE '{cases[-1][0]}' END"
    return docs.select(
        "*", F.expr(bucket).alias("b")
    ).select(
        *[c for c in docs.columns], F.expr(expr).alias("split")
    )


def split_contamination(
    docs: DataFrame,
    n_words: int = DECON_N_WORDS,
    weights: tuple = (("train", 98), ("val", 1), ("test", 1)),
    salt: str = "split-v1",
) -> DataFrame:
    """Cross-split leakage audit — the check every pipeline runs right
    after :func:`split_assign`: for each held-out (non-``train``)
    document, how many of its distinct word ``n_words``-grams also
    occur in ANY train document. Returns per held-out doc
    ``(doc_id, split, n_grams, n_hits, contam_rate)``. A val/test doc
    with high ``contam_rate`` would leak its answers into training
    (the GPT-3 §4 / PaLM memorization audit, here applied to the
    engine's own splits).

    Scale shape (the asymmetry is the point): the held-out side is a
    few percent of the corpus by construction, so ITS distinct gram
    set broadcasts; the train side — the 100-TB side — is pruned to
    that vocabulary by a map-side broadcast semi-join BEFORE its
    distinct (never shuffling train grams outside the held-out
    vocabulary), and the surviving train∩held-out gram set (bounded by
    the held-out set) broadcasts back onto the held-out docs. Only
    int64 md5 gram hashes ever move; the train corpus never shuffles."""
    if n_words < 1:
        raise ValueError(f"n_words must be >= 1, got {n_words}")
    gram_hashes = (
        f"CASE WHEN size(ws) >= {n_words} THEN array_distinct("
        f"transform(sequence(1, size(ws) - {n_words - 1}),"
        f" j -> CAST(conv(substr(md5(array_join(slice(ws, j, {n_words}),"
        f" ' ')), 1, 15), 16, 10) AS BIGINT) % {P31}))"
        " ELSE array() END"
    )
    assigned = split_assign(docs, weights, salt)
    grams = assigned.select(
        "doc_id", "split", F.expr("split(text, ' ')").alias("ws")
    ).select("doc_id", "split", F.explode(F.expr(gram_hashes)).alias("h"))
    held = grams.filter(F.col("split") != "train")
    held_vocab = held.select("h").distinct()
    train_hits = (
        grams.filter(F.col("split") == "train")
        .join(F.broadcast(held_vocab), "h", "left_semi")
        .select("h").distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    per_doc = (
        held.join(F.broadcast(train_hits), "h", "left")
        .groupBy("doc_id", "split")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
        )
    )
    return per_doc.select(
        "doc_id", "split", "n_grams", "n_hits",
        F.expr("CAST(n_hits AS DOUBLE) / n_grams").alias("contam_rate"),
    )


def split_contamination_report(
    docs: DataFrame,
    n_words: int = DECON_N_WORDS,
    weights: tuple = (("train", 98), ("val", 1), ("test", 1)),
    salt: str = "split-v1",
) -> DataFrame:
    """Per-split rollup of :func:`split_contamination`: held-out doc
    count, docs sharing >= 1 train n-gram, gram totals and the two
    rates a leakage report quotes. Integer aggregates + shared float
    division only."""
    per_doc = split_contamination(docs, n_words, weights, salt)
    return (
        per_doc.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.expr("CASE WHEN n_hits > 0 THEN 1 ELSE 0 END"))
            .cast("long").alias("n_contam_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_hits").cast("long").alias("n_hits"),
        )
        .select(
            "split", "n_docs", "n_contam_docs", "n_grams", "n_hits",
            F.expr("CAST(n_contam_docs AS DOUBLE) / n_docs")
            .alias("doc_contam_rate"),
            F.expr("CAST(n_hits AS DOUBLE) / n_grams")
            .alias("gram_contam_rate"),
        )
    )


def temperature_mix(docs: DataFrame, sqrt_passes: int = 1) -> DataFrame:
    """Temperature-scaled source sampling weights (the multilingual /
    multi-source rebalancing of Conneau & Lample 2019 §3.1 and
    Arivazhagan et al. 2019 §4.2): sampling probability
    ``p_i ∝ share_i ** alpha`` with ``alpha = 0.5 ** sqrt_passes`` —
    the exponent is applied as ``sqrt_passes`` nested square roots
    because IEEE-754 ``sqrt`` is correctly rounded (bit-identical on
    every engine) while ``pow`` is not; alpha = 1/2 (default) and 1/4
    cover the values the papers sweep.

    Per source: doc count, token mass, natural share, temperature
    probability and the resulting up/down-sampling boost. The
    normalizing sum folds over sources in SORTED source order
    (sources are a bounded set — tens, not millions), so the floats
    are bit-reproducible under any partitioning.

    Scale: one partial+final hash aggregate on ``source`` (bounded
    keys), then arithmetic over the tiny per-source frame."""
    if sqrt_passes < 1:
        raise ValueError(f"sqrt_passes must be >= 1, got {sqrt_passes}")
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("token_mass"),
    )
    w_expr = "CAST(token_mass AS DOUBLE)"
    for _ in range(sqrt_passes):
        w_expr = f"sqrt({w_expr})"
    weighted = per_src.withColumn("w", F.expr(w_expr))
    totals = weighted.agg(
        F.sum("token_mass").cast("long").alias("mass_total"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(source, w))),"
            " s -> s.w), CAST(0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("w_total"),
    )
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source", "n_docs", "token_mass",
            F.expr("CAST(token_mass AS DOUBLE) / mass_total").alias("nat_share"),
            F.expr("w / w_total").alias("temp_prob"),
            F.expr("(w / w_total) / (CAST(token_mass AS DOUBLE) / mass_total)")
            .alias("boost"),
        )
    )


# Gopher repetition thresholds (Rae et al. 2021, table A1): max fraction
# of characters in the most frequent word n-gram (n = 2..4) and in all
# duplicated word n-grams (n = 5..10)
GOPHER_TOP_NGRAM_MAX_FRAC = ((2, 0.20), (3, 0.18), (4, 0.16))
GOPHER_DUP_NGRAM_MAX_FRAC = (
    (5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10)
)


def gopher_repetition(docs: DataFrame) -> DataFrame:
    """The full Gopher intra-document repetition table (Rae et al.
    2021, table A1), adapted from lines to word n-grams (this corpus is
    single-line): per document, the fraction of characters contained in
    the MOST FREQUENT word n-gram for n = 2..4 (``top{n}_frac``) and in
    ALL DUPLICATED word n-grams for n = 5..10 (``dup{n}_frac``), each
    with its table-A1 pass flag and the conjunctive ``keep``.

    Reading pinned here (the paper is prose; this is the NeMo-Curator/
    Dolma occurrence-mass reading): char mass of an n-gram = its joined
    string length times its occurrence count; ``top`` takes the most
    frequent gram (ties: larger char mass, then smaller hash — total
    order, partition-invariant), ``dup`` sums the mass of every gram
    occurring twice-or-more. Fractions divide by ``length(text)``; a
    document shorter than n words scores 0 for that n; one with fewer
    than 2 words has no grams at all and produces NO row — compose with
    :func:`gopher_rules`, whose word-count bound drops it anyway.

    Scale: gram extraction is a map-side HOF over the pre-split words
    array (no CSE inside lambdas — ``ws`` materialized first); only
    (doc_id, n, int64 md5 hash, char length) rows shuffle — one hash
    aggregate keyed on (doc, n, gram) whose fan-out is ~9 gram rows per
    word, then one per-doc rollup. The gram TEXT never shuffles."""
    ns = [n for n, _ in GOPHER_TOP_NGRAM_MAX_FRAC] + [
        n for n, _ in GOPHER_DUP_NGRAM_MAX_FRAC
    ]

    def grams_expr(n):
        return (
            f"CASE WHEN size(ws) >= {n} THEN transform("
            f"transform(sequence(1, size(ws) - {n - 1}),"
            f" j -> array_join(slice(ws, j, {n}), ' ')),"
            f" s -> struct(CAST({n} AS BIGINT) AS n,"
            f" CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)"
            f" % {P31} AS h,"
            f" CAST(length(s) AS BIGINT) AS chars)) ELSE array() END"
        )

    all_grams = "flatten(array(" + ", ".join(grams_expr(n) for n in ns) + "))"
    long = docs.select(
        "doc_id",
        F.expr("CAST(length(text) AS BIGINT)").alias("total_chars"),
        F.expr("split(text, ' ')").alias("ws"),
    ).select(
        "doc_id", "total_chars", F.explode(F.expr(all_grams)).alias("g")
    )
    counted = long.groupBy(
        "doc_id", F.col("g.n").alias("n"), F.col("g.h").alias("h")
    ).agg(
        F.min("total_chars").alias("total_chars"),
        F.count("*").cast("long").alias("cnt"),
        F.min("g.chars").alias("chars"),
    )
    per_doc_n = counted.groupBy("doc_id", "n").agg(
        F.min("total_chars").alias("total_chars"),
        F.max(F.struct("cnt", "chars", F.expr("-h"))).alias("top"),
        F.sum(
            F.expr("CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END")
        ).cast("long").alias("dup_mass"),
    ).select(
        "doc_id", "n", "total_chars", "dup_mass",
        F.expr("top.cnt * top.chars").cast("long").alias("top_mass"),
    )
    top_cols, dup_cols, passes = [], [], []
    for n, thr in GOPHER_TOP_NGRAM_MAX_FRAC:
        top_cols.append(
            F.expr(
                f"coalesce(CAST(max(CASE WHEN n = {n} THEN top_mass END)"
                f" AS DOUBLE) / min(total_chars), CAST(0 AS DOUBLE))"
            ).alias(f"top{n}_frac")
        )
        passes.append((f"top{n}_frac", thr))
    for n, thr in GOPHER_DUP_NGRAM_MAX_FRAC:
        dup_cols.append(
            F.expr(
                f"coalesce(CAST(max(CASE WHEN n = {n} THEN dup_mass END)"
                f" AS DOUBLE) / min(total_chars), CAST(0 AS DOUBLE))"
            ).alias(f"dup{n}_frac")
        )
        passes.append((f"dup{n}_frac", thr))
    wide = per_doc_n.groupBy("doc_id").agg(*top_cols, *dup_cols)
    flags = [
        F.expr(f"CAST({col} <= {thr} AS INT)").alias(f"pass_{col[:-5]}")
        for col, thr in passes
    ]
    keep = " AND ".join(f"{col} <= {thr}" for col, thr in passes)
    return wide.select("*", *flags, F.expr(f"CAST({keep} AS INT)").alias("keep"))


def source_vocab_overlap(docs: DataFrame, k: int = 64) -> DataFrame:
    """Pairwise per-source WORD-VOCABULARY overlap from ONE KMV sketch
    per source (Beyer et al. 2007) — the cross-slice audit a mixture
    pipeline runs to see which crawls/sources actually share language:
    HLL answers only "how many distinct", KMV's k-minimum hash lists
    additionally combine across sources into Jaccard and intersection
    estimates, because the k smallest hashes of a union are a uniform
    sample of it.

    For each unordered source pair (source_a < source_b):
    ``X`` = the k smallest hashes of the union of the two sketches,
    ``k_int`` = |X ∩ A ∩ B|, ``jaccard_est`` = k_int / |X|,
    ``union_est`` = the basic KMV estimator on X, ``inter_est`` =
    jaccard_est * union_est. When a pair's combined vocabulary holds
    fewer than k distinct hashes the sketches ARE the hash sets and
    every number is exact (``exact`` flag; md5 collisions aside).
    All md5/IEEE ops shared verbatim with the plain-Python twin —
    bit-reproducible.

    Scale shape: the one corpus-sized stage is the (source, word-hash)
    dedup inside :func:`kmv_agg`; after it every row is a <= k-long
    hash list, and the pairwise join is |sources|² over bounded arrays
    — expression-only array ops, no re-touch of the corpus."""
    from dtaianomaly_spark.rollup.tiers import KMV_EST_SQL, KMV_M, kmv_agg

    words = docs.select(
        "source", F.explode(F.expr("split(text, ' ')")).alias("word")
    )
    # ONE sketch stage feeds both sides of the pairwise self-join:
    # checkpointing it (lazily — no job at construction time) stops the
    # corpus dedup + rank window from running once per join side
    sk = kmv_agg(words, ["source"], "word", k).localCheckpoint(eager=False)
    a = sk.select(
        F.col("source").alias("source_a"),
        F.col("kmin").alias("kmin_a"),
        F.col("ndv_est").alias("ndv_a_est"),
    )
    b = sk.select(
        F.col("source").alias("source_b"),
        F.col("kmin").alias("kmin_b"),
        F.col("ndv_est").alias("ndv_b_est"),
    )
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    x = f"slice(array_sort(array_distinct(concat(kmin_a, kmin_b))), 1, {int(k)})"
    union_est = KMV_EST_SQL.format(a="x", k=int(k), m=KMV_M)
    return (
        pairs.withColumn("x", F.expr(x))
        .withColumn(
            "k_int",
            F.expr(
                "CAST(size(array_intersect(x,"
                " array_intersect(kmin_a, kmin_b))) AS BIGINT)"
            ),
        )
        .select(
            "source_a", "source_b", "ndv_a_est", "ndv_b_est",
            F.expr(union_est).alias("union_est"),
            F.expr(
                "CAST(k_int AS DOUBLE) / CAST(size(x) AS DOUBLE)"
            ).alias("jaccard_est"),
            F.expr(
                f"(CAST(k_int AS DOUBLE) / CAST(size(x) AS DOUBLE))"
                f" * ({union_est})"
            ).alias("inter_est"),
            (F.size("x") < k).alias("exact"),
        )
    )


def quota_sample(
    docs: DataFrame, quotas: DataFrame, salt: str = "quota-v1"
) -> DataFrame:
    """EXACT-count deterministic per-source sampling — the companion to
    :func:`mixture_sample` (hash thresholding: reproducible but
    binomial counts) when the mixture config demands exact quotas:
    within each source, order documents by ``md5(doc_id || salt)``
    (doc_id as the collision tiebreak — a total order) and keep the
    first ``quota``. The sample is a pure function of (doc_id, salt,
    quota): reproducible under any partitioning, cluster size or retry,
    and growing a source never evicts a kept document except by the
    md5 order itself (rank-based selection is NOT growth-stable the
    way :func:`split_assign` is — new documents hashing low displace
    the tail; pin the corpus snapshot, or use mixture_sample when
    growth-stability matters more than exact counts).

    ``quotas``: a (source, quota) frame — tiny, broadcast. Returns the
    selected documents with their ``rank``.

    Scale shape: ONE sort-based rank window per source over (source,
    60-bit key) rows — Spark window sorts spill, and the standard
    KMV-style refinement (pre-filter keys below quota/n_docs-scaled
    thresholds) bounds the sort input when quotas are tiny fractions;
    text never enters the window, only the key and ids."""
    keyed = docs.withColumn(
        "_qk",
        F.expr(
            f"CAST(conv(substr(md5(concat_ws(':', doc_id, '{salt}')),"
            f" 1, 15), 16, 10) AS BIGINT)"
        ),
    )
    w = Window.partitionBy("source").orderBy("_qk", "doc_id")
    return (
        keyed.join(F.broadcast(quotas), "source")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("quota"))
        .drop("_qk")
    )


def dup_source_matrix(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cross-source duplication matrix — WHERE the near-duplicates come
    from: every near-dup pair (doc_a, doc_b, jaccard) mapped to its
    unordered source pair and aggregated to (source_a <= source_b,
    n_pairs, min_jaccard, max_jaccard). The diagonal is within-source
    duplication (boilerplate, mirrored pages inside one crawl); heavy
    off-diagonal cells are cross-crawl mirrors — the signal that decides
    whether dedup must run across source boundaries at all. Only
    order-independent aggregates (count/min/max), so the floats are
    reproducible at any partitioning without a sorted fold.

    Scale shape: the pair table is already threshold-pruned (orders of
    magnitude smaller than the corpus); two keyed joins attach sources,
    then one bounded |sources|² aggregate. The corpus itself is touched
    only for the (doc_id, source) projection."""
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.select("doc_a", "doc_b", "jaccard")
        .join(src.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("source", "src_a"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("source", "src_b"), "doc_b")
    )
    return (
        labeled.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def canonical_select(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Canonical-document selection — the ACTIONABLE end of near-dedup:
    within each transitive duplicate cluster (:func:`dedup_clusters`),
    keep exactly ONE document, the one the pinned total order prefers
    (:func:`quality` score DESC, then doc_id ASC as the tiebreak), and
    mark the rest dropped. Output per doc: (doc_id, cluster_id,
    cluster_size, keep, kept_doc_id) — the keep-list a curation run
    materializes plus the redirect map (dup -> canonical) that
    downstream lineage wants.

    Scale shape: clusters come from the iterative pair propagation
    (bounded by the pair graph, not the corpus); the selection is ONE
    rank window per cluster over (cluster_id, quality, doc_id) rows —
    metadata only, text never enters the shuffle. Singleton clusters
    pass through the same window at size 1."""
    q = quality(docs).select("doc_id", "quality")
    cl = dedup_clusters(docs, pairs).join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        cl.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .withColumn(
            "kept_doc_id",
            F.first("doc_id").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .select(
            "doc_id", "cluster_id", "cluster_size",
            (F.col("rk") == 1).alias("keep"), "kept_doc_id",
        )
    )


def length_drift(docs: DataFrame) -> DataFrame:
    """Per-source document-LENGTH distribution drift: the exact
    two-sample Kolmogorov-Smirnov statistic between each source's
    doc-length distribution and the whole corpus — the shape-of-content
    monitor that complements :func:`source_drift`'s vocabulary
    chi-square (a source can keep its vocabulary and still collapse to
    stub pages; that moves length, not words). D = max |F_src(x) -
    F_corpus(x)|; both CDFs are step functions that only jump at
    observed lengths, so the max is attained at observed values and the
    whole statistic is EXACT: integer cumulative counts, one IEEE
    divide per side at the max, computed as max over the integer-exact
    cross-difference |c_src * n_corpus - c_corpus * n_src| first
    (bit-reproducible without float folds).

    Output: (source, n_docs, ks_d) with dn = the integer numerator
    max |c_s * n - c * n_s| and ks_d = dn / (n_s * n) as one divide.

    Scale shape: the value domain is DISTINCT LENGTHS — bounded by the
    max document length, not by content — so the (source, length) cell
    grid is safe (unlike a vocab grid); one corpus-sized aggregate to
    cells, a dense per-source step-carry over the corpus's length grid
    (two windows on one partitioning), one max per source."""
    from pyspark.sql import Window

    lengths = docs.select(
        "source", F.length("text").cast("long").alias("len")
    )
    cells = lengths.groupBy("source", "len").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=False)
    grid_x = cells.select("len").distinct()
    src_n = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_s")
    )
    # dense (source, x) grid over DISTINCT LENGTHS (bounded domain);
    # absent cells read 0 via the left join, the step carry is a
    # running sum per source in length order
    grid = (
        src_n.crossJoin(F.broadcast(grid_x))
        .join(cells, ["source", "len"], "left")
        .select(
            "source", "n_s", "len",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    w_s = Window.partitionBy("source").orderBy("len")
    corpus = cells.groupBy("len").agg(F.sum("c").cast("long").alias("cc"))
    w_c = Window.orderBy("len")
    corpus_cdf = corpus.select(
        "len",
        F.sum("cc").over(
            w_c.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cum_c"),
    )
    n_tot = cells.agg(F.sum("c").cast("long").alias("n")).localCheckpoint(
        eager=False
    )
    stepped = (
        grid.withColumn(
            "cum_s",
            F.sum("c").over(
                w_s.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long"),
        )
        .join(corpus_cdf, "len")
        .crossJoin(F.broadcast(n_tot))
    )
    return (
        stepped.groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.max(
                F.abs(F.col("cum_s") * F.col("n") - F.col("cum_c") * F.col("n_s"))
            ).cast("long").alias("dn"),
            F.max(F.col("n_s") * F.col("n")).cast("long").alias("_den"),
        )
        .select(
            "source", "n_docs", "dn",
            F.expr("CAST(dn AS DOUBLE) / CAST(_den AS DOUBLE)").alias("ks_d"),
        )
    )


def mix_plan(
    mix: DataFrame, budget_tokens, max_epochs: float = 4.0
) -> DataFrame:
    """Token-budget allocation with an EPOCH CAP — the mixture planner
    that turns :func:`temperature_mix`'s probabilities into an
    executable data recipe: allocate ``budget_tokens`` across sources
    proportional to ``temp_prob``, but never schedule any source for
    more than ``max_epochs`` passes over its own mass (the repetition
    ceiling the data-constrained-scaling literature imposes — Muennighoff
    et al. 2023 find ~4 epochs is where repeated tokens stop paying).
    Capped sources keep ``max_epochs * token_mass``; their surplus
    re-spreads over the uncapped, which may cap more sources — classic
    water-filling, computed in CLOSED FORM by one sorted fold instead
    of iteration: sources cap exactly in decreasing ``temp_prob /
    token_mass`` order, so a single pass in that order (fold state =
    remaining budget and probability mass) finds the KKT watermark
    (B*, P*), and each source is then capped iff its uncapped share at
    the watermark would exceed the cap. Every float op is one shared
    expression — bit-reproducible by the plain-Python twin.

    Input: (source, token_mass, temp_prob) — the temperature_mix
    output. Output per source: target_tokens, epochs, capped; when the
    budget exceeds ``max_epochs`` x the whole corpus, every source caps
    and the leftover is visible as budget - sum(target_tokens).

    Scale: the frame is |sources| rows; the fold and the watermark
    broadcast are O(|sources|) — nothing touches a corpus."""
    if isinstance(budget_tokens, DataFrame):
        # lazy budget: a 1-row frame whose single column is the budget
        # (e.g. an aggregate of the mix itself) — keeps the builder free
        # of construction-time Spark jobs
        bcol = budget_tokens.columns[0]
        mix = mix.crossJoin(
            F.broadcast(budget_tokens.select(F.col(bcol).alias("_budget")))
        )
        b0 = "max(CAST(_budget AS DOUBLE))"
    else:
        if budget_tokens < 0:
            raise ValueError(
                f"budget_tokens must be >= 0, got {budget_tokens}"
            )
        b0 = f"CAST({int(budget_tokens)} AS DOUBLE)"
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    cap = f"CAST({float(max_epochs)} AS DOUBLE)"
    # fold in capping order (temp_prob/token_mass DESC, source ASC):
    # a source caps iff its share of the CURRENT remainder exceeds the
    # cap; once one declines, all later (smaller-ratio) ones decline too
    fold = (
        "aggregate("
        " array_sort(collect_list(struct("
        "   -(temp_prob / CAST(token_mass AS DOUBLE)) AS negr,"
        "   source, temp_prob AS p,"
        "   CAST(token_mass AS DOUBLE) AS m))),"
        f" struct({b0} AS b, CAST(1.0 AS DOUBLE) AS p),"
        " (acc, x) -> IF(acc.p > CAST(0 AS DOUBLE)"
        f"   AND x.p * acc.b / (acc.p * x.m) > {cap},"
        "   struct(acc.b - " + cap + " * x.m AS b, acc.p - x.p AS p), acc))"
    )
    keep = ["source", "token_mass", "temp_prob"] + (
        ["_budget"] if "_budget" in mix.columns else []
    )
    water = mix.select(*keep).agg(F.expr(fold).alias("w")).select(
        F.col("w.b").alias("_bstar"), F.col("w.p").alias("_pstar")
    )
    target = (
        f"CASE WHEN _pstar <= CAST(0 AS DOUBLE)"
        f" OR temp_prob * _bstar / (_pstar * CAST(token_mass AS DOUBLE))"
        f" > {cap}"
        f" THEN {cap} * CAST(token_mass AS DOUBLE)"
        f" ELSE temp_prob * _bstar / _pstar END"
    )
    return (
        mix.select("source", "token_mass", "temp_prob")
        .crossJoin(F.broadcast(water))
        .withColumn("target_tokens", F.expr(target))
        .select(
            "source", "token_mass", "temp_prob", "target_tokens",
            F.expr(
                "target_tokens / CAST(token_mass AS DOUBLE)"
            ).alias("epochs"),
            F.expr(
                f"_pstar <= CAST(0 AS DOUBLE) OR temp_prob * _bstar"
                f" / (_pstar * CAST(token_mass AS DOUBLE)) > {cap}"
            ).alias("capped"),
        )
    )


def novelty_curve(docs: DataFrame) -> DataFrame:
    """Corpus novelty curve: per document (in doc_id ingestion order),
    the fraction of its DISTINCT 8-gram shingles never seen in any
    EARLIER document — the marginal-novelty signal behind "is this
    snapshot still adding new content" curation decisions (the
    per-doc form of the vocabulary-growth ladder, at shingle
    granularity). Exact integer counts + one shared float formula.

    Output: (doc_id, n_shingles, n_prior, novelty).

    Scale shape: the standard inverted-index pair — a gram-keyed
    MIN(doc_id) aggregate (map-side combined) joined back to the
    per-doc gram stream, then a doc-keyed rollup; the gram text never
    shuffles (int64 hashes), no pairwise joins anywhere. The MIN is
    order-free, so 'earlier' needs no global sort — ingestion order
    IS the doc_id order."""
    all_long = doc_shingles(docs).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    first = all_long.groupBy("s").agg(
        F.min("doc_id").alias("first_doc")
    )
    per = (
        all_long.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.expr("CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END")
            ).cast("long").alias("n_prior"),
        )
    )
    return per.select(
        "doc_id", "n_shingles", "n_prior",
        F.expr(
            "1 - CAST(n_prior AS DOUBLE) / n_shingles"
        ).alias("novelty"),
    )


def _lz78_phrases(s: str) -> int:
    """LZ78 phrase count (Lempel & Ziv 1978): greedily split ``s`` into
    phrases, each = longest already-seen phrase + one new char. The
    count is the classic compressibility measure — low for repetitive
    text, ~n/log n for incompressible text."""
    seen: set = set()
    count = 0
    cur = ""
    for ch in s:
        cur += ch
        if cur not in seen:
            seen.add(cur)
            count += 1
            cur = ""
    if cur:
        count += 1  # ragged final phrase (already seen)
    return count


def lz_complexity(docs: DataFrame) -> DataFrame:
    """Per-document LZ78 compressibility report: phrase count and the
    normalized complexity n_phrases / n_chars — the "gzip-ability"
    quality signal (boilerplate and templated spam compress far better
    than natural prose; near-random noise compresses worse). The
    curation-filter sibling of tx_quality's surface ratios and
    tx_char_rarity's distributional score, measuring STRUCTURE rather
    than composition.

    Output: (doc_id, n_chars, n_phrases, lz_ratio).

    Rows-only (the greedy dictionary parse is inherently sequential
    per document); the kernel is pinned in pytest on closed-form
    cases (the all-same-char string yields the triangular-number
    phrase count) and on the repetitive < prose < noise ordering.

    Scale shape: map-only Arrow pass over (doc_id, text) — O(n)
    phrases per doc with a per-doc hash dictionary, embarrassingly
    parallel, zero shuffle beyond the scan."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_chars", LongType(), False),
            StructField("n_phrases", LongType(), False),
            StructField("lz_ratio", DoubleType(), True),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                np_ = _lz78_phrases(t)
                n = len(t)
                out.append((
                    int(doc_id), n, np_,
                    (np_ / n) if n else None,
                ))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["doc_id", "n_chars", "n_phrases", "lz_ratio"],
                )

    return docs.select("doc_id", "text").mapInPandas(run, schema)


def dup_pagerank(
    docs: DataFrame, pairs: DataFrame, iters: int = 10,
    damping_num: int = 85, damping_den: int = 100,
) -> DataFrame:
    """PageRank over the near-duplicate candidate graph: nodes are ALL
    documents, undirected edges the LSH candidate pairs — rank mass
    concentrates on documents embedded in large duplicate
    neighborhoods, a centrality-based canonical-selection /
    crawl-frontier signal that counting degrees misses (a doc bridging
    two dup clusters outranks a doc inside one). The engine's
    iterative-linear-algebra representative beyond the connected-
    components fixpoint: ``iters`` rounds of the damped power
    iteration r' = (1−d)/N + d·(A_deg⁻¹)ᵀ r, expressed as join +
    aggregate per round.

    Determinism discipline: the per-target contribution sum is a
    SORTED FOLD over (source, contribution) — float addition order is
    pinned, so the distributed result is bit-reproducible at any
    partitioning (and the pytest NumPy replay reproduces it term by
    term). Isolated docs are dangling nodes: they keep the
    teleport term only ((1−d)/N exactly — asserted in pytest) and
    their mass is NOT redistributed, the GraphX convention (total rank
    sums below 1 when the graph has isolated nodes; rank_x_n stays
    comparable within a corpus). Damping is a rational (85/100) so the constant folds to
    the same double everywhere.

    Output: (doc_id, degree, rank, rank_x_n) — rank_x_n = rank·N, the
    scale-free form (1.0 = average).

    Scale shape: per round ONE shuffle (the target-keyed contribution
    aggregate; the rank-side join is co-keyed on source by the same
    hash). Lineage is truncated with localCheckpoint(eager=False)
    every THIRD round (and on the last) — every round would pay a full
    materialization job per round for a ≤3-join plan that Catalyst
    handles fine, the dup-cluster fixpoint lesson applied with a
    lighter cadence."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nodes = docs.select("doc_id").localCheckpoint(eager=False)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    n_docs = nodes.count()  # bounded driver scalar (node count)
    base = f"CAST({damping_den - damping_num} AS DOUBLE) / ({damping_den} * CAST({n_docs} AS BIGINT))"
    damp = f"(CAST({damping_num} AS DOUBLE) / {damping_den})"
    rank = nodes.select(
        "doc_id",
        F.expr(f"CAST(1 AS DOUBLE) / CAST({n_docs} AS BIGINT)").alias("rank"),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(src, c))),"
        " s -> s.c), CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    for it in range(iters):
        contrib = (
            edges.join(rank, edges.src == rank.doc_id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("doc_id"), "src",
                F.expr("rank / deg").alias("c"),
            )
        )
        summed = contrib.groupBy("doc_id").agg(F.expr(fold).alias("s"))
        rank = nodes.join(summed, "doc_id", "left").select(
            "doc_id",
            F.expr(
                f"{base} + {damp} * coalesce(s, CAST(0 AS DOUBLE))"
            ).alias("rank"),
        )
        if it % 3 == 2 or it == iters - 1:
            rank = rank.localCheckpoint(eager=False)
    return (
        rank.join(
            deg.select(F.col("src").alias("doc_id"), "deg"), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            "rank",
            F.expr(f"rank * CAST({n_docs} AS BIGINT)").alias("rank_x_n"),
        )
    )


def collocations_topk(docs: DataFrame, k: int = 50, min_count: int = 5) -> DataFrame:
    """Corpus collocations by LIFT — the classic PMI collocation miner
    with the log dropped: lift(a,b) = N·c(a,b) / (c(a)·c(b)) is a
    strictly monotone transform of PMI (PMI = log lift), so ranking by
    lift IS ranking by PMI while every comparison stays a ratio of
    exact int64 products — no transcendental ever enters, and the
    oracle reproduces ranks and the one float division bit-for-bit.
    ``min_count`` drops hapax pairs (the standard PMI-sparsity fix).

    Output: top-``k`` rows (a, b, pair_cnt, cnt_a, cnt_b, lift),
    deterministic ties (lift DESC, a, b).

    Scale shape: bigram and unigram counts are map-side-combined hash
    aggregates on reduced keys (the inverted-index discipline of the
    fluency models); unigram counts broadcast onto the surviving
    (count ≥ min_count) pair table; top-k via sort+limit →
    TakeOrderedAndProject. Ranking by a rational avoids both libm
    divergence AND the float-tie ambiguity a log-space sort risks."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ws = docs.select("doc_id", F.expr("split(text, ' ')").alias("ws"))
    bigrams = ws.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
                " ELSE array() END"
            )
        ).alias("bg")
    ).select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    words = docs.select(
        F.explode(F.expr("split(text, ' ')")).alias("w")
    )
    uni = words.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    total = words.agg(F.count("*").cast("long").alias("n_total"))
    pairs = (
        bigrams.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_count)
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("w").alias("a"),
                                   F.col("c").alias("cnt_a"))), "a")
        .join(
            F.broadcast(uni.select(F.col("w").alias("b"),
                                   F.col("c").alias("cnt_b"))), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a", "b", "pair_cnt", "cnt_a", "cnt_b",
            F.expr(
                "CAST(n_total AS DOUBLE) * pair_cnt"
                " / (CAST(cnt_a AS DOUBLE) * cnt_b)"
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.col("a"), F.col("b")
    ).limit(k)


def containment_pairs(
    long: DataFrame, threshold_num: int = 4, threshold_den: int = 5
) -> DataFrame:
    """ASYMMETRIC containment over informative shingle sets:
    containment(A in B) = |A∩B| / |A| — the quote/aggregator/subset
    detector Jaccard structurally misses (a short doc fully contained
    in a long one has tiny Jaccard but containment 1.0; Broder 1997
    defined both for exactly this reason). Emits each ordered
    direction whose containment ≥ threshold, so (small ⊂ big) and
    (big ⊂ small) report independently.

    The threshold is applied as an EXACT integer cross-multiplication
    (den·inter ≥ num·n_small — no float enters the filter) and the
    reported float is derived from the exact (inter, na, nb) triple —
    the oracle reproduces both bit-for-bit.

    Output: (doc_small, doc_big, inter, n_small, n_big, containment).

    Scale shape: identical to jaccard_pairs (the same inverted-index
    join on the shingle hash, the same df-cap guarantees), ONE extra
    projection — the unordered pair table fans out to at most two
    ordered rows."""
    sizes = long.groupBy("doc_id").agg(F.count("*").cast("long").alias("nsh"))
    a, b = long.alias("a"), long.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    both = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("nsh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("nsh", "nb"), "doc_b")
    )
    directed = both.select(
        F.col("doc_a").alias("doc_small"), F.col("doc_b").alias("doc_big"),
        "inter", F.col("na").alias("n_small"), F.col("nb").alias("n_big"),
    ).unionByName(
        both.select(
            F.col("doc_b").alias("doc_small"),
            F.col("doc_a").alias("doc_big"),
            "inter", F.col("nb").alias("n_small"),
            F.col("na").alias("n_big"),
        )
    )
    return (
        directed.filter(
            F.expr(f"{threshold_den} * inter >= {threshold_num} * n_small")
        )
        .select(
            "doc_small", "doc_big", "inter", "n_small", "n_big",
            F.expr("CAST(inter AS DOUBLE) / n_small").alias("containment"),
        )
    )


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document. Ranking discipline: for
    a fixed document, tf·idf with idf = log(N/df) orders candidates
    identically to the RATIONAL score tf·N/df (log is monotone and
    tf > 0), so no transcendental is needed — the score column is that
    rational computed as ONE double from exact int64 counts (identical
    in the oracle, so ranks and floats both reproduce bit-for-bit),
    with the word as the deterministic tie-break. df = number of
    documents containing the word.

    Output: (doc_id, rnk, word, tf, df, score).

    Scale shape: tf is a (doc, word) hash aggregate; df folds the tf
    table (never the corpus); df broadcasts onto tf; the per-doc top-k
    is a bounded window over each doc's vocabulary."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(
        F.count("*").cast("long").alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    total = docs.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", F.col("w").alias("word"), "tf", "df",
            F.expr(
                "CAST(tf AS DOUBLE) * n_docs / df"
            ).alias("score"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.col("word")
    )
    return (
        scored.select(
            "doc_id", F.row_number().over(win).cast("long").alias("rnk"),
            "word", "tf", "df", "score",
        )
        .filter(F.col("rnk") <= k)
    )
