"""Token-sequence training-prep ops over the engine's canonical corpus
shape ``(doc_id, tokens array<int>, n_tok [, source])`` — the "tokens"
leg of the LLM-pipeline brief that the reference engine (dtaianomaly,
which stops at window extraction over these same arrays) has no
counterpart for:

* **BPE merge training** (Sennrich et al. 2016): the tokenizer-refresh
  job a data pipeline runs over a new crawl — count adjacent token
  pairs, merge the most frequent, repeat. :func:`pair_counts` /
  :func:`apply_merge` / :func:`bpe_train`.
* **Fixed-context sequence packing** (Krell et al. 2021, "Efficient
  Sequence Packing without Cross-contamination"): turn ragged tokenized
  documents into dense ``capacity``-token training rows with minimal
  padding. :func:`chunk_tokens` / :func:`pack_sequences` /
  :func:`packing_stats`.

Scale shapes (100 TB):

* ``pair_counts`` — map-side HOF pair stream into ONE map-side-combined
  hash aggregate keyed on the (pa, pb) int pair; per-doc pair lists
  never shuffle, only partial counts do. The same inverted-index shape
  as exact dedup — survives 100x.
* ``bpe_train`` — K passes of (pair count -> 1-row argmax collect ->
  Arrow map merge). Each pass lazily ``localCheckpoint``s the merged
  corpus: the next pass's argmax action materializes the blocks while
  it counts pairs — one fused job per round — and pass k+1 reads
  materialized arrays instead of replaying k merge lambdas (the
  dedup-cluster lineage-truncation trick). The LAST round's merge pass
  executes inside the caller's first action on the returned corpus.
  **Training is an ACTION**: the winning pair is data-dependent, so
  calling it runs Spark jobs — unlike the lazy builders elsewhere in
  this package. The only driver traffic per pass is ONE row (the
  argmax) — never a vocabulary or a corpus.
* ``chunk_tokens`` — map-side slice HOF, zero shuffle.
* ``pack_sequences`` — one shuffle on a deterministic md5 group key,
  then per-group Arrow best-fit-decreasing. Bin quality is per-group
  (each group packs independently), which is exactly how a 1000-executor
  packing job must run anyway: the group count caps per-task state at
  |corpus|/n_groups sequences, and raising it scales the op to any
  corpus. Assignments are bit-deterministic at ANY partitioning: the
  group key is an md5 of the row identity and the in-group order is the
  total order (n_tok DESC, id ASC).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dtaianomaly_spark.kernels import tokens as KT

#: Default id for the first learned merge token — far above the
#: synthetic corpora's raw-token range, far below int32 max.
NEW_ID_START = 1_000_000


class MergeLog:
    """Checkpoint log for the multi-round merge trainers (BPE /
    WordPiece), the trainer-side twin of the rollup engine's
    snapshot log (streaming/incremental.py): each completed round
    appends ONE record — the merge decision, plus per-round lineage
    (wall ms, candidate volume) — with the same copy-on-write + atomic
    POSIX-rename commit. A killed training job rerun with the same
    ``checkpoint_dir`` replays the logged merges in ONE Arrow pass
    (:func:`apply_merges`) and resumes counting at the first unlogged
    round; committed rounds are never recounted.

    The header record pins the trainer name and scoring params — a
    resume under different rules raises instead of silently mixing
    merge tables. An ``exhausted`` record marks early convergence (no
    candidate pair left) so resumes stop without paying a count pass."""

    def __init__(self, checkpoint_dir: str, trainer: str, params: dict):
        import os

        self.path = os.path.join(checkpoint_dir, "merges.jsonl")
        self.dir = checkpoint_dir
        self.trainer = trainer
        self.params = {k: params[k] for k in sorted(params)}
        os.makedirs(checkpoint_dir, exist_ok=True)

    def read(self) -> Tuple[List[dict], bool]:
        """(committed merge records in step order, exhausted flag);
        validates the header against this trainer's params."""
        import json
        import os

        if not os.path.exists(self.path):
            return [], False
        merges, exhausted = [], False
        with open(self.path) as f:
            for line in f:
                rec = json.loads(line)
                if "trainer" in rec:
                    if (
                        rec["trainer"] != self.trainer
                        or rec["params"] != self.params
                    ):
                        raise ValueError(
                            f"checkpoint at {self.path} was written by"
                            f" trainer={rec['trainer']} params="
                            f"{rec['params']}; refusing to resume as"
                            f" trainer={self.trainer} params={self.params}"
                        )
                elif rec.get("exhausted"):
                    exhausted = True
                else:
                    merges.append(rec)
        merges.sort(key=lambda r: r["step"])
        if [r["step"] for r in merges] != list(range(len(merges))):
            raise ValueError(
                f"checkpoint at {self.path} has a gap in its step"
                " sequence — the log is corrupt"
            )
        return merges, exhausted

    def _append(self, rec: dict) -> None:
        import json
        import os
        import uuid

        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        existing = ""
        if os.path.exists(self.path):
            with open(self.path) as f:
                existing = f.read()
        with open(tmp, "w") as f:
            f.write(existing + json.dumps(rec) + "\n")
        os.replace(tmp, self.path)

    def commit(self, rec: dict) -> None:
        import os

        if not os.path.exists(self.path):
            self._append({"trainer": self.trainer, "params": self.params})
        self._append(rec)

    def mark_exhausted(self) -> None:
        import os

        if not os.path.exists(self.path):
            self._append({"trainer": self.trainer, "params": self.params})
        self._append({"exhausted": True})


def pair_counts(corpus: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the whole corpus: one row per distinct
    (pa, pb) with its raw adjacency count (overlaps included, as BPE
    counts them: ``[a,a,a]`` contributes ``(a,a)`` twice).

    Expression-only: the pair stream is a map-side ``transform`` HOF
    (the ``sequence(1, 0)``-descends guard applies — short arrays emit
    nothing), and the single shuffle is the map-side-combined count."""
    pairs = corpus.select(
        F.explode(
            F.expr(
                "CASE WHEN size(tokens) >= 2 THEN"
                " transform(sequence(1, size(tokens) - 1),"
                " i -> struct(tokens[i-1] AS pa, tokens[i] AS pb))"
                " ELSE CAST(array() AS array<struct<pa:int,pb:int>>) END"
            )
        ).alias("pr")
    ).select("pr.pa", "pr.pb")
    return pairs.groupBy("pa", "pb").agg(
        F.count("*").cast("long").alias("cnt")
    )


def apply_merge(corpus: DataFrame, a: int, b: int, new_id: int) -> DataFrame:
    """Apply ONE BPE merge ``(a, b) -> new_id`` to every ``tokens``
    array (greedy left-to-right, single pass over the original array —
    :func:`dtaianomaly_spark.kernels.tokens.merge_pair`). Map-only
    Arrow stage; preserves the input schema (``n_tok`` recomputed when
    present), so merged corpora drop back into every downstream op."""
    a, b, new_id = int(a), int(b), int(new_id)
    schema = corpus.schema
    has_ntok = "n_tok" in corpus.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            merged = [
                KT.merge_pair(t, a, b, new_id) for t in pdf["tokens"]
            ]
            pdf = pdf.copy()
            pdf["tokens"] = [m.tolist() for m in merged]
            if has_ntok:
                pdf["n_tok"] = np.array(
                    [m.shape[0] for m in merged], dtype=np.int32
                )
            yield pdf

    return corpus.mapInPandas(run, schema)


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 16,
    new_id_start: int = NEW_ID_START,
    min_count: int = 2,
    checkpoint_dir: Optional[str] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Distributed BPE training: ``n_merges`` rounds of (corpus-wide
    pair count -> argmax -> merge apply). Tie-break pinned to
    (cnt DESC, pa ASC, pb ASC) — the same total order as the pytest
    oracle :func:`dtaianomaly_spark.kernels.tokens.bpe_reference`, so
    the learned merge table is bit-deterministic for a given corpus.

    Returns ``(merges, merged_corpus)``: the merge table
    (step, pa, pb, new_id, cnt) and the corpus after all merges.
    **Runs Spark jobs when called** (see module docstring); each round
    collects exactly one row and lazily checkpoints the merged arrays
    (materialized by the next round's argmax — or, for the final
    round, by the caller's first action on the returned corpus).

    At 100 TB each round is one map-side-combined aggregate plus one
    map-only Arrow pass — the classic distributed BPE loop. Production
    trainers amortize rounds with pair-delta bookkeeping; the per-round
    full recount here trades that for exactness and statelessness and
    is the right shape while n_merges stays small (tokenizer refreshes
    are tens of merges over an already-tokenized corpus, not the
    from-characters thousands).

    ``checkpoint_dir`` makes training RESUMABLE (the rollup engine's
    snapshot contract extended to the trainer): each completed round
    atomically commits its merge + lineage to ``merges.jsonl``
    (:class:`MergeLog`); a killed run rerun with the same dir replays
    the committed merges in ONE Arrow pass and counts only the
    remaining rounds."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    import time as _time

    spark = corpus.sparkSession
    cur = corpus
    merges: List[Tuple[int, int, int, int, int]] = []
    log = exhausted = None
    if checkpoint_dir is not None:
        log = MergeLog(
            checkpoint_dir,
            "bpe",
            {"new_id_start": new_id_start, "min_count": min_count},
        )
        prior, exhausted = log.read()
        merges = [
            (r["step"], r["pa"], r["pb"], r["new_id"], r["cnt"])
            for r in prior
        ]
        if merges:
            cur = apply_merges(
                corpus, [(pa, pb, m) for _, pa, pb, m, _ in merges]
            ).localCheckpoint(eager=False)
    for step in range(len(merges), n_merges):
        if exhausted:
            break
        t0 = _time.perf_counter()
        best = (
            pair_counts(cur)
            .orderBy(F.col("cnt").desc(), F.col("pa"), F.col("pb"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["cnt"]) < min_count:
            if log is not None:
                log.mark_exhausted()
            break
        pa, pb, cnt = (
            int(best[0]["pa"]), int(best[0]["pb"]), int(best[0]["cnt"])
        )
        new_id = new_id_start + step
        merges.append((step, pa, pb, new_id, cnt))
        if log is not None:
            log.commit(
                {
                    "step": step, "pa": pa, "pb": pb, "new_id": new_id,
                    "cnt": cnt,
                    "wall_ms": int(1000 * (_time.perf_counter() - t0)),
                }
            )
        # lazy checkpoint: the NEXT round's argmax action materializes
        # the merged blocks while it counts pairs — one job per round
        # instead of a separate eager-materialization job
        cur = apply_merge(cur, pa, pb, new_id).localCheckpoint(eager=False)
    merges_df = spark.createDataFrame(
        merges, schema="step long, pa int, pb int, new_id int, cnt long"
    )
    return merges_df, cur


def apply_merges(corpus: DataFrame, merges) -> DataFrame:
    """The BPE ENCODE step: apply a learned merge table to every
    ``tokens`` array in rank order (merge 0 first — each later merge
    sees the earlier merges' output, exactly as at training time, so
    encoding a corpus with its own learned table reproduces
    :func:`bpe_train`'s merged corpus bit-for-bit).

    ``merges`` is either the (step, pa, pb, new_id, ...) DataFrame from
    :func:`bpe_train` — collected here; it is n_merges rows by contract,
    a bounded vocabulary-sized table, never a corpus — or an iterable of
    (pa, pb, new_id) triples in rank order. ONE map-only Arrow stage:
    all K merges run per batch inside the same Python worker pass, not
    K Spark passes."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        merges = [(r["pa"], r["pb"], r["new_id"]) for r in rows]
    ms = [(int(a), int(b), int(m)) for a, b, m in merges]
    schema = corpus.schema
    has_ntok = "n_tok" in corpus.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf["tokens"]:
                arr = np.asarray(t, dtype=np.int32)
                for a, b, m in ms:
                    arr = KT.merge_pair(arr, a, b, m)
                out.append(arr)
            pdf = pdf.copy()
            pdf["tokens"] = [a.tolist() for a in out]
            if has_ntok:
                pdf["n_tok"] = np.array(
                    [a.shape[0] for a in out], dtype=np.int32
                )
            yield pdf

    return corpus.mapInPandas(run, schema)


def chunk_tokens(corpus: DataFrame, capacity: int) -> DataFrame:
    """Split every ``tokens`` array into consecutive chunks of at most
    ``capacity`` tokens — the pre-pass that makes any corpus packable
    (no sequence longer than a training row). Map-side slice HOF, zero
    shuffle. Output: (doc_id, chunk, tokens, n_tok); chunk ids are
    0-based and contiguous per doc; concatenating a doc's chunks in
    chunk order reproduces its original array. An EMPTY document emits
    one empty chunk (n_tok = 0) rather than vanishing — row
    conservation holds; the packer rejects 0-length sequences loudly,
    so callers with empty docs filter deliberately, never silently."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    nchunks = f"(size(tokens) + {capacity - 1}) DIV {capacity}"
    return (
        corpus.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "CASE WHEN size(tokens) >= 1 THEN"
                    f" transform(sequence(0, {nchunks} - 1),"
                    f" j -> slice(tokens, j * {capacity} + 1, {capacity}))"
                    " ELSE array(CAST(array() AS array<int>)) END"
                )
            ).alias("chunk", "tokens"),
        )
        .select(
            "doc_id",
            F.col("chunk").cast("int").alias("chunk"),
            "tokens",
            F.expr("size(tokens)").cast("int").alias("n_tok"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    capacity: int,
    n_groups: int = 64,
    id_cols: Optional[Tuple[str, ...]] = None,
) -> DataFrame:
    """Assign every sequence to a fixed-``capacity`` training bin with
    best-fit-DECREASING packing inside deterministic hash groups.

    ``chunks`` needs (``n_tok`` plus the identity columns) — the output
    of :func:`chunk_tokens`, or any corpus whose sequences already fit.
    ``id_cols`` defaults to ("doc_id", "chunk") intersected with the
    input columns; together they must identify a row.

    Output: id columns + (n_tok, grp, bin) where ``bin`` is the
    0-based bin index WITHIN the group; (grp, bin) is the global
    training-row id. Every bin's token total is <= capacity; padding
    accounting comes from :func:`packing_stats`.

    Deterministic at any partitioning: grp is an md5 of the row
    identity (never Spark's partitioner), and each group packs its
    rows in the total order (n_tok DESC, id ASC) with the exact kernel
    :func:`dtaianomaly_spark.kernels.tokens.pack_bfd`."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1, got {n_groups}")
    if id_cols is None:
        id_cols = tuple(
            c for c in ("doc_id", "chunk") if c in chunks.columns
        )
    if not id_cols:
        raise ValueError("no identity columns found (need id_cols)")
    ident = " || ':' || ".join(
        f"CAST({c} AS STRING)" for c in id_cols
    )
    base = chunks.select(
        *id_cols,
        F.col("n_tok").cast("int").alias("n_tok"),
        F.expr(
            f"CAST(conv(substr(md5({ident}), 1, 15), 16, 10)"
            f" % {int(n_groups)} AS INT)"
        ).alias("grp"),
    )
    # build a FRESH StructType: .add() mutates the DataFrame's cached
    # schema object, desyncing df.columns from the JVM plan
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(base.schema.fields)
        + [StructField("bin", IntegerType(), False)]
    )
    sort_cols = ["n_tok"] + list(id_cols)
    ascending = [False] + [True] * len(id_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        pdf = pdf.reset_index(drop=True)
        pdf["bin"] = np.array(
            KT.pack_bfd(pdf["n_tok"].tolist(), capacity), dtype=np.int32
        )
        return pdf

    return base.groupBy("grp").applyInPandas(pack, out_schema)


def build_packed_rows(
    chunks: DataFrame,
    packed: DataFrame,
    capacity: int,
    id_cols: Optional[Tuple[str, ...]] = None,
) -> DataFrame:
    """Materialize the actual training rows: join the packing
    assignment back to the token arrays and concatenate each (grp, bin)
    bin's sequences — in the deterministic id-column order — into
    one dense row. Output: (grp, bin, n_seqs, n_tok, tokens, offsets)
    where ``offsets`` are the sequence start positions inside
    ``tokens`` (the attention-mask boundaries packing needs to avoid
    cross-contamination, per Krell et al. 2021).

    ``id_cols`` is the same row-identity contract as
    :func:`pack_sequences` (default: ("doc_id", "chunk") intersected
    with the packed columns — so a corpus packed with
    ``id_cols=("doc_id",)`` round-trips here unchanged).

    One co-partitioned equi-join on the id columns plus one hash
    aggregate keyed on (grp, bin); each collected list is <= one bin
    (<= capacity tokens), so nothing unbounded ever folds."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if id_cols is None:
        id_cols = tuple(
            c for c in ("doc_id", "chunk") if c in packed.columns
        )
    if not id_cols:
        raise ValueError("id_cols resolved empty: pass the identity columns")
    ids = list(id_cols)
    joined = chunks.select(*ids, "tokens").join(
        packed.select(*ids, "grp", "bin"), ids
    )
    agg = joined.groupBy("grp", "bin").agg(
        F.expr(
            f"array_sort(collect_list(struct({', '.join(ids)}, tokens)))"
        ).alias("segs")
    )
    return agg.select(
        "grp",
        "bin",
        F.expr("size(segs)").cast("int").alias("n_seqs"),
        F.expr(
            "CAST(aggregate(segs, 0, (a, s) -> a + size(s.tokens))"
            " AS INT)"
        ).alias("n_tok"),
        F.expr("flatten(transform(segs, s -> s.tokens))").alias("tokens"),
        F.expr(
            "slice(aggregate(segs, array(0),"
            " (a, s) -> concat(a, array(a[size(a) - 1]"
            " + size(s.tokens)))), 1, size(segs))"
        ).alias("offsets"),
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row packing report over :func:`pack_sequences` output:
    (n_groups, n_bins, n_seqs, n_tokens, pad_tokens, fill). Integer
    aggregates + one shared float formula (fill = tokens / bin
    capacity mass). Per-group bin counts come from the 0-based
    contiguous bin ids (max + 1), so the rollup is two tiny hash
    aggregates — nothing corpus-sized moves."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    per_grp = packed.groupBy("grp").agg(
        (F.max("bin").cast("long") + 1).alias("g_bins"),
        F.count("*").cast("long").alias("g_seqs"),
        F.sum("n_tok").cast("long").alias("g_tokens"),
    )
    return per_grp.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("g_bins").cast("long").alias("n_bins"),
        F.sum("g_seqs").cast("long").alias("n_seqs"),
        F.sum("g_tokens").cast("long").alias("n_tokens"),
        (F.sum("g_bins") * capacity - F.sum("g_tokens"))
        .cast("long")
        .alias("pad_tokens"),
    ).select(
        "n_groups",
        "n_bins",
        "n_seqs",
        "n_tokens",
        "pad_tokens",
        F.expr(
            "CAST(n_tokens AS DOUBLE)"
            f" / (CAST(n_bins AS DOUBLE) * {int(capacity)})"
        ).alias("fill"),
    )


# --------------------------------------------------------------------------
# Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece unigram
# model) over the same int-token corpus: units are token n-grams, a
# document's probability marginalizes over all segmentations into
# units, EM fits unit probabilities, Viterbi encodes.  Completes the
# tokenizer family next to BPE: BPE grows units bottom-up by merges,
# unigram starts from an over-complete seed vocabulary and fits/prunes.
#
# Scale shape (100 TB): seeding is the pair_counts shape per n-gram
# length (map-side HOF key stream into a hash aggregate over reduced
# int64 keys, global top-N via TakeOrderedAndProject); each EM round is
# ONE map-only Arrow E-step (model broadcast in the task closure — the
# unit table is bounded) emitting per-(doc, unit) expected counts,
# folded per unit with the two-level deterministic fold; only the
# <=|units| count rows reach the driver per round.  TRAINING IS AN
# ACTION (the BPE-trainer convention).  Pruning keeps every length-1
# unit (coverage guarantee: any sequence of seen tokens stays
# segmentable) + the top ``keep_multi`` longer units by probability — a
# documented simplification of SentencePiece's likelihood-loss pruning.

UNIGRAM_MAX_LEN = 4


def _ngram_key_expr(length: int) -> str:
    """HOF expression producing the int64 Horner keys of every
    ``length``-gram of ``tokens`` (mirrors kernels.tokens.pack_ngrams)."""
    B, O = KT.UNIT_PACK_BASE, KT.UNIT_PACK_OFFSET
    horner = f"(CAST(tokens[i] AS BIGINT) + {O})"
    for j in range(1, length):
        horner = f"({horner} * {B} + CAST(tokens[i + {j}] AS BIGINT) + {O})"
    # size(tokens), NOT the n_tok column: the Arrow E-step and encode
    # read actual array lengths, so keying grams off a (possibly stale)
    # n_tok would silently train on different grams than EM scores —
    # and an overstated n_tok would index past the array
    return (
        f"CASE WHEN size(tokens) >= {length} THEN"
        f" transform(sequence(0, size(tokens) - {length}), i -> {horner})"
        " ELSE array() END"
    )


def unigram_seed_counts(
    corpus: DataFrame, max_len: int = UNIGRAM_MAX_LEN
) -> DataFrame:
    """(length, key, cnt) corpus-wide n-gram counts for every length in
    1..max_len — the candidate-unit statistics. One union of map-side
    key streams into hash aggregates over bounded int64 keys."""
    parts = []
    for length in range(1, max_len + 1):
        parts.append(
            corpus.select(
                F.explode(F.expr(_ngram_key_expr(length))).alias("key")
            )
            .groupBy("key")
            .agg(F.count("*").cast("long").alias("cnt"))
            .select(F.lit(length).cast("int").alias("length"), "key", "cnt")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def unigram_train(
    corpus: DataFrame,
    max_len: int = UNIGRAM_MAX_LEN,
    top_ngrams: int = 256,
    n_iters: int = 2,
    keep_multi: int = 128,
) -> list:
    """Distributed unigram-LM fit.  Returns the final unit table as a
    list of dicts: {unit_id, length, toks, logp, e_cnt} sorted by
    unit_id (== seed order: length ASC, key ASC) — bounded
    (|alphabet| + keep_multi rows), broadcastable.

    Steps: (1) seed = every present token (length 1) + the global
    top-``top_ngrams`` longer n-grams, probabilities proportional to
    raw counts; (2) ``n_iters`` EM rounds — Arrow forward-backward
    E-step (kernels.tokens.unigram_expected_counts, shared with the
    pytest oracle), two-level deterministic per-unit fold, driver
    M-step p(u) = c(u)/Σc; (3) prune to length-1 + top ``keep_multi``
    longer units by (logp DESC, length ASC, key ASC), renormalized in
    unit-id order."""
    import math

    seeds = unigram_seed_counts(corpus, max_len)
    base = seeds.filter(F.col("length") == 1).collect()
    multi = (
        seeds.filter(F.col("length") > 1)
        .orderBy(F.col("cnt").desc(), "length", "key")
        .limit(int(top_ngrams))
        .collect()
    )
    rows = sorted(
        [(int(r["length"]), int(r["key"]), int(r["cnt"])) for r in base]
        + [(int(r["length"]), int(r["key"]), int(r["cnt"])) for r in multi]
    )
    total = sum(c for _, _, c in rows)
    units = [
        {
            "unit_id": i,
            "length": l,
            "key": k,
            "toks": KT.unpack_ngram(k, l),
            "logp": math.log(c) - math.log(total),
            "e_cnt": float(c),
        }
        for i, (l, k, c) in enumerate(rows)
    ]

    estep_schema = "doc_id long, unit_id long, e double"
    fold_doc = (
        "aggregate(transform(array_sort(collect_list(struct(doc_id, e))),"
        " s -> s.e), CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    fold_h = (
        "aggregate(transform(array_sort(collect_list(struct(h, e))),"
        " s -> s.e), CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    n_units = len(units)
    for _ in range(int(n_iters)):
        model = _np_model(units)

        def estep(batches, model=model, n_units=n_units):
            for batch in batches:
                doc_ids = batch.column(0).to_numpy()
                la = batch.column(1)
                lens = la.value_lengths().to_numpy().astype(np.int64)
                values = la.flatten().to_numpy().astype(np.int64)
                starts = np.cumsum(lens) - lens
                out_d, out_u, out_e = [], [], []
                for row_i in range(batch.num_rows):
                    toks = values[starts[row_i] : starts[row_i] + lens[row_i]]
                    # only the nonzero expected counts are emitted; the
                    # kernel's per-doc log-normalizer z (the doc
                    # log-likelihood) is dropped here — the M-step needs
                    # counts only, and shipping a sentinel row per doc
                    # through both fold levels would be pure shuffle waste
                    e, _z = KT.unigram_expected_counts(toks, model, n_units)
                    nz = np.flatnonzero(e)
                    out_d.extend([int(doc_ids[row_i])] * nz.size)
                    out_u.extend(int(u) for u in nz)
                    out_e.extend(float(x) for x in e[nz])
                import pyarrow as pa

                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_d, type=pa.int64()),
                        pa.array(out_u, type=pa.int64()),
                        pa.array(out_e, type=pa.float64()),
                    ],
                    names=["doc_id", "unit_id", "e"],
                )

        stage = corpus.select("doc_id", "tokens").mapInArrow(
            estep, estep_schema
        )
        lvl1 = (
            stage.select(
                "unit_id",
                F.expr(
                    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15),"
                    f" 16, 10) AS BIGINT) % {N_EM_GROUPS}"
                ).alias("h"),
                "doc_id",
                "e",
            )
            .groupBy("unit_id", "h")
            .agg(F.expr(fold_doc).alias("e"))
        )
        agg = (
            lvl1.groupBy("unit_id").agg(F.expr(fold_h).alias("e")).collect()
        )
        counts = {int(r["unit_id"]): float(r["e"]) for r in agg}
        s = 0.0
        for u in units:  # unit-id order — deterministic
            u["e_cnt"] = counts.get(u["unit_id"], 0.0)
            s += u["e_cnt"]
        for u in units:
            # every present unit has positive posterior mass (any path
            # through it exists); guard anyway for numerical underflow
            u["logp"] = (
                math.log(u["e_cnt"]) - math.log(s)
                if u["e_cnt"] > 0.0
                else float("-inf")
            )
        # zero-mass units stay in the table at logp = -inf (the lattice
        # treats them as absent) — ids never shift mid-training, which
        # keeps the oracle mirror trivial

    # prune: keep all length-1 + top keep_multi longer units (-inf
    # units sort last and are excluded)
    ones = [u for u in units if u["length"] == 1 and u["logp"] != float("-inf")]
    longer = sorted(
        (u for u in units if u["length"] > 1 and u["logp"] != float("-inf")),
        key=lambda u: (-u["logp"], u["length"], u["key"]),
    )[: int(keep_multi)]
    kept = sorted(ones + longer, key=lambda u: (u["length"], u["key"]))
    s = 0.0
    for u in kept:  # renormalize in (length, key) order
        s += math.exp(u["logp"])
    logs = math.log(s)
    return [
        {**u, "unit_id": i, "logp": u["logp"] - logs}
        for i, u in enumerate(kept)
    ]


N_EM_GROUPS = 32  # md5 doc-hash subgroups of the two-level EM fold


def _np_model(units: list) -> dict:
    """Per-length (sorted keys, unit ids, logps) numpy tables for the
    lattice kernels."""
    model: dict = {}
    for u in units:
        model.setdefault(u["length"], []).append(
            (u["key"], u["unit_id"], u["logp"])
        )
    return {
        l: tuple(
            np.asarray(col, dtype=(np.int64 if i < 2 else np.float64))
            for i, col in enumerate(zip(*sorted(v)))
        )
        for l, v in model.items()
    }


def unigram_units_frame(spark, units: list) -> DataFrame:
    """The unit table as a DataFrame (unit_id, length, toks, logp,
    e_cnt) — the model artifact a pipeline persists."""
    return spark.createDataFrame(
        [
            (u["unit_id"], u["length"], u["toks"], u["logp"], u["e_cnt"])
            for u in units
        ],
        schema="unit_id long, length int, toks array<int>, logp double,"
        " e_cnt double",
    )


def unigram_encode(corpus: DataFrame, units: list) -> DataFrame:
    """Viterbi-encode every document under a trained unit table: ONE
    map-only Arrow stage (model in the task closure), emitting
    (doc_id, n_tok, n_pieces, score) — the per-doc compression the
    tokenizer-swap report aggregates.  The piece streams are pinned in
    pytest to concatenate back to the exact input tokens."""
    model = _np_model(units)

    def encode(batches):
        import pyarrow as pa

        for batch in batches:
            doc_ids = batch.column(0).to_numpy()
            la = batch.column(1)
            row_lens = la.value_lengths().to_numpy().astype(np.int64)
            values = la.flatten().to_numpy().astype(np.int64)
            starts = np.cumsum(row_lens) - row_lens
            n_out, p_out, s_out = [], [], []
            for row_i in range(batch.num_rows):
                toks = values[starts[row_i] : starts[row_i] + row_lens[row_i]]
                ids, lens, score = KT.unigram_viterbi(toks, model)
                n_out.append(int(toks.shape[0]))
                p_out.append(int(ids.shape[0]))
                s_out.append(float(score))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([int(d) for d in doc_ids], type=pa.int64()),
                    pa.array(n_out, type=pa.int64()),
                    pa.array(p_out, type=pa.int64()),
                    pa.array(s_out, type=pa.float64()),
                ],
                names=["doc_id", "n_tok", "n_pieces", "score"],
            )

    return corpus.select("doc_id", "tokens").mapInArrow(
        encode, "doc_id long, n_tok long, n_pieces long, score double"
    )


# --------------------------------------------------------------- WordPiece


def wordpiece_counts(corpus: DataFrame) -> DataFrame:
    """Pair counts AND unit (single-token) counts in ONE map-side HOF
    stream + ONE map-side-combined aggregate: rows ``(pa, pb, cnt)``
    where ``pb IS NULL`` marks a unit-count row for token id ``pa``.
    The WordPiece score needs both tables per round; emitting them from
    the same corpus pass halves the trainer's scan count vs two
    aggregates. Same scale shape as :func:`pair_counts`: per-doc
    streams never shuffle, only partial counts do."""
    rows = corpus.select(
        F.explode(
            F.expr(
                "concat("
                " CASE WHEN size(tokens) >= 2 THEN"
                "  transform(sequence(1, size(tokens) - 1),"
                "  i -> struct(tokens[i-1] AS pa, tokens[i] AS pb))"
                " ELSE CAST(array() AS array<struct<pa:int,pb:int>>) END,"
                " transform(tokens, t -> struct(t AS pa,"
                " CAST(NULL AS INT) AS pb)))"
            )
        ).alias("pr")
    ).select("pr.pa", "pr.pb")
    return rows.groupBy("pa", "pb").agg(
        F.count("*").cast("long").alias("cnt")
    )


def wordpiece_train(
    corpus: DataFrame,
    n_merges: int = 8,
    new_id_start: int = NEW_ID_START,
    min_count: int = 2,
    candidate_k: int = 128,
    checkpoint_dir: Optional[str] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Distributed WordPiece merge training (Schuster & Nakajima 2012;
    the likelihood-ratio criterion of the public HuggingFace
    `tokenizers` WordPiece trainer — distinct from BPE's raw-frequency
    argmax and Unigram's EM pruning): each round merges the adjacent
    pair maximizing ``count(ab) / (count(a) * count(b))``, tie-break
    (pa ASC, pb ASC), pinned bit-exactly to
    :func:`dtaianomaly_spark.kernels.tokens.wordpiece_reference`.

    Round shape (TRAINING IS AN ACTION, the BPE-trainer convention):

    1. ONE corpus pass — the combined pair+unit aggregate
       (:func:`wordpiece_counts`), eagerly ``localCheckpoint``-ed (a
       vocabulary-bounded table, never a corpus).
    2. Scores on the checkpointed table: unit counts broadcast onto the
       pair rows, double-precision score ONLY to rank candidates — a
       ``TakeOrderedAndProject`` top-``candidate_k`` collect.
    3. EXACT winner on the driver via integer cross-multiplication over
       the collected candidates. Doubles cannot misrank across the
       1e-9 relative margin (one int->double conversion + one divide is
       <= 3 ulp), so the exact argmax is always inside the margin; if
       the margin might be truncated (all ``candidate_k`` rows inside
       it) the full in-margin set is re-collected by filter first.
    4. Merge applied as the map-only Arrow stage (:func:`apply_merge`),
       lazily checkpointed — the next round's aggregate materializes it.

    At 10^12-token scale counts exceed 2^53 and the double score's
    relative error is ~1e-15 — still 6 orders inside the margin, so
    exactness survives. The driver traffic per round is bounded by
    ``candidate_k`` (or the tie margin), never a vocabulary.

    ``checkpoint_dir`` makes training RESUMABLE exactly as in
    :func:`bpe_train`: per-round atomic merge+lineage commits
    (:class:`MergeLog`), replay-then-continue on rerun.

    Returns ``(merges, merged_corpus)`` where ``merges`` is
    (step, pa, pb, new_id, cnt, ca, cb)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if candidate_k < 1:
        raise ValueError(f"candidate_k must be >= 1, got {candidate_k}")
    import time as _time

    spark = corpus.sparkSession
    cur = corpus
    merges: List[Tuple[int, int, int, int, int, int, int]] = []
    log = exhausted = None
    if checkpoint_dir is not None:
        log = MergeLog(
            checkpoint_dir,
            "wordpiece",
            {"new_id_start": new_id_start, "min_count": min_count},
        )
        prior, exhausted = log.read()
        merges = [
            (
                r["step"], r["pa"], r["pb"], r["new_id"],
                r["cnt"], r["ca"], r["cb"],
            )
            for r in prior
        ]
        if merges:
            cur = apply_merges(
                corpus, [(pa, pb, m) for _, pa, pb, m, _, _, _ in merges]
            ).localCheckpoint(eager=False)
    for step in range(len(merges), n_merges):
        if exhausted:
            break
        t0 = _time.perf_counter()
        counts = wordpiece_counts(cur).localCheckpoint(eager=True)
        units = counts.filter(F.col("pb").isNull()).select(
            F.col("pa").alias("u"), F.col("cnt").alias("cu")
        )
        scored = (
            counts.filter(
                F.col("pb").isNotNull() & (F.col("cnt") >= min_count)
            )
            .join(
                F.broadcast(
                    units.select(
                        F.col("u").alias("pa"), F.col("cu").alias("ca")
                    )
                ),
                "pa",
            )
            .join(
                F.broadcast(
                    units.select(
                        F.col("u").alias("pb"), F.col("cu").alias("cb")
                    )
                ),
                "pb",
            )
            .select(
                "pa", "pb", "cnt", "ca", "cb",
                (
                    F.col("cnt").cast("double")
                    / (F.col("ca").cast("double") * F.col("cb").cast("double"))
                ).alias("score"),
            )
        )
        top = (
            scored.orderBy(F.col("score").desc(), "pa", "pb")
            .limit(candidate_k)
            .collect()
        )
        if not top:
            if log is not None:
                log.mark_exhausted()
            break
        thresh = top[0]["score"] * (1.0 - 1e-9)
        cands = [r for r in top if r["score"] >= thresh]
        if len(cands) == candidate_k:
            # the tie margin may extend past the top-k window — fetch
            # the complete in-margin set (still tie-bounded, tiny)
            cands = scored.filter(F.col("score") >= thresh).collect()
        best = None
        for r in sorted(cands, key=lambda r: (int(r["pa"]), int(r["pb"]))):
            c, ca, cb = int(r["cnt"]), int(r["ca"]), int(r["cb"])
            # exact rational compare; strict > keeps the smallest
            # (pa, pb) among exact ties
            if best is None or c * best[3] * best[4] > best[2] * ca * cb:
                best = (int(r["pa"]), int(r["pb"]), c, ca, cb)
        pa, pb, c, ca, cb = best
        new_id = new_id_start + step
        merges.append((step, pa, pb, new_id, c, ca, cb))
        if log is not None:
            log.commit(
                {
                    "step": step, "pa": pa, "pb": pb, "new_id": new_id,
                    "cnt": c, "ca": ca, "cb": cb,
                    "n_candidates": len(cands),
                    "wall_ms": int(1000 * (_time.perf_counter() - t0)),
                }
            )
        cur = apply_merge(cur, pa, pb, new_id).localCheckpoint(eager=False)
    merges_df = spark.createDataFrame(
        merges,
        schema="step long, pa int, pb int, new_id int, cnt long,"
        " ca long, cb long",
    )
    return merges_df, cur


def expand_merges(merges) -> List[Tuple[int, Tuple[int, ...]]]:
    """Flatten each learned unit id to its base-token sequence:
    ``seq(new_id) = seq(pa) + seq(pb)``, base ids expanding to
    themselves. ``merges`` is the trainer's DataFrame (collected here —
    an n_merges-row model table, never a corpus) or (pa, pb, new_id)
    triples in rank order. Returns ``[(new_id, base_seq), ...]`` in
    rank order — the unit inventory :func:`wordpiece_encode` matches
    against."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        merges = [(r["pa"], r["pb"], r["new_id"]) for r in rows]
    seqs: dict = {}
    out: List[Tuple[int, Tuple[int, ...]]] = []
    for a, b, m in merges:
        sa = seqs.get(int(a), (int(a),))
        sb = seqs.get(int(b), (int(b),))
        seqs[int(m)] = sa + sb
        out.append((int(m), sa + sb))
    return out


def wordpiece_encode(corpus: DataFrame, merges) -> DataFrame:
    """WordPiece INFERENCE: maximal munch (longest-match-first) over
    the learned unit inventory — NOT BPE's rank-order merge replay
    (:func:`apply_merges`): at each position the LONGEST learned unit
    matching the upcoming tokens is emitted regardless of merge rank,
    else the raw token (every base id is its own length-1 unit, so
    there is no UNK). The two rules genuinely differ: train ``(1,2)``
    then ``(100,3)`` and encode ``[1,2,3]`` — merge replay and maximal
    munch both give ``[101]``, but a LATER long unit, e.g. ``(2,3)``
    learned after ``(1,2)``, loses to the earlier merge under replay
    on ``[1,2,3]`` yet wins under munch on ``[2,3]``-led suffixes.

    ONE map-only Arrow stage, model in the task closure (unit table is
    n_merges rows). Emits (doc_id, pieces array<int>, n_tok, n_pieces);
    pinned in pytest against the flat-dict reference matcher and a
    piece-expansion round-trip."""
    # per-length dicts, longest first — the engine's match structure
    tables: dict = {}
    for uid, seq in expand_merges(merges):
        tables.setdefault(len(seq), {})[seq] = uid
    lens_desc = sorted(tables, reverse=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces, n_tok, n_pieces = [], [], []
            for t in pdf["tokens"]:
                s = [int(x) for x in t]
                out: List[int] = []
                i, n = 0, len(s)
                while i < n:
                    for ln in lens_desc:
                        if ln > n - i:
                            continue
                        uid = tables[ln].get(tuple(s[i : i + ln]))
                        if uid is not None:
                            out.append(uid)
                            i += ln
                            break
                    else:
                        out.append(s[i])
                        i += 1
                pieces.append(out)
                n_tok.append(len(s))
                n_pieces.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": pieces,
                    "n_tok": np.array(n_tok, dtype=np.int64),
                    "n_pieces": np.array(n_pieces, dtype=np.int64),
                }
            )

    return corpus.select("doc_id", "tokens").mapInPandas(
        run,
        "doc_id long, pieces array<int>, n_tok long, n_pieces long",
    )


# ------------------------------------------------- corpus diagnostics


def vocab_growth(
    corpus: DataFrame, ladder: Tuple[int, ...] = (1, 2, 4, 8)
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve — the tokenizer-planning
    diagnostic (how fast does the unit inventory saturate as the crawl
    grows?): for each prefix threshold T in ``ladder`` (docs in doc_id
    order, the deterministic stand-in for crawl order, scaled as
    ``T/max(ladder)`` of the corpus), the distinct-token count and
    token mass of the first-T/max slice.

    Scale shape: ONE map-side-combined aggregate to each token's FIRST
    document (vocab-bounded rows), then one tiny conditional-sum pass
    over it per the whole ladder — the corpus is scanned twice total
    (once for firsts, once for the per-slice token mass), never per
    ladder rung. Output: (n_docs, vocab_size, token_mass) per rung."""
    if not ladder or list(ladder) != sorted(set(int(t) for t in ladder)):
        raise ValueError(f"ladder must be strictly increasing, got {ladder}")
    denom = int(max(ladder))
    n_docs = corpus.count()
    cuts = [
        (int(t), n_docs * int(t) // denom) for t in ladder
    ]  # (rung, docs in prefix)
    firsts = (
        corpus.select(
            "doc_id", F.explode("tokens").alias("token")
        )
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    # doc_id rank == doc_id order: the synthetic corpora use dense ids;
    # for arbitrary ids substitute a row_number ladder upstream
    vocab_aggs = firsts.agg(
        *[
            F.sum(
                F.when(F.col("first_doc") < F.lit(k), 1).otherwise(0)
            ).cast("long").alias(f"v{t}")
            for t, k in cuts
        ]
    )
    # rank cutoffs need doc_id-rank: map doc_id -> rank via ordering
    mass_aggs = corpus.agg(
        *[
            F.sum(
                F.when(F.col("doc_id") < F.lit(k), F.col("n_tok")).otherwise(0)
            ).cast("long").alias(f"m{t}")
            for t, k in cuts
        ]
    )
    both = vocab_aggs.crossJoin(F.broadcast(mass_aggs)).collect()[0]
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [
            (k, int(both[f"v{t}"]), int(both[f"m{t}"]))
            for t, k in cuts
        ],
        schema="n_docs long, vocab_size long, token_mass long",
    )


def zipf_fit(corpus: DataFrame, top_k: int = 256) -> DataFrame:
    """Zipf's-law slope over the top-``top_k`` token frequencies: OLS
    of ln(freq) on ln(rank) — the one-number skew summary a sampling /
    vocabulary-size decision reads. ONE vocab-bounded count aggregate +
    a ``top_k`` heap collect (TakeOrderedAndProject, ties (cnt DESC,
    token ASC)); the regression runs on the driver over ``top_k`` rows
    in pinned rank order, so the floats are bit-deterministic. Output:
    one row (n_tokens_ranked, slope, intercept, r2)."""
    import math

    if top_k < 2:
        raise ValueError(f"top_k must be >= 2, got {top_k}")
    rows = (
        corpus.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(int(top_k))
        .collect()
    )
    if len(rows) < 2:
        raise ValueError(
            f"zipf_fit needs >= 2 distinct tokens, corpus has {len(rows)}"
        )
    xs = [math.log(r_i + 1) for r_i in range(len(rows))]
    ys = [math.log(int(r["cnt"])) for r in rows]
    n = len(rows)
    mx = sum(xs) / n
    my = sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx if sxx > 0 else 0.0
    intercept = my - slope * mx
    r2 = (sxy * sxy) / (sxx * syy) if sxx > 0 and syy > 0 else 0.0
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(n, float(slope), float(intercept), float(r2))],
        schema="n_tokens_ranked long, slope double, intercept double,"
        " r2 double",
    )


def tokenizer_swap_report(
    corpus: DataFrame,
    sources: DataFrame,
    bpe_merges,
    wp_merges,
    unigram_units: list,
) -> DataFrame:
    """The tokenizer-SELECTION report the three trainers exist to feed:
    per (source, tokenizer) the document count, input token mass,
    output piece mass, and compression ratio for BPE (rank-order merge
    replay), WordPiece (maximal munch), and Unigram-LM (Viterbi) — all
    three encodes over the SAME corpus, each ONE map-only Arrow stage,
    joined to the source dimension and rolled up. The frame a data team
    reads to pick the tokenizer for the next training run.

    ``sources`` is the (doc_id, source) dimension; model artifacts come
    from the three trainers (bounded tables/lists, never corpora).
    Scale shape: three encode map stages + three doc_id joins + one
    union + one per-(source, tokenizer) rollup — payload arrays never
    shuffle (each encode emits only per-doc counts here)."""
    legs = []
    bpe_counts = apply_merges(corpus, bpe_merges).select(
        "doc_id",
        F.lit("bpe").alias("tokenizer"),
        F.size("tokens").cast("long").alias("n_pieces"),
    )
    wp_counts = wordpiece_encode(corpus, wp_merges).select(
        "doc_id", F.lit("wordpiece").alias("tokenizer"), "n_pieces"
    )
    uni_counts = unigram_encode(corpus, unigram_units).select(
        "doc_id", F.lit("unigram").alias("tokenizer"), "n_pieces"
    )
    base = corpus.select("doc_id", F.col("n_tok").cast("long").alias("n_tok"))
    for leg in (bpe_counts, wp_counts, uni_counts):
        legs.append(leg)
    per_doc = legs[0].unionByName(legs[1]).unionByName(legs[2])
    joined = per_doc.join(base, "doc_id").join(
        sources.select("doc_id", "source"), "doc_id"
    )
    return (
        joined.groupBy("source", "tokenizer")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_in"),
            F.sum("n_pieces").cast("long").alias("pieces_out"),
        )
        .select(
            "source", "tokenizer", "n_docs", "tokens_in", "pieces_out",
            F.expr(
                "CAST(tokens_in AS DOUBLE) / CAST(pieces_out AS DOUBLE)"
            ).alias("compression"),
        )
    )


def epoch_order(
    packed_rows: DataFrame,
    epoch: int,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle of the packed rows —
    the step between :func:`build_packed_rows` and the data loader:
    every epoch every packed bin gets a shuffle key
    ``md5(grp || bin || epoch || salt)`` (the repo's md5 convention —
    bit-reproducible by any engine and by the plain-Python pytest
    twin) and the epoch's training order is the ascending key order.
    Output: input columns + (epoch, seq) where ``seq`` is the dense
    0-based position of the row in epoch order.

    Properties that matter for training (all pytest-pinned): the order
    is a permutation (seq is dense per epoch), reproducible under any
    partitioning, different across epochs (fresh md5 input), and
    STABLE under corpus growth in the key sense — a bin's key never
    changes, so appending new bins interleaves them without reshuffling
    the relative order of existing ones (the split_assign contract,
    applied to ordering).

    Scale: one global sort on the 128-bit key (range partitioning —
    the honest 100-TB shape: epoch shards are WRITTEN in key order so
    the loader streams sequentially); the window over the sorted order
    adds no extra exchange. At cluster scale, substitute the
    row_number window with ``zipWithIndex``-style shard offsets if a
    single ordering partition column is preferred; the key itself is
    already the total order."""
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    from pyspark.sql import Window

    key = (
        f"md5(concat(CAST(grp AS STRING), '|', CAST(bin AS STRING),"
        f" '|e{int(epoch)}|', '{salt}'))"
    )
    w = Window.orderBy("shuffle_key", "grp", "bin")
    return (
        packed_rows.withColumn("shuffle_key", F.expr(key))
        .withColumn("epoch", F.lit(int(epoch)).cast("long"))
        .withColumn("seq", (F.row_number().over(w) - 1).cast("long"))
        .drop("shuffle_key")
    )


def oov_ladder(
    corpus: DataFrame, vocab_sizes: Tuple[int, ...] = (32, 64, 128)
) -> DataFrame:
    """Per-source OOV rate under truncated token vocabularies — the
    tokenizer-sizing audit: if the deployed vocabulary kept only the
    top-``V`` tokens by corpus frequency, what fraction of each
    source's token mass falls out-of-vocabulary? One row per
    (source, vocab_size): total token mass, OOV mass, and their ratio
    (one IEEE divide). The vocabulary order is the pinned total order
    ``count DESC, token ASC`` — deterministic under ties, shared with
    the plain-Python twin.

    Input: the canonical corpus shape (doc_id, tokens, n_tok, source).

    Scale shape: ONE (source, token) hash aggregate is the only
    corpus-sized stage (map-side combined; bounded by
    |sources| x |token domain| cells); the global vocabulary ranks fold
    THOSE cells, the rank join broadcasts, and the ladder is
    conditional sums over the cell table — the whole ladder re-reads
    the corpus zero times."""
    if not vocab_sizes or any(v < 1 for v in vocab_sizes):
        raise ValueError(f"vocab_sizes must be >= 1, got {vocab_sizes!r}")
    from pyspark.sql import Window

    sv = (
        corpus.select("source", F.explode("tokens").alias("value"))
        .groupBy("source", "value")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    gcnt = sv.groupBy("value").agg(F.sum("cnt").cast("long").alias("gcnt"))
    # token-domain-bounded frame: the single-partition rank window runs
    # over distinct tokens, never the corpus
    ranked = gcnt.withColumn(
        "vrank",
        F.row_number().over(
            Window.orderBy(F.col("gcnt").desc(), F.col("value").asc())
        ),
    )
    cells = sv.join(F.broadcast(ranked.select("value", "vrank")), "value")
    # the whole ladder in ONE per-source aggregate (one conditional sum
    # per rung), unpivoted to long form with stack() — no shuffle per rung
    per_src = cells.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("vrank") > v, F.col("cnt"))), F.lit(0)
            ).cast("long").alias(f"_oov_{v}")
            for v in vocab_sizes
        ],
    )
    stack = ", ".join(
        f"CAST({int(v)} AS BIGINT), _oov_{v}" for v in vocab_sizes
    )
    return per_src.select(
        "source", "total_tokens",
        F.expr(
            f"stack({len(vocab_sizes)}, {stack}) AS (vocab_size, oov_tokens)"
        ),
    ).select(
        "source", "vocab_size", "total_tokens", "oov_tokens",
        F.expr(
            "CAST(oov_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)"
        ).alias("oov_rate"),
    )


def bpe_decode(encoded: DataFrame, merges) -> DataFrame:
    """The BPE DECODE step: expand every learned unit id back to its
    base-token sequence (:func:`expand_merges` — recursive expansion
    resolved driver-side over the bounded model table, never a corpus)
    in ONE expression-only map stage: ``flatten(transform(tokens,
    CASE ...))``. Zero Python, zero shuffle. ``decode(encode(x)) == x``
    for every sequence by construction of the merge replay — the
    round-trip invariant tok_roundtrip pins corpus-wide.

    Extra columns pass through; ``n_tok`` (when present) is updated to
    the decoded length."""
    exp = expand_merges(merges)
    branches = " ".join(
        f"WHEN t = {mid} THEN array({', '.join(str(x) for x in seq)})"
        for mid, seq in exp
    )
    case = f"CASE {branches} ELSE array(t) END" if exp else "array(t)"
    out = encoded.withColumn(
        "tokens",
        F.expr(
            f"CAST(flatten(transform(tokens, t -> {case}))"
            f" AS array<int>)"
        ),
    )
    if "n_tok" in encoded.columns:
        out = out.withColumn("n_tok", F.size("tokens"))
    return out


def pack_contamination(
    packed: DataFrame, clusters: DataFrame
) -> DataFrame:
    """Cross-contamination audit for packed training rows: Krell et
    al.'s packing is safe because attention masks separate the
    sequences inside a bin — but a bin holding TWO CHUNKS OF NEAR-
    DUPLICATE DOCUMENTS still leaks (the model sees the same content
    twice in one optimizer step, a mini epoch-2 the mixture accounting
    never recorded). Given the packing assignment
    (:func:`pack_sequences` output: id cols + grp, bin) and a doc ->
    cluster map (:func:`...text.dedup_clusters`), report per (grp,
    bin): sequences, distinct docs, distinct clusters, and the
    contaminated flag (some cluster contributes 2+ DISTINCT docs —
    same-doc chunk pairs are the normal case and don't count).

    Scale shape: one join on doc_id (the cluster map is corpus-
    metadata-sized), one (grp, bin) aggregate over bounded per-bin
    member lists. Output is one row per training bin."""
    joined = packed.join(clusters.select("doc_id", "cluster_id"), "doc_id")
    return (
        joined.groupBy("grp", "bin")
        .agg(
            F.count("*").cast("long").alias("n_seqs"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        )
        .withColumn(
            "contaminated", F.col("n_clusters") < F.col("n_docs")
        )
    )
