"""Token training-prep ops (pipelines/tokens.py): BPE pair counting /
merge training vs the exact Python oracle, chunking round-trip, and
deterministic best-fit-decreasing packing invariants."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dtaianomaly_spark.kernels import tokens as KT
from dtaianomaly_spark.pipelines import tokens as TK
from dtaianomaly_spark.sources import corpus as C

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ------------------------------------------------------------- kernels
def test_merge_pair_matches_scan_reference():
    rng = np.random.default_rng(11)
    for _ in range(4000):
        n = int(rng.integers(0, 40))
        arr = rng.integers(0, 4, n).tolist()
        a, b = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        got = KT.merge_pair(arr, a, b, 99).tolist()
        want = KT.merge_pair_scan(arr, a, b, 99)
        assert got == want, (arr, a, b)


def test_merge_pair_equal_pair_runs():
    assert KT.merge_pair([5, 5, 5], 5, 5, 9).tolist() == [9, 5]
    assert KT.merge_pair([5, 5, 5, 5], 5, 5, 9).tolist() == [9, 9]
    assert KT.merge_pair([1, 5, 5, 5, 2, 5, 5], 5, 5, 9).tolist() == [
        1, 9, 5, 2, 9,
    ]


def test_pack_bfd_matches_brute_force():
    rng = np.random.default_rng(13)
    for _ in range(2000):
        cap = int(rng.integers(1, 64))
        ls = rng.integers(1, cap + 1, int(rng.integers(0, 80))).tolist()
        assert KT.pack_bfd(ls, cap) == KT.pack_reference(ls, cap)


def test_pack_bfd_bucket_structure_adversarial():
    """Exercise the bucket-by-remainder structure: masses of identical
    lengths (all bins share one remainder bucket, tie-break = lowest bin
    id), alternating fills that empty and recreate buckets, and a long
    mixed stream — all must match the brute-force reference."""
    # identical lengths: cap 10, len 3 -> bins cycle through remainders
    assert KT.pack_bfd([3] * 50, 10) == KT.pack_reference([3] * 50, 10)
    # exact fills: remainder-0 buckets accumulate and are never reused
    assert KT.pack_bfd([7, 3, 7, 3, 7, 3], 10) == KT.pack_reference(
        [7, 3, 7, 3, 7, 3], 10
    )
    rng = np.random.default_rng(29)
    ls = rng.integers(1, 513, 5000).tolist()
    assert KT.pack_bfd(ls, 512) == KT.pack_reference(ls, 512)


def test_pack_bfd_rejects_out_of_range():
    with pytest.raises(ValueError, match="chunk long sequences"):
        KT.pack_bfd([5], 4)
    with pytest.raises(ValueError, match="capacity"):
        KT.pack_bfd([1], 0)


# ------------------------------------------------------- Spark: BPE
def test_pair_counts_match_reference(spark):
    arrays = C.token_arrays(spark, SF_DIR)
    seqs = [r["tokens"] for r in arrays.select("tokens").collect()]
    want = KT.pair_count_reference(seqs)
    got = {
        (r["pa"], r["pb"]): r["cnt"]
        for r in TK.pair_counts(arrays).collect()
    }
    assert got == want


def test_bpe_train_matches_python_oracle(spark):
    # deterministic subset: LIMIT without ORDER BY may pick different
    # rows across the trainer's many independent jobs
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 40")
    rows = arrays.orderBy("doc_id").collect()
    seqs = [r["tokens"] for r in rows]
    want_merges, want_final = KT.bpe_reference(
        seqs, n_merges=6, new_id_start=TK.NEW_ID_START
    )
    merges_df, merged = TK.bpe_train(arrays, n_merges=6)
    got_merges = [
        (r["step"], r["pa"], r["pb"], r["new_id"], r["cnt"])
        for r in merges_df.orderBy("step").collect()
    ]
    assert got_merges == want_merges
    got_final = {
        r["doc_id"]: r["tokens"] for r in merged.collect()
    }
    want_by_doc = {
        rows[i]["doc_id"]: want_final[i] for i in range(len(rows))
    }
    assert got_final == want_by_doc
    # n_tok stays consistent with the merged arrays
    assert merged.filter(F.expr("n_tok != size(tokens)")).count() == 0


def test_apply_merges_reproduces_training_output(spark):
    """Encoding a corpus with its own learned merge table must equal
    the trainer's merged corpus bit-for-bit (rank-order application)."""
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 30")
    merges_df, merged = TK.bpe_train(arrays, n_merges=5)
    encoded = TK.apply_merges(arrays, merges_df)
    a = {r["doc_id"]: r["tokens"] for r in merged.collect()}
    b = {r["doc_id"]: r["tokens"] for r in encoded.collect()}
    assert a == b
    # triple-list form agrees with the DataFrame form
    triples = [
        (r["pa"], r["pb"], r["new_id"])
        for r in merges_df.orderBy("step").collect()
    ]
    c = {
        r["doc_id"]: r["tokens"]
        for r in TK.apply_merges(arrays, triples).collect()
    }
    assert a == c


def test_apply_merge_preserves_schema(spark):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 5")
    out = TK.apply_merge(arrays, 1, 2, 777)
    assert out.schema == arrays.schema


# ---------------------------------------------------- Spark: packing
def test_chunk_tokens_round_trip(spark):
    arrays = C.token_arrays(spark, SF_DIR)
    chunks = TK.chunk_tokens(arrays, 512)
    assert chunks.filter("n_tok < 1 OR n_tok > 512").count() == 0
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list("
                "struct(chunk, tokens))), s -> s.tokens))"
            ).alias("tokens")
        )
    )
    diff = (
        rebuilt.alias("r")
        .join(arrays.alias("o"), "doc_id")
        .filter(F.expr("r.tokens != o.tokens"))
    )
    assert diff.count() == 0
    # chunk ids contiguous: max+1 == count per doc
    bad = (
        chunks.groupBy("doc_id")
        .agg(F.max("chunk").alias("mx"), F.count("*").alias("c"))
        .filter("mx + 1 != c")
    )
    assert bad.count() == 0


def test_pack_sequences_invariants_and_determinism(spark):
    chunks = TK.chunk_tokens(C.token_arrays(spark, SF_DIR), 512)
    packed = TK.pack_sequences(chunks, 512, n_groups=8)
    # every bin fits
    over = (
        packed.groupBy("grp", "bin")
        .agg(F.sum("n_tok").alias("t"))
        .filter("t > 512")
    )
    assert over.count() == 0
    # every chunk assigned exactly once
    assert packed.count() == chunks.count()
    # bit-deterministic across partitionings
    again = TK.pack_sequences(chunks.repartition(32), 512, n_groups=8)
    assert packed.exceptAll(again).count() == 0
    assert again.exceptAll(packed).count() == 0


def test_pack_sequences_matches_kernel_per_group(spark):
    chunks = TK.chunk_tokens(
        C.token_arrays(spark, SF_DIR).filter("doc_id < 60"), 256
    )
    packed = TK.pack_sequences(chunks, 256, n_groups=4)
    rows = packed.collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    for grp, rs in by_grp.items():
        rs_sorted = sorted(
            rs, key=lambda r: (-r["n_tok"], r["doc_id"], r["chunk"])
        )
        want = KT.pack_bfd([r["n_tok"] for r in rs_sorted], 256)
        got = [r["bin"] for r in rs_sorted]
        assert got == want, grp


def test_build_packed_rows_round_trip(spark):
    arrays = C.token_arrays(spark, SF_DIR)
    chunks = TK.chunk_tokens(arrays, 512)
    packed = TK.pack_sequences(chunks, 512, n_groups=8)
    rows_df = TK.build_packed_rows(chunks, packed, 512)
    # every packed row fits and its bookkeeping is consistent
    bad = rows_df.filter(
        "n_tok > 512 OR n_tok != size(tokens)"
        " OR n_seqs != size(offsets) OR offsets[0] != 0"
    )
    assert bad.count() == 0
    # token mass and sequence count conserved
    tot = rows_df.agg(
        F.sum("n_tok").alias("t"), F.sum("n_seqs").alias("s")
    ).collect()[0]
    want = chunks.agg(
        F.sum("n_tok").alias("t"), F.count("*").alias("s")
    ).collect()[0]
    assert (tot["t"], tot["s"]) == (want["t"], want["s"])
    # offsets slice the concatenation back into the original chunks:
    # re-derive every (start, tokens-slice) segment and anti-join
    segs = rows_df.select(
        F.explode(
            F.expr(
                "transform(offsets, (o, i) -> struct(o AS off,"
                " slice(tokens, o + 1,"
                " coalesce(try_element_at(offsets, i + 2), n_tok) - o)"
                " AS seg))"
            )
        ).alias("s")
    ).select(F.col("s.seg").alias("tokens"))
    missing = chunks.select("tokens").exceptAll(segs)
    assert missing.count() == 0


def test_build_packed_rows_custom_id_cols(spark):
    """pack_sequences advertises arbitrary id_cols (a corpus whose
    sequences already fit, keyed by doc_id alone) — build_packed_rows
    must honor the same contract instead of assuming (doc_id, chunk)."""
    arrays = C.token_arrays(spark, SF_DIR).filter("n_tok <= 128").select(
        "doc_id", "tokens", "n_tok"
    )
    packed = TK.pack_sequences(arrays, 128, n_groups=4)
    assert "chunk" not in packed.columns
    rows_df = TK.build_packed_rows(arrays, packed, 128)
    bad = rows_df.filter(
        "n_tok > 128 OR n_tok != size(tokens) OR n_seqs != size(offsets)"
    )
    assert bad.count() == 0
    tot = rows_df.agg(
        F.sum("n_tok").alias("t"), F.sum("n_seqs").alias("s")
    ).collect()[0]
    want = arrays.agg(
        F.sum("n_tok").alias("t"), F.count("*").alias("s")
    ).collect()[0]
    assert (tot["t"], tot["s"]) == (want["t"], want["s"])


def test_packing_stats_arithmetic(spark):
    chunks = TK.chunk_tokens(C.token_arrays(spark, SF_DIR), 512)
    packed = TK.pack_sequences(chunks, 512, n_groups=8)
    row = TK.packing_stats(packed, 512).collect()[0]
    assert row["n_seqs"] == chunks.count()
    tok = chunks.agg(F.sum("n_tok")).collect()[0][0]
    assert row["n_tokens"] == tok
    assert row["pad_tokens"] == row["n_bins"] * 512 - tok
    assert row["fill"] == tok / (row["n_bins"] * 512.0)
    assert 0.9 < row["fill"] <= 1.0  # BFD on this corpus packs tightly


def test_chunk_tokens_conserves_empty_docs(spark):
    """An empty document must emit one empty chunk, not vanish; the
    packer then rejects it loudly instead of silently dropping it."""
    df = spark.createDataFrame(
        [(1, [5, 6, 7]), (2, [])],
        "doc_id long, tokens array<int>",
    )
    chunks = TK.chunk_tokens(df, 2)
    got = {
        (r["doc_id"], r["chunk"]): r["tokens"] for r in chunks.collect()
    }
    assert got == {(1, 0): [5, 6], (1, 1): [7], (2, 0): []}
    with pytest.raises(Exception, match="outside \\[1, capacity"):
        TK.pack_sequences(chunks, 2, n_groups=2).collect()


# --------------------------------------------------- Spark: WordPiece
def test_wordpiece_reference_sanity():
    # hand-checked: pairs (1,2):3 beats (2,3):2 at equal unit counts
    merges, final = KT.wordpiece_reference(
        [[1, 2, 1, 2, 3], [1, 2, 3, 3]], n_merges=3, new_id_start=100
    )
    assert merges == [
        (0, 1, 2, 100, 3, 3, 3),
        (1, 100, 3, 101, 2, 3, 3),
    ]
    assert final == [[100, 101], [101, 3]]


def test_wordpiece_picks_rarer_units_over_raw_frequency():
    """The likelihood-ratio score must beat BPE's raw-count argmax:
    pair (7,8) (count 2, units 2x2) outranks (1,1) (count 3, units
    6x6) because 2/4 > 3/36 — BPE would pick (1,1)."""
    seqs = [[1, 1, 1, 1, 7, 8], [1, 1, 7, 8]]
    bpe_m, _ = KT.bpe_reference(seqs, 1, 100)
    wp_m, _ = KT.wordpiece_reference(seqs, 1, 100)
    assert bpe_m[0][1:3] == (1, 1)
    assert wp_m[0][1:3] == (7, 8)


def test_wordpiece_train_matches_python_oracle(spark):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 40")
    rows = arrays.orderBy("doc_id").collect()
    seqs = [r["tokens"] for r in rows]
    want_merges, want_final = KT.wordpiece_reference(
        seqs, n_merges=6, new_id_start=TK.NEW_ID_START
    )
    merges_df, merged = TK.wordpiece_train(arrays, n_merges=6)
    got_merges = [
        (
            r["step"], r["pa"], r["pb"], r["new_id"],
            r["cnt"], r["ca"], r["cb"],
        )
        for r in merges_df.orderBy("step").collect()
    ]
    assert got_merges == want_merges
    got_final = {r["doc_id"]: r["tokens"] for r in merged.collect()}
    want_by_doc = {
        rows[i]["doc_id"]: want_final[i] for i in range(len(rows))
    }
    assert got_final == want_by_doc


def test_wordpiece_train_tiny_tie_break(spark):
    """Exact-tie corpora resolve to the smallest (pa, pb): all pairs
    here score 1/(2*2) -> the winner must be the lexicographic min."""
    df = spark.createDataFrame(
        [(0, [3, 4], 2, "a"), (1, [4, 3], 2, "a"),
         (2, [3, 4], 2, "a"), (3, [4, 3], 2, "a")],
        schema="doc_id long, tokens array<int>, n_tok int, source string",
    )
    want, _ = KT.wordpiece_reference(
        [[3, 4], [4, 3], [3, 4], [4, 3]], 1, TK.NEW_ID_START
    )
    merges_df, _ = TK.wordpiece_train(df, n_merges=1)
    got = [
        (r["step"], r["pa"], r["pb"], r["new_id"], r["cnt"], r["ca"], r["cb"])
        for r in merges_df.collect()
    ]
    assert got == want
    assert got[0][1:3] == (3, 4)


def test_wordpiece_train_candidate_window_truncation(spark):
    """candidate_k=1 forces the in-margin re-collect path on tie-heavy
    corpora; the learned table must be unchanged."""
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 25")
    a = TK.wordpiece_train(arrays, n_merges=4)[0].orderBy("step").collect()
    b = (
        TK.wordpiece_train(arrays, n_merges=4, candidate_k=1)[0]
        .orderBy("step")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_wordpiece_train_partitioning_invariance(spark):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 40")
    a = TK.wordpiece_train(arrays, n_merges=5)[0].orderBy("step").collect()
    b = (
        TK.wordpiece_train(arrays.repartition(13), n_merges=5)[0]
        .orderBy("step")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_wordpiece_encode_matches_reference_and_round_trips(spark):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 60")
    merges_df, _ = TK.wordpiece_train(arrays, n_merges=8)
    expand = dict(TK.expand_merges(merges_df))
    vocab = {seq: uid for uid, seq in TK.expand_merges(merges_df)}
    got = {
        r["doc_id"]: (r["pieces"], r["n_tok"], r["n_pieces"])
        for r in TK.wordpiece_encode(arrays, merges_df).collect()
    }
    for r in arrays.select("doc_id", "tokens").collect():
        want = KT.greedy_encode_reference(r["tokens"], vocab)
        pieces, n_tok, n_pieces = got[r["doc_id"]]
        assert pieces == want, r["doc_id"]
        assert n_tok == len(r["tokens"]) and n_pieces == len(want)
        # round trip: expanding every emitted piece reproduces the input
        flat = [
            t
            for p in pieces
            for t in expand.get(p, (p,))
        ]
        assert flat == list(r["tokens"]), r["doc_id"]


def test_wordpiece_encode_munch_differs_from_rank_replay(spark):
    """Pin the semantic difference vs BPE apply_merges: a later-rank
    LONGER unit wins under maximal munch but loses under rank replay."""
    df = spark.createDataFrame(
        [(0, [1, 2, 3], 3, "a")],
        schema="doc_id long, tokens array<int>, n_tok int, source string",
    )
    # rank 0: (2,3)->100 ; rank 1: (1,2)->101 ; rank 2: (101,3)->102
    triples = [(2, 3, 100), (1, 2, 101), (101, 3, 102)]
    replay = TK.apply_merges(df, triples).collect()[0]["tokens"]
    assert replay == [1, 100]  # rank replay: (2,3) fires first
    munch = TK.wordpiece_encode(df, triples).collect()[0]["pieces"]
    assert munch == [102]  # munch: longest unit (1,2,3) wins outright


# ------------------------------------------- trainer checkpoint/resume
def test_bpe_train_resumes_from_merge_log(spark, tmp_path, monkeypatch):
    """Kill-after-3 then rerun: the resumed trainer must (a) produce
    the identical merge table and merged corpus, (b) recount pairs ONLY
    for the unlogged rounds."""
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 40")
    want_merges, want_corpus = TK.bpe_train(arrays, n_merges=6)
    want = [tuple(r) for r in want_merges.orderBy("step").collect()]
    ck = str(tmp_path / "bpe_ck")
    partial, _ = TK.bpe_train(arrays, n_merges=3, checkpoint_dir=ck)
    assert partial.count() == 3

    calls = {"n": 0}
    real = TK.pair_counts

    def counted(corpus):
        calls["n"] += 1
        return real(corpus)

    monkeypatch.setattr(TK, "pair_counts", counted)
    resumed_merges, resumed_corpus = TK.bpe_train(
        arrays, n_merges=6, checkpoint_dir=ck
    )
    assert calls["n"] == 3  # rounds 3..5 only — committed rounds skipped
    assert [tuple(r) for r in resumed_merges.orderBy("step").collect()] == want
    a = {r["doc_id"]: r["tokens"] for r in want_corpus.collect()}
    b = {r["doc_id"]: r["tokens"] for r in resumed_corpus.collect()}
    assert a == b


def test_wordpiece_train_resumes_from_merge_log(spark, tmp_path, monkeypatch):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 40")
    want = [
        tuple(r)
        for r in TK.wordpiece_train(arrays, n_merges=5)[0]
        .orderBy("step")
        .collect()
    ]
    ck = str(tmp_path / "wp_ck")
    TK.wordpiece_train(arrays, n_merges=2, checkpoint_dir=ck)
    calls = {"n": 0}
    real = TK.wordpiece_counts

    def counted(corpus):
        calls["n"] += 1
        return real(corpus)

    monkeypatch.setattr(TK, "wordpiece_counts", counted)
    resumed, _ = TK.wordpiece_train(arrays, n_merges=5, checkpoint_dir=ck)
    assert calls["n"] == 3
    assert [tuple(r) for r in resumed.orderBy("step").collect()] == want


def test_merge_log_refuses_cross_trainer_resume(spark, tmp_path):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 10")
    ck = str(tmp_path / "ck")
    TK.bpe_train(arrays, n_merges=1, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="refusing to resume"):
        TK.wordpiece_train(arrays, n_merges=1, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="refusing to resume"):
        TK.bpe_train(arrays, n_merges=1, min_count=5, checkpoint_dir=ck)


def test_merge_log_exhausted_marker_skips_recount(spark, monkeypatch, tmp_path):
    """A corpus that converges early writes the exhausted record; the
    rerun must do ZERO counting work."""
    df = spark.createDataFrame(
        [(0, [1, 2], 2, "a"), (1, [3, 4], 2, "a")],
        schema="doc_id long, tokens array<int>, n_tok int, source string",
    )
    ck = str(tmp_path / "ck")
    merges, _ = TK.bpe_train(df, n_merges=4, checkpoint_dir=ck)
    assert merges.count() == 0  # every pair is unique -> below min_count
    calls = {"n": 0}
    real = TK.pair_counts

    def counted(c):
        calls["n"] += 1
        return real(c)

    monkeypatch.setattr(TK, "pair_counts", counted)
    again, _ = TK.bpe_train(df, n_merges=4, checkpoint_dir=ck)
    assert again.count() == 0
    assert calls["n"] == 0


# ------------------------------------------------ corpus diagnostics
def test_vocab_growth_matches_brute_force(spark):
    arrays = C.token_arrays(spark, SF_DIR)
    got = [
        (r["n_docs"], r["vocab_size"], r["token_mass"])
        for r in TK.vocab_growth(arrays, ladder=(1, 2, 4, 8)).collect()
    ]
    rows = arrays.orderBy("doc_id").collect()
    n = len(rows)
    want = []
    for t in (1, 2, 4, 8):
        k = n * t // 8
        pre = [r for r in rows if r["doc_id"] < k]
        vocab = set(x for r in pre for x in r["tokens"])
        want.append((k, len(vocab), sum(len(r["tokens"]) for r in pre)))
    assert got == want
    # monotone: vocabulary and mass never shrink as the prefix grows
    assert all(a[1] <= b[1] and a[2] <= b[2] for a, b in zip(want, want[1:]))


def test_vocab_growth_rejects_bad_ladder(spark):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 5")
    with pytest.raises(ValueError, match="ladder"):
        TK.vocab_growth(arrays, ladder=(4, 2))
    with pytest.raises(ValueError, match="ladder"):
        TK.vocab_growth(arrays, ladder=())


def test_zipf_fit_matches_brute_force(spark):
    import math

    arrays = C.token_arrays(spark, SF_DIR)
    got = TK.zipf_fit(arrays, top_k=64).collect()[0]
    counts: dict = {}
    for r in arrays.collect():
        for x in r["tokens"]:
            counts[int(x)] = counts.get(int(x), 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = len(top)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    assert got["n_tokens_ranked"] == n
    assert got["slope"] == sxy / sxx
    assert got["intercept"] == my - (sxy / sxx) * mx
    assert got["r2"] == (sxy * sxy) / (sxx * syy)
    assert got["slope"] <= 0.0  # frequencies are non-increasing in rank


def test_zipf_fit_exact_on_known_distribution(spark):
    # freq(token t) proportional to 2^-t -> ln f = c - t ln 2; with
    # rank = t+1 the log-log fit has negative slope and r2 < 1
    docs = [
        (i, [t for t in range(6) for _ in range(2 ** (6 - t))], 126, "a")
        for i in range(3)
    ]
    df = spark.createDataFrame(
        docs, schema="doc_id long, tokens array<int>, n_tok int, source string"
    )
    row = TK.zipf_fit(df, top_k=6).collect()[0]
    assert row["n_tokens_ranked"] == 6
    assert row["slope"] < 0 and 0 < row["r2"] <= 1.0


def test_zipf_fit_rejects_degenerate_vocab(spark):
    df = spark.createDataFrame(
        [(0, [7, 7, 7], 3, "a")],
        schema="doc_id long, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(ValueError, match="distinct tokens"):
        TK.zipf_fit(df, top_k=8)


def test_tokenizer_swap_report_composes_from_encodes(spark):
    arrays = C.token_arrays(spark, SF_DIR).filter("doc_id < 50")
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    bpe_m, _ = TK.bpe_train(arrays, n_merges=4)
    wp_m, _ = TK.wordpiece_train(arrays, n_merges=4)
    uni = TK.unigram_train(arrays, top_ngrams=32, n_iters=1, keep_multi=16)
    got = {
        (r["source"], r["tokenizer"]): (
            r["n_docs"], r["tokens_in"], r["pieces_out"], r["compression"]
        )
        for r in TK.tokenizer_swap_report(
            arrays, src, bpe_m, wp_m, uni
        ).collect()
    }
    src_map = {r["doc_id"]: r["source"] for r in src.collect()}
    base = {r["doc_id"]: r["n_tok"] for r in arrays.collect()}
    legs = {
        "bpe": {
            r["doc_id"]: r["n_tok"]
            for r in TK.apply_merges(arrays, bpe_m).collect()
        },
        "wordpiece": {
            r["doc_id"]: r["n_pieces"]
            for r in TK.wordpiece_encode(arrays, wp_m).collect()
        },
        "unigram": {
            r["doc_id"]: r["n_pieces"]
            for r in TK.unigram_encode(arrays, uni).collect()
        },
    }
    want = {}
    for tok, pieces in legs.items():
        per_src: dict = {}
        for d, p in pieces.items():
            s = src_map[d]
            nd, ti, po = per_src.get(s, (0, 0, 0))
            per_src[s] = (nd + 1, ti + base[d], po + int(p))
        for s, (nd, ti, po) in per_src.items():
            want[(s, tok)] = (nd, ti, po, ti / po)
    assert got == want
    # every tokenizer leg covers every source present in the slice
    assert len({k[0] for k in got}) * 3 == len(got)


def test_merge_log_detects_step_gap(tmp_path):
    import json

    ck = str(tmp_path / "ck")
    log = TK.MergeLog(ck, "bpe", {"new_id_start": 10, "min_count": 2})
    log.commit({"step": 0, "pa": 1, "pb": 2, "new_id": 10, "cnt": 5})
    # corrupt: skip step 1
    log._append({"step": 2, "pa": 3, "pb": 4, "new_id": 12, "cnt": 3})
    with pytest.raises(ValueError, match="gap in its step"):
        log.read()
    # well-formed log round-trips records and order
    ck2 = str(tmp_path / "ck2")
    log2 = TK.MergeLog(ck2, "wordpiece", {"new_id_start": 10, "min_count": 2})
    log2.commit({"step": 0, "pa": 1, "pb": 2, "new_id": 10, "cnt": 5,
                 "ca": 9, "cb": 8})
    log2.commit({"step": 1, "pa": 10, "pb": 2, "new_id": 11, "cnt": 3,
                 "ca": 5, "cb": 4})
    recs, exhausted = log2.read()
    assert [r["step"] for r in recs] == [0, 1] and not exhausted
    log2.mark_exhausted()
    recs, exhausted = log2.read()
    assert len(recs) == 2 and exhausted
    # every record after the header is valid JSON (atomic appends)
    with open(log2.path) as f:
        assert all(json.loads(l) is not None for l in f)


def test_wordpiece_encode_random_property(spark):
    """Adversarial random corpora: Spark maximal munch == the flat-dict
    reference for vocabularies with nested/overlapping units."""
    rng = np.random.default_rng(23)
    docs = [
        (i, rng.integers(0, 5, int(rng.integers(0, 30))).tolist())
        for i in range(60)
    ]
    df = spark.createDataFrame(
        [(i, t, len(t), "a") for i, t in docs],
        schema="doc_id long, tokens array<int>, n_tok int, source string",
    )
    # overlapping / chained units over the tiny alphabet
    triples = [
        (0, 1, 100), (1, 2, 101), (100, 2, 102), (2, 101, 103),
        (102, 103, 104), (3, 3, 105),
    ]
    vocab = {seq: uid for uid, seq in TK.expand_merges(triples)}
    got = {
        r["doc_id"]: r["pieces"]
        for r in TK.wordpiece_encode(df, triples).collect()
    }
    expand = dict(TK.expand_merges(triples))
    for i, toks in docs:
        want = KT.greedy_encode_reference(toks, vocab)
        assert got[i] == want, (i, toks)
        flat = [t for p in got[i] for t in expand.get(p, (p,))]
        assert flat == toks


def test_epoch_order_is_deterministic_permutation(spark):
    import hashlib

    chunks = TK.chunk_tokens(C.token_arrays(spark, SF_DIR).limit(40), 128)
    packed = TK.pack_sequences(chunks, 512, n_groups=4)
    rows = TK.build_packed_rows(chunks, packed, 512)

    e0 = TK.epoch_order(rows, 0)
    got = [(r["grp"], r["bin"]) for r in e0.orderBy("seq").collect()]
    seqs = [r["seq"] for r in e0.orderBy("seq").collect()]
    n = rows.count()
    assert seqs == list(range(n))                 # dense 0-based order
    assert sorted(got) == sorted(
        (r["grp"], r["bin"]) for r in rows.collect()
    )                                              # a permutation

    # plain-Python md5 twin reproduces the exact order
    def key(g, b, epoch, salt="shuffle-v1"):
        return hashlib.md5(f"{g}|{b}|e{epoch}|{salt}".encode()).hexdigest()

    want = sorted(got, key=lambda gb: (key(*gb, 0), gb[0], gb[1]))
    assert got == want

    # partitioning invariance
    again = [
        (r["grp"], r["bin"])
        for r in TK.epoch_order(rows.repartition(16), 0)
        .orderBy("seq").collect()
    ]
    assert again == got

    # different epochs genuinely reshuffle; same epoch is stable
    e1 = [(r["grp"], r["bin"]) for r in TK.epoch_order(rows, 1).orderBy("seq").collect()]
    assert e1 != got and sorted(e1) == sorted(got)

    # growth stability of the KEY: existing bins keep their relative
    # order when new bins appear (the split_assign contract for order)
    sub = rows.filter("bin % 2 = 0")
    sub_order = [
        (r["grp"], r["bin"])
        for r in TK.epoch_order(sub, 0).orderBy("seq").collect()
    ]
    assert sub_order == [gb for gb in got if gb[1] % 2 == 0]

    with pytest.raises(ValueError, match="epoch"):
        TK.epoch_order(rows, -1)


def test_oov_ladder_matches_python_twin(spark):
    from collections import Counter

    arrays = C.token_arrays(spark, SF_DIR)
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    corpus = arrays.join(src, "doc_id")
    sizes = (8, 32, 64)
    got = {
        (r["source"], r["vocab_size"]): (
            r["total_tokens"], r["oov_tokens"], r["oov_rate"]
        )
        for r in TK.oov_ladder(corpus, sizes).collect()
    }

    rows = corpus.select("source", "tokens").collect()
    per_src: dict = {}
    glob: Counter = Counter()
    for r in rows:
        c = per_src.setdefault(r["source"], Counter())
        for t in r["tokens"]:
            c[t] += 1
            glob[t] += 1
    order = sorted(glob, key=lambda t: (-glob[t], t))
    n_pairs = 0
    for v in sizes:
        keep = set(order[:v])
        for s, c in per_src.items():
            n_pairs += 1
            total = sum(c.values())
            oov = sum(n for t, n in c.items() if t not in keep)
            assert got[(s, v)] == (total, oov, float(oov) / float(total))
    assert len(got) == n_pairs
    # monotone: a bigger vocabulary never increases OOV mass
    for s in per_src:
        assert got[(s, 8)][1] >= got[(s, 32)][1] >= got[(s, 64)][1]
    with pytest.raises(ValueError, match="vocab_sizes"):
        TK.oov_ladder(corpus, ())


def test_bpe_decode_inverts_encode(spark):
    arrays = C.token_arrays(spark, SF_DIR).withColumn(
        "orig", F.col("tokens")
    )
    merges, _merged = TK.bpe_train(arrays.drop("orig"), n_merges=4)
    encoded = TK.apply_merges(arrays, merges)
    # encode actually changed something (the invariant isn't vacuous)
    assert encoded.filter("tokens != orig").count() > 0
    decoded = TK.bpe_decode(encoded, merges)
    assert decoded.filter("tokens != orig").count() == 0
    # n_tok tracks the decoded length again
    assert decoded.filter("n_tok != size(orig)").count() == 0
    # empty merge table: decode is the identity
    ident = TK.bpe_decode(arrays, [])
    assert ident.filter("tokens != orig").count() == 0


def test_pack_contamination_constructed_and_conservation(spark):
    # constructed: bin (0,0) holds two docs of one cluster -> leak;
    # bin (0,1) holds two chunks of ONE doc -> clean by definition;
    # bin (1,0) holds two docs of different clusters -> clean
    packed = spark.createDataFrame(
        [(10, 0, 0, 0), (11, 0, 0, 0),
         (12, 0, 0, 1), (12, 1, 0, 1),
         (13, 0, 1, 0), (14, 0, 1, 0)],
        "doc_id long, chunk long, grp long, bin long",
    )
    clusters = spark.createDataFrame(
        [(10, 10), (11, 10), (12, 12), (13, 13), (14, 14)],
        "doc_id long, cluster_id long",
    )
    got = {
        (r["grp"], r["bin"]): (
            r["n_seqs"], r["n_docs"], r["n_clusters"], r["contaminated"]
        )
        for r in TK.pack_contamination(packed, clusters).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1, True),
        (0, 1): (2, 1, 1, False),
        (1, 0): (2, 2, 2, False),
    }

    # real run: every assigned sequence lands in exactly one bin row
    arrays = C.token_arrays(spark, SF_DIR)
    chunks = TK.chunk_tokens(arrays, 512)
    packed = TK.pack_sequences(
        chunks.select("doc_id", "chunk", "n_tok"), 512
    )
    ident = arrays.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    rep = TK.pack_contamination(packed, ident).persist()
    assert rep.agg(F.sum("n_seqs")).collect()[0][0] == packed.count()
    # identity clustering: nothing can be contaminated
    assert rep.filter("contaminated").count() == 0
    rep.unpersist()
