"""Pinned independent-Python oracles for the round-5 selection/scoring
operators (the driver's oracle set sits at the 100-query rotation
ceiling, so these are rows-only driver checks + the bit-exact pins
below): SemDeDup pruning, DSIR importance resampling, and Kneser-Ney
fluency."""

import hashlib
import math
import os
import sys
from collections import Counter, defaultdict

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# SemDeDup


def _semdedup_oracle(vec_ids, embs, centers, eps):
    """Brute-force SemDeDup: assign to nearest centroid on the sphere,
    then per cluster drop i iff any j earlier in (csim DESC, vec_id)
    order has cos(i, j) > 1 - eps."""
    X = np.asarray(embs, dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sims = X @ centers.T
    cells = np.argmax(sims, axis=1)
    csim = sims[np.arange(len(cells)), cells]
    out = {}
    for c in np.unique(cells):
        idx = np.where(cells == c)[0]
        order = sorted(idx, key=lambda i: (-csim[i], vec_ids[i]))
        for pos, i in enumerate(order):
            dup = any(
                float(X[i] @ X[j]) > 1.0 - eps for j in order[:pos]
            )
            out[vec_ids[i]] = (int(c), float(csim[i]), not dup)
    return out


def test_semdedup_matches_bruteforce_oracle(spark):
    from dtaianomaly_spark.kernels.detectors import kmeans_fit
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, SF_DIR)
    got = {
        r["vec_id"]: (r["cell"], r["csim"], r["keep"])
        for r in SIM.semdedup(emb, n_cells=8, eps=0.75, seed=42).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    # reproduce the operator's own centroid fit (limit(4096) covers the
    # whole sf0.001 table, so the sample is the full input)
    sample = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    centers = kmeans_fit(sample, 8, seed=42)
    want = _semdedup_oracle(
        [r["vec_id"] for r in rows], [r["embedding"] for r in rows],
        centers, 0.75,
    )
    assert set(got) == set(want)
    for vid, (cell, csim, keep) in want.items():
        gc, gs, gk = got[vid]
        assert gc == cell and gk == keep, (vid, got[vid], want[vid])
        assert gs == pytest.approx(csim, abs=1e-12)
    # the pruning must actually fire at this eps, else the test is vacuous
    assert any(not k for _, _, k in want.values())
    assert any(k for _, _, k in want.values())


def test_semdedup_keeps_farthest_from_centroid(spark):
    """Within any cluster containing drops, every dropped example has a
    semantic duplicate ranked earlier (higher csim) — so the survivor
    of a duplicate group is the lowest-csim member (the keep-hard rule)."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, SF_DIR)
    rows = SIM.semdedup(emb, n_cells=8, eps=0.75, seed=42).collect()
    by_cell = defaultdict(list)
    for r in rows:
        by_cell[r["cell"]].append(r)
    for cell_rows in by_cell.values():
        cell_rows.sort(key=lambda r: (-r["csim"], r["vec_id"]))
        # the top-ranked example of every cluster is never dropped
        assert cell_rows[0]["keep"]


# --------------------------------------------------------------------------
# DSIR


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dsir_oracle(docs, target_source, n_keep, n_buckets):
    """Independent DSIR: hashed unigram+bigram bucket counts, add-one
    smoothed log-ratio model, sorted-bucket fold, md5-seeded Gumbel
    top-k."""
    tc, rc = Counter(), Counter()
    per_doc = {}
    for doc_id, source, text in docs:
        ws = text.split(" ")
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        bc = Counter(_md5_60(g) % n_buckets for g in grams)
        per_doc[doc_id] = (source, bc)
        (tc if source == target_source else rc).update(bc)
    tt, rt = sum(tc.values()), sum(rc.values())
    llr = {
        b: math.log((tc[b] + 1) / (tt + n_buckets))
        - math.log((rc[b] + 1) / (rt + n_buckets))
        for b in set(tc) | set(rc)
    }
    scored = []
    for doc_id, (source, bc) in per_doc.items():
        if source == target_source:
            continue
        logw = 0.0
        for b in sorted(bc):
            logw += bc[b] * llr[b]
        u = (_md5_60(str(doc_id)) + 1) / (2**60 + 1)
        g = -math.log(-math.log(u))
        scored.append((doc_id, source, logw, logw + g))
    scored.sort(key=lambda t: (-t[3], t[0]))
    return scored[:n_keep]


def test_dsir_select_matches_python_oracle(spark):
    from dtaianomaly_spark.pipelines import selection as SEL
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, SF_DIR)
    got = SEL.dsir_select(
        docs, target_source="src0", n_keep=16, n_buckets=64
    ).collect()
    raw = [
        (r["doc_id"], r["source"], r["text"])
        for r in docs.select("doc_id", "source", "text").collect()
    ]
    want = _dsir_oracle(raw, "src0", 16, 64)
    assert [r["doc_id"] for r in got] == [t[0] for t in want]
    assert [r["rk"] for r in got] == list(range(1, len(want) + 1))
    for r, (doc_id, source, logw, score) in zip(got, want):
        assert r["source"] == source
        assert r["logw"] == pytest.approx(logw, rel=1e-12)
        assert r["score"] == pytest.approx(score, rel=1e-12)
    # no target docs may leak into the selected pool
    assert all(r["source"] != "src0" for r in got)


def test_dsir_prefers_target_like_docs(spark):
    """Sanity: a raw doc that shares the target's gram distribution must
    outrank (by unperturbed logw) one with disjoint vocabulary."""
    from dtaianomaly_spark.pipelines import selection as SEL

    rows = [
        ("t1", "tgt", "alpha beta gamma alpha beta"),
        ("t2", "tgt", "alpha beta gamma delta"),
        ("r_like", "raw", "alpha beta gamma alpha"),
        ("r_far", "raw", "omega psi chi phi omega psi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        r["doc_id"]: r["logw"]
        for r in SEL.dsir_select(
            docs, target_source="tgt", n_keep=4, n_buckets=64
        ).collect()
    }
    assert got["r_like"] > got["r_far"]


# --------------------------------------------------------------------------
# Kneser-Ney fluency


def _kn_oracle(texts):
    """Independent interpolated-KN bigram scorer, D = 3/4."""
    cbg, c1, n1a, n1b = Counter(), Counter(), defaultdict(set), defaultdict(set)
    for _, text in texts:
        ws = text.split(" ")
        for a, b in zip(ws, ws[1:]):
            cbg[(a, b)] += 1
            c1[a] += 1
            n1a[a].add(b)
            n1b[b].add(a)
    n1all = len(cbg)
    out = {}
    for doc_id, text in texts:
        ws = text.split(" ")
        prs = []
        for a, b in zip(ws, ws[1:]):
            pr = (4 * cbg[(a, b)] - 3) / (4.0 * c1[a]) + (
                3.0 * len(n1a[a]) * len(n1b[b])
            ) / (4.0 * c1[a] * n1all)
            prs.append(pr)
        if prs:
            out[doc_id] = (len(prs), math.fsum(prs) / len(prs))
        else:
            out[doc_id] = (0, None)
    return out


def test_kn_fluency_matches_python_oracle(spark):
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, SF_DIR)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_fluency"])
        for r in TX.kn_fluency(docs).collect()
    }
    texts = [
        (r["doc_id"], r["text"])
        for r in docs.select("doc_id", "text").collect()
    ]
    want = _kn_oracle(texts)
    assert set(got) == set(want)
    for doc_id, (n, fl) in want.items():
        gn, gf = got[doc_id]
        assert gn == n
        if fl is None:
            assert gf is None
        else:
            assert gf == pytest.approx(fl, rel=1e-12)


def test_kn_probabilities_form_subdistribution(spark):
    """For every context a, sum_b p_KN(b|a) == 1 exactly (interpolated
    KN is a proper conditional distribution when the clamp is inactive);
    spot-check on a tiny corpus via the same formula."""
    cbg, c1, n1a, n1b = Counter(), Counter(), defaultdict(set), defaultdict(set)
    texts = ["a b a c a b", "b c b a", "c c a b"]
    for text in texts:
        ws = text.split(" ")
        for a, b in zip(ws, ws[1:]):
            cbg[(a, b)] += 1
            c1[a] += 1
            n1a[a].add(b)
            n1b[b].add(a)
    n1all = len(cbg)
    vocab_cont = {b: len(s) for b, s in n1b.items()}
    for a in c1:
        # sum over SEEN continuations + the continuation mass the model
        # reserves for unseen b (sum over full vocab of the backoff term)
        seen = sum(
            (4 * cbg[(a, b)] - 3) / (4.0 * c1[a])
            for b in n1a[a]
        )
        backoff = sum(
            (3.0 * len(n1a[a]) * vocab_cont[b]) / (4.0 * c1[a] * n1all)
            for b in vocab_cont
        )
        assert seen + backoff == pytest.approx(1.0, abs=1e-12)


# --------------------------------------------------------------------------
# Quality classifier


def _clf_oracle(docs, target_source, n_buckets, n_iters, lr):
    """Independent NumPy full-batch-GD logistic regression over the same
    L1-normalized hashed unigram+bigram features."""
    feats = {}
    for doc_id, source, text in docs:
        ws = text.split(" ")
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        bc = Counter(_md5_60(g) % n_buckets for g in grams)
        tot = sum(bc.values())
        feats[doc_id] = (
            1.0 if source == target_source else 0.0,
            {b: n / tot for b, n in bc.items()},
        )
    w = np.zeros(n_buckets)
    n_docs = len(feats)
    for _ in range(n_iters):
        g = np.zeros(n_buckets)
        for y, xs in feats.values():
            m = sum(xs[b] * w[b] for b in sorted(xs))
            r = 1.0 / (1.0 + math.exp(-m)) - y
            for b, x in xs.items():
                g[b] += x * r
        w = w - lr * g / n_docs
    scores = {}
    for doc_id, (y, xs) in feats.items():
        m = sum(xs[b] * w[b] for b in sorted(xs))
        scores[doc_id] = (int(y), 1.0 / (1.0 + math.exp(-m)))
    return w, scores


def test_quality_classifier_matches_numpy_gd(spark):
    from dtaianomaly_spark.pipelines import selection as SEL
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, SF_DIR)
    w = SEL.classifier_train(
        docs, target_source="src0", n_buckets=64, n_iters=4, lr=4.0
    )
    raw = [
        (r["doc_id"], r["source"], r["text"])
        for r in docs.select("doc_id", "source", "text").collect()
    ]
    want_w, want_scores = _clf_oracle(raw, "src0", 64, 4, 4.0)
    assert len(w) == 64
    np.testing.assert_allclose(w, want_w, rtol=1e-9, atol=1e-12)
    got = {
        r["doc_id"]: (r["y"], r["score"])
        for r in SEL.classifier_score(
            docs, w, target_source="src0"
        ).collect()
    }
    assert set(got) == set(want_scores)
    for doc_id, (y, s) in want_scores.items():
        gy, gs = got[doc_id]
        assert gy == y
        assert gs == pytest.approx(s, rel=1e-9)


def test_quality_classifier_separates_disjoint_vocab(spark):
    """On a linearly separable toy corpus the trained classifier must
    score every target doc above every pool doc."""
    from dtaianomaly_spark.pipelines import selection as SEL

    rows = [
        ("t1", "tgt", "alpha beta gamma alpha beta"),
        ("t2", "tgt", "beta gamma alpha gamma"),
        ("t3", "tgt", "gamma alpha beta beta"),
        ("r1", "raw", "omega psi chi phi"),
        ("r2", "raw", "psi chi omega omega phi"),
        ("r3", "raw", "chi phi psi omega"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    scored = SEL.quality_classifier(
        docs, target_source="tgt", n_buckets=64, n_iters=12, lr=16.0
    ).collect()
    tgt = [r["score"] for r in scored if r["y"] == 1]
    raw = [r["score"] for r in scored if r["y"] == 0]
    assert min(tgt) > max(raw)
    assert all(s > 0.5 for s in tgt) and all(s < 0.5 for s in raw)


# --------------------------------------------------------------------------
# k-center coreset


def _quantize(vec):
    return [math.floor(float(np.float64(np.float32(v))) * 10000) for v in vec]


def _kcenter_oracle(rows, k):
    """Independent greedy farthest-point traversal under the engine's
    exact integer-cosine distance (float(na) * float(nb) mirrors the
    CAST-to-double product — na * nb overflows 2^53)."""
    qs = {r["vec_id"]: _quantize(r["embedding"]) for r in rows}
    norms = {v: sum(x * x for x in q) for v, q in qs.items()}

    def dist(a, b):
        dot = sum(x * y for x, y in zip(qs[a], qs[b]))
        return 1.0 - dot / math.sqrt(float(norms[a]) * float(norms[b]))

    first = min(qs)
    centers = [first]
    mindist = {v: min(2.0, dist(v, first)) for v in qs}
    for _ in range(k - 1):
        nxt = max(qs, key=lambda v: (mindist[v], -v))
        centers.append(nxt)
        for v in qs:
            mindist[v] = min(mindist[v], dist(v, nxt))
    assign = {}
    for v in qs:
        best = min(
            ((dist(v, c), rk + 1, c) for rk, c in enumerate(centers)),
        )
        assign[v] = (best[2], best[1], best[0])
    return centers, assign


def test_kcenter_coreset_matches_python_greedy(spark):
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, SF_DIR)
    got = {
        r["vec_id"]: (r["center_id"], r["center_rk"], r["dist"], r["is_center"])
        for r in SIM.kcenter_coreset(emb, k=6).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    centers, assign = _kcenter_oracle(rows, 6)
    assert set(got) == set(assign)
    for v, (cid, crk, d) in assign.items():
        gc, gr, gd, gic = got[v]
        assert (gc, gr) == (cid, crk), (v, got[v], assign[v])
        assert gd == d  # bit-exact: shared integer triple + IEEE formula
        assert gic == (v in centers)
    assert sum(1 for *_, ic in got.values() if ic) == 6


def test_kcenter_radius_decreases_cover(spark):
    """Farther-point greedy: the max assignment distance (cover radius)
    must be non-increasing in k."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, SF_DIR)
    r3 = max(r["dist"] for r in SIM.kcenter_coreset(emb, k=3).collect())
    r6 = max(r["dist"] for r in SIM.kcenter_coreset(emb, k=6).collect())
    assert r6 <= r3


# --------------------------------------------------------------------------
# Per-source BPE fertility report (driver-query invariants: the encode
# pass itself is bit-pinned in tests/test_tokens_pipeline.py)


def test_tok_fertility_consistent_with_corpus_totals(spark):
    import __spark_entry__ as E

    rows = E.queries()["tok_fertility"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["tokens_after"] <= r["tokens_before"]
        assert r["compression"] >= 1.0
        assert r["n_docs"] > 0
    totals = E.queries()["tok_bpe_encode"](spark, SF_DIR).collect()[0]
    assert sum(r["n_docs"] for r in rows) == totals["n_docs"]
    assert sum(r["tokens_before"] for r in rows) == totals["tokens_before"]
    assert sum(r["tokens_after"] for r in rows) == totals["tokens_after"]


# --------------------------------------------------------------------------
# Hard-negative mining


def test_hard_negatives_exact_cosines_over_bm25_rows(spark):
    """Every non-self BM25 row appears exactly once with the bit-exact
    integer-quantized cosine and the threshold flag."""
    from dtaianomaly_spark.pipelines import retrieval as RET
    from dtaianomaly_spark.pipelines import similarity as SIM
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, SF_DIR)
    emb = SIM.load_embeddings(spark, SF_DIR)
    got = {
        (r["qid"], r["doc_id"]): (r["rnk"], r["score"], r["cos"], r["is_hard"])
        for r in RET.hard_negatives(docs, emb, cos_threshold=0.8).collect()
    }
    bm = {
        (r["qid"], r["doc_id"]): (r["rnk"], r["score"])
        for r in RET.bm25_topk(docs).collect()
    }
    qs = {
        r["vec_id"]: _quantize(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    norms = {v: sum(x * x for x in q) for v, q in qs.items()}
    want_keys = {k for k in bm if k[0] != k[1]}
    assert set(got) == want_keys
    for (qid, did), (rnk, score, cos, hard) in got.items():
        assert (rnk, score) == bm[(qid, did)]
        dot = sum(a * b for a, b in zip(qs[qid], qs[did]))
        want_cos = dot / math.sqrt(float(norms[qid]) * float(norms[did]))
        assert cos == want_cos  # bit-exact
        assert hard == (cos < 0.8)


def test_kcenter_stops_when_all_points_covered(spark):
    """k beyond the number of distinct directions: selection stops when
    the cover radius hits zero instead of re-selecting covered points."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]),          # same direction
        (2, [0.0, 1.0]), (3, [0.0, 2.0]),          # same direction
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SIM.kcenter_coreset(emb, k=4).collect()
    n_centers = sum(1 for r in out if r["is_center"])
    assert n_centers == 2
    assert all(r["dist"] == 0.0 for r in out)
