"""Unigram-LM tokenizer (Kudo 2018) pins: the forward-backward /
Viterbi kernels against a brute-force all-segmentations enumeration,
and the distributed EM trainer against an independent local
orchestration of the same kernels (exact parity — the two-level fold
orders are mirrored)."""

import hashlib
import math
import os
import sys
from collections import Counter

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.kernels import tokens as KT

SF_DIR = "/root/testdata/sf0.001"


def _model_from_logp(units_logp):
    rows = []
    for uid, (u, lpv) in enumerate(sorted(units_logp.items())):
        rows.append((len(u), KT.pack_ngrams(np.asarray(u), len(u))[0], uid, lpv))
    model = {}
    for l, k, uid, lpv in rows:
        model.setdefault(l, []).append((k, uid, lpv))
    return (
        {
            l: tuple(
                np.asarray(col, dtype=(np.int64 if i < 2 else np.float64))
                for i, col in enumerate(zip(*sorted(v)))
            )
            for l, v in model.items()
        },
        [u for u, _ in sorted(units_logp.items())],
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_expected_counts_match_enumeration(seed):
    rng = np.random.default_rng(seed)
    alphabet = [0, 1, 2]
    units = [(a,) for a in alphabet]
    # random multi-units drawn from short grams
    for _ in range(4):
        l = int(rng.integers(2, 4))
        units.append(tuple(int(x) for x in rng.integers(0, 3, l)))
    units = sorted(set(units))
    probs = rng.random(len(units)) + 0.05
    probs /= probs.sum()
    units_logp = {u: math.log(p) for u, p in zip(units, probs)}
    model, _ = _model_from_logp(units_logp)
    toks = [int(x) for x in rng.integers(0, 3, 9)]
    e, z = KT.unigram_expected_counts(
        np.asarray(toks), model, len(units)
    )
    ec, ze, best = KT.unigram_enum_reference(toks, units_logp)
    assert z == pytest.approx(ze, abs=1e-10)
    for uid, u in enumerate(sorted(units_logp)):
        assert e[uid] == pytest.approx(ec.get(u, 0.0), abs=1e-10), u
    ids, lens, score = KT.unigram_viterbi(np.asarray(toks), model)
    got_units = []
    pos = 0
    srt = sorted(units_logp)
    for i, l in zip(ids, lens):
        got_units.append(srt[int(i)])
        assert len(srt[int(i)]) == int(l)
        assert tuple(toks[pos : pos + l]) == srt[int(i)]  # round-trip
        pos += int(l)
    assert pos == len(toks)
    assert got_units == best
    assert score == pytest.approx(
        sum(units_logp[u] for u in best), abs=1e-10
    )


def _md5_60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _local_unigram_train(docs, max_len, top_ngrams, n_iters, keep_multi):
    """Independent local orchestration of the trainer (same kernels,
    mirrored fold orders): docs = list of (doc_id, np tokens)."""
    counts = Counter()
    for _, toks in docs:
        for l in range(1, max_len + 1):
            for k in KT.pack_ngrams(toks, l):
                counts[(l, int(k))] += 1
    base = [(l, k, c) for (l, k), c in counts.items() if l == 1]
    multi = sorted(
        ((l, k, c) for (l, k), c in counts.items() if l > 1),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:top_ngrams]
    rows = sorted([(l, k, c) for l, k, c in base] + list(multi))
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
    from dtaianomaly_spark.pipelines.tokens import N_EM_GROUPS, _np_model

    n_units = len(units)
    for _ in range(n_iters):
        model = _np_model(units)
        # per-doc E-step, then the mirrored two-level fold:
        # (unit, h) partial folds docs sorted by doc_id; final folds
        # partials sorted by h; zero e-contributions are never emitted
        partials = {}
        for doc_id, toks in sorted(docs):
            e, _z = KT.unigram_expected_counts(toks, model, n_units)
            h = _md5_60(str(doc_id)) % N_EM_GROUPS
            for uid in np.flatnonzero(e):
                key = (int(uid), h)
                partials[key] = partials.get(key, 0.0) + float(e[uid])
        totals = {}
        for (uid, h) in sorted(partials):
            totals[uid] = totals.get(uid, 0.0) + partials[(uid, h)]
        s = 0.0
        for u in units:
            u["e_cnt"] = totals.get(u["unit_id"], 0.0)
            s += u["e_cnt"]
        for u in units:
            u["logp"] = (
                math.log(u["e_cnt"]) - math.log(s)
                if u["e_cnt"] > 0.0
                else float("-inf")
            )
    ones = [
        u for u in units if u["length"] == 1 and u["logp"] != float("-inf")
    ]
    longer = sorted(
        (u for u in units if u["length"] > 1 and u["logp"] != float("-inf")),
        key=lambda u: (-u["logp"], u["length"], u["key"]),
    )[:keep_multi]
    kept = sorted(ones + longer, key=lambda u: (u["length"], u["key"]))
    s = 0.0
    for u in kept:
        s += math.exp(u["logp"])
    logs = math.log(s)
    return [
        {**u, "unit_id": i, "logp": u["logp"] - logs}
        for i, u in enumerate(kept)
    ]


def test_distributed_trainer_matches_local_em(spark):
    from dtaianomaly_spark.pipelines import tokens as TK
    from dtaianomaly_spark.sources import corpus as C

    arrays = C.token_arrays(spark, SF_DIR)
    got = TK.unigram_train(
        arrays, max_len=3, top_ngrams=48, n_iters=2, keep_multi=24
    )
    docs = [
        (int(r["doc_id"]), np.asarray(r["tokens"], dtype=np.int64))
        for r in arrays.select("doc_id", "tokens").collect()
    ]
    want = _local_unigram_train(
        docs, max_len=3, top_ngrams=48, n_iters=2, keep_multi=24
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["unit_id"], g["length"], g["key"], g["toks"]) == (
            w["unit_id"], w["length"], w["key"], w["toks"],
        )
        assert g["logp"] == pytest.approx(w["logp"], rel=1e-12, abs=1e-12)
        assert g["e_cnt"] == pytest.approx(w["e_cnt"], rel=1e-12, abs=1e-12)


def test_unigram_encode_roundtrip_and_scores(spark):
    from dtaianomaly_spark.pipelines import tokens as TK
    from dtaianomaly_spark.sources import corpus as C

    arrays = C.token_arrays(spark, SF_DIR)
    units = TK.unigram_train(
        arrays, max_len=3, top_ngrams=48, n_iters=1, keep_multi=24
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["n_pieces"], r["score"])
        for r in TK.unigram_encode(arrays, units).collect()
    }
    from dtaianomaly_spark.pipelines.tokens import _np_model

    model = _np_model(units)
    toks_map = [u["toks"] for u in units]
    rows = arrays.select("doc_id", "tokens").collect()
    assert set(got) == {int(r["doc_id"]) for r in rows}
    for r in rows:
        toks = np.asarray(r["tokens"], dtype=np.int64)
        ids, lens, score = KT.unigram_viterbi(toks, model)
        n_tok, n_pieces, g_score = got[int(r["doc_id"])]
        assert n_tok == toks.shape[0]
        assert n_pieces == ids.shape[0]
        assert g_score == score  # same kernel, same floats
        # pieces concatenate back to the exact input
        flat = [t for i in ids for t in toks_map[int(i)]]
        assert flat == [int(t) for t in toks]


def test_planted_repeated_gram_becomes_unit(spark):
    """A corpus dominated by one repeated 3-gram must keep that gram as
    a high-probability unit, and Viterbi must use it (pieces < tokens)."""
    from dtaianomaly_spark.pipelines import tokens as TK

    gram = [7, 8, 9]
    rows = [
        (i, gram * 10 + [int(i % 3)], 31) for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, n_tok int"
    )
    units = TK.unigram_train(
        docs, max_len=3, top_ngrams=16, n_iters=2, keep_multi=8
    )
    by_toks = {tuple(u["toks"]): u for u in units}
    assert tuple(gram) in by_toks
    enc = TK.unigram_encode(docs, units).collect()
    assert all(r["n_pieces"] < r["n_tok"] for r in enc)
