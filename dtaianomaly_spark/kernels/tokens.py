"""Pure NumPy/Python kernels for the token-sequence training-prep ops
(``pipelines/tokens.py``): greedy BPE merge application (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") and deterministic best-fit-decreasing sequence packing (Krell
et al. 2021, "Efficient Sequence Packing without Cross-contamination").

The Spark Arrow stages call these kernels verbatim; the pytest oracles
cross-check them against intentionally DIFFERENT reference
implementations (explicit while-scan / brute-force packing), so a
vectorization bug cannot hide in shared code.
"""

from __future__ import annotations

import bisect
import heapq
from typing import Iterable, List, Sequence, Tuple

import numpy as np


def merge_pair(arr: Sequence[int], a: int, b: int, m: int) -> np.ndarray:
    """Greedy LEFT-TO-RIGHT non-overlapping replacement of adjacent
    ``(a, b)`` token pairs with ``m`` — one BPE merge-apply step over
    one sequence. Single pass over the ORIGINAL array: a freshly
    emitted ``m`` never re-merges within the same step (standard BPE;
    the next training step sees it).

    Fully vectorized. When ``a != b`` two adjacent positions cannot
    both match (position ``i`` needs ``t[i+1] == b``, position ``i+1``
    needs ``t[i+1] == a``), so every match merges. When ``a == b``
    matches come in consecutive runs (token runs of ``a``) and greedy
    scanning keeps the even offsets of each run: ``[a,a,a] -> [m,a]``,
    ``[a,a,a,a] -> [m,m]``.
    """
    t = np.asarray(arr, dtype=np.int32)
    if t.size < 2:
        return t.copy()
    match = np.nonzero((t[:-1] == a) & (t[1:] == b))[0]
    if match.size == 0:
        return t.copy()
    if a == b:
        is_start = np.ones(match.size, dtype=bool)
        is_start[1:] = np.diff(match) != 1
        run_start = match[
            np.maximum.accumulate(
                np.where(is_start, np.arange(match.size), 0)
            )
        ]
        match = match[(match - run_start) % 2 == 0]
    out = t.copy()
    out[match] = np.int32(m)
    keep = np.ones(t.size, dtype=bool)
    keep[match + 1] = False
    return out[keep]


def merge_pair_scan(seq: Sequence[int], a: int, b: int, m: int) -> List[int]:
    """Explicit while-scan reference for :func:`merge_pair` (test
    oracle — deliberately not vectorized, no shared code paths)."""
    s = [int(x) for x in seq]
    out: List[int] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(int(m))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def pair_count_reference(seqs: Iterable[Sequence[int]]) -> dict:
    """Raw adjacent-pair counts (overlaps included, as BPE counts them:
    ``[a,a,a]`` contributes ``(a,a)`` twice) — test oracle for the
    Spark ``pair_counts`` aggregate."""
    counts: dict = {}
    for s in seqs:
        s = [int(x) for x in s]
        for x, y in zip(s, s[1:]):
            counts[(x, y)] = counts.get((x, y), 0) + 1
    return counts


def bpe_reference(
    seqs: Iterable[Sequence[int]],
    n_merges: int,
    new_id_start: int,
    min_count: int = 2,
) -> Tuple[List[Tuple[int, int, int, int, int]], List[List[int]]]:
    """Exact slow BPE-training oracle: recount pairs each step with a
    Python dict and apply the winning merge with the explicit scan.
    Tie-break is pinned to (count DESC, pa ASC, pb ASC) — the same
    total order the Spark trainer uses. Returns
    ``([(step, pa, pb, new_id, cnt), ...], final_sequences)``."""
    cur = [[int(x) for x in s] for s in seqs]
    merges: List[Tuple[int, int, int, int, int]] = []
    for step in range(n_merges):
        counts = pair_count_reference(cur)
        if not counts:
            break
        (pa, pb), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_count:
            break
        m = new_id_start + step
        merges.append((step, pa, pb, m, cnt))
        cur = [merge_pair_scan(s, pa, pb, m) for s in cur]
    return merges, cur


def pack_bfd(lengths: Sequence[int], capacity: int) -> List[int]:
    """Best-fit packing of ``lengths`` (in the GIVEN order — callers
    sort descending for the best-fit-decreasing guarantee) into bins of
    ``capacity``: each item goes to the open bin with the SMALLEST
    remaining space that still fits it (ties -> lowest bin index), else
    opens a new bin. Returns the bin index per item, aligned with the
    input order. Deterministic: output depends only on the input order.

    Bins are bucketed BY REMAINING CAPACITY (a min-heap of bin ids per
    distinct remainder, plus a sorted list of the <= capacity + 1
    distinct remainders), so each item costs O(log capacity) for the
    remainder lookup + O(log bins_in_bucket) for the heap — every
    linear-shift structure is capacity-bounded, never n-sized, which is
    what lets a single hash group hold millions of sequences at the
    100 TB shape (a flat sorted (remaining, bin) list would shift O(n)
    entries per item)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    buckets: dict[int, List[int]] = {}  # remaining -> min-heap of bin ids
    keys: List[int] = []  # sorted distinct remainings with open bins
    n_bins = 0
    out: List[int] = []
    for n in lengths:
        n = int(n)
        if n < 1 or n > capacity:
            raise ValueError(
                f"sequence length {n} outside [1, capacity={capacity}];"
                " chunk long sequences first (chunk_tokens)"
            )
        j = bisect.bisect_left(keys, n)
        if j == len(keys):
            idx = n_bins
            n_bins += 1
            r_new = capacity - n
        else:
            r = keys[j]
            heap = buckets[r]
            idx = heapq.heappop(heap)
            if not heap:
                del buckets[r]
                keys.pop(j)
            r_new = r - n
        out.append(idx)
        heap2 = buckets.get(r_new)
        if heap2 is None:
            buckets[r_new] = [idx]
            bisect.insort(keys, r_new)
        else:
            heapq.heappush(heap2, idx)
    return out


def pack_reference(lengths: Sequence[int], capacity: int) -> List[int]:
    """Brute-force best-fit reference for :func:`pack_bfd` (test
    oracle): linear scan over all open bins per item."""
    bins: List[int] = []  # remaining per bin
    out: List[int] = []
    for n in lengths:
        n = int(n)
        if n < 1 or n > capacity:
            raise ValueError(f"length {n} outside [1, {capacity}]")
        best = -1
        for i, r in enumerate(bins):
            if r >= n and (best < 0 or r < bins[best]):
                best = i
        if best < 0:
            bins.append(capacity - n)
            out.append(len(bins) - 1)
        else:
            bins[best] -= n
            out.append(best)
    return out


# --------------------------------------------------------------------------
# Unigram-LM tokenizer kernels (Kudo 2018, "Subword Regularization" —
# the SentencePiece unigram model), over INT-token sequences: units are
# token n-grams, a sequence's probability marginalizes over all
# segmentations into units, EM fits unit probabilities, Viterbi encodes.
# Shared verbatim by the distributed trainer's Arrow E-step and the
# pytest oracles so per-doc float streams are bit-identical.

UNIT_PACK_OFFSET = 512   # shifts token values (>= -512) non-negative
UNIT_PACK_BASE = 1 << 12  # 4096 > any shifted token value in the corpus


def pack_ngrams(tokens: np.ndarray, length: int) -> np.ndarray:
    """int64 Horner keys of every ``length``-gram of ``tokens`` —
    position i gets key of tokens[i : i + length].  Keys are unique per
    (length, gram) given 0 <= token + OFFSET < BASE (asserted); lengths
    use separate key spaces (the model stores per-length tables)."""
    t = np.asarray(tokens, dtype=np.int64) + UNIT_PACK_OFFSET
    if t.size and (t.min() < 0 or t.max() >= UNIT_PACK_BASE):
        raise ValueError("token value outside the packable range")
    n = t.shape[0]
    if n < length:
        return np.empty(0, dtype=np.int64)
    k = t[: n - length + 1].copy()
    for j in range(1, length):
        k = k * UNIT_PACK_BASE + t[j : n - length + j + 1]
    return k


def unpack_ngram(key: int, length: int) -> List[int]:
    """Inverse of :func:`pack_ngrams` for one key."""
    out = []
    for _ in range(length):
        out.append(int(key % UNIT_PACK_BASE) - UNIT_PACK_OFFSET)
        key //= UNIT_PACK_BASE
    return out[::-1]


def lattice_logp(tokens: np.ndarray, model: dict):
    """Match every (position, length) against the model: ``model`` maps
    length -> (sorted int64 keys, unit_id int64 array, logp float64
    array).  Returns (uid, lp) of shape (n, L): unit row id (-1 = no
    unit) and its log-probability (-inf)."""
    n = int(np.asarray(tokens).shape[0])
    L = max(model) if model else 0
    uid = np.full((n, L), -1, dtype=np.int64)
    lp = np.full((n, L), -np.inf, dtype=np.float64)
    for length, (keys, ids, lps) in model.items():
        kk = pack_ngrams(tokens, length)
        if kk.size == 0 or keys.size == 0:
            continue
        pos = np.searchsorted(keys, kk)
        pos_c = np.minimum(pos, keys.size - 1)
        ok = keys[pos_c] == kk
        col_u = uid[: kk.size, length - 1]
        col_p = lp[: kk.size, length - 1]
        col_u[ok] = ids[pos_c[ok]]
        col_p[ok] = lps[pos_c[ok]]
    return uid, lp


def unigram_expected_counts(tokens: np.ndarray, model: dict, n_units: int):
    """Per-document E-step: forward-backward over the segmentation
    lattice.  Returns (e, loglik): dense expected-count vector over
    unit ids (accumulated in row-major (position, length) scan order —
    deterministic) and the document log-likelihood log Z.  A document
    with no full-coverage path (impossible when every present token is
    a unit) yields zeros and -inf."""
    import math

    uid, lp = lattice_logp(tokens, model)
    n, L = lp.shape
    NEG = float("-inf")

    def lae(a: float, b: float) -> float:
        # scalar logaddexp via math (numpy scalar ufuncs cost ~10x);
        # same max + log1p(exp(-|d|)) formula
        if a == NEG:
            return b
        if b == NEG:
            return a
        if a < b:
            a, b = b, a
        return a + math.log1p(math.exp(b - a))

    lpl = lp.tolist()  # plain floats: the sequential DP is scalar-bound
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(n):
        ai = alpha[i]
        if ai == NEG:
            continue
        row = lpl[i]
        for j in range(L):
            v = row[j]
            if i + j + 1 <= n and v != NEG:
                alpha[i + j + 1] = lae(alpha[i + j + 1], ai + v)
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        row = lpl[i]
        b = NEG
        for j in range(L):
            v = row[j]
            if i + j + 1 <= n and v != NEG:
                b = lae(b, v + beta[i + j + 1])
        beta[i] = b
    alpha = np.asarray(alpha)
    beta = np.asarray(beta)
    z = alpha[n]
    e = np.zeros(n_units, dtype=np.float64)
    if z == -np.inf:
        return e, float("-inf")
    # posterior of match (i, j): exp(alpha[i] + lp + beta[i+j+1] - Z)
    # beta_end[i, j] = beta[i + j + 1] for the valid i <= n - j - 1
    beta_end = np.full((n, L), -np.inf)
    for j in range(L):
        m = n - j
        if m > 0:
            beta_end[:m, j] = beta[j + 1 : j + 1 + m]
    post = np.exp(alpha[:n, None] + lp + beta_end - z)
    flat_u = uid.reshape(-1)
    flat_p = post.reshape(-1)
    okm = flat_u >= 0
    np.add.at(e, flat_u[okm], flat_p[okm])
    return e, float(z)


def unigram_viterbi(tokens: np.ndarray, model: dict):
    """Best segmentation under the model: returns (unit_ids, lengths,
    score).  Ties prefer the LONGER unit (then the recurrence's earlier
    predecessor is impossible — lengths are unique per position), so
    the path is deterministic."""
    uid, lp = lattice_logp(tokens, model)
    n, L = lp.shape
    NEG = float("-inf")
    lpl = lp.tolist()
    best = [NEG] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)  # chosen length ending at i
    for i in range(n):
        bi = best[i]
        if bi == NEG:
            continue
        row = lpl[i]
        for j in range(L):
            e = i + j + 1
            v = row[j]
            if e <= n and v != NEG:
                s = bi + v
                # strictly-greater OR equal-with-longer-length wins
                if s > best[e] or (s == best[e] and j + 1 > back[e]):
                    best[e] = s
                    back[e] = j + 1
    if best[n] == -np.inf:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                float("-inf"))
    lens = []
    ids = []
    i = n
    while i > 0:
        l = int(back[i])
        lens.append(l)
        ids.append(int(uid[i - l, l - 1]))
        i -= l
    return (np.asarray(ids[::-1], dtype=np.int64),
            np.asarray(lens[::-1], dtype=np.int64), float(best[n]))


def unigram_enum_reference(tokens, units_logp: dict):
    """Brute-force oracle for tiny sequences: enumerate EVERY
    segmentation (units_logp maps token-tuples to logp), returning
    (expected counts dict unit-tuple -> float, loglik, best segmentation
    list with the same longer-unit tie rule)."""
    import itertools  # noqa: F401  (documentation of intent)
    import math

    seqs = []

    def rec(i, cur):
        if i == len(tokens):
            seqs.append(list(cur))
            return
        for l in range(1, len(tokens) - i + 1):
            u = tuple(tokens[i : i + l])
            if u in units_logp:
                cur.append(u)
                rec(i + l, cur)
                cur.pop()

    rec(0, [])
    if not seqs:
        return {}, float("-inf"), []
    logps = [sum(units_logp[u] for u in s) for s in seqs]
    m = max(logps)
    z = m + math.log(sum(math.exp(x - m) for x in logps))
    exp_counts: dict = {}
    for s, lpv in zip(seqs, logps):
        w = math.exp(lpv - z)
        for u in s:
            exp_counts[u] = exp_counts.get(u, 0.0) + w
    # Viterbi tie rule: max logp; among ties prefer segmentation whose
    # FIRST unit is longer, recursively (greedy longer-unit backtrace)
    best_lp = max(logps)
    cands = [s for s, lpv in zip(seqs, logps) if lpv == best_lp]
    best = max(cands, key=lambda s: [len(u) for u in s[::-1]])
    return exp_counts, z, best


def unit_count_reference(seqs: Iterable[Sequence[int]]) -> dict:
    """Per-token-id occurrence counts — test oracle for the unit-count
    half of the Spark WordPiece combined aggregate."""
    counts: dict = {}
    for s in seqs:
        for x in s:
            x = int(x)
            counts[x] = counts.get(x, 0) + 1
    return counts


def wordpiece_reference(
    seqs: Iterable[Sequence[int]],
    n_merges: int,
    new_id_start: int,
    min_count: int = 2,
) -> Tuple[List[Tuple[int, int, int, int, int, int, int]], List[List[int]]]:
    """Exact slow WordPiece-training oracle (Schuster & Nakajima 2012;
    the likelihood-ratio trainer in the public HuggingFace `tokenizers`
    WordPiece): each step picks the adjacent pair maximizing
    ``count(ab) / (count(a) * count(b))``, compared EXACTLY via integer
    cross-multiplication (no floats anywhere), tie-break (pa ASC,
    pb ASC); pairs below ``min_count`` are never candidates. Returns
    ``([(step, pa, pb, new_id, cnt, ca, cb), ...], final_sequences)``."""
    cur = [[int(x) for x in s] for s in seqs]
    merges: List[Tuple[int, int, int, int, int, int, int]] = []
    for step in range(n_merges):
        pc = pair_count_reference(cur)
        uc = unit_count_reference(cur)
        cands = sorted(
            (pa, pb, c) for (pa, pb), c in pc.items() if c >= min_count
        )
        if not cands:
            break
        best = None
        for pa, pb, c in cands:
            ca, cb = uc[pa], uc[pb]
            # strict > keeps the smallest (pa, pb) among exact ties
            if best is None or c * best[3] * best[4] > best[2] * ca * cb:
                best = (pa, pb, c, ca, cb)
        pa, pb, c, ca, cb = best
        m = new_id_start + step
        merges.append((step, pa, pb, m, c, ca, cb))
        cur = [merge_pair_scan(s, pa, pb, m) for s in cur]
    return merges, cur


def greedy_encode_reference(seq: Sequence[int], vocab: dict) -> List[int]:
    """Maximal-munch (longest-match-first) reference encoder — the
    WordPiece INFERENCE rule, deliberately a single flat-dict scan with
    none of the engine's per-length table structure. ``vocab`` maps
    ``tuple(base tokens) -> unit_id`` for multi-token units; a raw
    token always matches itself, so there is no UNK."""
    s = [int(x) for x in seq]
    max_len = max((len(k) for k in vocab), default=1)
    out: List[int] = []
    i = 0
    while i < len(s):
        for ln in range(min(max_len, len(s) - i), 1, -1):
            uid = vocab.get(tuple(s[i : i + ln]))
            if uid is not None:
                out.append(int(uid))
                i += ln
                break
        else:
            out.append(s[i])
            i += 1
    return out
