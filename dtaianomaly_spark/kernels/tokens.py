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
