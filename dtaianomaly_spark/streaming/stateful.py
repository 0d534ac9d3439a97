"""Custom stateful streaming operator: incremental bucket-completion
rollup via ``applyInPandasWithState``.

The batch rollup assumes each series arrives whole; a live ingest feeds
(doc_id, pos, value) points in chunks, possibly out of order across
micro-batches. This operator keeps per-series PARTIAL bucket aggregates
in Spark streaming state and emits a bucket's final stats row exactly
when its last position arrives — the streaming twin of the raw tier
(same integer partials, same derived floats), and the pattern for any
custom stateful window op the reference family needs online
(MedianMethod with ``neighborhood_size_after=0`` is "purely online" —
MedianMethod.py:20-24 — and slots into this same state shape).

State per series: the open buckets' (bucket_id, cnt, sum, sumsq, min,
max) arrays. Completed buckets leave state immediately. A series' FINAL
bucket is usually short (n % 16 ticks) and would otherwise linger in
state forever — so the operator arms a processing-time timeout per key:
if a series receives no data for ``flush_after_ms``, its remaining
partial buckets are flushed as final rows and the state entry is
dropped. State size is therefore bounded by out-of-orderness within the
timeout horizon, not by the total number of series ever seen.

Input contract: exactly-once points. Completion is detected by count
(cnt == BUCKET_TICKS), so a replayed/duplicated point would complete a
bucket early with inflated stats — feed this operator from a source
with exactly-once semantics (file source / Kafka with idempotent
producers), as the batch tier assumes unique (doc_id, pos).

Output contract (the ``final`` column): a bucket completed by count
emits exactly ONE row with ``final=true`` (exactly-once input means a
bucket's 16 positions arrive at most once, so it can complete at most
once). A TTL flush emits the partial buckets with ``final=false`` — and
if the series later REVIVES, the remaining points of an already-flushed
bucket accumulate fresh state and flush again, so one (doc_id, bucket)
may own SEVERAL ``final=false`` rows. Those rows are disjoint partials:
downstream must either filter ``final=true`` (at-most-once complete
buckets) or monoid-combine per (doc_id, bucket) — sum the cnt/sum/sumsq
columns, min/max the min/max columns — which reconstructs the exact
bucket stats regardless of how the flushes split it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, LongType, StringType, StructField,
    StructType,
)

BUCKET_TICKS = 16
FLUSH_AFTER_MS = 30_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("cnt", LongType(), False),
        StructField("sum", LongType(), False),
        StructField("sumsq", LongType(), False),
        StructField("min", LongType(), False),
        StructField("max", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("cnts", ArrayType(LongType()), True),
        StructField("sums", ArrayType(LongType()), True),
        StructField("sumsqs", ArrayType(LongType()), True),
        StructField("mins", ArrayType(LongType()), True),
        StructField("maxs", ArrayType(LongType()), True),
    ]
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
) -> Iterator[pd.DataFrame]:
    doc_id = key[0]
    if state.exists:
        buckets, cnts, sums, sumsqs, mins, maxs = state.get
        open_b = {
            b: [cnts[i], sums[i], sumsqs[i], mins[i], maxs[i]]
            for i, b in enumerate(buckets)
        }
    else:
        open_b = {}

    if state.hasTimedOut:
        # Idle series: flush remaining partial buckets (the short tail
        # bucket, plus any gaps that will never fill) as final rows.
        state.remove()
        if open_b:
            yield pd.DataFrame(
                [
                    (doc_id, b, st[0], st[1], st[2], st[3], st[4], False)
                    for b, st in sorted(open_b.items())
                ],
                columns=OUTPUT_SCHEMA.names,
            )
        return

    for pdf in pdfs:
        for pos, value in zip(pdf["pos"], pdf["value"]):
            b = int(pos) // BUCKET_TICKS
            v = int(value)
            cur = open_b.get(b)
            if cur is None:
                open_b[b] = [1, v, v * v, v, v]
            else:
                cur[0] += 1
                cur[1] += v
                cur[2] += v * v
                cur[3] = min(cur[3], v)
                cur[4] = max(cur[4], v)

    done = {b: st for b, st in open_b.items() if st[0] >= BUCKET_TICKS}
    for b in done:
        del open_b[b]

    if open_b:
        bs = sorted(open_b)
        state.update(
            (
                bs,
                [open_b[b][0] for b in bs],
                [open_b[b][1] for b in bs],
                [open_b[b][2] for b in bs],
                [open_b[b][3] for b in bs],
                [open_b[b][4] for b in bs],
            )
        )
        if flush_after_ms is not None:
            state.setTimeoutDuration(flush_after_ms)
    else:
        state.remove()

    if done:
        yield pd.DataFrame(
            [
                (doc_id, b, st[0], st[1], st[2], st[3], st[4], True)
                for b, st in sorted(done.items())
            ],
            columns=OUTPUT_SCHEMA.names,
        )


def _make_compose_update(
    buckets_per_coarse: int, points_per_coarse: int, flush_after_ms: int | None
):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.exists:
            buckets, cnts, sums, sumsqs, mins, maxs = state.get
            open_b = {
                b: [cnts[i], sums[i], sumsqs[i], mins[i], maxs[i]]
                for i, b in enumerate(buckets)
            }
        else:
            open_b = {}

        if state.hasTimedOut:
            state.remove()
            if open_b:
                yield pd.DataFrame(
                    [
                        (doc_id, b, st[0], st[1], st[2], st[3], st[4], False)
                        for b, st in sorted(open_b.items())
                    ],
                    columns=OUTPUT_SCHEMA.names,
                )
            return

        for pdf in pdfs:
            for bucket, cnt, s, sq, mn, mx in zip(
                pdf["bucket"], pdf["cnt"], pdf["sum"], pdf["sumsq"],
                pdf["min"], pdf["max"],
            ):
                cb = int(bucket) // buckets_per_coarse
                cur = open_b.get(cb)
                if cur is None:
                    open_b[cb] = [int(cnt), int(s), int(sq), int(mn), int(mx)]
                else:
                    cur[0] += int(cnt)
                    cur[1] += int(s)
                    cur[2] += int(sq)
                    cur[3] = min(cur[3], int(mn))
                    cur[4] = max(cur[4], int(mx))

        done = {b: st for b, st in open_b.items() if st[0] >= points_per_coarse}
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update(
                (
                    bs,
                    [open_b[b][0] for b in bs],
                    [open_b[b][1] for b in bs],
                    [open_b[b][2] for b in bs],
                    [open_b[b][3] for b in bs],
                    [open_b[b][4] for b in bs],
                )
            )
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        if done:
            yield pd.DataFrame(
                [
                    (doc_id, b, st[0], st[1], st[2], st[3], st[4], True)
                    for b, st in sorted(done.items())
                ],
                columns=OUTPUT_SCHEMA.names,
            )

    return update


def stateful_tier_compose(
    raw_bucket_stream,
    buckets_per_coarse: int = 60,
    points_per_coarse: int = 60 * BUCKET_TICKS,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """SECOND-LEVEL continuous aggregate: the completed-raw-bucket append
    stream (output of :func:`stateful_bucket_rollup`) composes into the
    1m tier online — coarse bucket = raw bucket div 60, partials merge
    MONOIDALLY (sum/sum/sum/min/max — the same exact-integer partial
    composition the batch tiers use, rollup/tiers.py), and a coarse row
    emits the moment its point count completes. This is the streaming
    twin of raw -> 1m tier composition: chaining both operators gives a
    live rollup pipeline whose completed rows byte-match the batch 1m
    tier (tested). Because the combine is a monoid over DISJOINT
    partials, it is also correct when fed TTL-flushed partial raw rows
    (``final=false``) — completion is by accumulated point count, not
    row count. Same output contract (``final`` flag) and TTL semantics
    as the raw operator."""
    return raw_bucket_stream.groupBy("doc_id").applyInPandasWithState(
        _make_compose_update(buckets_per_coarse, points_per_coarse, flush_after_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


def stateful_bucket_rollup(stream_long_form, flush_after_ms: int | None = FLUSH_AFTER_MS):
    """points stream (doc_id, pos, value) -> append-mode stream of
    COMPLETED raw-tier buckets.

    With ``flush_after_ms`` set (the default — the right mode for a
    long-lived ingest), idle series flush their partial tail buckets
    after that much processing-time silence and leave state, so state
    is bounded by the active-series working set. Note that a
    timeout-enabled stateful operator keeps the micro-batch engine
    scheduling batches to service pending timers, so an
    ``availableNow`` catch-up run won't terminate at end-of-data —
    pass ``flush_after_ms=None`` (NoTimeout) for finite replay jobs,
    accepting that tail partial buckets stay in state (they're
    reconciled by the batch rollup that follows a replay)."""
    def update(key, pdfs, state):
        return _update(key, pdfs, state, flush_after_ms)

    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming heavy hitters: the online twin of rollup/tiers.topk_tokens.
# ------------------------------------------------------------------

TOPK_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("value", LongType(), False),
        StructField("cnt", LongType(), False),
        StructField("rnk", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

# per-series state: open buckets' exact per-value counts. The alphabet
# is bounded (the token vocabulary), so the per-bucket map is a
# fixed-size summary, same argument as the batch tier's exact top-k.
TOPK_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("values", ArrayType(ArrayType(LongType())), True),
        StructField("counts", ArrayType(ArrayType(LongType())), True),
    ]
)


def _topk_rows(doc_id, bucket, vc: dict, k: int | None, final: bool):
    ranked = sorted(vc.items(), key=lambda it: (-it[1], it[0]))
    if k is not None:
        ranked = ranked[:k]
    return [
        (doc_id, bucket, v, c, r + 1, final)
        for r, (v, c) in enumerate(ranked)
    ]


def _make_topk_update(bucket_ticks: int, k: int, flush_after_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict[int, dict[int, int]] = {}
        if state.exists:
            buckets, valss, cntss = state.get
            open_b = {
                b: dict(zip(valss[i], cntss[i]))
                for i, b in enumerate(buckets)
            }

        if state.hasTimedOut:
            # idle series: flush the partial buckets' FULL value-count
            # lists (rnk may exceed k) — unlike a top-k cut, the full
            # list is a monoid (sum cnt per value, re-rank), so a
            # revived series' re-flush stays exactly combinable.
            state.remove()
            rows = []
            for b in sorted(open_b):
                rows.extend(_topk_rows(doc_id, b, open_b[b], None, False))
            if rows:
                yield pd.DataFrame(rows, columns=TOPK_OUTPUT_SCHEMA.names)
            return

        for pdf in pdfs:
            grouped = (
                pdf.assign(bucket=pdf["pos"] // bucket_ticks)
                .groupby(["bucket", "value"])
                .size()
            )
            for (b, v), c in grouped.items():
                vc = open_b.setdefault(int(b), {})
                vc[int(v)] = vc.get(int(v), 0) + int(c)

        done = {
            b: vc for b, vc in open_b.items()
            if sum(vc.values()) >= bucket_ticks
        }
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update(
                (
                    bs,
                    [sorted(open_b[b]) for b in bs],
                    [[open_b[b][v] for v in sorted(open_b[b])] for b in bs],
                )
            )
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        rows = []
        for b in sorted(done):
            rows.extend(_topk_rows(doc_id, b, done[b], k, True))
        if rows:
            yield pd.DataFrame(rows, columns=TOPK_OUTPUT_SCHEMA.names)

    return update


def stateful_topk_tokens(
    stream_long_form,
    bucket_ticks: int = 960,
    k: int = 3,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """points stream (doc_id, pos, value) -> append stream of per-bucket
    top-k token values, the ONLINE twin of ``rollup/tiers.topk_tokens``:
    per-series state holds each open bucket's exact per-value counts
    (bounded by the token alphabet, the same boundedness argument as
    the batch tier), a bucket's top-k rows (cnt DESC, value ASC — the
    batch tie-break) emit exactly once when its ``bucket_ticks``-th
    point arrives, and completed rows byte-match the batch operator on
    the same points (tested). TTL flushes emit the partial buckets'
    FULL value-count lists (``final=false``, rnk may exceed k): a
    top-k cut of a partial is not mergeable, the full list is — sum
    cnt per (doc_id, bucket, value) across flushes, re-rank, and the
    exact batch answer reappears. Same timeout caveats as
    :func:`stateful_bucket_rollup`."""
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_topk_update(bucket_ticks, k, flush_after_ms),
        TOPK_OUTPUT_SCHEMA,
        TOPK_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming histogram: the online twin of rollup/tiers.hist_rollup.
# ------------------------------------------------------------------

HIST_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("bin", LongType(), False),
        StructField("bcnt", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

HIST_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("bins", ArrayType(ArrayType(LongType())), True),
    ]
)


def _make_hist_update(
    bucket_ticks: int, lo: int, hi: int, n_bins: int,
    flush_after_ms: int | None,
):
    width = (hi - lo) // n_bins

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict[int, list[int]] = {}
        if state.exists:
            buckets, binss = state.get
            open_b = {b: list(binss[i]) for i, b in enumerate(buckets)}

        def rows_of(items, final):
            out = []
            for b, bins in items:
                out.extend(
                    (doc_id, b, i, c, final)
                    for i, c in enumerate(bins) if c > 0
                )
            return out

        if state.hasTimedOut:
            # partial histograms are a monoid (bin-wise sum): flushes of
            # a revived series re-combine exactly downstream
            state.remove()
            rows = rows_of(sorted(open_b.items()), False)
            if rows:
                yield pd.DataFrame(rows, columns=HIST_OUTPUT_SCHEMA.names)
            return

        for pdf in pdfs:
            clipped = pdf["value"].clip(lo, hi - 1)
            grouped = (
                pdf.assign(
                    bucket=pdf["pos"] // bucket_ticks,
                    bin=(clipped - lo) // width,
                )
                .groupby(["bucket", "bin"])
                .size()
            )
            for (b, i), c in grouped.items():
                bins = open_b.setdefault(int(b), [0] * n_bins)
                bins[int(i)] += int(c)

        done = {
            b: bins for b, bins in open_b.items()
            if sum(bins) >= bucket_ticks
        }
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update((bs, [open_b[b] for b in bs]))
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        rows = rows_of(sorted(done.items()), True)
        if rows:
            yield pd.DataFrame(rows, columns=HIST_OUTPUT_SCHEMA.names)

    return update


def stateful_hist_rollup(
    stream_long_form,
    bucket_ticks: int = 960,
    lo: int | None = None,
    hi: int | None = None,
    n_bins: int | None = None,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """points stream (doc_id, pos, value) -> append stream of per-bucket
    fixed-bin histograms, the ONLINE twin of ``rollup/tiers.hist_rollup``
    (same clamp-then-integer-divide bin rule): state per open bucket is
    the n_bins counter array (fixed size — the same boundedness that
    makes the batch tier mergeable), a completed bucket's non-empty bins
    emit exactly once when its ``bucket_ticks``-th point arrives, and
    completed rows byte-match the batch histogram on the same points
    (tested). Because bin counts are a plain monoid, TTL flushes of
    partial buckets (``final=false``) re-combine exactly by bin-wise
    sum — revival-safe, unlike a truncated summary. Same timeout
    caveats as :func:`stateful_bucket_rollup`.
    Geometry defaults come from the batch tier's constants
    (rollup/tiers.py HIST_LO/HIST_HI/HIST_BINS) — retuning the tier
    retunes the streaming twin with it."""
    from dtaianomaly_spark.rollup.tiers import HIST_BINS, HIST_HI, HIST_LO

    lo = HIST_LO if lo is None else lo
    hi = HIST_HI if hi is None else hi
    n_bins = HIST_BINS if n_bins is None else n_bins
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_hist_update(bucket_ticks, lo, hi, n_bins, flush_after_ms),
        HIST_OUTPUT_SCHEMA,
        HIST_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming Count-Min: the online twin of rollup/tiers.countmin_rollup.
# ------------------------------------------------------------------

CMS_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("row", LongType(), False),
        StructField("cell", LongType(), False),
        StructField("ccnt", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

CMS_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("grids", ArrayType(ArrayType(LongType())), True),
    ]
)


def _cms_cells_py(value: int, depth: int, width: int) -> list:
    """The batch tier's md5 row-hash family, verbatim in Python
    (rollup/tiers._cms_cell_sql): cell_r = md5(value || '|r' || r)
    first-15-hex-digits mod width."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}|r{r}".encode()).hexdigest()[:15], 16)
        % width
        for r in range(depth)
    ]


def _make_cms_update(
    bucket_ticks: int, depth: int, width: int, flush_after_ms: int | None
):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict[int, list[int]] = {}
        if state.exists:
            buckets, grids = state.get
            open_b = {b: list(grids[i]) for i, b in enumerate(buckets)}

        def rows_of(items, final):
            out = []
            for b, grid in items:
                out.extend(
                    (doc_id, b, i // width, i % width, c, final)
                    for i, c in enumerate(grid) if c > 0
                )
            return out

        if state.hasTimedOut:
            # partial grids are a monoid (cell-wise sum): flushes of a
            # revived series re-combine exactly downstream
            state.remove()
            rows = rows_of(sorted(open_b.items()), False)
            if rows:
                yield pd.DataFrame(rows, columns=CMS_OUTPUT_SCHEMA.names)
            return

        cells: dict[int, list[int]] = {}
        for pdf in pdfs:
            grouped = (
                pdf.assign(bucket=pdf["pos"] // bucket_ticks)
                .groupby(["bucket", "value"])
                .size()
            )
            for (b, v), c in grouped.items():
                grid = open_b.setdefault(int(b), [0] * (depth * width))
                v = int(v)
                if v not in cells:
                    cells[v] = _cms_cells_py(v, depth, width)
                for r, cell in enumerate(cells[v]):
                    grid[r * width + cell] += int(c)

        done = {
            b: grid for b, grid in open_b.items()
            if sum(grid[:width]) >= bucket_ticks  # row 0 sees every point
        }
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update((bs, [open_b[b] for b in bs]))
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        rows = rows_of(sorted(done.items()), True)
        if rows:
            yield pd.DataFrame(rows, columns=CMS_OUTPUT_SCHEMA.names)

    return update


def stateful_countmin(
    stream_long_form,
    bucket_ticks: int = 960,
    depth: int | None = None,
    width: int | None = None,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """points stream (doc_id, pos, value) -> append stream of sparse
    Count-Min cells, the ONLINE twin of ``rollup/tiers.countmin_rollup``
    (same md5 row-hash family, so completed buckets byte-match the
    batch sketch built at the same ``bucket_ticks`` — tested). State
    per open bucket is the depth x width counter grid — FIXED SIZE no
    matter the value domain, which is the whole point of keeping a
    sketch online: heavy-hitter state (stateful_topk_tokens) grows
    with the alphabet, this never does. Completion is detected by row
    0's mass reaching ``bucket_ticks`` (every point increments exactly
    one cell per row). Cell counters are a plain monoid, so TTL
    flushes of partial grids (``final=false``) re-combine exactly by
    cell-wise sum — revival-safe. Same exactly-once input contract and
    timeout caveats as :func:`stateful_bucket_rollup`. Geometry
    defaults come from the batch tier's constants (CMS_DEPTH/CMS_WIDTH)
    — retuning the tier retunes the twin with it."""
    from dtaianomaly_spark.rollup.tiers import CMS_DEPTH, CMS_WIDTH

    depth = CMS_DEPTH if depth is None else depth
    width = CMS_WIDTH if width is None else width
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_cms_update(bucket_ticks, depth, width, flush_after_ms),
        CMS_OUTPUT_SCHEMA,
        CMS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming Bloom: the online twin of rollup/tiers.bloom_rollup.
# ------------------------------------------------------------------

BLOOM_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("bit", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

BLOOM_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("bits", ArrayType(ArrayType(LongType())), True),
    ]
)


def _bloom_bits_py(value: int, k: int, m_bits: int) -> list:
    """The batch tier's md5 bit family, verbatim in Python
    (rollup/tiers._bloom_bit_sql): bit_i = md5(value || '|b' || i)
    first-15-hex-digits mod m_bits (distinct-folded by the caller's
    set semantics)."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}|b{i}".encode()).hexdigest()[:15], 16)
        % m_bits
        for i in range(k)
    ]


def _make_bloom_update(
    bucket_ticks: int, m_bits: int, k: int, flush_after_ms: int | None
):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict[int, tuple[int, set]] = {}
        if state.exists:
            buckets, counts, bits = state.get
            open_b = {
                b: (int(counts[i]), set(bits[i]))
                for i, b in enumerate(buckets)
            }

        def rows_of(items, final):
            return [
                (doc_id, b, bit, final)
                for b, (_, bset) in items
                for bit in sorted(bset)
            ]

        if state.hasTimedOut:
            # bit sets are an idempotent monoid (union): flushes of a
            # revived series re-combine exactly downstream via distinct
            state.remove()
            rows = rows_of(sorted(open_b.items()), False)
            if rows:
                yield pd.DataFrame(rows, columns=BLOOM_OUTPUT_SCHEMA.names)
            return

        vbits: dict[int, list] = {}
        for pdf in pdfs:
            grouped = (
                pdf.assign(bucket=pdf["pos"] // bucket_ticks)
                .groupby(["bucket", "value"])
                .size()
            )
            for (b, v), c in grouped.items():
                cnt, bset = open_b.get(int(b), (0, set()))
                v = int(v)
                if v not in vbits:
                    vbits[v] = _bloom_bits_py(v, k, m_bits)
                bset.update(vbits[v])
                open_b[int(b)] = (cnt + int(c), bset)

        done = {
            b: st for b, st in open_b.items() if st[0] >= bucket_ticks
        }
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update(
                (
                    bs,
                    [open_b[b][0] for b in bs],
                    [sorted(open_b[b][1]) for b in bs],
                )
            )
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        rows = rows_of(sorted(done.items()), True)
        if rows:
            yield pd.DataFrame(rows, columns=BLOOM_OUTPUT_SCHEMA.names)

    return update


def stateful_bloom(
    stream_long_form,
    bucket_ticks: int = 960,
    m_bits: int | None = None,
    k: int | None = None,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """points stream (doc_id, pos, value) -> append stream of sparse
    Bloom set-bit rows, the ONLINE twin of ``rollup/tiers.bloom_rollup``
    (same md5 bit family, so completed buckets byte-match the batch
    filter built at the same ``bucket_ticks`` — tested). State per open
    bucket is the bit SET plus one point counter — bounded by
    ``m_bits`` no matter the value domain, and unlike the Count-Min
    grid it SATURATES (a hot bucket's state stops growing once its
    bits fill in). Completion is detected by the point counter reaching
    ``bucket_ticks``. Bit sets are an idempotent commutative monoid
    (union), so TTL flushes of partial filters (``final=false``)
    re-combine exactly by per-(doc_id, bucket) DISTINCT — revival-safe,
    and even double-delivered flush rows are harmless (idempotence —
    strictly more forgiving than the counter twins). Same exactly-once
    input contract for COMPLETION and timeout caveats as
    :func:`stateful_bucket_rollup`; the bits themselves survive
    duplicated points (set semantics), only the completion trigger
    needs uniqueness. Geometry defaults come from the batch tier's
    constants (BLOOM_BITS/BLOOM_K) — retuning the tier retunes the
    twin with it."""
    from dtaianomaly_spark.rollup.tiers import BLOOM_BITS, BLOOM_K

    m_bits = BLOOM_BITS if m_bits is None else m_bits
    k = BLOOM_K if k is None else k
    if m_bits < 1 or k < 1:
        raise ValueError(f"m_bits/k must be >= 1, got {m_bits}/{k}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_bloom_update(bucket_ticks, m_bits, k, flush_after_ms),
        BLOOM_OUTPUT_SCHEMA,
        BLOOM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming KMV: the online twin of rollup/tiers.kmv_rollup.
# ------------------------------------------------------------------

KMV_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("kmin", ArrayType(LongType()), False),
        StructField("ndv_est", DoubleType(), False),
        StructField("exact", BooleanType(), False),
        StructField("final", BooleanType(), False),
    ]
)

KMV_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("kmins", ArrayType(ArrayType(LongType())), True),
    ]
)


def _kmv_hash_py(value: int) -> int:
    """The batch tier's md5 hash (rollup/tiers.KMV_HASH_SQL), verbatim:
    first 15 hex digits of md5(value) as a 60-bit integer."""
    import hashlib

    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)


def _kmv_est_py(kmin: list, k: int) -> float:
    """rollup/tiers.KMV_EST_SQL verbatim in Python: exact below k, else
    the Beyer et al. basic estimator — same correctly-rounded
    int->double conversion, same IEEE divides."""
    from dtaianomaly_spark.rollup.tiers import KMV_M

    if len(kmin) < k:
        return float(len(kmin))
    return float(k - 1) / (float(kmin[k - 1]) / float(KMV_M))


def _make_kmv_update(
    bucket_ticks: int, k: int, flush_after_ms: int | None
):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict[int, tuple[int, list]] = {}
        if state.exists:
            buckets, counts, kmins = state.get
            open_b = {
                b: (int(counts[i]), list(kmins[i]))
                for i, b in enumerate(buckets)
            }

        def rows_of(items, final):
            return [
                (
                    doc_id, b, kmin, _kmv_est_py(kmin, k),
                    len(kmin) < k, final,
                )
                for b, (_, kmin) in items
            ]

        if state.hasTimedOut:
            # k-min lists are an idempotent monoid (union-take-k):
            # flushes of a revived series re-combine exactly downstream
            state.remove()
            rows = rows_of(sorted(open_b.items()), False)
            if rows:
                yield pd.DataFrame(rows, columns=KMV_OUTPUT_SCHEMA.names)
            return

        hcache: dict[int, int] = {}
        for pdf in pdfs:
            grouped = (
                pdf.assign(bucket=pdf["pos"] // bucket_ticks)
                .groupby(["bucket", "value"])
                .size()
            )
            for (b, v), c in grouped.items():
                cnt, kmin = open_b.get(int(b), (0, []))
                v = int(v)
                if v not in hcache:
                    hcache[v] = _kmv_hash_py(v)
                h = hcache[v]
                if h not in kmin and (len(kmin) < k or h < kmin[-1]):
                    kmin = sorted(kmin + [h])[:k]
                open_b[int(b)] = (cnt + int(c), kmin)

        done = {
            b: st for b, st in open_b.items() if st[0] >= bucket_ticks
        }
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update(
                (
                    bs,
                    [open_b[b][0] for b in bs],
                    [open_b[b][1] for b in bs],
                )
            )
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        rows = rows_of(sorted(done.items()), True)
        if rows:
            yield pd.DataFrame(rows, columns=KMV_OUTPUT_SCHEMA.names)

    return update


def stateful_kmv(
    stream_long_form,
    bucket_ticks: int = 960,
    k: int | None = None,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """points stream (doc_id, pos, value) -> append stream of KMV
    k-minimum-hash sketches, the ONLINE twin of
    ``rollup/tiers.kmv_rollup`` (same md5 hash family and estimator
    formula, so completed buckets byte-match the batch sketch built at
    the same ``bucket_ticks`` — tested). State per open bucket is the
    sorted k-min list plus one point counter — bounded by ``k`` longs
    no matter the value domain, and like the Bloom twin it SATURATES
    (once k hashes are held, only smaller ones displace). Completion is
    detected by the point counter reaching ``bucket_ticks``. K-min
    lists are an idempotent commutative monoid (union-take-k), so TTL
    flushes of partial sketches (``final=false``) re-combine exactly —
    revival-safe, re-delivery harmless. Same exactly-once input
    contract for COMPLETION as :func:`stateful_bucket_rollup`; the
    sketch itself survives duplicated points (set semantics). ``k``
    defaults to the batch tier's KMV_K."""
    from dtaianomaly_spark.rollup.tiers import KMV_K

    k = KMV_K if k is None else k
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_kmv_update(bucket_ticks, k, flush_after_ms),
        KMV_OUTPUT_SCHEMA,
        KMV_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming DDSketch: the online twin of rollup/tiers.ddsketch_rollup.
# ------------------------------------------------------------------

DD_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("sidx", LongType(), False),
        StructField("dcnt", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

DD_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType()), True),
        StructField("sidxs", ArrayType(ArrayType(LongType())), True),
        StructField("cnts", ArrayType(ArrayType(LongType())), True),
    ]
)


def _make_dd_update(bucket_ticks: int, bounds: list,
                    flush_after_ms: int | None):
    from dtaianomaly_spark.rollup.tiers import dd_index_py

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict[int, dict[int, int]] = {}
        if state.exists:
            buckets, sidxs, cnts = state.get
            open_b = {
                b: dict(zip(sidxs[i], cnts[i]))
                for i, b in enumerate(buckets)
            }

        def rows_of(items, final):
            return [
                (doc_id, b, s, c, final)
                for b, hist in items
                for s, c in sorted(hist.items())
            ]

        if state.hasTimedOut:
            # log-bucket counts are a monoid (index-wise sum): flushes
            # of a revived series re-combine exactly downstream
            state.remove()
            rows = rows_of(sorted(open_b.items()), False)
            if rows:
                yield pd.DataFrame(rows, columns=DD_OUTPUT_SCHEMA.names)
            return

        idx_cache: dict[int, int] = {}
        for pdf in pdfs:
            grouped = (
                pdf.assign(bucket=pdf["pos"] // bucket_ticks)
                .groupby(["bucket", "value"])
                .size()
            )
            for (b, v), c in grouped.items():
                hist = open_b.setdefault(int(b), {})
                v = int(v)
                if v not in idx_cache:
                    idx_cache[v] = dd_index_py(v, bounds)
                s = idx_cache[v]
                hist[s] = hist.get(s, 0) + int(c)

        done = {
            b: hist for b, hist in open_b.items()
            if sum(hist.values()) >= bucket_ticks
        }
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update((
                bs,
                [sorted(open_b[b]) for b in bs],
                [[open_b[b][s] for s in sorted(open_b[b])] for b in bs],
            ))
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        rows = rows_of(sorted(done.items()), True)
        if rows:
            yield pd.DataFrame(rows, columns=DD_OUTPUT_SCHEMA.names)

    return update


def stateful_ddsketch(
    stream_long_form,
    bucket_ticks: int = 960,
    vmax: int | None = None,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """points stream (doc_id, pos, value) -> append stream of sparse
    signed log-gamma bucket counts, the ONLINE twin of
    ``rollup/tiers.ddsketch_rollup`` (same exact-rational gamma = 51/50
    index map via the shared :func:`dd_index_py`, so completed buckets
    byte-match the batch sketch built at the same ``bucket_ticks`` —
    tested). State per open bucket is the nonempty-log-bucket
    histogram — bounded by ``2 * len(bounds) + 1`` entries no matter n
    or NDV (the DDSketch point: quantile state that never grows with
    the data). Completion is detected by the histogram mass reaching
    ``bucket_ticks``. Log-bucket counts are a plain commutative monoid,
    so TTL flushes of partials (``final=false``) re-combine exactly by
    index-wise sum — revival-safe. Same exactly-once input contract
    and timeout caveats as :func:`stateful_bucket_rollup`. ``vmax``
    defaults to the batch tier's DD_VMAX — retuning the tier retunes
    the twin with it."""
    from dtaianomaly_spark.rollup.tiers import DD_VMAX, dd_boundaries

    bounds = dd_boundaries(DD_VMAX if vmax is None else vmax)
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_dd_update(bucket_ticks, bounds, flush_after_ms),
        DD_OUTPUT_SCHEMA,
        DD_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming DGIM: the online twin of operators/windows.eh_sliding_count_map.
# ------------------------------------------------------------------

EH_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pos", LongType(), False),
        StructField("est", DoubleType(), False),
        StructField("n_buckets", LongType(), False),
    ]
)

EH_STATE_SCHEMA = StructType(
    [
        StructField("next_pos", LongType(), True),
        StructField("ts", ArrayType(LongType()), True),
        StructField("sz", ArrayType(LongType()), True),
    ]
)


def _make_eh_update(window: int, r: int, ttl_ms: int | None):
    import numpy as np

    from dtaianomaly_spark.kernels.eh import ExpHistogram

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        eh = ExpHistogram(window, r)
        if state.exists:
            next_pos, ts, sz = state.get
            next_pos = int(next_pos)
            eh.buckets = list(zip(ts, sz))
            cold_start = False
        else:
            next_pos, cold_start = 0, True

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return

        batch = pd.concat(chunks).sort_values("pos")
        poss = batch["pos"].to_numpy(dtype=np.int64)
        flags = batch["flag"].to_numpy(dtype=np.int64)
        if cold_start:
            # TTL-evicted series restart with an empty histogram — the
            # bounded-state trade the whole sketch family makes
            next_pos = int(poss[0])
        expected = next_pos + np.arange(poss.shape[0])
        if not np.array_equal(poss, expected):
            raise ValueError(
                f"streaming DGIM requires in-order contiguous points;"
                f" series {doc_id!r} expected pos {next_pos}, got"
                f" {poss[:5].tolist()}..."
            )
        est = np.empty(poss.shape[0], dtype=np.float64)
        nb = np.empty(poss.shape[0], dtype=np.int64)
        for j in range(poss.shape[0]):
            p = int(poss[j])
            if flags[j]:
                eh.add(p)
            est[j] = eh.estimate(p)
            nb[j] = eh.n_buckets()
        state.update((
            int(poss[-1]) + 1,
            [int(t) for t, _ in eh.buckets],
            [int(s) for _, s in eh.buckets],
        ))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(doc_id, poss.shape[0]),
                "pos": poss,
                "est": est,
                "n_buckets": nb,
            }
        )

    return update


def stateful_eh_sliding(
    stream_long_form, window: int = 256, r: int = 4,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """(doc_id, pos, flag) stream -> append stream of DGIM sliding-
    window count estimates, byte-equal to the batch replay operator
    ``operators/windows.eh_sliding_count_map`` (the SAME ExpHistogram
    class steps in both — the state IS the bucket list, serialized
    verbatim). The first twin in the family whose state answers a
    SLIDING question: O(r log W) buckets per series no matter how long
    the stream or how dense the flags. In-order exactly-once input
    contract (the structure is causal); same TTL caveats as the other
    twins — an evicted series restarts empty."""
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_eh_update(window, r, flush_after_ms),
        EH_OUTPUT_SCHEMA,
        EH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )
