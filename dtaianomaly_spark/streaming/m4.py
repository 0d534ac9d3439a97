"""Streaming M4: the online twin of the batch pixel-downsample tier
(``operators.preprocessing.m4_fixed``).

M4's four per-bucket points (first/last/value-min/value-max, Jugel et
al. VLDB 2014) form a commutative MONOID over (pos, value) pairs —
first/last combine by pos order, vmin/vmax by the same lexicographic
(value, pos) rules the batch aggregate uses — so partials from
out-of-order micro-batches merge exactly and a completed bucket's row
is byte-identical to the batch operator's. Streaming buckets are
FIXED-width (``pos DIV width``): the batch op's per-series equal-width
pixel buckets need the final series length, which a live ingest does
not know.

State/TTL/exactly-once contract is the bucket-rollup one
(streaming/stateful.py module docstring): completion by count
(``cnt == width``), idle series flush partial buckets ``final=false``
after ``flush_after_ms`` and leave state, ``final=false`` partials of
a revived series monoid-combine downstream."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
)

from dtaianomaly_spark.streaming.stateful import FLUSH_AFTER_MS

M4_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("cnt", LongType(), False),
        StructField("pos_first", LongType(), False),
        StructField("v_first", LongType(), False),
        StructField("pos_last", LongType(), False),
        StructField("v_last", LongType(), False),
        StructField("pos_min", LongType(), False),
        StructField("v_min", LongType(), False),
        StructField("pos_max", LongType(), False),
        StructField("v_max", LongType(), False),
        StructField("final", BooleanType(), False),
    ]
)

# open buckets' parallel partial arrays: bucket id, count, then the
# four (pos, value) corner points
M4_STATE_SCHEMA = StructType(
    [StructField("buckets", ArrayType(LongType()), True)]
    + [
        StructField(f, ArrayType(LongType()), True)
        for f in (
            "cnts",
            "pos_firsts", "v_firsts", "pos_lasts", "v_lasts",
            "pos_mins", "v_mins", "pos_maxs", "v_maxs",
        )
    ]
)


def _absorb(cur: list, pos: int, v: int) -> None:
    """Fold one point into a partial [cnt, pf, vf, pl, vl, pmin, vmin,
    pmax, vmax] under the batch aggregate's exact tie rules."""
    cur[0] += 1
    if pos < cur[1]:
        cur[1], cur[2] = pos, v
    if pos > cur[3]:
        cur[3], cur[4] = pos, v
    # vmin: lexicographic min of (value, pos) — ties keep earliest pos
    if (v, pos) < (cur[6], cur[5]):
        cur[5], cur[6] = pos, v
    # vmax: lexicographic max of (value, pos) — ties keep latest pos
    if (v, pos) > (cur[8], cur[7]):
        cur[7], cur[8] = pos, v


def _make_m4_update(width: int, flush_after_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        open_b: dict = {}
        if state.exists:
            cols = state.get
            for i, b in enumerate(cols[0]):
                open_b[b] = [cols[j][i] for j in range(1, 10)]

        if state.hasTimedOut:
            state.remove()
            if open_b:
                yield pd.DataFrame(
                    [
                        (doc_id, b, *st, False)
                        for b, st in sorted(open_b.items())
                    ],
                    columns=M4_OUTPUT_SCHEMA.names,
                )
            return

        for pdf in pdfs:
            for pos, value in zip(pdf["pos"], pdf["value"]):
                pos, v = int(pos), int(value)
                b = pos // width
                cur = open_b.get(b)
                if cur is None:
                    open_b[b] = [1, pos, v, pos, v, pos, v, pos, v]
                else:
                    _absorb(cur, pos, v)

        done = {b: st for b, st in open_b.items() if st[0] >= width}
        for b in done:
            del open_b[b]

        if open_b:
            bs = sorted(open_b)
            state.update(
                tuple(
                    [bs] + [[open_b[b][j] for b in bs] for j in range(9)]
                )
            )
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        else:
            state.remove()

        if done:
            yield pd.DataFrame(
                [(doc_id, b, *st, True) for b, st in sorted(done.items())],
                columns=M4_OUTPUT_SCHEMA.names,
            )

    return update


def stateful_m4(
    stream_long_form,
    width: int = 16,
    flush_after_ms: int | None = FLUSH_AFTER_MS,
):
    """(doc_id, pos, value) point stream -> append stream of completed
    fixed-width M4 buckets (byte-matching ``m4_fixed`` on completed
    buckets; see module docstring for the final=false partial rule)."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_m4_update(width, flush_after_ms),
        M4_OUTPUT_SCHEMA,
        M4_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if flush_after_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )
