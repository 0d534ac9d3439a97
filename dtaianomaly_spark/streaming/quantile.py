"""Online quantile tracking with bounded state — the streaming form of
the mergeable quantile summary (rollup/qsummary.py), and the streaming
analog of the ContaminationRate threshold: a monitoring pipeline keeps
a per-series running q-quantile of anomaly scores (the contamination
cutoff) without ever holding the scores themselves.

State per series: one m-entry weighted summary + its accumulated error
bound. Each micro-batch folds in as a fresh fine summary (sorted batch,
balanced runs) and the pair is merged + re-pruned back to m entries —
``np_fine_summary`` / ``np_merge_prune``, the exact construction the
batch tier uses, so the CDF contract carries over with the merge costs
ADDED: after k batches the bound is Σ batch deficits + Σ prune slacks.
That linear growth is honest and documented — repeated pruning pays per
merge (unlike the batch tier's single two-level merge); size ``m``
relative to batch count controls it (tested: the bound holds AND stays
a small fraction of n for the chunk counts a real ingest produces).

Emission (append stream): after every batch, one row per updated series
with the current q-quantile estimate, the error bound, and n_seen —
downstream threshold consumers always see the freshest cutoff. The
estimate's TRUE rank is within ``err`` of ceil(q*n_seen) (tested
against the exact quantile over all points seen).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from dtaianomaly_spark.rollup.qsummary import np_fine_summary, np_merge_prune

QUANTILE_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("q_value", LongType(), False),
        StructField("err", LongType(), False),
        StructField("q", DoubleType(), False),
    ]
)

QUANTILE_STATE_SCHEMA = StructType(
    [
        StructField("values", ArrayType(LongType()), True),
        StructField("weights", ArrayType(LongType()), True),
        StructField("deficit", LongType(), True),
    ]
)


def _make_quantile_update(m: int, q_num: int, q_den: int):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        doc_id = key[0]
        if state.hasTimedOut:  # pragma: no cover - NoTimeout default
            state.remove()
            return
        batch = []
        for pdf in pdfs:
            batch.append(pdf["value"].to_numpy())
        vals = np.concatenate(batch) if batch else np.empty(0, dtype=np.int64)
        if vals.shape[0] == 0:
            return
        reps_b, ws_b, d_b = np_fine_summary(vals, m)
        if state.exists:
            sv, sw, sd = state.get
            reps, ws, slack = np_merge_prune(
                [(np.asarray(sv), np.asarray(sw)), (reps_b, ws_b)], m
            )
            deficit = int(sd) + d_b + slack
        else:
            reps, ws, deficit = reps_b, ws_b, d_b
        state.update((reps.tolist(), ws.tolist(), deficit))

        n_seen = int(ws.sum())
        cum = np.cumsum(ws)
        rank = (n_seen * q_num + q_den - 1) // q_den
        j = int(np.searchsorted(cum, rank, side="left"))
        j = min(j, reps.shape[0] - 1)
        yield pd.DataFrame(
            [(doc_id, n_seen, int(reps[j]), deficit, q_num / q_den)],
            columns=QUANTILE_OUTPUT_SCHEMA.names,
        )

    return update


def stateful_quantile_tracker(
    stream_long_form, m: int = 64, q_num: int = 19, q_den: int = 20
):
    """(doc_id, value) stream -> append stream of running q-quantile
    estimates (default p95, the ContaminationRate-style cutoff) with an
    explicit error bound, from m-entry bounded state per series.

    INTEGER DOMAIN: values must be integral (the token domain the batch
    tier serves — int64 values and int64 ranks keep the read-off
    oracle-exact). Real-valued anomaly scores must be quantized to
    fixed-point by the caller (e.g. ``CAST(score * 10^6 AS BIGINT)``);
    non-integral floats raise in the state update rather than being
    silently truncated."""
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_quantile_update(m, q_num, q_den),
        QUANTILE_OUTPUT_SCHEMA,
        QUANTILE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
