"""Streaming vocabulary growth: the online twin of the Heaps'-law
diagnostic (``pipelines.tokens.vocab_growth``).

A live crawl wants "how many NEVER-seen-before tokens did this batch
bring" without rescanning the corpus. Tokens hash into ``n_buckets``
disjoint state buckets (``pmod(token, n_buckets)``); each bucket keeps
its seen-token set in streaming state and emits, per trigger it
receives data, one row (bucket, new_tokens, bucket_vocab) — newly-seen
count and the bucket's running vocabulary size. Downstream,
``sum(new_tokens)`` per trigger is the Heaps increment and
``sum(max(bucket_vocab))`` the running vocabulary — the batch
prefix-curve reproduced exactly when batches arrive in crawl order
(pinned in pytest via a foreachBatch recorder).

Scale shape: per-bucket state is |vocab| / n_buckets token ids —
raising ``n_buckets`` bounds per-task state at any vocabulary, the
same argument as the packing groups. State never stores positions or
documents, only the id set; no TTL (a vocabulary diagnostic must
remember everything it has seen — that IS the state)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StructField, StructType,
)

VOCAB_OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType(), False),
        StructField("new_tokens", LongType(), False),
        StructField("bucket_vocab", LongType(), False),
    ]
)

VOCAB_STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(LongType()), True)]
)


def _vocab_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    bucket = int(key[0])
    seen = np.asarray(state.get[0], dtype=np.int64) if state.exists else \
        np.empty(0, dtype=np.int64)
    batch_tokens = [
        pdf["token"].to_numpy(dtype=np.int64) for pdf in pdfs
    ]
    if not batch_tokens:
        return
    fresh = np.unique(np.concatenate(batch_tokens))
    if seen.size:
        # seen is kept sorted, fresh is unique-sorted: membership via
        # one searchsorted pass, no hashing
        idx = np.searchsorted(seen, fresh)
        idx[idx >= seen.size] = seen.size - 1
        fresh = fresh[seen[idx] != fresh]
    n_new = int(fresh.size)
    if n_new:
        seen = np.sort(np.concatenate([seen, fresh]))
        state.update(([int(x) for x in seen],))
    yield pd.DataFrame(
        {
            "bucket": [bucket],
            "new_tokens": [n_new],
            "bucket_vocab": [int(seen.size)],
        }
    )


def stateful_vocab_growth(stream_corpus, n_buckets: int = 64):
    """corpus stream (doc_id, tokens array<int>, ...) -> append stream
    of per-trigger (bucket, new_tokens, bucket_vocab) rows (module
    docstring). The explode + pmod bucketing runs in-stream; only
    (bucket, token) pairs shuffle to the stateful stage."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    toks = stream_corpus.select(
        F.explode("tokens").alias("token")
    ).select(
        F.pmod(F.col("token").cast("long"), F.lit(int(n_buckets))).alias(
            "bucket"
        ),
        F.col("token").cast("long").alias("token"),
    )
    return toks.groupBy("bucket").applyInPandasWithState(
        _vocab_update,
        VOCAB_OUTPUT_SCHEMA,
        VOCAB_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
