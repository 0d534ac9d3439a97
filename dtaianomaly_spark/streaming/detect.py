"""Online streaming anomaly detection: the purely-online MedianMethod
(``neighborhood_size_after = 0``, MedianMethod.py:20-24) as a custom
stateful Structured Streaming operator.

Per-series state is just the last ``b`` values (the trailing
neighborhood) — constant per series, independent of stream length. Each
micro-batch scores its new points by running the SAME NumPy kernel the
batch engine uses (``kernels.detectors.median_method_scores``) over
``concat(state_tail, new_points)`` and emitting the new suffix, so the
streamed scores are BIT-EQUAL to a batch run over the whole series
(verified in tests/test_streaming_detect.py). The NaN padding the kernel
applies at the series head reproduces the reference's edge semantics for
the first points automatically.

Input contract: in-order, exactly-once (doc_id, pos, value) points —
the online detector is causal, so out-of-order delivery changes what
"the last b observations" means. Points inside one micro-batch are
sorted by pos before scoring; cross-batch reordering is the source's
responsibility (e.g. a per-key ordered log). Like the stateful rollup,
idle series are dropped from state after a processing-time timeout.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from dtaianomaly_spark.kernels import detectors as KD

STATE_TTL_MS = 60_000

SCORE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pos", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("tail", ArrayType(DoubleType()), True),
        StructField("next_pos", LongType(), True),
    ]
)


def _make_update(b: int, ttl_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            tail_list, next_pos = state.get
            tail = np.asarray(tail_list, dtype=np.float64)
            next_pos = int(next_pos)
            cold_start = False
        else:
            tail = np.empty(0, dtype=np.float64)
            next_pos = 0
            cold_start = True

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values("pos")
            vals = batch["value"].to_numpy(dtype=np.float64)
            poss = batch["pos"].to_numpy(dtype=np.int64)
            if cold_start:
                # no state: either a genuinely new series OR one whose
                # state the TTL evicted while idle. Accept ANY starting
                # position — the evicted neighborhood is gone, so the
                # first points after a resume score against a cold
                # (NaN-padded) window, the standard monitoring trade
                # for bounded state. Raising here would kill the whole
                # streaming query the moment an idle series came back.
                next_pos = int(poss[0])
            # causal contract: positions must continue where state
            # (or the cold start) left off
            expected = next_pos + np.arange(vals.shape[0])
            if not np.array_equal(poss, expected):
                raise ValueError(
                    f"online MedianMethod requires in-order contiguous points;"
                    f" series {doc_id!r} expected pos {next_pos}, got"
                    f" {poss[:5].tolist()}..."
                )
            full = np.concatenate([tail, vals]) if tail.size else vals
            # head NaN-padding only applies at the true series start; for a
            # warm state the kernel sees exactly the trailing b real values
            scores = KD.median_method_scores(full, b, 0)[tail.shape[0]:]
            next_pos += vals.shape[0]
            new_tail = full[-b:] if full.shape[0] > b else full
            state.update((new_tail.tolist(), next_pos))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {"doc_id": np.repeat(doc_id, scores.shape[0]),
                 "pos": poss, "score": scores}
            )
        else:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return update


# both stateful detectors share the (tail values, position cursor) state
MP_STATE_SCHEMA = STATE_SCHEMA

MP_SCORE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("idx", LongType(), False),
        StructField("profile", DoubleType(), False),
    ]
)


def _make_mp_update(w: int, horizon: int, ttl_ms: int | None):
    tail_len = horizon + w - 1  # values needed to rescore the oldest lookback window

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            tail_list, next_pos = state.get
            tail = np.asarray(tail_list, dtype=np.float64)
            next_pos = int(next_pos)
            cold_start = False
        else:
            tail = np.empty(0, dtype=np.float64)
            next_pos = 0
            cold_start = True

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return

        batch = pd.concat(chunks).sort_values("pos")
        vals = batch["value"].to_numpy(dtype=np.float64)
        poss = batch["pos"].to_numpy(dtype=np.int64)
        if cold_start:
            # state evicted while idle: accept any resume position — the
            # lookback before it is gone (bounded-state trade, same as
            # the online MedianMethod)
            next_pos = int(poss[0])
        expected = next_pos + np.arange(vals.shape[0])
        if not np.array_equal(poss, expected):
            raise ValueError(
                f"online left matrix profile requires in-order contiguous"
                f" points; series {doc_id!r} expected pos {next_pos}, got"
                f" {poss[:5].tolist()}..."
            )
        full = np.concatenate([tail, vals]) if tail.size else vals
        base = next_pos - tail.shape[0]  # global position of full[0]
        next_pos += vals.shape[0]
        new_tail = full[-tail_len:] if full.shape[0] > tail_len else full
        state.update((new_tail.tolist(), next_pos))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        if full.shape[0] >= w:
            # windows completed by THIS batch: global idx in
            # [next_pos_before_batch - w + 1, last_value_pos - w + 1];
            # the kernel over the suffix is bit-equal to the full-series
            # kernel because every distance only reads window values
            prof = KD.left_matrix_profile(full, w, horizon)
            first_new_global = max(base, poss[0] - w + 1)
            lo_loc = first_new_global - base
            if lo_loc < prof.shape[0]:
                out_idx = np.arange(lo_loc, prof.shape[0], dtype=np.int64) + base
                yield pd.DataFrame(
                    {
                        "doc_id": np.repeat(doc_id, out_idx.shape[0]),
                        "idx": out_idx,
                        "profile": prof[lo_loc:],
                    }
                )

    return update


def _make_fitted_update(w: int, score_fn, model, ttl_ms: int | None):
    """Stateful scorer for a PRE-FITTED window model: state is the
    trailing ``w - 1`` raw values + a position cursor; every window is
    scored the moment its last point arrives."""
    tail_len = w - 1

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            tail_list, next_pos = state.get
            tail = np.asarray(tail_list, dtype=np.float64)
            next_pos = int(next_pos)
            cold_start = False
        else:
            tail = np.empty(0, dtype=np.float64)
            next_pos = 0
            cold_start = True

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return

        batch = pd.concat(chunks).sort_values("pos")
        vals = batch["value"].to_numpy(dtype=np.float64)
        poss = batch["pos"].to_numpy(dtype=np.int64)
        if cold_start:
            # state evicted while idle: accept any resume position (the
            # bounded-state trade shared by every online detector here)
            next_pos = int(poss[0])
        expected = next_pos + np.arange(vals.shape[0])
        if not np.array_equal(poss, expected):
            raise ValueError(
                f"online window scoring requires in-order contiguous"
                f" points; series {doc_id!r} expected pos {next_pos}, got"
                f" {poss[:5].tolist()}..."
            )
        full = np.concatenate([tail, vals]) if tail.size else vals
        base = next_pos - tail.shape[0]  # global position of full[0]
        next_pos += vals.shape[0]
        new_tail = full[-tail_len:] if full.shape[0] > tail_len else full
        state.update((new_tail.tolist(), next_pos))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        if full.shape[0] >= w:
            # window idx completed by this batch: every start in
            # [0, len(full)-w]; all of them end inside the new points
            # because the retained tail is exactly w-1 values
            from dtaianomaly_spark.kernels import windowing as KW

            wins = KW.sliding_window(full, w, 1)
            scores = score_fn(wins, model)
            out_idx = np.arange(wins.shape[0], dtype=np.int64) + base
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_id, out_idx.shape[0]),
                    "idx": out_idx,
                    "profile": scores.astype(np.float64),
                }
            )

    return update


def stateful_fitted_window_scores(
    stream_long_form,
    window_size: int,
    score_fn,
    model,
    state_ttl_ms: int | None = STATE_TTL_MS,
):
    """(doc_id, pos, value) point stream -> append stream of per-window
    scores (doc_id, idx, profile) from a model FITTED IN BATCH and
    shipped in the task closure — the fit-offline / score-online shape
    every window-model detector (KMeans, IsolationForest, LOF, ...)
    shares in production. ``score_fn(windows_matrix, model)`` is the SAME
    kernel the batch ``operators.detectors.window_model_scores`` path
    uses, applied to stride-1 causal windows, so the streamed per-window
    scores are BIT-EQUAL to a batch ``score_fn(sliding_window(x, w, 1),
    model)`` over the full series (tests/test_streaming_detect.py).

    Per-series state = the trailing ``window_size - 1`` raw values + a
    position cursor — constant, independent of stream length. Model
    state is IMMUTABLE (fitted once, offline), which is what makes every
    window's score independent of arrival batching. Same input contract
    and TTL semantics as ``stateful_median_scores``."""
    if window_size < 2:
        raise ValueError(f"window_size must be >= 2, got {window_size}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_fitted_update(window_size, score_fn, model, state_ttl_ms),
        MP_SCORE_SCHEMA,
        MP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


def stateful_left_matrix_profile(
    stream_long_form,
    window_size: int = 16,
    horizon: int = 64,
    state_ttl_ms: int | None = STATE_TTL_MS,
):
    """(doc_id, pos, value) point stream -> append stream of CAUSAL
    matrix-profile window scores (doc_id, idx, profile): window idx is
    emitted the moment its last point arrives, scored against the last
    ``horizon`` past windows (kernels.detectors.left_matrix_profile).
    Per-series state = the trailing ``horizon + window_size - 1`` raw
    values + a position cursor — constant, independent of stream length.
    Bit-equal to the batch kernel over the full series (the kernel's
    direct window evaluation is suffix-invariant). Same input contract
    and TTL semantics as ``stateful_median_scores``; pass
    ``state_ttl_ms=None`` for finite ``availableNow`` replays.

    CAVEAT vs the batch detector family: this is the LEFT profile (past
    neighbors only) — the streaming-causal semantics — not the symmetric
    self-join the batch MatrixProfileDetector computes; a window whose
    nearest match comes later in the series scores differently."""
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_mp_update(window_size, horizon, state_ttl_ms),
        MP_SCORE_SCHEMA,
        MP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


def stateful_median_scores(
    stream_long_form,
    neighborhood_size_before: int = 16,
    state_ttl_ms: int | None = STATE_TTL_MS,
):
    """(doc_id, pos, value) point stream -> append stream of online
    MedianMethod scores, bit-equal to the batch kernel. Pass
    ``state_ttl_ms=None`` for finite ``availableNow`` replays (see
    stateful.stateful_bucket_rollup on why a pending processing-time
    timer keeps the micro-batch engine polling past end-of-data)."""
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_update(neighborhood_size_before, state_ttl_ms),
        SCORE_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# --------------------------------------------------------------- CUSUM
# The smallest possible stateful detector: per-series state is ONE
# integer (the running CUSUM value) plus the position cursor. The batch
# twin (operators/detectors.py:cusum_scores) computes the same values
# relationally via the prefix-min identity; the streamed values are
# bit-equal because the recurrence carries exactly through the scalar
# state (verified in tests/test_streaming_detect.py).

CUSUM_SCORE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pos", LongType(), False),
        StructField("cusum", LongType(), False),
        # IntegerType to match the batch twin exactly (cusum_scores casts
        # alarm to int) — a lambda-architecture unionByName of both
        # outputs must not hit an int-vs-bigint schema conflict
        StructField("alarm", IntegerType(), False),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s", LongType(), True),
        StructField("next_pos", LongType(), True),
    ]
)


def _make_cusum_update(k: int, h: int, ttl_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            s0, next_pos = (int(v) for v in state.get)
            cold_start = False
        else:
            s0, next_pos = 0, 0
            cold_start = True

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values("pos")
            vals = batch["value"].to_numpy(dtype=np.int64)
            poss = batch["pos"].to_numpy(dtype=np.int64)
            if cold_start:
                # TTL-evicted series resume from s = 0 (the bounded-state
                # trade, same as the online MedianMethod's cold window)
                next_pos = int(poss[0])
            expected = next_pos + np.arange(vals.shape[0])
            if not np.array_equal(poss, expected):
                raise ValueError(
                    f"streaming CUSUM requires in-order contiguous points;"
                    f" series {doc_id!r} expected pos {next_pos}, got"
                    f" {poss[:5].tolist()}..."
                )
            # batch-local prefix-min identity WITH carry-in: seed the
            # prefixes at s0 (>= 0), clamp against min(0, running min)
            pref = s0 + np.cumsum(vals - k)
            run_min = np.minimum.accumulate(np.minimum(pref, 0))
            s = pref - run_min
            state.update((int(s[-1]), int(poss[-1]) + 1))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_id, s.shape[0]),
                    "pos": poss,
                    "cusum": s,
                    "alarm": (s > h).astype(np.int32),
                }
            )
        else:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return update


def stateful_cusum(
    stream_long_form, k: int, h: int, state_ttl_ms: int | None = STATE_TTL_MS
):
    """(doc_id, pos, value) stream -> append stream of Page CUSUM values
    + alarms, bit-equal to the batch cusum_scores over the full series.
    O(1) state per series (one integer + the position cursor)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_cusum_update(k, h, state_ttl_ms),
        CUSUM_SCORE_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        timeout,
    )


# ------------------------------------------------ streaming Holt-Winters

HW_SCORE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pos", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# state: position cursor, warmup buffer (grows to 2m then clears), and
# the O(m) forecaster state (level, trend, seasonals); `warm` marks
# whether (lvl, b, s) is live
HW_STATE_SCHEMA = StructType(
    [
        StructField("next_pos", LongType(), True),
        StructField("buf", ArrayType(DoubleType()), True),
        StructField("warm", IntegerType(), True),
        StructField("lvl", DoubleType(), True),
        StructField("b", DoubleType(), True),
        StructField("s", ArrayType(DoubleType()), True),
    ]
)


def _make_hw_update(m: int, alpha: float, beta: float, gamma: float,
                    ttl_ms: int | None):
    from dtaianomaly_spark.kernels.detectors_ext import hw_init, hw_step

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            next_pos, buf, warm, lvl, b, s = state.get
            next_pos, buf, warm = int(next_pos), list(buf), bool(warm)
            s = list(s)
            cold_start = False
        else:
            next_pos, buf, warm, lvl, b, s = 0, [], False, 0.0, 0.0, []
            cold_start = True

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return

        batch = pd.concat(chunks).sort_values("pos")
        vals = batch["value"].to_numpy(dtype=np.float64)
        poss = batch["pos"].to_numpy(dtype=np.int64)
        if cold_start:
            # TTL-evicted series restart their warmup (the bounded-state
            # trade, same as the streaming CUSUM's s = 0 reset)
            next_pos = int(poss[0])
        expected = next_pos + np.arange(vals.shape[0])
        if not np.array_equal(poss, expected):
            raise ValueError(
                f"streaming Holt-Winters requires in-order contiguous"
                f" points; series {doc_id!r} expected pos {next_pos},"
                f" got {poss[:5].tolist()}..."
            )
        scores = np.zeros(vals.shape[0], dtype=np.float64)
        for j, x_t in enumerate(vals.tolist()):
            t = int(poss[j])
            if not warm:
                buf.append(x_t)
                if len(buf) == 2 * m:
                    lvl, b, s = hw_init(buf, m, alpha, beta, gamma)
                    # hw_init indexes seasonals by BUFFER-LOCAL phase;
                    # post-warmup steps read s[t % m] with the GLOBAL
                    # position. Rotate so slot phi holds the seasonal of
                    # global phase phi — for a stream starting at g = t
                    # - 2m + 1, s_global[phi] = s_local[(phi - g) % m].
                    # (g % m == 0, e.g. a stream from pos 0, is the
                    # identity; this matters after a TTL restart.)
                    g = t - 2 * m + 1
                    if g % m:
                        s = [s[(phi - g) % m] for phi in range(m)]
                    warm, buf = True, []
                continue  # warmup scores stay 0, as in the batch kernel
            scores[j], lvl, b = hw_step(
                lvl, b, s, t, x_t, m, alpha, beta, gamma
            )
        state.update(
            (int(poss[-1]) + 1, buf, int(warm), float(lvl), float(b), s)
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(doc_id, scores.shape[0]),
                "pos": poss,
                "score": scores,
            }
        )

    return update


def stateful_holt_winters(
    stream_long_form, period: int = 64, alpha: float = 0.3,
    beta: float = 0.1, gamma: float = 0.2,
    state_ttl_ms: int | None = STATE_TTL_MS,
):
    """(doc_id, pos, value) stream -> append stream of Holt-Winters
    one-step forecast-error scores, byte-equal to the batch
    ``holt_winters_scores`` over the full series (the SAME ``hw_step``
    code path runs in both — no reimplementation to drift). State per
    series is O(period): the (level, trend, seasonals) triple after
    warmup, the warmup buffer (<= 2 * period values) before. Same
    in-order exactly-once input contract and TTL caveats as
    :func:`stateful_cusum`; a point scored in a different micro-batch
    than its neighbors scores identically because the recursion carries
    the full forecaster state across batches."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_hw_update(period, alpha, beta, gamma, state_ttl_ms),
        HW_SCORE_SCHEMA,
        HW_STATE_SCHEMA,
        "append",
        timeout,
    )


# ----------------------------------------------------------------- ACF
# Streaming twin of operators/windows.py:acf_report — after every
# micro-batch it emits the prefix-series ACF snapshot (lags 1..nlags),
# bit-equal to the batch operator run over the same prefix. Bounded
# state per series: the FIRST nlags values (fixed once seen), the last
# nlags values (ring), and 3 + nlags integer moments — the n²-scaled
# identity needs nothing else, because h_l = S - sum(last l) and
# t_l = S - sum(first l).

ACF_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n", LongType(), False),
        StructField("lag", LongType(), False),
        StructField("acf", DoubleType(), False),
    ]
)

ACF_STATE_SCHEMA = StructType(
    [
        StructField("first", ArrayType(LongType()), True),
        StructField("ring", ArrayType(LongType()), True),
        StructField("cnt", LongType(), True),
        StructField("s", LongType(), True),
        StructField("sxx", LongType(), True),
        StructField("sxy", ArrayType(LongType()), True),
    ]
)


def _make_acf_update(nlags: int, ttl_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            first, ring, cnt, s, sxx, sxy = state.get
            first, ring = list(first), list(ring)
            sxy = np.asarray(sxy, dtype=np.int64)
            cnt, s, sxx = int(cnt), int(s), int(sxx)
        else:
            first, ring, cnt, s, sxx = [], [], 0, 0, 0
            sxy = np.zeros(nlags, dtype=np.int64)

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(chunks).sort_values("pos")
        vals = batch["value"].to_numpy(dtype=np.int64)
        poss = batch["pos"].to_numpy(dtype=np.int64)
        expected = cnt + np.arange(vals.shape[0])
        if not np.array_equal(poss, expected):
            raise ValueError(
                f"streaming ACF requires in-order contiguous points from"
                f" pos 0; series {doc_id!r} expected pos {cnt}, got"
                f" {poss[:5].tolist()}..."
            )
        ext = np.concatenate([np.asarray(ring, dtype=np.int64), vals])
        r = len(ring)
        idx = np.arange(vals.shape[0]) + r
        for l in range(1, nlags + 1):
            ok = idx - l >= 0
            sxy[l - 1] += int((ext[idx[ok]] * ext[idx[ok] - l]).sum())
        s += int(vals.sum())
        sxx += int((vals * vals).sum())
        cnt += int(vals.shape[0])
        if len(first) < nlags:
            first = (first + vals.tolist())[:nlags]
        ring_arr = ext[-nlags:]
        state.update((
            first, ring_arr.tolist(), cnt, s, sxx, sxy.tolist(),
        ))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        den = cnt * cnt * sxx - cnt * s * s
        if den <= 0:
            return
        lags, acfs = [], []
        for l in range(1, min(nlags, cnt - 1) + 1):
            h = s - int(ring_arr[-l:].sum())
            t = s - sum(first[:l])
            num = cnt * cnt * int(sxy[l - 1]) - cnt * s * (h + t) \
                + (cnt - l) * s * s
            lags.append(l)
            acfs.append(float(num) / float(den))
        if lags:
            yield pd.DataFrame({
                "doc_id": np.repeat(doc_id, len(lags)),
                "n": np.full(len(lags), cnt, dtype=np.int64),
                "lag": np.asarray(lags, dtype=np.int64),
                "acf": np.asarray(acfs, dtype=np.float64),
            })

    return update


def stateful_acf(
    stream_long_form, nlags: int = 8, state_ttl_ms: int | None = STATE_TTL_MS
):
    """(doc_id, pos, value) stream -> append stream of prefix-series ACF
    snapshots at lags 1..nlags, each snapshot bit-equal to the batch
    acf_report over the same prefix (same integer moments, same single
    divide). State per series: 2*nlags values + nlags + 3 int64s."""
    if nlags < 1:
        raise ValueError(f"nlags must be >= 1, got {nlags}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_acf_update(nlags, state_ttl_ms),
        ACF_OUT_SCHEMA,
        ACF_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# --------------------------------------------------------------- trend
# Streaming twin of operators/windows.py:trend_report — after every
# micro-batch it emits the prefix-series OLS trend snapshot (slope,
# intercept, R², linear forecast), bit-equal to the batch operator over
# the same prefix. State per series is O(1): the six int64 moments
# (n, St, Stt, Sy, Syy, Sty) — pos is the regressor, so nothing else
# is needed; every float below repeats the batch SQL's exact DOUBLE
# expression shape (cast-from-exact-int64, one op at a time).

TREND_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n", LongType(), False),
        StructField("slope", DoubleType(), False),
        StructField("intercept", DoubleType(), False),
        StructField("r2", DoubleType(), True),
        StructField("forecast", DoubleType(), False),
    ]
)

TREND_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType(), True),
        StructField("st", LongType(), True),
        StructField("stt", LongType(), True),
        StructField("sy", LongType(), True),
        StructField("syy", LongType(), True),
        StructField("sty", LongType(), True),
    ]
)


def _make_trend_update(horizon: int, ttl_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cnt, st, stt, sy, syy, sty = (int(v) for v in state.get)
        else:
            cnt = st = stt = sy = syy = sty = 0

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(chunks).sort_values("pos")
        vals = batch["value"].to_numpy(dtype=np.int64)
        poss = batch["pos"].to_numpy(dtype=np.int64)
        expected = cnt + np.arange(vals.shape[0])
        if not np.array_equal(poss, expected):
            raise ValueError(
                f"streaming trend requires in-order contiguous points"
                f" from pos 0; series {doc_id!r} expected pos {cnt},"
                f" got {poss[:5].tolist()}..."
            )
        cnt += int(vals.shape[0])
        st += int(poss.sum())
        stt += int((poss * poss).sum())
        sy += int(vals.sum())
        syy += int((vals * vals).sum())
        sty += int((poss * vals).sum())
        state.update((cnt, st, stt, sy, syy, sty))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        if cnt < 2:
            return
        # the batch operator's exact float sequence (windows.py
        # trend_report): each CAST is from an exact int64, each op its
        # own IEEE double step
        num = cnt * sty - st * sy
        den = cnt * stt - st * st
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(st)) / float(cnt)
        vy = cnt * syy - sy * sy
        r2 = (float(num) * float(num)) / (float(den) * float(vy)) \
            if vy > 0 else None
        forecast = intercept + slope * float(cnt - 1 + horizon)
        yield pd.DataFrame(
            {
                "doc_id": [doc_id],
                "n": np.asarray([cnt], dtype=np.int64),
                "slope": np.asarray([slope], dtype=np.float64),
                "intercept": np.asarray([intercept], dtype=np.float64),
                # nullable Float64 so a constant series' r2=None lands
                # as a true SQL NULL (np.float64 would coerce to NaN)
                "r2": pd.array([r2], dtype="Float64"),
                "forecast": np.asarray([forecast], dtype=np.float64),
            }
        )

    return update


def stateful_trend(
    stream_long_form, horizon: int = 64,
    state_ttl_ms: int | None = STATE_TTL_MS,
):
    """(doc_id, pos, value) stream -> append stream of prefix-series OLS
    trend snapshots (slope / intercept / R² / linear forecast), each
    bit-equal to the batch ``trend_report`` over the same prefix. State
    per series: SIX int64 moments — the smallest state of any twin in
    this module; the merge is pure addition, so late replays of whole
    chunks are detectable by the contiguity guard and the operator
    scales to any series length without growing state."""
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_trend_update(horizon, state_ttl_ms),
        TREND_OUT_SCHEMA,
        TREND_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ----------------------------------------------------------- hysteresis
# Streaming twin of operators/detectors.py:hysteresis_alarm — the
# Schmitt-trigger alarm as an O(1)-state operator: one alarm bit (plus
# the contiguity cursor) per series. The sequential recurrence IS the
# natural streaming form; the batch operator's last-crossing identity
# and this recurrence are proven equal in
# test_operators_vs_kernels.test_hysteresis_identity_equals_sequential_replay,
# and the twin is byte-matched against the batch operator per prefix.

HYST_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pos", LongType(), False),
        StructField("value", LongType(), False),
        StructField("alarm", LongType(), False),
        StructField("edge", LongType(), False),
    ]
)

HYST_STATE_SCHEMA = StructType(
    [
        StructField("alarm", LongType(), True),
        StructField("nxt", LongType(), True),
    ]
)


def _make_hyst_update(hi: int, lo: int, ttl_ms: int | None):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            alarm, nxt = (int(v) for v in state.get)
        else:
            alarm, nxt = 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(chunks).sort_values("pos")
        vals = batch["value"].to_numpy(dtype=np.int64)
        poss = batch["pos"].to_numpy(dtype=np.int64)
        if not np.array_equal(poss, nxt + np.arange(vals.shape[0])):
            raise ValueError(
                f"streaming hysteresis requires contiguous points from"
                f" pos 0; series {doc_id!r} expected pos {nxt},"
                f" got {poss[:5].tolist()}..."
            )
        alarms = np.empty(vals.shape[0], dtype=np.int64)
        edges = np.empty(vals.shape[0], dtype=np.int64)
        for i, v in enumerate(vals):
            new = (1 if v > hi else 0) if alarm == 0 \
                else (0 if v <= lo else 1)
            edges[i] = 1 if new != alarm else 0
            alarms[i] = new
            alarm = new
        nxt = int(poss[-1]) + 1
        state.update((alarm, nxt))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({
            "doc_id": np.repeat(doc_id, vals.shape[0]),
            "pos": poss, "value": vals,
            "alarm": alarms, "edge": edges,
        })

    return update


def stateful_hysteresis(
    stream_long_form, hi: int, lo: int,
    state_ttl_ms: int | None = STATE_TTL_MS,
):
    """(doc_id, pos, value) stream -> append stream of Schmitt-trigger
    alarm rows, byte-equal to the batch ``hysteresis_alarm`` over any
    prefix. State per series: ONE alarm bit + the contiguity cursor —
    the smallest possible alerting state, which is the point: the
    dual-threshold rule needs no history replay to resume."""
    if lo >= hi:
        raise ValueError(f"need lo < hi, got lo={lo}, hi={hi}")
    return stream_long_form.groupBy("doc_id").applyInPandasWithState(
        _make_hyst_update(int(hi), int(lo), state_ttl_ms),
        HYST_OUT_SCHEMA,
        HYST_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )
