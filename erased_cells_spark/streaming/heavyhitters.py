"""Streaming heavy hitters: space-bounded per-window top-token tracking
with the MERGEABLE Misra-Gries summary — the trending-terms shape for an
unbounded token stream where the vocabulary is too large to count
exactly (the 100 TB case: state per window is O(m) COUNTERS, independent
of vocabulary size, vs the windowed-count operator's O(distinct tokens)).

Algorithm (Misra-Gries 1982; mergeable form Agarwal et al., PODS 2012):
keep at most m (token, count) counters per window. Merging a batch's
exact token counts into the summary adds shared counters, inserts new
ones, and — when the counter set exceeds m — subtracts the (m+1)-th
largest count from every counter and drops the non-positive ones,
accumulating the subtraction into a per-window error budget `dec`.

Guarantees (asserted against the exact batch twin in
tests/test_heavy_hitters.py, and they hold under ANY merge order, so
micro-batch arrival order never matters):
  - undercount only:  est <= true
  - bounded error:    true - est <= dec   (and dec <= N/(m+1))
  - no false negatives above the budget: every token with true > dec
    appears in the summary.

Streaming shape: applyInPandasWithState keyed by the event-time window
start; watermark-driven EVENT-time timeouts emit a window's summary
exactly once when the watermark passes its end (replay/backfill safe —
the sessionizer's discipline). Late rows beyond the watermark drop.
Batch-side exact counts come from heavy_hitters_batch (one groupBy) —
the oracle the guarantees are checked against.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_SCHEMA = StructType(
    [
        StructField("window_start_s", StringType()),
        StructField("token", StringType()),
        StructField("est_count", LongType()),
        StructField("err_bound", LongType()),
        StructField("window_total", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("dec", LongType()),
        StructField("total", LongType()),
    ]
)


def mg_merge(counter: dict, add: dict, m: int) -> tuple[dict, int]:
    """Merge exact counts `add` into a Misra-Gries summary bounded to m
    counters. Returns (summary, decrement) where decrement is the amount
    subtracted from every counter this merge (adds to the error budget)."""
    if m < 1:
        raise ValueError("m must be >= 1")
    for t, c in add.items():
        counter[t] = counter.get(t, 0) + int(c)
    if len(counter) <= m:
        return counter, 0
    kth = sorted(counter.values(), reverse=True)[m]  # (m+1)-th largest
    return {t: c - kth for t, c in counter.items() if c > kth}, kth


def _hh_fn(m: int):
    def fn(key, pdfs, state: GroupState):
        wstart = key[0]
        if state.hasTimedOut:
            tokens, counts, dec, total = state.get
            state.remove()
            ws = pd.Timestamp(wstart).strftime("%Y-%m-%d %H:%M:%S")
            yield pd.DataFrame(
                [
                    {
                        "window_start_s": ws,
                        "token": t,
                        "est_count": int(c),
                        "err_bound": int(dec),
                        "window_total": int(total),
                    }
                    for t, c in sorted(zip(tokens, counts))
                ],
                columns=[f.name for f in HH_SCHEMA.fields],
            )
            return
        if state.exists:
            tokens, counts, dec, total = state.get
            counter = dict(zip(tokens, (int(c) for c in counts)))
        else:
            counter, dec, total = {}, 0, 0
        for pdf in pdfs:
            vc = pdf["token"].value_counts()  # vectorized exact batch counts
            total += int(vc.sum())
            counter, d = mg_merge(counter, vc.to_dict(), m)
            dec += d
        state.update(
            (list(counter.keys()), [int(c) for c in counter.values()], int(dec), int(total))
        )
        # window closes when the watermark passes its end; the timeout must
        # sit strictly above the current watermark (Spark rejects it else)
        wm = state.getCurrentWatermarkMs()
        wend_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
        state.setTimeoutTimestamp(max(wend_ms, wm + 1))
        yield pd.DataFrame([], columns=[f.name for f in HH_SCHEMA.fields])

    return fn


def heavy_hitters_stream(
    stream: DataFrame,
    m: int = 16,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    token_col: str = "token",
) -> DataFrame:
    """Per-event-time-window Misra-Gries summaries over a (ts, token)
    stream: at most m counters of state per open window, one summary
    emission per window when the watermark closes it."""
    win = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            win.getField("start").alias("wstart"),
            win.getField("end").alias("wend"),
            F.col(token_col).alias("token"),
            # the watermarked event-time column must survive into the
            # stateful operator's input or Spark rejects EventTimeTimeout
            F.col(ts_col).alias("__ts"),
        )
        .groupBy("wstart", "wend")
        .applyInPandasWithState(
            _hh_fn(m),
            outputStructType=HH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def heavy_hitters_batch(df: DataFrame, window: str = "1 hour",
                        ts_col: str = "ts", token_col: str = "token") -> DataFrame:
    """Exact per-window token counts — the ground truth the stream's
    guarantees are verified against: (window_start_s, token, n, total)."""
    win = F.window(F.col(ts_col), window)
    counts = (
        df.select(win.getField("start").alias("wstart"), F.col(token_col).alias("token"))
        .groupBy("wstart", "token")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy("wstart").agg(F.sum("n").alias("total"))
    return (
        counts.join(totals, "wstart")
        .select(
            F.date_format("wstart", "yyyy-MM-dd HH:mm:ss").alias("window_start_s"),
            "token", "n", "total",
        )
    )
