"""Streaming CUSUM drift monitoring — the stateful face of
operators/changepoint.py, built exactly like the geofence/sessionizer
stateful operators (applyInPandasWithState, O(1) state per key).

Batch CUSUM uses the prefix closed form (one window pass); a MONITOR
wants the alarm the moment the micro-batch containing it lands. State
per series is three int64s — the running prefix sum P, the running
prefix minimum min_j P_j, and the last processed event time — so the
stream computes the IDENTICAL s_n = P_n - min(0, min_j P_j) sequence
the batch closed form produces, and emits the rows where s_n >= h.

Contract (the geofence conventions):
- per series, event times are strictly increasing; an event at-or-before
  the last processed time is LATE and dropped;
- integer values/drift/threshold (exact state, no float drift ever);
- stream output == batch `cusum_scores(...).filter(alarm)` under any
  micro-batch slicing (pinned in tests across batch boundaries).

100 TB: state is 3 ints per series; per micro-batch work is one sorted
pass over the key's new rows inside an Arrow batch; the only shuffle is
the groupBy(series) the stateful operator needs anyway."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_ALARM_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("ts_s", StringType()),
        StructField("value", LongType()),
        StructField("cusum", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("p", LongType()),
        StructField("pmin", LongType()),
        StructField("last_ms", LongType()),
    ]
)


def cusum_alarms_stream(
    stream: DataFrame,
    drift: int,
    h: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """Alarm rows (series, ts_s, value, cusum) from a stream of
    (series, ts, value) — value integer, per-series ts strictly
    increasing."""

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # NoTimeout — defensive only
            return
        series = key[0]
        pdf = pd.concat(list(pdfs)).sort_values("ts")
        ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        vals = pdf["value"].to_numpy()
        p, pmin, last_ms = state.get if state.exists else (0, 0, -(2**62))
        out = []
        for t, v in zip(ms.tolist(), vals.tolist()):
            if t <= last_ms:  # late
                continue
            last_ms = t
            p += int(v) - drift
            if p < pmin:
                pmin = p
            s = p - min(0, pmin)
            if s >= h:
                out.append(
                    {
                        "series": series,
                        "ts_s": pd.Timestamp(t, unit="ms").strftime(
                            "%Y-%m-%d %H:%M:%S"
                        ),
                        "value": int(v),
                        "cusum": s,
                    }
                )
        state.update((int(p), int(pmin), int(last_ms)))
        yield pd.DataFrame(out, columns=["series", "ts_s", "value", "cusum"])

    return (
        stream.withWatermark("ts", watermark)
        .select("series", "ts", "value")
        .groupBy("series")
        .applyInPandasWithState(
            fn,
            outputStructType=CUSUM_ALARM_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_alarms_batch(df: DataFrame, drift: int, h: int) -> DataFrame:
    """Batch twin: the closed-form window pass filtered to alarms — the
    oracle the stream must equal under any micro-batch slicing."""
    from pyspark.sql import functions as F

    from erased_cells_spark.operators.changepoint import cusum_scores

    scored = cusum_scores(df, ["series"], ["ts"], "value", drift=drift, h=h)
    return scored.filter(F.col("alarm")).select(
        "series",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
        "cusum",
    )
