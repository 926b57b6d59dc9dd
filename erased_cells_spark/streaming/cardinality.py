"""Streaming windowed distinct counts via the deterministic HLL
(functions/cardinality.py): per event-time window, maintain the 2^p
max-rho registers in O(2^p) state and emit the estimate exactly once
when the watermark closes the window — the dashboard-cardinality shape
("distinct users per hour") with state independent of the actual
distinct count.

The per-row (bucket, rho) pair is computed JVM-SIDE before the stateful
operator (bucket_rho_exprs — the same md5/bin expressions the batch
sketch uses), so the Python side only max-merges small register arrays
per micro-batch (one vectorized pandas groupby.max). Because registers
are DETERMINISTIC and merge by max, the stream's final register table
is bit-identical to the batch sketch over the same rows no matter how
micro-batches slice the input — tests assert register equality AND
estimate equality against hll_registers/hll_estimate, not a tolerance.

Late rows beyond the watermark drop (standard); a window's registers
live until the watermark passes its end."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from erased_cells_spark.functions.cardinality import (
    bucket_rho_exprs,
    estimate_from_registers,
)

HLL_STREAM_SCHEMA = StructType(
    [
        StructField("window_start_s", StringType()),
        StructField("hll_estimate_r", DoubleType()),
        StructField("nonzero_buckets", LongType()),
        StructField("buckets", ArrayType(LongType())),
        StructField("rhos", ArrayType(LongType())),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType())),
        StructField("rhos", ArrayType(LongType())),
    ]
)


def _hll_fn(p: int):
    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            buckets, rhos = state.get
            state.remove()
            regs = dict(zip((int(b) for b in buckets), (int(r) for r in rhos)))
            ws = pd.Timestamp(key[0]).strftime("%Y-%m-%d %H:%M:%S")
            order = sorted(regs)
            yield pd.DataFrame(
                [
                    {
                        "window_start_s": ws,
                        "hll_estimate_r": estimate_from_registers(regs, p),
                        "nonzero_buckets": len(regs),
                        "buckets": order,
                        "rhos": [regs[b] for b in order],
                    }
                ],
                columns=[f.name for f in HLL_STREAM_SCHEMA.fields],
            )
            return
        if state.exists:
            buckets, rhos = state.get
            regs = dict(zip((int(b) for b in buckets), (int(r) for r in rhos)))
        else:
            regs = {}
        for pdf in pdfs:
            merged = pdf.groupby("bucket")["rho"].max()  # vectorized per batch
            for b, r in merged.items():
                b, r = int(b), int(r)
                if r > regs.get(b, 0):
                    regs[b] = r
        state.update((list(regs.keys()), list(regs.values())))
        wm = state.getCurrentWatermarkMs()
        wend_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
        state.setTimeoutTimestamp(max(wend_ms, wm + 1))
        yield pd.DataFrame([], columns=[f.name for f in HLL_STREAM_SCHEMA.fields])

    return fn


def hll_distinct_stream(
    stream: DataFrame,
    p: int = 6,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "k",
) -> DataFrame:
    """Per-window deterministic-HLL distinct estimates over a (ts, key)
    stream: one emission per window at watermark close, carrying the
    estimate AND the registers (so downstream can keep merging)."""
    bucket, rho = bucket_rho_exprs(key_col, p)
    win = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            win.getField("start").alias("wstart"),
            win.getField("end").alias("wend"),
            bucket.alias("bucket"),
            rho.alias("rho"),
            F.col(ts_col).alias("__ts"),  # watermarked col must survive
        )
        .groupBy("wstart", "wend")
        .applyInPandasWithState(
            _hll_fn(p),
            outputStructType=HLL_STREAM_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
