"""Sorted shard export: write a table as N globally-ordered parquet
shards plus a `_manifest.json` of per-shard key ranges (underscore-prefixed so Spark directory reads skip it) — the training-data
handoff format (deterministic curriculum order, resumable readers that
binary-search the manifest instead of listing files, downstream merges
that never re-sort).

Global order: repartitionByRange assigns contiguous key ranges to
partitions in partition-id order and sortWithinPartitions orders inside
each, so shard i's max key <= shard i+1's min key — VERIFIED from the
written parquet footers at export time (the manifest is built from
footer statistics, a pure metadata pass, and the cross-shard ordering
invariant is asserted before the manifest lands; a violated invariant
fails the export rather than shipping an unordered corpus). Range
boundaries come from Spark's reservoir sampling, so shard SIZES are
approximate (skew note below) while ordering is exact.

Skew: a single dominant key cannot be split across range partitions —
its shard simply grows (ordering still holds). The manifest records
per-shard row counts so downstream sees the imbalance; re-export with
more shards or a finer key if it matters.

Scale shape: one range shuffle + per-partition sort (Spark's external
sort spills), one footer pass for the manifest. No driver data."""

from __future__ import annotations

import glob
import json
import os
import time

from pyspark.sql import DataFrame


def export_sorted_shards(
    df: DataFrame, path: str, order_cols: list[str], n_shards: int
) -> dict:
    """Write df as n_shards globally-ordered parquet shards under `path`
    with `_manifest.json` recording (file, rows, min/max of the leading
    order column) per shard, ordered. Returns the manifest dict."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    import pyarrow.parquet as pq

    (
        df.repartitionByRange(n_shards, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("error")
        .parquet(path)
    )
    lead = order_cols[0]
    shards = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[lead]).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        shards.append(
            {
                "file": os.path.basename(f),
                "rows": md.num_rows,
                "min": lo,
                "max": hi,
            }
        )
    populated = [s for s in shards if s["rows"] > 0]
    for a, b in zip(populated, populated[1:]):
        if not (a["max"] <= b["min"]):
            raise RuntimeError(
                f"sorted export invariant violated: shard {a['file']} max "
                f"{a['max']!r} > shard {b['file']} min {b['min']!r} — refusing "
                "to write the manifest for an unordered corpus"
            )
    manifest = {
        "order_cols": list(order_cols),
        "n_shards": len(shards),
        "total_rows": sum(s["rows"] for s in shards),
        "created_at": time.time(),
        "shards": shards,
    }
    tmp = os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


def shards_for_range(manifest: dict, lo, hi) -> list[str]:
    """The shard files that can contain keys in [lo, hi] — the manifest
    binary-search a resumable reader does instead of opening every file."""
    return [
        s["file"]
        for s in manifest["shards"]
        if s["rows"] > 0 and not (s["max"] < lo or s["min"] > hi)
    ]
