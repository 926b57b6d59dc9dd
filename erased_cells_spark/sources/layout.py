"""Spatially-clustered (Z-order-style) parquet layout for scan pruning.

At 100 TB the cheapest query is the one that never reads the bytes: parquet
row-group min/max statistics prune a scan only when rows with similar key
values sit in the same row group. Randomly-laid-out points give every row
group the FULL key range (no pruning); range-partitioning by the grid cell
key and sorting within partitions gives each row group a narrow cell band,
so a spatial box query — expressed as cell-key ranges from the box's cover —
skips almost every row group at the footer. The same trick Iceberg calls
`sort_order(z-order)` and Delta calls `OPTIMIZE ZORDER BY`, built here from
stock Spark primitives: repartitionByRange + sortWithinPartitions on the
row-major grid key (spatial/cells_expr), which is exactly a space-filling
curve at a fixed resolution."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import cell_key_expr
from erased_cells_spark.plans.skew import repartition_by_cell


def write_spatially_clustered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 12,
    n_partitions: int | None = None,
    cell_col: str = "cell",
) -> None:
    """Write df to parquet clustered by the res-level grid cell key: range
    partition on the key (spatial neighbors co-locate in files), sort within
    partitions (row groups get narrow min/max bands). The key is kept as
    `cell_col` so readers can push cell-range predicates straight to the
    footer stats."""
    keyed = df.withColumn(cell_col, cell_key_expr(F.col(lon_col), F.col(lat_col), res))
    out = repartition_by_cell(keyed, cell_col, n_partitions).sortWithinPartitions(cell_col)
    out.write.mode("overwrite").parquet(path)


def rowgroup_cell_spans(path: str, cell_col: str = "cell") -> list[int]:
    """Per-row-group (max - min) span of the cell key from the parquet
    FOOTERS (no data read) — the direct measure of how prunable the layout
    is: clustered layouts have spans ≪ the full key range."""
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(cell_col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append(int(st.max - st.min))
    return spans
