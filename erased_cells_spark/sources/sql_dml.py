"""SQL DML over snapshot tables (r7, VERDICT r6 missing #4).

The r6 SQL surface made `SELECT` work (`create_or_replace_view`: the full
read() plan — evolution mapping, merge-on-read deletes — behind a temp
view). This module adds the second thing an analyst tries: writing with
SQL. It is deliberately a THIN DISPATCHER, not a SQL engine — each
statement maps 1:1 onto the snapshot table's existing, conflict-detected
mutation API, so SQL DML inherits every contract those paths already
prove (atomic commits, optimistic concurrency via `_expected_parent`,
row-conservation checks, merge-on-read visibility):

    INSERT INTO t <query>        -> write_partitions(new partitions only;
                                    an existing partition FAILS LOUD — SQL
                                    INSERT may never silently resume-skip)
    INSERT OVERWRITE t <query>   -> write_partitions(overwrite=True)
                                    (dynamic partition overwrite)
    DELETE FROM t WHERE <pred>   -> delete_where (copy-on-write rewrite of
                                    matching partitions only)
    MERGE INTO t USING s ON
      t.k = s.k WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
                                 -> merge(spark.table(s), key_col=k)
    SELECT / WITH / VALUES       -> spark.sql passthrough over the views

Anything else fails loud (UPDATE, partial MERGE clauses, DDL) — the
engine's Python API is the escape hatch, and a half-faithful translation
would be worse than none. After every DML the table's view re-registers,
so the next SELECT sees the new snapshot (views pin the snapshot resolved
at registration — the same time-travel-consistent rule as r6).

Statement grammar is parsed with anchored regexes over the canonical
forms above; `<query>` and `<pred>` pass through to Spark SQL verbatim,
so full Spark expression syntax works inside them. Reference parity
anchor: the reference exposes no SQL at all (erased-cells is a cell
kernel crate); this surface is mandated by the engine side of SURVEY §2.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from erased_cells_spark.sources.snapshot import SnapshotTable

_INSERT_RE = re.compile(
    r"^INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<view>\w+)\s+(?P<query>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^DELETE\s+FROM\s+(?P<view>\w+)\s+WHERE\s+(?P<pred>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^MERGE\s+INTO\s+(?P<view>\w+)(?:\s+AS\s+(?P<talias>\w+))?"
    r"\s+USING\s+(?P<source>\w+)(?:\s+AS\s+(?P<salias>\w+))?"
    r"\s+ON\s+(?P<lq>\w+)\.(?P<lk>\w+)\s*=\s*(?P<rq>\w+)\.(?P<rk>\w+)"
    r"\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*"
    r"\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.IGNORECASE | re.DOTALL,
)


class SnapshotSql:
    """One SQL entry point over a set of registered snapshot tables.

    register() binds a view name to a SnapshotTable plus the DML routing
    metadata SQL cannot carry (the table's lineage/partition column);
    sql() dispatches a statement. SELECT-family statements return the
    DataFrame; DML statements return the new snapshot id (int)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, tuple[SnapshotTable, str]] = {}

    def register(
        self, name: str, table: SnapshotTable, lineage_col: str
    ) -> DataFrame:
        self._tables[name.lower()] = (table, lineage_col)
        return table.create_or_replace_view(self.spark, name)

    def _resolve(self, view: str, stmt: str) -> tuple[SnapshotTable, str]:
        entry = self._tables.get(view.lower())
        if entry is None:
            raise ValueError(
                f"SQL DML: {view!r} is not a registered snapshot table "
                f"(registered: {sorted(self._tables)}) in: {stmt!r}"
            )
        return entry

    def sql(self, stmt: str) -> DataFrame | int:
        s = stmt.strip().rstrip(";").strip()
        if not s:
            raise ValueError("empty SQL statement")
        head = s.split(None, 1)[0].upper()
        if head in ("SELECT", "WITH", "VALUES"):
            return self.spark.sql(s)
        if head == "INSERT":
            return self._insert(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "MERGE":
            return self._merge(s)
        raise ValueError(
            f"SQL DML: unsupported statement {head!r} — supported: SELECT/"
            f"WITH/VALUES, INSERT INTO/OVERWRITE, DELETE FROM .. WHERE, "
            f"canonical MERGE (in: {stmt!r})"
        )

    def _refresh(self, view: str, table: SnapshotTable) -> int:
        table.create_or_replace_view(self.spark, view)
        return table.metrics()["snapshot_id"]

    def _insert(self, s: str) -> int:
        m = _INSERT_RE.match(s)
        if not m:
            raise ValueError(f"SQL DML: cannot parse INSERT statement: {s!r}")
        table, lineage = self._resolve(m["view"], s)
        df = self.spark.sql(m["query"])
        if lineage not in df.columns:
            raise ValueError(
                f"SQL DML: INSERT query must produce the table's lineage "
                f"column {lineage!r} (got columns {df.columns})"
            )
        # partition VALUES are metadata-scale (bounded by partition count);
        # data rows never reach the driver
        values = sorted(
            r[0] for r in df.select(lineage).distinct().collect()
        )
        if not values:
            return table.metrics()["snapshot_id"]  # empty insert: no-op
        overwrite = m["mode"].upper() == "OVERWRITE"
        if not overwrite:
            clash = sorted(
                str(v) for v in values if str(v) in table.committed_lineage()
            )
            if clash:
                raise ValueError(
                    f"SQL DML: INSERT INTO would append to existing "
                    f"partitions {clash} — write_partitions resume-skip "
                    "would silently drop those rows; use INSERT OVERWRITE "
                    "(replace the shards) or MERGE (upsert by key)"
                )
        table.write_partitions(df, lineage, values, overwrite=overwrite)
        return self._refresh(m["view"], table)

    def _delete(self, s: str) -> int:
        m = _DELETE_RE.match(s)
        if not m:
            raise ValueError(
                f"SQL DML: cannot parse DELETE (only DELETE FROM <t> WHERE "
                f"<pred> is supported): {s!r}"
            )
        table, _ = self._resolve(m["view"], s)
        table.delete_where(self.spark, m["pred"])
        return self._refresh(m["view"], table)

    def _merge(self, s: str) -> int:
        m = _MERGE_RE.match(s)
        if not m:
            raise ValueError(
                "SQL DML: cannot parse MERGE — only the canonical upsert "
                "form is supported (MERGE INTO t USING s ON t.k = s.k WHEN "
                f"MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *): {s!r}"
            )
        table, lineage = self._resolve(m["view"], s)
        tname = (m["talias"] or m["view"]).lower()
        sname = (m["salias"] or m["source"]).lower()
        sides = {m["lq"].lower(): m["lk"], m["rq"].lower(): m["rk"]}
        if set(sides) != {tname, sname}:
            raise ValueError(
                f"SQL DML: MERGE ON clause must compare the target and the "
                f"source ({tname!r}, {sname!r}), got {sorted(sides)}: {s!r}"
            )
        if sides[tname] != sides[sname]:
            raise ValueError(
                f"SQL DML: MERGE key must be the same column on both sides "
                f"(merge() upserts by one key), got {sides[tname]!r} vs "
                f"{sides[sname]!r}: {s!r}"
            )
        updates = self.spark.table(m["source"])
        table.merge(self.spark, updates, key_col=sides[tname], lineage_col=lineage)
        return self._refresh(m["view"], table)
