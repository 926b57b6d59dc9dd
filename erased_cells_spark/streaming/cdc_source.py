"""Structured-Streaming CDC source over SnapshotTable (r6).

`spark.readStream.format("snapshot_cdc").option("path", tbl.path).load()`
turns the snapshot log into a stream: each micro-batch is the set of
partitions APPENDED between two snapshot ids — the incremental-read shape
Iceberg exposes as its streaming source, built on Spark 4's Python Data
Source API (public: pyspark.sql.datasource).

Offsets ARE snapshot ids, so the stream inherits the table's exactly-once
story: Spark checkpoints the last processed snapshot id; a restart resumes
from it; a partition is emitted in exactly one batch because commits are
atomic and append-only windows never mutate committed partitions.

APPEND-ONLY contract (the Iceberg streaming rule): a replace-style commit
inside a window — partition rewrite (merge/delete_where/compact), removed
partition, or a merge-on-read delete-list change — RAISES with a pointer
to the batch-side `SnapshotTable.changes()`, which handles those windows
with full before/after semantics. `option("skip_replace", "true")` instead
skips replace windows' rewritten partitions and streams only genuinely new
partition keys (the Iceberg `streaming-skip-overwrite-snapshots` switch).

Executor reads are PURE pyarrow (no SparkSession on that side of the API):
each InputPartition carries one committed partition dir's file list plus
the frozen column mapping; rows come back as Arrow RecordBatches (the
vectorized lane of the API). Schema evolution is applied file-side —
renames re-point through written names, add-column defaults fill, drops
vanish — against the schema FROZEN AT STREAM START (restart the stream to
surface columns added later; the standard fixed-schema streaming rule).
Equality delete sets pending at the window end are anti-filtered file-side
(takedown lists are broadcast-small by contract; scope='past' sets skip
partitions whose data-seq postdates them), and POSITION delete sets
pending at the window end are anti-filtered by (table-relative file path,
row ordinal) — with skip_replace a window can contain an append followed
by a delete_where_positions commit whose positions reference the appended
files (ADVICE r6).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

# schema derivation unifies footers across at most this many partitions —
# a bounded metadata read; tables wider than this should pass an explicit
# .schema(...) (documented, fail-safe: extra columns just read as NULL)
SCHEMA_SAMPLE_PARTITIONS = 64


# partition-meta keys that carry no row-visibility information: a commit
# touching only these (build_bloom rewriting the blooms map, the one-time
# seq-stamping migration) is INDEX/METADATA MAINTENANCE, not a replace —
# flagging it would permanently wedge a strict-mode stream (ADVICE r6)
_NON_DATA_META_KEYS = ("blooms", "committed_at", "seq")


def _is_data_change(a: dict, b: dict) -> bool:
    """True when partition meta a→b changed the partition's visible ROWS:
    identical modulo non-data keys → no; a pure compaction chain
    (compacted_from == old path, equal rows) → no (mirrors the whitelist
    batch-side changes() applies); anything else → yes."""
    if a == b:
        return False
    strip = lambda m: {k: v for k, v in m.items() if k not in _NON_DATA_META_KEYS}  # noqa: E731
    sa, sb = strip(a), strip(b)
    if sa == sb:
        return False
    return not (
        b.get("compacted_from") == a.get("path")
        and b.get("rows") == a.get("rows")
        and b.get("lineage") == a.get("lineage")
    )


def _mapping_of(raw: dict) -> dict:
    m = raw.get("column_mapping") or {}
    return {
        "renames": dict(m.get("renames") or {}),
        "dropped": list(m.get("dropped") or []),
        "defaults": dict(m.get("defaults") or {}),
    }


def _partitions_of(table_path: str, raw: dict) -> dict:
    """Resolve a raw snapshot manifest (inline or manifest-list) to the
    full {key: meta} map with pure-python JSON reads."""
    if "partitions" in raw:
        return raw["partitions"]
    out: dict = {}
    for entry in raw.get("manifest_list") or []:
        with open(os.path.join(table_path, entry["path"])) as f:
            out.update(json.load(f)["partitions"])
    return out


def _raw_manifest(table_path: str, snapshot_id: int) -> dict:
    if snapshot_id == 0:
        return {"snapshot_id": 0, "partitions": {}}
    p = os.path.join(table_path, f"snapshot-{snapshot_id:06d}.json")
    with open(p) as f:
        return json.load(f)


def _current_sid(table_path: str) -> int:
    cur = os.path.join(table_path, "CURRENT")
    if not os.path.exists(cur):
        return 0
    with open(cur) as f:
        return int(f.read().strip())


def _apply_mapping_arrow(tbl: pa.Table, mapping: dict, target: pa.Schema) -> pa.Table:
    """File-side schema evolution: project a raw parquet table onto the
    stream's frozen logical schema (rename → new name; default → COALESCE
    fill; missing → typed nulls; extras dropped)."""
    renames, dropped = mapping["renames"], set(mapping["dropped"])
    defaults = mapping["defaults"]
    cols = {}
    for name in tbl.column_names:
        tgt = renames.get(name, name)
        if tgt in dropped:
            continue
        cols[tgt] = tbl.column(name)
    out = []
    for field in target:
        arr = cols.get(field.name)
        if arr is not None:
            arr = arr.cast(field.type)
            if field.name in defaults:
                arr = pc.fill_null(arr, defaults[field.name])
        elif field.name in defaults:
            arr = pa.array([defaults[field.name]] * len(tbl)).cast(field.type)
        else:
            arr = pa.nulls(len(tbl), field.type)
        out.append(arr)
    return pa.table(out, schema=target)


class _CdcPartition(InputPartition):
    def __init__(self, files, mapping, target_schema, delete_sets, seq=0,
                 pos_delete_files=(), rel_dir=""):
        self.files = files
        self.mapping = mapping
        self.target_schema = target_schema  # serialized (pickled pa.Schema is fine)
        self.delete_sets = delete_sets  # [(eff_col, written_col, path, entry_seq)]
        self.seq = seq  # partition data-sequence (scope='past' delete scoping)
        self.pos_delete_files = pos_delete_files  # abs paths of (__file,__pos) sets
        self.rel_dir = rel_dir  # table-relative partition dir (position matching)


class SnapshotCdcStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema: pa.Schema, options: dict):
        self.table_path = table_path
        self.arrow_schema = schema
        self.start_sid = int(options.get("from_snapshot", 0))
        self.skip_replace = str(options.get("skip_replace", "false")).lower() == "true"

    # ---- offsets are snapshot ids ----
    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_sid}

    def latestOffset(self) -> dict:
        return {"snapshot_id": _current_sid(self.table_path)}

    def partitions(self, start: dict, end: dict):
        s_sid, e_sid = start["snapshot_id"], end["snapshot_id"]
        raw_s = _raw_manifest(self.table_path, s_sid)
        raw_e = _raw_manifest(self.table_path, e_sid)
        ps = _partitions_of(self.table_path, raw_s)
        pe = _partitions_of(self.table_path, raw_e)
        replaced = sorted(
            k for k in ps if k not in pe or _is_data_change(ps[k], pe[k])
        )
        dels_changed = (raw_s.get("delete_files") or []) != (
            raw_e.get("delete_files") or []
        ) or (raw_s.get("position_delete_files") or []) != (
            raw_e.get("position_delete_files") or []
        )
        if (replaced or dels_changed) and not self.skip_replace:
            raise ValueError(
                f"snapshot_cdc: window {s_sid}→{e_sid} contains replace-style "
                f"commits (rewritten/removed partitions {replaced[:5]}"
                f"{'…' if len(replaced) > 5 else ''}, delete-list change="
                f"{dels_changed}) — the streaming source is APPEND-ONLY. Use "
                "SnapshotTable.changes() for full before/after semantics, "
                "restart the stream from the current snapshot, or set "
                "option('skip_replace', 'true') to stream only new partitions."
            )
        mapping = _mapping_of(raw_e)
        # equality delete sets pending at the window END apply to appended
        # rows too (a takedown key can match a row appended later) — except
        # scope='past' entries, which by construction only hide partitions
        # whose data-seq <= the entry seq (checked per partition in read())
        delete_sets = [
            (
                mapping["renames"].get(e["key_col"], e["key_col"]),
                e["key_col"],
                os.path.join(self.table_path, e["path"]),
                e.get("seq"),
            )
            for e in raw_e.get("delete_files") or []
        ]
        # POSITION delete sets pending at the window end (ADVICE r6): with
        # skip_replace a window can contain an append followed by a
        # delete_where_positions commit — the positions then reference the
        # appended files, so each appended partition must anti-filter its
        # own (table-relative file path, row ordinal) pairs during read
        pos_delete_files = tuple(
            os.path.join(self.table_path, e["path"])
            for e in raw_e.get("position_delete_files") or []
        )
        out = []
        for key in sorted(pe):
            if key in ps:
                continue  # committed before the window (or replaced+skipped)
            meta = pe[key]
            pdir = os.path.join(self.table_path, meta["path"])
            files = sorted(
                os.path.join(pdir, f)
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
            out.append(
                _CdcPartition(
                    files, mapping, self.arrow_schema, delete_sets,
                    seq=int(meta.get("seq", 0)),
                    pos_delete_files=pos_delete_files,
                    rel_dir=meta["path"],
                )
            )
        return out

    def read(self, partition: _CdcPartition):
        target = partition.target_schema
        # load pending equality-delete key sets once per task (small by
        # contract — they are takedown lists). scope='past' sets whose seq
        # predates this partition's data-seq cannot hide its rows — skip.
        dels = []
        for eff, written, path, entry_seq in partition.delete_sets:
            if entry_seq is not None and partition.seq > entry_seq:
                continue
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            keys = pa.concat_tables([pq.read_table(f) for f in files])
            dels.append((eff, keys.column(written)))
        # pending POSITION deletes that reference THIS partition's files:
        # table-relative path → set of deleted row ordinals (ADVICE r6 —
        # without this, a skip_replace window spanning an append and a
        # later delete_where_positions commit would stream deleted rows)
        pos_by_file: dict = {}
        for path in partition.pos_delete_files:
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            for pf in files:
                t = pq.read_table(pf)
                for fp, pos in zip(
                    t.column("__file").to_pylist(), t.column("__pos").to_pylist()
                ):
                    if fp.startswith(partition.rel_dir + "/"):
                        pos_by_file.setdefault(fp, set()).add(pos)
        for f in partition.files:
            tbl = pq.read_table(f)
            rel = os.path.join(partition.rel_dir, os.path.basename(f))
            dead = pos_by_file.get(rel)
            if dead:
                keep = [i for i in range(len(tbl)) if i not in dead]
                tbl = tbl.take(pa.array(keep, type=pa.int64()))
            tbl = _apply_mapping_arrow(tbl, partition.mapping, target)
            if len(tbl) == 0:
                continue
            for eff, keys in dels:
                if eff in tbl.column_names and len(keys):
                    mask = pc.is_in(tbl.column(eff), value_set=keys.combine_chunks())
                    tbl = tbl.filter(pc.invert(pc.fill_null(mask, False)))
            yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are snapshot ids; nothing table-side to release


class SnapshotCdcDataSource(DataSource):
    """`spark.dataSource.register(SnapshotCdcDataSource)` then
    `spark.readStream.format("snapshot_cdc").option("path", <table dir>)`.
    Options: path (required), from_snapshot (default 0 — the full table as
    the first batch), skip_replace (default false — fail loud on
    replace-style windows)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdc"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_cdc requires option('path', <table dir>)")
        raw = _raw_manifest(path, _current_sid(path))
        parts = _partitions_of(path, raw)
        if not parts:
            raise ValueError(f"snapshot_cdc: empty snapshot table at {path}")
        mapping = _mapping_of(raw)
        renames, dropped = mapping["renames"], set(mapping["dropped"])
        # unify footers over a bounded partition sample, under the mapping
        fields: dict = {}
        for key in sorted(parts)[:SCHEMA_SAMPLE_PARTITIONS]:
            pdir = os.path.join(path, parts[key]["path"])
            pfiles = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            if not pfiles:
                continue
            sch = pq.read_schema(os.path.join(pdir, pfiles[0]))
            for field in sch:
                tgt = renames.get(field.name, field.name)
                if tgt not in dropped and tgt not in fields:
                    # every stream column is NULLABLE regardless of the
                    # sampled footer: under add-column evolution any
                    # column can be absent in some batch (read as NULL),
                    # and a required-marked column would poison downstream
                    # file sinks' merged schemas
                    fields[tgt] = pa.field(tgt, field.type, nullable=True)
        for name, default in mapping["defaults"].items():
            if name not in fields and name not in dropped:
                fields[name] = pa.field(name, pa.scalar(default).type)
        self._arrow_schema = pa.schema(list(fields.values()))
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._arrow_schema)

    def streamReader(self, schema) -> SnapshotCdcStreamReader:
        path = self.options["path"]
        # rebuild the arrow schema from the (possibly user-supplied) spark
        # schema so read() emits exactly what the engine expects
        from pyspark.sql.pandas.types import to_arrow_schema

        return SnapshotCdcStreamReader(path, to_arrow_schema(schema), self.options)
