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

CHANGELOG MODE (r7): `option("mode", "changelog")` adds a `_change_type`
∈ {insert, delete} column (Iceberg's CDC metadata column). Windows that
ADD merge-on-read delete sets — the takedown path — emit the rows those
sets hide as _change_type='delete' rows instead of erroring: one
delete-scan task per start-snapshot partition filters rows that were
visible at the start AND are hit by a window-added set, so the stream's
multiset equals batch `changes()` on append+delete windows. Partition
rewrites and shrunk delete lists (row resurrection) still fail loud.
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
_NON_DATA_META_KEYS = ("blooms", "hll", "committed_at", "seq")


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
                 pos_delete_files=(), rel_dir="", kind="insert",
                 new_delete_sets=(), new_pos_files=()):
        self.files = files
        self.mapping = mapping
        self.target_schema = target_schema  # serialized (pickled pa.Schema is fine)
        self.delete_sets = delete_sets  # [(eff_col, written_col, path, entry_seq)]
        self.seq = seq  # partition data-sequence (scope='past' delete scoping)
        self.pos_delete_files = pos_delete_files  # abs paths of (__file,__pos) sets
        self.rel_dir = rel_dir  # table-relative partition dir (position matching)
        self.kind = kind  # 'insert' | 'delete' (changelog mode)
        # delete-scan inputs: equality/position sets ADDED in the window —
        # the rows they hide (under start-snapshot visibility) are the
        # window's _change_type='delete' rows
        self.new_delete_sets = new_delete_sets
        self.new_pos_files = new_pos_files


CHANGE_TYPE_COL = "_change_type"


def _stamp_change_type(tbl: pa.Table, target: pa.Schema, kind: str) -> pa.Table:
    """Append the constant _change_type column when the stream schema
    carries one (changelog mode); no-op in append mode."""
    if CHANGE_TYPE_COL not in target.names:
        return tbl
    stamp = pa.array([kind] * len(tbl), type=pa.string())
    cols = [tbl.column(f.name) if f.name != CHANGE_TYPE_COL else stamp for f in target]
    return pa.table(cols, schema=target)


class SnapshotCdcStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema: pa.Schema, options: dict):
        self.table_path = table_path
        self.arrow_schema = schema
        self.start_sid = int(options.get("from_snapshot", 0))
        self.skip_replace = str(options.get("skip_replace", "false")).lower() == "true"
        self.mode = str(options.get("mode", "append")).lower()
        if self.mode not in ("append", "changelog"):
            raise ValueError(
                f"snapshot_cdc: mode {self.mode!r} not in ('append', 'changelog')"
            )

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
        changelog = self.mode == "changelog"
        dels_changed = (raw_s.get("delete_files") or []) != (
            raw_e.get("delete_files") or []
        ) or (raw_s.get("position_delete_files") or []) != (
            raw_e.get("position_delete_files") or []
        )
        # a SHRUNK delete list (apply_deletes fold, manual surgery) means
        # rows RE-APPEARED — inexpressible as insert/delete lanes derived
        # from added sets, so changelog mode fails loud on it too
        eq_removed = {e["path"] for e in raw_s.get("delete_files") or []} - {
            e["path"] for e in raw_e.get("delete_files") or []
        }
        pos_removed = {
            e["path"] for e in raw_s.get("position_delete_files") or []
        } - {e["path"] for e in raw_e.get("position_delete_files") or []}
        if changelog and (eq_removed or pos_removed) and not self.skip_replace:
            raise ValueError(
                f"snapshot_cdc: window {s_sid}→{e_sid} REMOVED merge-on-read "
                f"delete sets ({sorted(eq_removed | pos_removed)[:5]}) — an "
                "apply_deletes fold or a resurrection, neither expressible "
                "as changelog insert/delete lanes. Use SnapshotTable."
                "changes() for this window or restart the stream from the "
                "current snapshot."
            )
        # changelog mode's whole point is delete windows: a delete-list
        # change becomes _change_type='delete' rows instead of an error.
        # Partition REWRITES stay out of scope in both modes (full
        # before/after multiset semantics live batch-side in changes()).
        if (replaced or (dels_changed and not changelog)) and not self.skip_replace:
            raise ValueError(
                f"snapshot_cdc: window {s_sid}→{e_sid} contains replace-style "
                f"commits (rewritten/removed partitions {replaced[:5]}"
                f"{'…' if len(replaced) > 5 else ''}, delete-list change="
                f"{dels_changed}) — the streaming source is APPEND-ONLY. Use "
                "SnapshotTable.changes() for full before/after semantics, "
                "option('mode', 'changelog') for delete-list windows, "
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
        if changelog:
            out.extend(
                self._delete_scan_partitions(raw_s, raw_e, ps, pe, mapping)
            )
        return out

    def _delete_scan_partitions(self, raw_s, raw_e, ps, pe, mapping):
        """changelog mode: one delete-scan task per start-snapshot
        partition when the window ADDED delete sets — the rows those sets
        hide (under START-snapshot visibility, so an already-hidden row
        never re-emits) are the window's _change_type='delete' rows.
        Rows of partitions appended in the same window never appear here
        (they were not visible at the start; the insert lane nets them by
        applying the end-pending sets), which keeps the stream's multiset
        equal to batch changes() on append+delete windows."""
        old_eq = {e["path"] for e in raw_s.get("delete_files") or []}
        new_eq = [
            e for e in raw_e.get("delete_files") or [] if e["path"] not in old_eq
        ]
        old_pos = {e["path"] for e in raw_s.get("position_delete_files") or []}
        new_pos = [
            e for e in raw_e.get("position_delete_files") or []
            if e["path"] not in old_pos
        ]
        if not new_eq and not new_pos:
            return []
        s_delete_sets = [
            (
                mapping["renames"].get(e["key_col"], e["key_col"]),
                e["key_col"],
                os.path.join(self.table_path, e["path"]),
                e.get("seq"),
            )
            for e in raw_s.get("delete_files") or []
        ]
        s_pos_files = tuple(
            os.path.join(self.table_path, e["path"])
            for e in raw_s.get("position_delete_files") or []
        )
        new_sets = [
            (
                mapping["renames"].get(e["key_col"], e["key_col"]),
                e["key_col"],
                os.path.join(self.table_path, e["path"]),
                e.get("seq"),
            )
            for e in new_eq
        ]
        new_pos_files = tuple(
            os.path.join(self.table_path, e["path"]) for e in new_pos
        )
        # ---- driver-side partition pruning (the 100 TB path): a takedown
        # window must NOT plan a scan task per table partition. Position
        # sets name their target files — only the referenced partition dirs
        # can emit delete rows. Equality sets are broadcast-small takedown
        # lists by contract — test their keys against per-partition blooms
        # (build_bloom) and skip partitions that provably contain none.
        pos_dirs: set = set()
        for path in new_pos_files:
            for pf in os.listdir(path):
                if pf.endswith(".parquet"):
                    col = pq.read_table(os.path.join(path, pf), columns=["__file"])
                    pos_dirs.update(
                        os.path.dirname(fp) for fp in col.column("__file").to_pylist()
                    )
        eq_keys = []  # [(eff, written, entry_seq, [values])]
        for eff, written, path, entry_seq in new_sets:
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            vals = pa.concat_tables([pq.read_table(f) for f in files])
            eq_keys.append(
                (eff, written, entry_seq, vals.column(written).to_pylist())
            )

        def might_hide(meta) -> bool:
            if meta["path"] in pos_dirs:
                return True
            part_seq = int(meta.get("seq", 0))
            blooms = meta.get("blooms") or {}
            for eff, written, entry_seq, vals in eq_keys:
                if entry_seq is not None and part_seq > entry_seq:
                    continue  # scope='past': set predates this partition
                bloom = blooms.get(written) or blooms.get(eff)
                if bloom is None:
                    return True  # no index → must scan
                from ..sources.snapshot import _bloom_might_contain

                if any(_bloom_might_contain(bloom, v) for v in vals):
                    return True
            return False

        out = []
        for key in sorted(ps):
            if key not in pe or _is_data_change(ps[key], pe[key]):
                continue  # rewritten: raised in strict mode, skipped otherwise
            meta = ps[key]
            if not might_hide(meta):
                continue  # bloom/position-proof: no delete rows here
            pdir = os.path.join(self.table_path, meta["path"])
            files = sorted(
                os.path.join(pdir, f)
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
            out.append(
                _CdcPartition(
                    files, mapping, self.arrow_schema, s_delete_sets,
                    seq=int(meta.get("seq", 0)),
                    pos_delete_files=s_pos_files,
                    rel_dir=meta["path"],
                    kind="delete",
                    new_delete_sets=new_sets,
                    new_pos_files=new_pos_files,
                )
            )
        return out

    @staticmethod
    def _load_eq_sets(sets, part_seq: int):
        """Load equality delete key sets once per task (small by contract
        — they are takedown lists). scope='past' sets whose seq predates
        the partition's data-seq cannot hide its rows — skipped."""
        out = []
        for eff, written, path, entry_seq in sets:
            if entry_seq is not None and part_seq > entry_seq:
                continue
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            keys = pa.concat_tables([pq.read_table(f) for f in files])
            out.append((eff, keys.column(written).combine_chunks()))
        return out

    @staticmethod
    def _load_pos_by_file(paths, rel_dir: str) -> dict:
        """Position-delete sets referencing files under `rel_dir`:
        {table-relative file path: set(row ordinals)}."""
        pos_by_file: dict = {}
        for path in paths:
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
                    if fp.startswith(rel_dir + "/"):
                        pos_by_file.setdefault(fp, set()).add(pos)
        return pos_by_file

    def read(self, partition: _CdcPartition):
        if partition.kind == "delete":
            yield from self._read_delete_scan(partition)
            return
        target = partition.target_schema
        data_target = pa.schema(
            [f for f in target if f.name != CHANGE_TYPE_COL]
        )
        dels = self._load_eq_sets(partition.delete_sets, partition.seq)
        # pending POSITION deletes that reference THIS partition's files
        # (ADVICE r6 — without this, a skip_replace window spanning an
        # append and a later delete_where_positions commit would stream
        # deleted rows)
        pos_by_file = self._load_pos_by_file(
            partition.pos_delete_files, partition.rel_dir
        )
        for f in partition.files:
            tbl = pq.read_table(f)
            rel = os.path.join(partition.rel_dir, os.path.basename(f))
            dead = pos_by_file.get(rel)
            if dead:
                keep = [i for i in range(len(tbl)) if i not in dead]
                tbl = tbl.take(pa.array(keep, type=pa.int64()))
            tbl = _apply_mapping_arrow(tbl, partition.mapping, data_target)
            if len(tbl) == 0:
                continue
            for eff, keys in dels:
                if eff in tbl.column_names and len(keys):
                    mask = pc.is_in(tbl.column(eff), value_set=keys)
                    tbl = tbl.filter(pc.invert(pc.fill_null(mask, False)))
            yield from _stamp_change_type(tbl, target, "insert").to_batches()

    def _read_delete_scan(self, partition: _CdcPartition):
        """changelog mode: emit _change_type='delete' rows — rows of this
        START-snapshot partition that (a) were VISIBLE at the start (not
        hidden by start-pending equality/position sets) and (b) are hidden
        by a set ADDED in the window."""
        import numpy as np

        target = partition.target_schema
        data_target = pa.schema([f for f in target if f.name != CHANGE_TYPE_COL])
        vis_eq = self._load_eq_sets(partition.delete_sets, partition.seq)
        vis_pos = self._load_pos_by_file(partition.pos_delete_files, partition.rel_dir)
        new_eq = self._load_eq_sets(partition.new_delete_sets, partition.seq)
        new_pos = self._load_pos_by_file(partition.new_pos_files, partition.rel_dir)
        for f in partition.files:
            raw = pq.read_table(f)
            n = len(raw)
            if n == 0:
                continue
            rel = os.path.join(partition.rel_dir, os.path.basename(f))
            mapped = _apply_mapping_arrow(raw, partition.mapping, data_target)

            def eq_mask(sets):
                m = np.zeros(n, dtype=bool)
                for eff, keys in sets:
                    if eff in mapped.column_names and len(keys):
                        hit = pc.fill_null(
                            pc.is_in(mapped.column(eff), value_set=keys), False
                        )
                        m |= hit.combine_chunks().to_numpy(zero_copy_only=False)
                return m

            visible = ~eq_mask(vis_eq)
            dead_s = vis_pos.get(rel)
            if dead_s:
                visible[np.fromiter(dead_s, dtype=np.int64)] = False
            hit = eq_mask(new_eq)
            dead_new = new_pos.get(rel)
            if dead_new:
                hit[np.fromiter(dead_new, dtype=np.int64)] = True
            take = np.nonzero(visible & hit)[0]
            if len(take) == 0:
                continue
            out = mapped.take(pa.array(take, type=pa.int64()))
            yield from _stamp_change_type(out, target, "delete").to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are snapshot ids; nothing table-side to release


class SnapshotCdcDataSource(DataSource):
    """`spark.dataSource.register(SnapshotCdcDataSource)` then
    `spark.readStream.format("snapshot_cdc").option("path", <table dir>)`.
    Options: path (required), from_snapshot (default 0 — the full table as
    the first batch), skip_replace (default false — fail loud on
    replace-style windows), mode (default 'append'; 'changelog' adds a
    `_change_type` ∈ {insert, delete} column and turns windows that ADD
    merge-on-read delete sets into _change_type='delete' rows — the
    streaming twin of SnapshotTable.changes() on append+delete windows;
    partition REWRITES remain out of scope in both modes)."""

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
        if str(self.options.get("mode", "append")).lower() == "changelog":
            # the changelog lane is typed into the schema itself (Iceberg's
            # `_change_type` metadata column): insert | delete per row
            fields[CHANGE_TYPE_COL] = pa.field(CHANGE_TYPE_COL, pa.string(), nullable=True)
        self._arrow_schema = pa.schema(list(fields.values()))
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._arrow_schema)

    def streamReader(self, schema) -> SnapshotCdcStreamReader:
        path = self.options["path"]
        # rebuild the arrow schema from the (possibly user-supplied) spark
        # schema so read() emits exactly what the engine expects
        from pyspark.sql.pandas.types import to_arrow_schema

        return SnapshotCdcStreamReader(path, to_arrow_schema(schema), self.options)
