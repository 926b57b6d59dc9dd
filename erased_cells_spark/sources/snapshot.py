"""Iceberg-style snapshot sink: parquet data + JSON manifest commits,
crash-atomic, resumable, with per-partition lineage and metrics.

Layout of a snapshot table dir:
    <table>/
      data/part-<lineage_id>-....parquet     (one dir, files accumulate)
      snapshot-000001.json                   (manifest: committed files)
      snapshot-000002.json
      CURRENT                                (atomic pointer: highest valid)

A manifest lists, per committed partition: lineage id, file paths, row count,
and job-defined metrics. Commit protocol = write manifest to a temp name +
os.rename (atomic on POSIX) + rewrite CURRENT via rename. Resume = read
CURRENT manifest, skip partitions whose lineage ids are already committed.

(The reference has no such machinery — this is the north-rule requirement
of `BASELINE.json` "resumable from checkpoint with per-partition lineage +
metrics"; Iceberg jars aren't in the environment, so the manifest protocol
is engine-own but deliberately Iceberg-shaped.)
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.data_dir, exist_ok=True)

    # ----- manifest plumbing ---------------------------------------------
    def _current_id(self) -> int:
        cur = os.path.join(self.path, "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.path, f"snapshot-{sid:06d}.json")

    def manifest(self, snapshot_id: int | None = None) -> dict:
        """Manifest of a specific snapshot (time travel) or CURRENT."""
        sid = self._current_id() if snapshot_id is None else snapshot_id
        if sid == 0:
            return {"snapshot_id": 0, "parent": None, "partitions": {}}
        p = self._manifest_path(sid)
        if not os.path.exists(p):
            raise ValueError(
                f"no snapshot {sid} at {self.path} (never committed, or expired)"
            )
        with open(p) as f:
            return json.load(f)

    def current_manifest(self) -> dict:
        return self.manifest()

    def snapshots(self) -> list[dict]:
        """All live snapshots, oldest first: (snapshot_id, committed_at,
        n_partitions, total_rows, operation)."""
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("snapshot-") and name.endswith(".json"):
                with open(os.path.join(self.path, name)) as f:
                    m = json.load(f)
                out.append(
                    {
                        "snapshot_id": m["snapshot_id"],
                        "committed_at": m.get("committed_at"),
                        "n_partitions": len(m["partitions"]),
                        "total_rows": sum(p["rows"] for p in m["partitions"].values()),
                        "operation": m.get("operation", "append"),
                    }
                )
        return out

    def committed_lineage(self) -> set[str]:
        return set(self.current_manifest()["partitions"].keys())

    def _commit(self, new_partitions: dict) -> int:
        parent = self.current_manifest()
        return self._commit_state({**parent["partitions"], **new_partitions})

    def _commit_state(self, partitions: dict, **extra) -> int:
        """Commit a manifest whose partition map is EXACTLY `partitions`
        (append merges via _commit; rollback/compact replace the state)."""
        parent = self.current_manifest()
        sid = parent["snapshot_id"] + 1
        manifest = {
            "snapshot_id": sid,
            "parent": parent["snapshot_id"] or None,
            "committed_at": time.time(),
            "partitions": partitions,
            **extra,
        }
        tmp = self._manifest_path(sid) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(sid))  # atomic
        cur_tmp = os.path.join(self.path, f"CURRENT.tmp-{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.rename(cur_tmp, os.path.join(self.path, "CURRENT"))
        return sid

    # ----- write path -------------------------------------------------------
    def write_partitions(
        self,
        df: DataFrame,
        lineage_col: str,
        lineage_values: list,
    ) -> dict:
        """Write ALL pending lineage partitions in ONE partitioned Spark job
        (a single scan of the input plan — never one filtered rescan per
        partition), skipping already-committed ones. Row counts come from the
        written parquet footers (pure metadata, no second data pass). Commits
        stay per-partition and atomic — staged files are invisible until their
        manifest rename — so a crash mid-commit-loop loses at most the
        in-flight partition and resume skips the committed ones.

        Returns {lineage: metrics}."""
        import glob
        import shutil
        from urllib.parse import unquote

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        done = self.committed_lineage()
        manifest_parts = self.current_manifest()["partitions"]
        stats: dict = {}
        pending = []
        for lv in lineage_values:
            key = str(lv)
            if key in done:
                stats[key] = {**manifest_parts[key], "skipped": True}
            else:
                pending.append(lv)
        if not pending:
            return stats

        # one job: partitionBy on a DUPLICATE of the lineage column, so the
        # committed data files keep the original column (partition dirs strip
        # their partitioning key from the file contents)
        stage = os.path.join(self.data_dir, f".stage-{uuid.uuid4().hex}")
        sl = df.filter(F.col(lineage_col).isin(pending)).withColumn(
            "__lineage", F.col(lineage_col).cast("string")
        )
        sl.write.mode("overwrite").partitionBy("__lineage").parquet(stage)

        staged = {}
        for d in os.listdir(stage):
            if d.startswith("__lineage="):
                staged[unquote(d[len("__lineage="):])] = os.path.join(stage, d)

        # FAIL LOUDLY if any staged partition would not be consumed by the
        # commit loop below (ADVICE r2): dir names come from Spark's
        # cast-to-string of the lineage value, the lookup keys from Python's
        # str() — a representation mismatch (bool True vs 'true', float or
        # timestamp formatting) would otherwise commit an EMPTY partition and
        # then rmtree the stage dir holding the real rows. Silent data loss
        # is the one failure mode a snapshot sink may never have.
        orphans = set(staged) - {str(lv) for lv in pending}
        if orphans:
            raise RuntimeError(
                f"snapshot write_partitions: staged lineage dirs {sorted(orphans)} "
                f"match no pending value in {[str(lv) for lv in pending]} — "
                "Spark's partition-dir string differs from str(lineage_value); "
                f"stage kept for inspection at {stage}"
            )

        for lv in pending:
            key = str(lv)
            out_dir = os.path.join(self.data_dir, f"part-{key}-{uuid.uuid4().hex}")
            src = staged.get(key)
            if src is None:
                # zero-row lineage value: commit an empty (schema-only)
                # partition so read() resolves every manifest path
                df.sparkSession.createDataFrame([], df.schema).write.mode(
                    "overwrite"
                ).parquet(out_dir)
            else:
                os.rename(src, out_dir)
            files = glob.glob(os.path.join(out_dir, "*.parquet"))
            n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            meta = {
                "lineage": key,
                "path": os.path.relpath(out_dir, self.path),
                "rows": n,
                "bytes": sum(os.path.getsize(f) for f in files),
                "n_files": len(files),
                "committed_at": time.time(),
            }
            self._commit({key: meta})
            stats[key] = meta
        shutil.rmtree(stage, ignore_errors=True)
        return stats

    # ----- read path ---------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read exactly the committed files of a snapshot (CURRENT by
        default; pass snapshot_id for TIME TRAVEL to any live snapshot) —
        uncommitted/garbage files in data/ are invisible (snapshot
        isolation), and compaction never rewrites history: an old snapshot
        keeps reading its original files until expire_snapshots drops them.

        SCHEMA EVOLUTION (add-column): partitions written before a column
        existed read as NULL for it — mergeSchema unions the parquet footer
        schemas across the snapshot's partitions, the same add-column
        semantics Iceberg provides (drops/renames are not supported; a
        rename would silently fork into two nullable columns)."""
        man = self.manifest(snapshot_id)
        paths = [os.path.join(self.path, p["path"]) for p in man["partitions"].values()]
        if not paths:
            raise ValueError(f"empty snapshot table at {self.path}")
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    # ----- table maintenance -------------------------------------------------
    def rollback(self, snapshot_id: int) -> int:
        """Roll the table back to an earlier snapshot's state — APPEND-ONLY:
        the rollback is itself a new snapshot whose partition map equals the
        target's, so history (and time travel across the rollback) is kept."""
        target = self.manifest(snapshot_id)
        return self._commit_state(
            dict(target["partitions"]), operation="rollback", rollback_of=snapshot_id
        )

    def compact(self, spark: SparkSession, max_files_per_partition: int = 1) -> int:
        """Rewrite every partition with more than max_files_per_partition
        files into that many files, committing the rewrite as a NEW snapshot
        (operation='compact'). Old snapshots keep reading the original
        small files — call expire_snapshots to reclaim them. Row counts are
        verified from the rewritten parquet footers and a mismatch RAISES
        before anything is committed (compaction must be a pure layout
        change). The 100 TB operational need this serves: streaming sinks
        and per-round deltas accumulate many small files; scan cost at the
        next read is dominated by file-open overhead until compaction."""
        import glob as _glob

        import pyarrow.parquet as pq

        man = self.current_manifest()
        new_parts = {}
        changed = False
        for key, meta in man["partitions"].items():
            if meta["n_files"] <= max_files_per_partition:
                new_parts[key] = meta
                continue
            src = os.path.join(self.path, meta["path"])
            out_dir = os.path.join(self.data_dir, f"part-{key}-compact-{uuid.uuid4().hex}")
            spark.read.parquet(src).coalesce(max_files_per_partition).write.mode(
                "overwrite"
            ).parquet(out_dir)
            files = _glob.glob(os.path.join(out_dir, "*.parquet"))
            rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            if rows != meta["rows"]:
                import shutil

                shutil.rmtree(out_dir, ignore_errors=True)
                raise RuntimeError(
                    f"compact: partition {key} rewrote {rows} rows, expected "
                    f"{meta['rows']} — aborting without commit"
                )
            new_parts[key] = {
                **meta,
                "path": os.path.relpath(out_dir, self.path),
                "bytes": sum(os.path.getsize(f) for f in files),
                "n_files": len(files),
                "compacted_from": meta["path"],
                "committed_at": time.time(),
            }
            changed = True
        if not changed:
            return man["snapshot_id"]
        return self._commit_state(new_parts, operation="compact")

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest keep_last snapshots and DELETE every data
        dir no kept snapshot references (the GC half of compaction/rollback;
        time travel to an expired snapshot raises afterwards)."""
        import shutil

        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1 (the CURRENT snapshot)")
        ids = sorted(s["snapshot_id"] for s in self.snapshots())
        keep = set(ids[-keep_last:])
        referenced = set()
        for sid in keep:
            for p in self.manifest(sid)["partitions"].values():
                referenced.add(p["path"])
        expired = []
        for sid in ids:
            if sid not in keep:
                os.remove(self._manifest_path(sid))
                expired.append(sid)
        deleted = []
        for d in os.listdir(self.data_dir):
            rel = os.path.relpath(os.path.join(self.data_dir, d), self.path)
            if d.startswith("part-") and rel not in referenced:
                shutil.rmtree(os.path.join(self.data_dir, d), ignore_errors=True)
                deleted.append(rel)
        return {"expired_snapshots": expired, "deleted_dirs": sorted(deleted)}

    def metrics(self) -> dict:
        man = self.current_manifest()
        return {
            "snapshot_id": man["snapshot_id"],
            "n_partitions": len(man["partitions"]),
            "total_rows": sum(p["rows"] for p in man["partitions"].values()),
            "partitions": man["partitions"],
        }
