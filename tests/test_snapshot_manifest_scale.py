"""Manifest-list scalability (VERDICT r4 item 7): commits touch O(touched
groups) of metadata, not O(all partitions); group summaries prune whole
manifests unopened; string zone bounds are truncated; tiny groups fold so
per-partition commit loops don't grow the list one file per commit."""

import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import (
    MANIFEST_GROUP_TARGET,
    SnapshotTable,
    ZONE_STR_MAX,
    _truncate_hi,
    _truncate_lo,
)


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def fake_meta(key: int, rows: int = 10) -> dict:
    return {
        "lineage": str(key),
        "path": f"data/part-{key}-deadbeef",
        "rows": rows,
        "bytes": 1000,
        "n_files": 1,
        "stats": {"k": [key * 100, key * 100 + 99]},
        "committed_at": 0.0,
    }


class TestManifestListScale:
    def test_ten_thousand_partition_commit_is_groups_not_world(self, table):
        """A 10⁴-partition table commits; a later 1-partition append must
        NOT rewrite unrelated group manifests (pure-metadata check — the
        commit path never touches data files)."""
        world = {f"{i:05d}": fake_meta(i) for i in range(10_000)}
        table._commit_state(world)
        groups_before = {
            n: os.path.getmtime(os.path.join(table.path, n))
            for n in os.listdir(table.path)
            if n.startswith("manifest-")
        }
        assert len(groups_before) == 10_000 // MANIFEST_GROUP_TARGET + 1
        # append ONE new partition
        table._commit({"10000": fake_meta(10_000)})
        raw = table._raw_manifest()
        paths = [e["path"] for e in raw["manifest_list"]]
        new_groups = [p for p in paths if p not in groups_before]
        assert len(new_groups) == 1  # exactly one new group file
        carried = [p for p in paths if p in groups_before]
        assert len(carried) == len(groups_before)  # everything else reused
        for p in carried:  # ...and reused means NOT rewritten
            assert os.path.getmtime(os.path.join(table.path, p)) == groups_before[p]
        assert table.metrics()["n_partitions"] == 10_001

    def test_group_summary_prunes_without_opening(self, table):
        world = {f"{i:05d}": fake_meta(i) for i in range(1_000)}
        table._commit_state(world)
        fresh = SnapshotTable(table.path)  # cold cache: opens are observable
        plan = fresh.plan_scan(where=[("k", "<", 100 * MANIFEST_GROUP_TARGET)])
        assert plan["read"] == [f"{i:05d}" for i in range(MANIFEST_GROUP_TARGET)]
        assert plan["groups_opened"] == 1
        assert plan["pruned_n"] == 1_000 - MANIFEST_GROUP_TARGET
        # only the admitting group was parsed into the cold cache
        assert len(fresh._group_cache) == 1

    def test_tiny_groups_fold(self, table):
        """40 per-partition commits (the write_partitions loop shape) must
        not leave 40 single-partition manifests — tiny groups fold."""
        for i in range(40):
            table._commit({str(i): fake_meta(i)})
        raw = table._raw_manifest()
        assert len(raw["manifest_list"]) < 15
        assert table.metrics()["n_partitions"] == 40

    def test_mutation_rewrites_only_owning_group(self, table):
        world = {f"{i:05d}": fake_meta(i) for i in range(1_000)}
        table._commit_state(world)
        before = {e["path"] for e in table._raw_manifest()["manifest_list"]}
        # change one partition's meta (what merge/compact do)
        world["00500"] = {**fake_meta(500), "rows": 11}
        table._commit_state(dict(world))
        after = table._raw_manifest()["manifest_list"]
        changed = [e for e in after if e["path"] not in before]
        # the owning group was rewritten (its 63 survivors + the change);
        # every other group entry carried over verbatim
        assert len(changed) == 1
        assert changed[0]["n_partitions"] == MANIFEST_GROUP_TARGET
        assert table.manifest()["partitions"]["00500"]["rows"] == 11


class TestStringZoneTruncation:
    def test_truncate_bounds_are_valid(self):
        s = "x" * 200 + "abc"
        lo, hi = _truncate_lo(s), _truncate_hi(s)
        assert len(lo) <= ZONE_STR_MAX and len(hi) <= ZONE_STR_MAX
        assert lo <= s <= hi  # weaker but VALID bounds
        assert _truncate_lo("short") == "short" == _truncate_hi("short")

    def test_truncate_hi_never_emits_lone_surrogates(self):
        """ADVICE r5: incrementing U+D7FF must skip the surrogate block —
        a lone surrogate json-round-trips in Python but is invalid strict
        UTF-8/JSON for any external manifest reader."""
        import json as _json

        s = "k" * (ZONE_STR_MAX - 1) + "퟿" + "tail-beyond-the-cap"
        hi = _truncate_hi(s)
        assert s <= hi and len(hi) <= ZONE_STR_MAX
        assert not any(0xD800 <= ord(c) <= 0xDFFF for c in hi)
        _json.dumps(hi).encode("utf-8")  # strict-encodable
        # a prefix char that is itself a lone surrogate also increments out
        s2 = "\ud800" * (ZONE_STR_MAX + 5)
        hi2 = _truncate_hi(s2)
        assert not any(0xD800 <= ord(c) <= 0xDFFF for c in hi2[-1:])

    def test_footer_stats_truncate_long_strings(self, spark, table):
        df = spark.range(4).select(
            F.col("id").alias("k"),
            F.lit(0).alias("bucket"),
            F.concat(F.lit("v" * 200), F.col("id").cast("string")).alias("blob"),
        )
        table.write_partitions(df, "bucket", [0])
        stats = table.current_manifest()["partitions"]["0"]["stats"]
        lo, hi = stats["blob"]
        assert len(lo) <= ZONE_STR_MAX and len(hi) <= ZONE_STR_MAX
        assert lo <= "v" * 200 + "0" and hi >= "v" * 200 + "3"
        # truncated bounds must never mis-prune a real value...
        plan = table.plan_scan(where=[("blob", "=", "v" * 200 + "2")])
        assert plan["read"] == ["0"]
        # ...and still prune what they can prove
        plan = table.plan_scan(where=[("blob", ">", "w")])
        assert plan["pruned_n"] == 1


class TestManifestListModel:
    def test_random_commit_sequences_match_dict_model(self, tmp_path):
        """Randomized append/update/delete sequences over the manifest-list
        layer (pure metadata): after every commit the resolved partitions
        must equal a plain dict model, summaries must sum correctly, and
        every referenced group file must exist."""
        import numpy as np

        rng = np.random.default_rng(31)
        table = SnapshotTable(str(tmp_path / "model"))
        model: dict = {}
        next_key = 0
        for step in range(30):
            op = rng.choice(["append", "update", "delete"], p=[0.5, 0.3, 0.2])
            if op == "append" or not model:
                n = int(rng.integers(1, 40))
                for _ in range(n):
                    model[f"{next_key:06d}"] = fake_meta(next_key)
                    next_key += 1
            elif op == "update":
                keys = list(model)
                for k in rng.choice(keys, size=min(5, len(keys)), replace=False):
                    model[k] = {**model[k], "rows": int(rng.integers(1, 100))}
            else:  # delete
                keys = list(model)
                for k in rng.choice(keys, size=min(3, len(keys)), replace=False):
                    del model[k]
                if not model:  # empty-table commits unsupported by contract
                    model[f"{next_key:06d}"] = fake_meta(next_key)
                    next_key += 1
            table._commit_state(dict(model))
            got = table.current_manifest()["partitions"]
            # resolution fidelity MODULO the engine-stamped data sequence
            # (r7): unchanged metas inherit their seq, changed ones stamp
            # the committing snapshot — the model tracks neither
            strip = lambda d: {  # noqa: E731
                k: {kk: v for kk, v in m.items() if kk != "seq"}
                for k, m in d.items()
            }
            assert strip(got) == model, f"divergence at step {step} ({op})"
            raw = table._raw_manifest()
            assert sum(e["n_partitions"] for e in raw["manifest_list"]) == len(model)
            assert sum(e["rows"] for e in raw["manifest_list"]) == sum(
                m["rows"] for m in model.values()
            )
            for e in raw["manifest_list"]:
                assert os.path.exists(os.path.join(table.path, e["path"]))
        # a COLD handle resolves identically (nothing depended on the cache)
        fresh = SnapshotTable(table.path)
        assert strip(fresh.current_manifest()["partitions"]) == model
        # expire keeps the newest snapshot readable and GCs dead groups
        res = fresh.expire_snapshots(keep_last=1)
        assert strip(fresh.current_manifest()["partitions"]) == model
        assert res["expired_snapshots"]

    def test_concurrent_appends_never_lose_partitions(self, tmp_path):
        """8 threads × 5 appends race on one table: every appended key must
        be present afterwards (the link-if-absent claim + repair/retry path
        under real contention)."""
        import threading

        table_path = str(tmp_path / "conc")
        SnapshotTable(table_path)._commit_state({"seed": fake_meta(0)})
        errors: list = []

        def worker(tid: int):
            t = SnapshotTable(table_path)  # own handle (no shared cache)
            try:
                for j in range(5):
                    key = f"t{tid}-{j}"
                    t._commit({key: fake_meta(tid * 100 + j)})
            except Exception as e:  # noqa: BLE001
                errors.append((tid, repr(e)))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors
        final = SnapshotTable(table_path).current_manifest()["partitions"]
        want = {"seed"} | {f"t{i}-{j}" for i in range(8) for j in range(5)}
        assert set(final) == want


class TestCommitCrashPoints:
    def test_crash_at_every_commit_io_step_leaves_table_recoverable(self, tmp_path):
        """Kill the committer at EVERY filesystem step of _commit_state (group
        write, group rename, manifest write, manifest link, CURRENT rename):
        after each simulated crash the table must still resolve to the last
        COMMITTED state, and the next commit must succeed and land on top of
        whatever the crash left behind (orphan adoption included)."""
        import erased_cells_spark.sources.snapshot as S

        crash_step = {"n": None, "count": 0}
        real_rename, real_link = os.rename, os.link

        class Boom(RuntimeError):
            pass

        def counting(fn):
            def wrapped(*a, **k):
                crash_step["count"] += 1
                if crash_step["n"] is not None and crash_step["count"] == crash_step["n"]:
                    raise Boom(f"simulated crash at fs-op {crash_step['n']}")
                return fn(*a, **k)

            return wrapped

        # first, count the fs ops of a clean commit
        probe = SnapshotTable(str(tmp_path / "probe"))
        os.rename, os.link = counting(real_rename), counting(real_link)
        try:
            crash_step["count"] = 0
            probe._commit_state({"a": fake_meta(1)})
            total_ops = crash_step["count"]
        finally:
            os.rename, os.link = real_rename, real_link
        assert total_ops >= 3  # group rename + manifest link + CURRENT rename

        for step in range(1, total_ops + 1):
            tdir = str(tmp_path / f"t{step}")
            table = SnapshotTable(tdir)
            table._commit_state({"base": fake_meta(0)})
            committed = table.current_manifest()["partitions"]
            os.rename, os.link = counting(real_rename), counting(real_link)
            try:
                crash_step["n"], crash_step["count"] = step, 0
                with pytest.raises(Boom):
                    table._commit_state({**committed, "new": fake_meta(9)})
            finally:
                os.rename, os.link = real_rename, real_link
                crash_step["n"] = None
            # a FRESH handle (the restarted process) must read a consistent
            # state: either the pre-crash commit or the fully-landed new one
            fresh = SnapshotTable(tdir)
            got = set(fresh.current_manifest()["partitions"])
            assert got in ({"base"}, {"base", "new"}), (step, got)
            # and the table remains writable (repair adopts any orphan)
            fresh._commit({"after": fake_meta(7)})
            final = set(SnapshotTable(tdir).current_manifest()["partitions"])
            assert {"base", "after"} <= final, (step, final)
