"""Named refs on SnapshotTable: TAGS (immutable pinned snapshots) and
BRANCHES (write-audit-publish staging forks with their own manifest
ladder). Contracts: tag pinning across later commits and expiry, branch
isolation (main never moves), branch resume-skip, fast-forward publish
with its stale-main guard, crashed-branch-commit repair, scope='past'
delete semantics across the fork, and drop+expire cleanup of branch
manifests and exclusive data dirs."""

import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import (
    CommitConflictError,
    SnapshotTable,
)


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def pages(spark, n=800, seed=42):
    return generate_pages(spark, n, seed=seed).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(4).cast("long"))
    )


def seeded(spark, table):
    table.write_partitions(pages(spark), "bucket", [0, 1, 2, 3])
    return table


class TestTags:
    def test_tag_pins_across_later_commits(self, spark, table):
        seeded(spark, table)
        tagged_rows = table.read(spark).count()
        table.create_tag("v1")
        table.write_partitions(
            pages(spark, 400, seed=5000).withColumn("bucket", F.lit(9).cast("long")),
            "bucket", [9],
        )
        assert table.read(spark).count() == tagged_rows + 400
        assert table.read(spark, ref="v1").count() == tagged_rows
        # identical to explicit time travel
        sid = table.refs()["v1"]["snapshot_id"]
        assert (
            table.read(spark, ref="v1").exceptAll(table.read(spark, sid)).count() == 0
        )

    def test_tag_create_is_exclusive_and_validated(self, spark, table):
        seeded(spark, table)
        table.create_tag("v1")
        with pytest.raises(ValueError, match="already exists"):
            table.create_tag("v1")
        with pytest.raises(ValueError):
            table.create_tag("2bad")  # must start with a letter
        with pytest.raises(ValueError):
            table.create_tag("later", snapshot_id=999)  # no such snapshot
        empty = SnapshotTable(str(table.path) + "-empty")
        with pytest.raises(ValueError):
            empty.create_tag("v0")

    def test_tag_survives_expiry_and_drop_releases(self, spark, table):
        seeded(spark, table)
        table.create_tag("v1")
        sid = table.refs()["v1"]["snapshot_id"]
        for b in (10, 11, 12):
            table.write_partitions(
                pages(spark, 50, seed=9000 + b * 100).withColumn("bucket", F.lit(b).cast("long")),
                "bucket", [b],
            )
        table.expire_snapshots(keep_last=1)
        # the tagged snapshot is still readable, intermediates are gone
        assert table.read(spark, ref="v1").count() == 800
        with pytest.raises(ValueError):
            table.read(spark, sid + 1)
        table.drop_ref("v1")
        table.expire_snapshots(keep_last=1)
        with pytest.raises(ValueError):
            table.read(spark, sid)

    def test_read_rejects_ref_plus_snapshot_id(self, spark, table):
        seeded(spark, table)
        table.create_tag("v1")
        with pytest.raises(ValueError, match="not both"):
            table.read(spark, snapshot_id=1, ref="v1")
        with pytest.raises(ValueError, match="no ref"):
            table.read(spark, ref="ghost")


class TestBranches:
    def test_branch_isolation_and_read(self, spark, table):
        seeded(spark, table)
        main_sid = table.metrics()["snapshot_id"]
        table.create_branch("exp")
        table.write_partitions(
            pages(spark, 300, seed=7000).withColumn("bucket", F.lit(7).cast("long")),
            "bucket", [7], branch="exp",
        )
        # main untouched: same snapshot id, same rows
        assert table.metrics()["snapshot_id"] == main_sid
        assert table.read(spark).count() == 800
        br = table.read(spark, ref="exp")
        assert br.count() == 1100
        assert br.filter(F.col("bucket") == 7).count() == 300

    def test_branch_resume_skip(self, spark, table):
        seeded(spark, table)
        table.create_branch("exp")
        df = pages(spark, 300, seed=7000).withColumn("bucket", F.lit(7).cast("long"))
        table.write_partitions(df, "bucket", [7], branch="exp")
        stats = table.write_partitions(df, "bucket", [7], branch="exp")
        assert stats["7"].get("skipped")
        assert table.read(spark, ref="exp").count() == 1100

    def test_branch_writes_are_append_only(self, spark, table):
        seeded(spark, table)
        table.create_branch("exp")
        df = pages(spark, 100).withColumn("bucket", F.lit(0).cast("long"))
        with pytest.raises(ValueError, match="append-only"):
            table.write_partitions(df, "bucket", [0], overwrite=True, branch="exp")
        table.create_tag("v1")
        with pytest.raises(ValueError, match="not a branch"):
            table.write_partitions(df, "bucket", [5], branch="v1")

    def test_fast_forward_publishes_and_guards_stale_main(self, spark, table):
        seeded(spark, table)
        table.create_branch("exp")
        table.write_partitions(
            pages(spark, 300, seed=7000).withColumn("bucket", F.lit(7).cast("long")),
            "bucket", [7], branch="exp",
        )
        sid = table.fast_forward("exp")
        assert table.metrics()["snapshot_id"] == sid
        assert table.read(spark).count() == 1100
        # publish == branch content
        assert (
            table.read(spark).exceptAll(table.read(spark, ref="exp")).count() == 0
        )
        # a second branch forked BEFORE that publish cannot fast-forward
        table.create_branch("stale", snapshot_id=sid - 1) if sid > 1 else None
        # recreate the race properly: fork now, advance main, then publish
        table.create_branch("exp2")
        table.write_partitions(
            pages(spark, 100, seed=8000).withColumn("bucket", F.lit(8).cast("long")),
            "bucket", [8], branch="exp2",
        )
        table.write_partitions(
            pages(spark, 100, seed=8500).withColumn("bucket", F.lit(12).cast("long")),
            "bucket", [12],
        )  # main advances
        with pytest.raises(CommitConflictError, match="main advanced"):
            table.fast_forward("exp2")

    def test_crashed_branch_commit_repairs(self, spark, table):
        """A committer that crashed between linking the branch manifest and
        updating the ref file leaves a complete head; the next branch op
        adopts it (the _repair_current argument, on the branch ladder)."""
        import json

        seeded(spark, table)
        table.create_branch("exp")
        table.write_partitions(
            pages(spark, 100, seed=7000).withColumn("bucket", F.lit(7).cast("long")),
            "bucket", [7], branch="exp",
        )
        # simulate the crash: roll the ref file back one commit
        ref = table._load_ref("exp")
        assert ref["snapshot_id"] == 2
        table._write_ref({**ref, "snapshot_id": 1}, replace=True)
        # next commit adopts the linked head instead of colliding forever
        table.write_partitions(
            pages(spark, 100, seed=7700).withColumn("bucket", F.lit(8).cast("long")),
            "bucket", [8], branch="exp",
        )
        man = json.load(open(table._branch_manifest_path("exp", 3)))
        assert man["parent"] == 2
        assert table.read(spark, ref="exp").count() == 1000

    def test_branch_sees_fork_deletes_and_past_scope(self, spark, table):
        """Fork-inherited merge-on-read deletes apply on the branch; a
        scope='past' delete never hides rows APPENDED on the branch after
        the fork (branch metas are seq-stamped above the fork point)."""
        df = pages(spark, 400).withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(2)))
        table.write_partitions(df, "bucket", [0, 1])
        victim = [r["url"] for r in table.read(spark).limit(1).collect()]
        keys = spark.createDataFrame([(u,) for u in victim], "url string")
        table.delete_keys(spark, keys, "url", scope="past")
        table.create_branch("exp")
        # append the SAME url on the branch: past-scoped delete must not hide it
        re_add = (
            pages(spark, 400)
            .filter(F.col("url").isin(victim))
            .withColumn("bucket", F.lit(5).cast("long"))
        )
        table.write_partitions(re_add, "bucket", [5], branch="exp")
        br = table.read(spark, ref="exp")
        assert br.filter(F.col("url").isin(victim) & (F.col("bucket") == 5)).count() == 1
        assert br.filter(F.col("url").isin(victim) & (F.col("bucket") != 5)).count() == 0
        # publish and re-check on main
        table.fast_forward("exp")
        m = table.read(spark)
        assert m.filter(F.col("url").isin(victim) & (F.col("bucket") == 5)).count() == 1
        assert m.filter(F.col("url").isin(victim) & (F.col("bucket") != 5)).count() == 0

    def test_drop_and_expire_cleans_branch(self, spark, table):
        seeded(spark, table)
        table.create_branch("exp")
        table.write_partitions(
            pages(spark, 300, seed=7000).withColumn("bucket", F.lit(7).cast("long")),
            "bucket", [7], branch="exp",
        )
        branch_dir = table._branch_manifest("exp", 2)["partitions"]["7"]["path"]
        assert os.path.isdir(os.path.join(table.path, branch_dir))
        table.drop_ref("exp")
        out = table.expire_snapshots(keep_last=1)
        assert any(str(e).startswith("exp-") for e in out["expired_snapshots"])
        assert not os.path.exists(table._branch_manifest_path("exp", 1))
        assert not os.path.isdir(os.path.join(table.path, branch_dir))
        # main data intact
        assert table.read(spark).count() == 800
        # the name is reusable after cleanup
        table.create_branch("exp")
        assert table.refs()["exp"]["type"] == "branch"

    def test_live_branch_data_survives_expiry(self, spark, table):
        seeded(spark, table)
        table.create_branch("exp")
        table.write_partitions(
            pages(spark, 300, seed=7000).withColumn("bucket", F.lit(7).cast("long")),
            "bucket", [7], branch="exp",
        )
        table.write_partitions(
            pages(spark, 100, seed=9000).withColumn("bucket", F.lit(9).cast("long")),
            "bucket", [9],
        )
        table.expire_snapshots(keep_last=1)
        assert table.read(spark, ref="exp").count() == 1100

    def test_sql_view_over_ref(self, spark, table):
        """The SQL surface speaks refs: a view over a branch head lets an
        analyst audit staged data before fast_forward publishes it."""
        seeded(spark, table)
        table.create_branch("exp")
        table.write_partitions(
            pages(spark, 300, seed=7000).withColumn("bucket", F.lit(7).cast("long")),
            "bucket", [7], branch="exp",
        )
        table.create_or_replace_view(spark, "tbl_main")
        table.create_or_replace_view(spark, "tbl_exp", ref="exp")
        n_main = spark.sql("SELECT count(*) AS n FROM tbl_main").collect()[0]["n"]
        n_exp = spark.sql("SELECT count(*) AS n FROM tbl_exp").collect()[0]["n"]
        assert (n_main, n_exp) == (800, 1100)

    def test_refs_listing(self, spark, table):
        seeded(spark, table)
        table.create_tag("v1")
        table.create_branch("exp")
        refs = table.refs()
        assert refs["v1"]["type"] == "tag" and refs["exp"]["type"] == "branch"
        assert refs["exp"]["fork_sid"] == refs["v1"]["snapshot_id"]
