"""Model-based testing of the snapshot mutation machinery: random seeded
sequences of append / merge / delete / rollback / compact run against BOTH
the SnapshotTable and a plain in-memory dict model — after every step the
table's content must equal the model exactly, time travel must reproduce
every recorded historical state, and manifests' row counts must agree.
This is the highest-assurance check for the r4 copy-on-write code: any
silent row loss/duplication in any interleaving shows up as a model
divergence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable

N_BUCKETS = 4
SEEDS = [3, 17, 41]


def to_rows(df):
    return {(r.k, r.bucket, r.val) for r in df.collect()}


def model_df(spark, model: dict):
    rows = [(k, b, v) for k, (b, v) in sorted(model.items())]
    return spark.createDataFrame(rows, "k LONG, bucket LONG, val STRING")


@pytest.mark.parametrize("seed", SEEDS)
def test_random_mutation_sequences_match_model(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    tbl = SnapshotTable(str(tmp_path / f"tbl{seed}"))

    # base state: 60 keys over 4 buckets
    model = {int(k): (int(k) % N_BUCKETS, f"v0-{k}") for k in range(60)}
    tbl.write_partitions(model_df(spark, model), "bucket", list(range(N_BUCKETS)))
    history = {tbl.metrics()["snapshot_id"]: dict(model)}

    for step in range(8):
        op = rng.choice(["merge", "delete", "rollback", "compact"], p=[0.45, 0.25, 0.15, 0.15])
        if op == "merge":
            ks = rng.choice(200, size=rng.integers(1, 8), replace=False)
            upd = {
                int(k): (int(rng.integers(0, N_BUCKETS)), f"v{step}-{k}") for k in ks
            }
            # inserts may only target EXISTING partitions — always true here
            sid = tbl.merge(
                spark,
                model_df(spark, upd),
                key_col="k",
                lineage_col="bucket",
            )
            model.update(upd)
            history[sid] = dict(model)
        elif op == "delete":
            cut = int(rng.integers(0, 200))
            sid_before = tbl.metrics()["snapshot_id"]
            sid = tbl.delete_where(spark, f"k >= {cut}")
            removed = [k for k in model if k >= cut]
            for k in removed:
                del model[k]
            if removed:
                assert sid == sid_before + 1
                history[sid] = dict(model)
            else:
                assert sid == sid_before  # idempotent no-op commits nothing
        elif op == "rollback":
            target = int(rng.choice(sorted(history)))
            sid = tbl.rollback(target)
            model = dict(history[target])
            history[sid] = dict(model)
        else:  # compact
            sid_before = tbl.metrics()["snapshot_id"]
            sid = tbl.compact(spark, max_files_per_partition=1)
            if sid != sid_before:
                history[sid] = dict(model)
        # ---- invariants after EVERY step --------------------------------
        if model:
            got = to_rows(tbl.read(spark))
            want = {(k, b, v) for k, (b, v) in model.items()}
            assert got == want, f"divergence after step {step} ({op})"
            man = tbl.current_manifest()
            assert sum(p["rows"] for p in man["partitions"].values()) == len(model)

    # time travel reproduces every recorded state (compaction may have been
    # followed by GC-free history — all manifests still live)
    for sid, state in history.items():
        if not state:
            continue
        got = to_rows(tbl.read(spark, snapshot_id=sid))
        assert got == {(k, b, v) for k, (b, v) in state.items()}, f"time travel to {sid}"


@pytest.mark.parametrize("seed", [7, 23])
def test_random_zone_prune_predicates_match_full_filter(spark, tmp_path, seed):
    """Random (col, op, value) predicates: the pruned read must equal the
    unpruned read + filter for every draw, and pruning must actually fire
    for selective range predicates on the partition-aligned column."""
    rng = np.random.default_rng(seed)
    tbl = SnapshotTable(str(tmp_path / f"zp{seed}"))
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") / 100).cast("long").alias("bucket"),
        (F.col("id") * 3 % 17).alias("m"),
    )
    tbl.write_partitions(df, "bucket", [0, 1, 2, 3])
    pruned_fired = 0
    for _ in range(12):
        col = str(rng.choice(["k", "m"]))
        op = str(rng.choice(["<", "<=", ">", ">=", "="]))
        val = int(rng.integers(0, 420))
        got = sorted(map(tuple, tbl.read(spark, where=[(col, op, val)]).collect()))
        scan = tbl.last_scan  # BEFORE the comparison read resets it
        if scan["pruned"] or scan["pruned_groups"]:  # either prune level
            pruned_fired += 1
        sql_op = "=" if op == "=" else op
        want = sorted(map(tuple, tbl.read(spark).filter(f"{col} {sql_op} {val}").collect()))
        assert got == want, (col, op, val)
    assert pruned_fired > 0  # the zone maps did real work in the sweep


@pytest.mark.parametrize("seed", [5])
def test_in_predicate_prunes_and_matches_full_filter(spark, tmp_path, seed):
    """r7: the `in` op (list value) — prune iff EVERY listed value is
    provably absent; result equals the unpruned read + IN filter; blooms
    extend the pruning to unsorted keys."""
    rng = np.random.default_rng(seed)
    tbl = SnapshotTable(str(tmp_path / "inp"))
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") / 100).cast("long").alias("bucket"),
        (F.col("id") * 3 % 17).alias("m"),
    )
    tbl.write_partitions(df, "bucket", [0, 1, 2, 3])
    for _ in range(8):
        vals = sorted(int(v) for v in rng.integers(0, 420, size=3))
        got = sorted(map(tuple, tbl.read(spark, where=[("k", "in", vals)]).collect()))
        scan = tbl.last_scan
        want = sorted(
            map(tuple, tbl.read(spark).filter(F.col("k").isin(vals)).collect())
        )
        assert got == want, vals
        # k is partition-aligned: 3 values touch at most 3 partitions
        assert scan["partitions_read"] <= 3
    # values all out of range → every partition prunes, read returns empty
    got = tbl.read(spark, where=[("k", "in", [1000, 2000])]).collect()
    assert got == [] and tbl.last_scan["partitions_read"] == 0
    # bloom path: unsorted key m has no zone-prunable alignment; a bloom
    # on m lets an IN whose values appear nowhere prune everything
    tbl.build_bloom(spark, "m")
    tbl.read(spark, where=[("m", "in", [99, 123])])
    assert tbl.last_scan["partitions_read"] == 0
    got = sorted(map(tuple, tbl.read(spark, where=[("m", "in", [5, 11])]).collect()))
    want = sorted(
        map(tuple, tbl.read(spark).filter(F.col("m").isin([5, 11])).collect())
    )
    assert got == want
    # empty IN list is a caller bug — fail loud
    with pytest.raises(ValueError, match="empty IN"):
        tbl.read(spark, where=[("k", "in", [])])
