"""spark-submit entry point for the END-TO-END training-data curation run.

Usage (full run over a parquet documents table):
    ./jobs/submit.sh jobs/run_curation.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated_snapshot [--eval-source src0] [--buckets 8]

Usage (INCREMENTAL over a snapshot-table source, r6):
    ./jobs/submit.sh jobs/run_curation.py --src-table /path/to/docs_snapshot \
        --out /tmp/curated_snapshot
    # first run curates the full table and records the source snapshot id;
    # every later run consumes src.changes(last_sid) — only the appended
    # docs are curated (partition-diff pruned, zero re-scan of old
    # batches), and source DELETIONS propagate to the keep list as
    # merge-on-read delete_keys (a takedown in the corpus takes the doc
    # out of the derived keep list without rewriting it).

The keep-list pipeline over a documents table, committed to an
Iceberg-style snapshot table with per-partition lineage + metrics:

  1. language filter (lang_id == en)  ∧  quality floor  ∧  the STRUCTURAL
     C4/Gopher rules (symbol-to-word ratio, bullet/ellipsis line
     fractions, duplicate-line fraction)  ∧  deterministic md5 hash
     downsample — all scan-side per-row JVM predicates, zero shuffle;
  2. Gopher REPETITION rules (word-count bounds, duplicate-word fraction,
     top-word share, mean word length) — one explode + two combinable
     aggregations, semi-join back;
  3. eval-set DECONTAMINATION: docs sharing a 13-gram with the --eval-source
     slice are dropped (the benchmark-leak guard);
  4. MinHash-LSH near-dup clustering over the survivors (hot-bucket
     guarded); non-canonical cluster members dropped. In incremental mode
     the LSH clusters WITHIN the new batch and exact-dedups against the
     existing keep list by doc_id; cross-batch NEAR-dup recall is the
     streaming guard's / periodic-full-recluster's job (the per-dump
     dedup convention of crawl pipelines — documented, not silent);
  5. keep list written to the snapshot sink (resumable: re-running with the
     same --out skips committed lineage partitions), with per-stage drop
     counts reported as job metrics.

Re-run with the same --out to verify resume (all partitions 'skipped').
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_FILE = "curation_state.json"


def curate(
    docs: DataFrame,
    ev: DataFrame,
    sample_pct: int = 60,
    quality_floor: float = 0.35,
) -> tuple[DataFrame, dict]:
    """The shared curation pipeline: docs (doc_id, text, ...) → keep-list
    doc_ids + per-stage counts. Used by both the full and the incremental
    paths so the filter semantics can never drift between them."""
    from erased_cells_spark.functions import text as T
    from erased_cells_spark.operators.components import connected_components
    from erased_cells_spark.operators.decontam import ngram_overlap_flags
    from erased_cells_spark.operators.dedup import minhash_lsh_pairs

    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    structural_ok = (
        (T.symbol_count(F.col("text")) / T.token_count(F.col("text")) < 0.1)
        & (T.bullet_line_frac(F.col("text")) <= 0.9)
        & (T.ellipsis_line_frac(F.col("text")) <= 0.3)
        & (T.dup_line_frac(F.col("text")) < 0.3)
    )
    scan_pass = (
        docs.filter(
            (T.lang_id(F.col("text")) == "en")
            & (T.quality_score(F.col("text")) >= quality_floor)
            & structural_ok
            & (h < sample_pct)
        )
        .select("doc_id", "text")
        .cache()
    )
    n_filtered = scan_pass.count()

    words = scan_pass.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    per = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_c"),
        (
            F.sum(F.length("w") * F.col("c")).cast("double") / F.sum("c").cast("double")
        ).alias("mean_wlen"),
    )
    rep_ok = per.filter(
        (F.col("n_words") >= 20)
        & (1.0 - F.col("n_distinct").cast("double") / F.col("n_words").cast("double") < 0.55)
        & (F.col("max_c").cast("double") / F.col("n_words").cast("double") < 0.10)
        & (F.col("mean_wlen") >= 3.0)
        & (F.col("mean_wlen") <= 8.0)
    ).select("doc_id")
    survivors = scan_pass.join(rep_ok, "doc_id", "semi").cache()
    n_gopher = survivors.count()

    flags = ngram_overlap_flags(survivors, ev, n=13).withColumnRenamed("train_id", "doc_id")
    clean = survivors.join(flags, "doc_id", "left_anti").cache()
    n_clean = clean.count()

    caches: list = []
    pairs = minhash_lsh_pairs(clean, 0.2, caches=caches)
    cc = connected_components(pairs, "id_a", "id_b")
    for c in caches:
        c.unpersist()
    drops = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    keep = clean.join(drops, "doc_id", "left_anti").select("doc_id").cache()
    n_keep = keep.count()
    scan_pass.unpersist()
    survivors.unpersist()
    clean.unpersist()
    counts = {
        "after_lang_quality_structural_sample": n_filtered,
        "after_gopher_repetition": n_gopher,
        "after_decontam": n_clean,
        "keep_list": n_keep,
    }
    return keep, counts


def _state_path(out: str) -> str:
    return os.path.join(out, STATE_FILE)


def _read_state(out: str) -> dict | None:
    p = _state_path(out)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_state(out: str, state: dict) -> None:
    tmp = _state_path(out) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _state_path(out))


def run_incremental(
    spark: SparkSession,
    src_table_path: str,
    out: str,
    eval_source: str = "src0",
    buckets: int = 8,
    sample_pct: int = 60,
    quality_floor: float = 0.35,
) -> dict:
    """Full run on first call; afterwards consume src.changes(last_sid):
    curate only the appended docs (batch-keyed lineage partitions) and
    propagate source deletions as keep-list delete_keys. Returns the job
    metrics dict. Callable from pytest and from spark-submit."""
    from erased_cells_spark.sources.snapshot import SnapshotTable

    src = SnapshotTable(src_table_path)
    table = SnapshotTable(out)
    src_sid = src.metrics()["snapshot_id"]
    state = _read_state(out)

    if state is None:
        docs = src.read(spark)
        ev = docs.filter(F.col("source") == eval_source)
        keep, counts = curate(
            docs.filter(F.col("source") != eval_source), ev, sample_pct, quality_floor
        )
        mode = "full"
        scan_info = None
    else:
        last = state["source_snapshot"]
        if last == src_sid:
            return {"mode": "noop", "source_snapshot": src_sid, **state.get("counts", {})}
        ch = src.changes(spark, last, src_sid)
        scan_info = dict(src.last_changes_scan)
        ev = src.read(spark, snapshot_id=src_sid).filter(F.col("source") == eval_source)
        keep, counts = curate(
            ch["appended"].filter(F.col("source") != eval_source),
            ev,
            sample_pct,
            quality_floor,
        )
        # takedown propagation FIRST: source rows deleted in the window
        # leave the keep list via merge-on-read delete keys (zero rewrites).
        # scope='past' (Iceberg sequence semantics) + delete-before-read
        # ordering make delete+re-append (update) windows correct: the
        # delete hides only the doc's OLD keep-list version; the new
        # version — written below at a higher data-seq — stays visible,
        # and the existing-id anti-join (computed after the delete) no
        # longer sees the old version, so the update is re-written instead
        # of silently vanishing (ADVICE r6).
        gone = ch["deleted"].select("doc_id").distinct()
        n_gone = gone.count()
        counts["source_deletions_propagated"] = n_gone
        if n_gone:
            table.delete_keys(spark, gone, "doc_id", scope="past")
        # exact cross-batch dedup by id: a doc re-crawled into a new batch
        # must not enter the keep list twice
        existing = table.read(spark).select("doc_id")
        keep = keep.join(existing, "doc_id", "left_anti").cache()
        counts["keep_list"] = keep.count()
        mode = "incremental"

    keyed = keep.withColumn(
        "bucket",
        F.concat(
            F.lit(f"b{src_sid}-"), F.pmod(F.col("doc_id"), F.lit(buckets)).cast("string")
        ),
    )
    stats = table.write_partitions(
        keyed, "bucket", [f"b{src_sid}-{i}" for i in range(buckets)]
    )
    keep.unpersist()
    _write_state(out, {"source_snapshot": src_sid, "counts": counts})
    return {
        "mode": mode,
        "source_snapshot": src_sid,
        "snapshot": table.metrics()["snapshot_id"],
        **counts,
        "changes_scan": scan_info,
        "partitions": {k: {x: m[x] for x in ("rows",) if x in m} for k, m in stats.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet (doc_id, source, text)")
    ap.add_argument(
        "--src-table", help="documents SNAPSHOT TABLE dir (enables incremental re-runs)"
    )
    ap.add_argument("--out", required=True, help="snapshot table dir")
    ap.add_argument("--eval-source", default="src0", help="source treated as the eval corpus")
    ap.add_argument("--buckets", type=int, default=8, help="lineage partitions")
    ap.add_argument("--sample-pct", type=int, default=60)
    ap.add_argument("--quality-floor", type=float, default=0.35)
    ap.add_argument(
        "--bloom",
        action="store_true",
        help="build a per-partition doc_id Bloom index on the keep-list "
        "snapshot (point lookups then skip bloom-proven-absent partitions)",
    )
    args = ap.parse_args()
    if bool(args.input) == bool(args.src_table):
        ap.error("exactly one of --input / --src-table is required")

    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.snapshot import SnapshotTable

    spark = apply_scale_conf(SparkSession.builder.appName("erased-cells-curation")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.src_table:
        out = run_incremental(
            spark,
            args.src_table,
            args.out,
            args.eval_source,
            args.buckets,
            args.sample_pct,
            args.quality_floor,
        )
        print(json.dumps(out))
        spark.stop()
        return

    docs = spark.read.parquet(args.input)
    n_total = docs.count()
    ev = docs.filter(F.col("source") == args.eval_source)
    keep, counts = curate(
        docs.filter(F.col("source") != args.eval_source),
        ev,
        args.sample_pct,
        args.quality_floor,
    )
    keyed = keep.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(args.buckets))).cache()

    table = SnapshotTable(args.out)
    stats = table.write_partitions(keyed, "bucket", list(range(args.buckets)))
    bloom_metrics = None
    if args.bloom:
        # point-lookup index: keep-list ids are hash-bucketed (unsorted per
        # partition), so zone maps can't answer "is doc X kept" without
        # opening every partition — the bloom can
        table.build_bloom(spark, "doc_id")
        probe = keyed.select("doc_id").first()
        plan = table.plan_scan(where=[("doc_id", "=", probe.doc_id)]) if probe else None
        bloom_metrics = {
            "indexed": True,
            "probe_partitions_read": len(plan["read"]) if plan else None,
            "partitions_total": plan["partitions_total"] if plan else None,
        }
    keyed.unpersist()
    print(
        json.dumps(
            {
                "snapshot": table.metrics()["snapshot_id"],
                "docs_total": n_total,
                **counts,
                "bloom": bloom_metrics,
                "partitions": stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
