"""Dump .explain('formatted') for a set of registered queries to files —
the r8 plan evidence (plans/r08/<query>_{before,after}.txt).

Usage: python tools/dump_explains.py <repo_root> <out_dir> <suffix> [sf_dir]

For queries whose registered form materializes eagerly behind a
localCheckpoint (the LSH dedup family), the file also contains the
PRE-CHECKPOINT pair-generation plan obtained from the operator directly,
since the registered DataFrame's own plan is just a scan of the
checkpointed result.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
SF = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"

sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

QUERIES = [
    "simhash_dups",
    "minhash_lsh_dups",
    "dup_clusters",
    "curation_keep_list",
    "decontam_eval_overlap",
    "media_phash_dups",
    "ann_self_topk_embeddings",
    "embedding_cosine_dups_lsh",
    "cosine_topk_embeddings",
    "ann_ivf_embeddings",
    "ann_pq_embeddings",
    "ann_lsh_embeddings",
    "knn_docs",
    "knn_join_docs",
    "zonal_raster_box_stats",
    "raster_focal_mean",
    "tile_algebra_en_share",
    "pip_zone_counts",
    "pip_large_zone_counts",
    "doc_bm25_search",
    "doc_langid_by_source",
    "doc_gopher_quality",
    "lang_source_setops",
    "events_window_interval_join",
    "q1_pricing_summary",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from erased_cells_spark.queries import SPARK_QUERIES, t

    os.makedirs(OUT, exist_ok=True)

    def explain_str(df) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # pre-checkpoint operator plans for the eagerly-materializing queries
    def pre_plans(name):
        from pyspark.sql import functions as F

        from erased_cells_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
        from erased_cells_spark.operators.similarity import (
            ann_lsh_self_topk,
            cosine_dup_pairs_lsh,
        )

        docs = t(spark, SF, "documents")
        emb = t(spark, SF, "embeddings")
        if name in ("minhash_lsh_dups", "dup_clusters", "curation_keep_list"):
            return minhash_lsh_pairs(docs, 0.2)
        if name == "simhash_dups":
            return simhash_pairs(docs, max_hamming=3)
        if name == "embedding_cosine_dups_lsh":
            return cosine_dup_pairs_lsh(emb, 0.4)
        if name == "ann_self_topk_embeddings":
            return ann_lsh_self_topk(emb, k=5)
        return None

    for name in QUERIES:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            continue
        path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
        try:
            txt = explain_str(fn(spark, SF))
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building {name}: {e}\n"
        extra = ""
        try:
            pre = pre_plans(name)
            if pre is not None:
                extra = (
                    "\n\n=== PRE-CHECKPOINT OPERATOR PLAN (pair generation, "
                    "before eager materialization) ===\n" + explain_str(pre)
                )
        except Exception as e:  # noqa: BLE001
            extra = f"\n\n(pre-checkpoint plan unavailable: {e})\n"
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), {SUFFIX} (sf={SF})\n\n")
            f.write(txt)
            f.write(extra)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
