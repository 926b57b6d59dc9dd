"""Per-query profiler: runs one registered query N times in a bench-identical
session with the event log enabled, then prints a per-lap breakdown of
 - driver time building the DataFrame (planning/py4j)
 - per-job wall time (with job descriptions / first stage name)
so optimization targets the real cost, not a guess.

Usage: python tools/profile_query.py <query_name> [laps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build_spark(cpus: int, log_dir: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("erased-cells-profile")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    name = sys.argv[1]
    laps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    log_dir = "/tmp/spark-events"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = build_spark(cpus, log_dir)
    spark.sparkContext.setLogLevel("ERROR")

    from erased_cells_spark.queries import SPARK_QUERIES

    fn = SPARK_QUERIES[name]
    # warmup at sf0.001 (same as bench)
    if os.environ.get("PROFILE_PRELUDE"):
        # reproduce the full-bench session context: warm every headline
        # query at sf0.001, then run the timed queries preceding `name`
        import bench

        for nm in bench.HEADLINE:
            SPARK_QUERIES[nm](spark, "/root/testdata/sf0.001").count()
        for nm in bench.HEADLINE:
            if nm == name:
                break
            for _ in range(3):
                SPARK_QUERIES[nm](spark, sf_dir).count()
    else:
        fn(spark, "/root/testdata/sf0.001").count()

    marks = []
    for lap in range(laps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter()
        n = df.count()
        t_end = time.perf_counter()
        marks.append((lap, t0, t_build, t_end, n))
        print(
            f"lap {lap}: build={t_build - t0:.3f}s count={t_end - t_build:.3f}s "
            f"total={t_end - t0:.3f}s rows={n}",
            file=sys.stderr,
        )
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse event log: job-level breakdown (Spark 4 rolls logs into a dir)
    log_path = os.path.join(log_dir, app_id)
    if not os.path.exists(log_path):
        cand = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        if os.path.isdir(cand):
            parts = [p for p in os.listdir(cand) if p.startswith("events_")]
            log_path = os.path.join(cand, sorted(parts)[0])
        else:
            log_path = cand
    jobs = {}  # id -> [start_ms, end_ms, desc, n_stages, n_tasks]
    stage_tasks = {}
    task_agg = {}
    if log_path.endswith(".zstd"):
        import zstandard

        fh = zstandard.ZstdDecompressor().stream_reader(open(log_path, "rb"))
        import io

        f_iter = io.TextIOWrapper(fh, encoding="utf-8")
    else:
        f_iter = open(log_path)
    with f_iter as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                call = ev.get("Properties", {}).get("callSite.short", "")
                nstg = len(ev.get("Stage Infos", []))
                ntask = sum(s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", []))
                jobs[jid] = [ev["Submission Time"], None, desc or call, nstg, ntask]
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid][1] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_tasks[si["Stage ID"]] = (
                    si.get("Submission Time", 0),
                    si.get("Completion Time", 0),
                    si.get("Number of Tasks", 0),
                    si.get("Stage Name", ""),
                )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = task_agg.setdefault(sid, [0, 0, 0, 0])
                agg[0] += m.get("Executor Run Time", 0)
                agg[1] += m.get("Executor Deserialize Time", 0)
                agg[2] += m.get("JVM GC Time", 0)
                agg[3] += 1
    t_origin = min(v[0] for v in jobs.values()) if jobs else 0
    print(f"\n=== jobs for {name} (app {app_id}) ===")
    for jid in sorted(jobs):
        st, en, desc, nstg, ntask = jobs[jid]
        dur = (en - st) / 1000.0 if en else float("nan")
        print(
            f"job {jid:>3}  t+{(st - t_origin)/1000.0:8.3f}s  dur={dur:7.3f}s  "
            f"stages={nstg:>2} tasks={ntask:>4}  {desc[:90]}"
        )
    total_job = sum((v[1] - v[0]) / 1000.0 for v in jobs.values() if v[1])
    print(f"total job wall (sum, overlaps ignored): {total_job:.3f}s")
    print("\n=== stages (wall >= 50ms) ===")
    for sid in sorted(stage_tasks):
        st, en, nt, nm = stage_tasks[sid]
        wall = (en - st) / 1000.0 if st and en else 0.0
        if wall < 0.05:
            continue
        run, deser, gc, done = task_agg.get(sid, [0, 0, 0, 0])
        print(
            f"stage {sid:>4} wall={wall:6.3f}s tasks={nt:>4} "
            f"execRun={run/1000.0:7.3f}s deser={deser/1000.0:6.3f}s "
            f"gc={gc/1000.0:5.3f}s  {nm[:80]}"
        )


if __name__ == "__main__":
    main()
