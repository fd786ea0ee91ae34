#!/usr/bin/env python
"""Per-stage wall profile of one catalog query (guide §1.1/§7).

Usage: python scripts/profile_query.py <name> [runs]

Runs the query with the Spark event log enabled (UI stays off), then
parses the log into per-stage wall/task-time rows tagged by job group,
so a composite query's cost can be attributed to its internal passes
(candidate join vs CC rounds vs final window, checkpoint jobs, etc.).
Nothing here is used by the bench — it is a diagnosis tool only.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_EVENTLOG", "1")

from garmin_performance_analysis_spark.harness.catalog import CATALOG  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="prof_evlog_")
    from pyspark.sql import SparkSession

    from garmin_performance_analysis_spark import session as sess_mod

    # same session settings as the bench, plus the event log
    builder = sess_mod.get_spark  # ensure module import side effects match
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = log_dir
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # warmup as in bench
    CATALOG["p2_point_lookup"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for i in range(runs):
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"run {i}: {time.perf_counter() - t0:.2f}s", flush=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1)
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        path = path + ".inprogress"
    if not os.path.exists(path):
        # Spark 4 rolling event-log v2 writes a directory per app with
        # events_* part files inside; find it and read those
        v2 = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        if os.path.isdir(v2):
            parts = sorted(
                os.path.join(v2, f)
                for f in os.listdir(v2)
                if f.startswith("events_")
            )
            if not parts:
                raise SystemExit(f"no events_* files in {v2}")
            path = parts
        else:
            raise SystemExit(f"no event log found under {log_dir}")
    if isinstance(path, str):
        path = [path]
    stages = []
    jobs = {}
    def lines():
        for p in path:
            with open(p) as fh:
                yield from fh

    for line in lines():
        try:
            ev = json.loads(line)
        except Exception:  # noqa: BLE001
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub and comp:
                stages.append(
                    {
                        "id": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:90],
                        "wall_ms": comp - sub,
                        "tasks": si.get("Number of Tasks"),
                    }
                )
    stage_to_job = {}
    for jid, j in jobs.items():
        for sid in j["stages"]:
            stage_to_job[sid] = jid
    stages.sort(key=lambda s: -s["wall_ms"])
    total = sum(s["wall_ms"] for s in stages)
    print(f"\n{len(stages)} stages, {len(jobs)} jobs, "
          f"sum stage wall {total/1000:.2f}s (overlapping)")
    for s in stages[:40]:
        print(f"{s['wall_ms']:7d}ms  {s['tasks']:4d}t  job{stage_to_job.get(s['id'], -1):<4} {s['name']}")


if __name__ == "__main__":
    main()
