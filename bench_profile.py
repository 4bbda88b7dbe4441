"""One-run scaling profiler: execute the fused bench pipeline once at the
given core count with the UI REST API on, then dump per-stage wall/CPU/GC/
shuffle metrics. Diffing two core counts pins WHERE the 4->16 scaling loss
lives: CPU-time inflation (contention: memcg/GC/locks) vs scheduling gaps
(stragglers, undersplit stages).

Usage:
  taskset -c 0-3  python bench_profile.py 4  16000000
  taskset -c 0-15 python bench_profile.py 16 16000000
Prints one JSON line: {"cores": C, "n": N, "wall": s, "stages": [...],
"totals": {...}}.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from webscraping_spark.session import get_spark

    import bench

    spark = get_spark(app_name=f"profile{cores}", cores=cores,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4099"})
    # warmup (quarter size) then one measured run
    bench._build_pipeline(spark, max(n // 4, 10_000), None).write.format(
        "noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.time()
    bench._build_pipeline(spark, n, None).write.format("noop").mode(
        "overwrite").save()
    wall = time.time() - t0

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    job_of_stage = {}
    for j in jobs:
        for sid in j.get("stageIds", []):
            job_of_stage[sid] = (j["jobId"], j["name"].split("\n")[0][:60])
    rows = []
    tot = {"task_ms": 0, "cpu_ms": 0, "gc_ms": 0, "shuffle_r_mb": 0.0,
           "shuffle_w_mb": 0.0, "input_mb": 0.0}
    for s in stages:
        r = {
            "id": s["stageId"],
            "job": job_of_stage.get(s["stageId"]),
            "attempt": s["attemptId"],
            "name": s["name"].split("\n")[0][:70],
            "tasks": s["numCompleteTasks"],
            "task_ms": s.get("executorRunTime", 0),
            "cpu_ms": int(s.get("executorCpuTime", 0) / 1e6),
            "gc_ms": s.get("jvmGcTime", 0),
            "sched_delay_ms": s.get("schedulerDelay", 0),
            "shuffle_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
            "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "submitted": s.get("submissionTime"),
            "completed": s.get("completionTime"),
        }
        rows.append(r)
        tot["task_ms"] += r["task_ms"]
        tot["cpu_ms"] += r["cpu_ms"]
        tot["gc_ms"] += r["gc_ms"]
        tot["shuffle_r_mb"] += r["shuffle_r_mb"]
        tot["shuffle_w_mb"] += r["shuffle_w_mb"]
        tot["input_mb"] += r["input_mb"]
    rows.sort(key=lambda r: -r["task_ms"])
    print(json.dumps({"cores": cores, "n": n, "wall": round(wall, 1),
                      "totals": tot, "stages": rows[:24]}))
    spark.stop()


if __name__ == "__main__":
    main()
