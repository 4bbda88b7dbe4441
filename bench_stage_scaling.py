"""Orchestrate bench_stages_iso.py at local[4] and local[16] (pinned,
spark-submit --py-files) and reduce to the stage-granular scaling table
(VERDICT r3 Next #1): per isolated stage —

    eff_raw   = t_4 / (4 * t_16)
    ceiling   = cpu_4 / cpu_16      (executor CPU-time inflation: on this
                                     single box memory stalls are charged
                                     to CPU time, so same-work CPU growth
                                     at 16 concurrent cores IS the
                                     DRAM-contention share)
    eff_rel   = eff_raw / ceiling

Appends one JSON line per level to BENCH/$SPARK_GRAFT_SCALING_OUT
(default stage_scaling_r5.jsonl) plus a summary line, and prints the
summary.

Usage: python bench_stage_scaling.py [--n ROWS] [--cores-small 4]
       [--cores-large 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run_iso(cores: int, n: int, pyfiles: str) -> dict:
    env = os.environ.copy()
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_GRAFT_BENCH_N"] = str(n)
    env.setdefault("PYTHONMALLOC", "malloc")
    env.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    env.setdefault("MALLOC_MMAP_MAX_", "0")
    env.setdefault("MALLOC_ARENA_MAX", "2")
    pin = (
        ["taskset", "-c", f"0-{cores - 1}"]
        if shutil.which("taskset") and cores <= (os.cpu_count() or 1)
        else []
    )
    spark_submit = shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if os.path.exists("/opt/spark/bin/spark-submit")
        else None
    )
    script = os.path.join(REPO, "bench_stages_iso.py")
    if spark_submit:
        cmd = pin + [
            spark_submit,
            "--master",
            f"local[{cores}]",
            "--driver-memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "--driver-java-options",
            "-XX:-DontCompileHugeMethods",
            "--py-files",
            pyfiles,
            script,
        ]
    else:
        cmd = pin + [sys.executable, script]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"stages"' in line:
            return json.loads(line)
    raise RuntimeError(
        f"stages_iso at local[{cores}] produced no result.\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64_000_000)
    ap.add_argument("--cores-small", type=int, default=4)
    ap.add_argument("--cores-large", type=int, default=16)
    args = ap.parse_args()

    from bench_scaling import build_pyfiles_zip

    pyfiles = build_pyfiles_zip()
    # large level FIRST: it materializes the shared stage-input tables at
    # 16 cores instead of 4
    large = run_iso(args.cores_large, args.n, pyfiles)
    small = run_iso(args.cores_small, args.n, pyfiles)

    ratio = args.cores_large / args.cores_small
    table = {}
    for name in large["stages"]:
        s, l = small["stages"][name], large["stages"][name]
        eff_raw = s["sec"] / (ratio * l["sec"]) if l["sec"] else 0.0
        ceiling = (s["cpu_sec"] / l["cpu_sec"]) if l["cpu_sec"] else 0.0
        table[name] = {
            "t_small": s["sec"],
            "t_large": l["sec"],
            "eff_raw": round(eff_raw, 3),
            "cpu_small": s["cpu_sec"],
            "cpu_large": l["cpu_sec"],
            "cpu_inflation": round(l["cpu_sec"] / s["cpu_sec"], 3)
            if s["cpu_sec"]
            else 0.0,
            "ceiling": round(ceiling, 3),
            "eff_rel": round(eff_raw / ceiling, 3) if ceiling else 0.0,
        }
    fused_eff = (
        small["fused_sec"] / (ratio * large["fused_sec"])
        if large.get("fused_sec")
        else 0.0
    )
    summary = {
        "metric": "stage_scaling_profile",
        "n": args.n,
        "pair": [args.cores_small, args.cores_large],
        "stages": table,
        "fused_small_sec": round(small.get("fused_sec", 0.0), 3),
        "fused_large_sec": round(large.get("fused_sec", 0.0), 3),
        "fused_eff_raw": round(fused_eff, 3),
        "urls_per_sec_small": small.get("urls_per_sec"),
        "urls_per_sec_large": large.get("urls_per_sec"),
    }
    out = os.path.join(
        REPO, "BENCH", os.environ.get("SPARK_GRAFT_SCALING_OUT", "stage_scaling_r5.jsonl")
    )
    with open(out, "a") as fh:
        fh.write(json.dumps({"level": "small", **small}) + "\n")
        fh.write(json.dumps({"level": "large", **large}) + "\n")
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
