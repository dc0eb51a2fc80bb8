#!/usr/bin/env python
"""Decompose WHERE the construction job's CPU-seconds go at a given
parallelism level — the steal-gated harness showed the identical 8M-row
job burning 706 cpu-s at local[2] but 1213 cpu-s at local[8] (1.72x
work inflation with ~77% core utilization at BOTH levels), which is the
entire 0.60-vs-1.0 efficiency gap. This probe answers: is the extra CPU
(a) JVM task compute (memory-bandwidth / cache contention), (b) GC,
or (c) python workers?

Sources:
- Spark status API (UI enabled for this probe only): per-stage
  executorRunTime, executorCpuTime (ns), jvmGcTime over all stages.
- /proc process tree split java vs pyspark.daemon workers, sampled at
  job end (utime+stime per process).

Usage: taskset -c 0-7 python bench_cpu_diag.py <cpus> <rows> [src_dir]
(src_dir: reuse a pre-generated repo-table parquet dir instead of
synthesizing inside the pinned JVM). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

_scratch = tempfile.mkdtemp(prefix="og_diag_", dir="/dev/shm")
os.environ["SPARK_LOCAL_DIRS"] = _scratch

from pyspark.sql import SparkSession  # noqa: E402


def proc_split():
    """cpu-seconds of descendant processes, split java vs python."""
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    info = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        pid = int(d)
        try:
            with open(f"/proc/{pid}/stat") as f:
                s = f.read()
            with open(f"/proc/{pid}/cmdline") as f:
                cmd = f.read().replace("\0", " ")
        except OSError:
            continue
        rest = s[s.rindex(")") + 2 :].split()
        info[pid] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / hz, cmd)

    def is_desc(pid):
        seen = 0
        while pid > 1 and seen < 64:
            if pid == me:
                return True
            pid = info.get(pid, (0,))[0]
            seen += 1
        return pid == me

    out = {"java": 0.0, "pydaemon": 0.0, "self": 0.0, "other": 0.0}
    for pid, (_, cpu, cmd) in info.items():
        if not is_desc(pid):
            continue
        if pid == me:
            out["self"] += cpu
        elif "java" in cmd.split(" ", 1)[0]:
            out["java"] += cpu
        elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            out["pydaemon"] += cpu
        else:
            out["other"] += cpu
    return out


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cpu-diag")
        .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ontograph_spark.pipeline.construct import construct_kg
    from ontograph_spark.pipeline.materialize import salted_repartition
    from ontograph_spark.pipeline.repo_source import synthesize_repo_table

    if len(sys.argv) > 3:
        src, own_src = sys.argv[3], False
    else:
        src, own_src = tempfile.mkdtemp(prefix="og_diag_src_", dir="/dev/shm"), True
        synthesize_repo_table(spark, rows, partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
    files = spark.read.parquet(src)

    def one(frac=None):
        inp = files.sample(frac, seed=7) if frac else files
        out = tempfile.mkdtemp(prefix="og_diag_out_", dir="/dev/shm")
        t0 = time.time()
        quads = construct_kg(spark, inp)
        salted_repartition(quads, spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(out)
        wall = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)
        return wall

    one(0.05)  # warmup (codegen, python worker spin-up)
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}/stages"

    def stage_totals():
        with urllib.request.urlopen(base) as r:
            stages = json.load(r)
        tot = {"run_ms": 0, "cpu_ms": 0, "gc_ms": 0, "tasks": 0, "stages": 0}
        per = []
        for st in stages:
            if st.get("status") != "COMPLETE":
                continue
            tot["stages"] += 1
            tot["tasks"] += st.get("numCompleteTasks", 0)
            tot["run_ms"] += st.get("executorRunTime", 0)
            tot["cpu_ms"] += st.get("executorCpuTime", 0) / 1e6  # ns -> ms
            tot["gc_ms"] += st.get("jvmGcTime", 0)
            per.append(
                {
                    "id": st["stageId"],
                    "name": st.get("name", "")[:60],
                    "tasks": st.get("numCompleteTasks", 0),
                    "cpu_s": round(st.get("executorCpuTime", 0) / 1e9, 1),
                    "run_s": round(st.get("executorRunTime", 0) / 1e3, 1),
                    "in_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                    "sh_r_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                    "sh_w_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "spill_mb": round(st.get("diskBytesSpilled", 0) / 1e6, 1),
                }
            )
        return tot, per

    before_stages, before_per = stage_totals()
    before_proc = proc_split()
    wall = one()
    after_stages, after_per = stage_totals()
    after_proc = proc_split()

    seen = {p["id"] for p in before_per}
    for p in after_per:
        if p["id"] not in seen:
            sys.stderr.write(json.dumps(p) + "\n")
    d_stages = {k: round(after_stages[k] - before_stages[k], 1) for k in before_stages}
    d_proc = {k: round(after_proc[k] - before_proc[k], 1) for k in before_proc}
    print(
        json.dumps(
            {
                "cpus": cpus,
                "rows": rows,
                "wall_s": round(wall, 1),
                # per-task metrics summed over the timed job's stages
                "task_run_s": round(d_stages["run_ms"] / 1e3, 1),
                "task_cpu_s": round(d_stages["cpu_ms"] / 1e3, 1),
                "task_gc_s": round(d_stages["gc_ms"] / 1e3, 1),
                "tasks": d_stages["tasks"],
                "stages": d_stages["stages"],
                # process-tree split (java includes GC+JIT+netty; pydaemon =
                # Arrow workers)
                "proc": d_proc,
            }
        )
    )
    spark.stop()
    if own_src:
        shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(_scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
