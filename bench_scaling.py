#!/usr/bin/env python
"""Scaling-efficiency evidence: the same construction job at two
parallelism levels (sandbox proxy for N vs 4N executors).

Methodology (tuned for a noisy shared host — see BENCH/BASELINE.md):

* **Fresh JVM per timed run** (subprocess), matching the per-job
  ``spark-submit`` production shape and preventing within-JVM state
  (codegen classes, shuffle files, GC growth) from bleeding across runs.
* **Interleaved levels** — runs alternate N, 4N, N, 4N … so slow host
  windows hit both levels equally instead of biasing one phase.
* **min-of-K** per level is the headline (the minimum estimates the
  uncontended wall; medians are reported alongside). This host shows
  multi-minute throttle windows (identical runs: 45 s … 683 s), so a
  median over few runs measures the hypervisor, not the code.
* Input parquet and all Spark scratch live on tmpfs (/dev/shm): one
  machine shares one disk across "clusters", which a real N-vs-4N
  cluster would not — IO must not be the variable.
* Identical input, shuffle partitioning and code at both levels; only
  the core count changes.

Usage: python bench_scaling.py [rows] [pairs] [N] [4N]
(defaults 500_000, 4, 2, 8)

Why N=2 / 4N=8: both well under the 32 hardware threads, so each level
gets dedicated cores and the 4x core ratio is real.

Writes BENCH/scaling_{N}_{4N}.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, shutil, sys, time, tempfile
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/og_spark_local"
os.makedirs("/dev/shm/og_spark_local", exist_ok=True)
from bench import build_spark
from ontograph_spark.pipeline.construct import construct_kg
from ontograph_spark.pipeline.materialize import salted_repartition

cpus, src = int(sys.argv[1]), sys.argv[2]
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
files = spark.read.parquet(src)

def one(frac=None):
    inp = files.sample(frac, seed=7) if frac else files
    out = tempfile.mkdtemp(prefix="og_scale_out_", dir="/dev/shm")
    t0 = time.time()
    quads = construct_kg(spark, inp)
    salted_repartition(quads, spark.sparkContext.defaultParallelism).write.mode(
        "overwrite").parquet(out)
    wall = time.time() - t0
    n = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    return wall, n

one(0.1)  # warmup: codegen compile, python worker spin-up (untimed)
spark.catalog.clearCache()
wall, triples = one()  # ONE timed run per JVM
spark.stop()
print(json.dumps({"wall": wall, "triples": triples}))
"""


def run_once(cpus: int, src: str) -> tuple[float, int, float]:
    load0 = os.getloadavg()[0]  # host background load when the run starts
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), src],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:])
        sys.exit(1)
    r = json.loads(p.stdout.strip().splitlines()[-1])
    return r["wall"], r["triples"], round(load0, 1)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    src = tempfile.mkdtemp(prefix="og_scale_src_", dir="/dev/shm")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys\n"
            "from bench import build_spark\n"
            "from ontograph_spark.pipeline.repo_source import synthesize_repo_table\n"
            "spark = build_spark(32)\n"
            f"synthesize_repo_table(spark, {rows}, partitions=128).write.mode('overwrite').parquet('{src}')\n"
            "spark.stop()\n",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        sys.exit(1)

    # accumulate across invocations: same rows + levels → prior walls merge
    # in (more samples = better min-of-K on a noisy host)
    out_path = f"BENCH/scaling_{n_lo}_{n_hi}.json"
    walls: dict[int, list[float]] = {n_lo: [], n_hi: []}
    loads: dict[int, list[float]] = {n_lo: [], n_hi: []}
    if os.path.exists(out_path):
        try:
            prior = json.load(open(out_path))
            if prior.get("rows") == rows and prior.get("levels") == [n_lo, n_hi]:
                for cpus in (n_lo, n_hi):
                    lv = prior["results"][f"local[{cpus}]"]
                    walls[cpus] = list(lv.get("walls_sec", []))
                    loads[cpus] = list(lv.get("loadavg_at_start", []))
        except Exception:
            pass
    triples = 0
    try:
        for _ in range(pairs):
            for cpus in (n_lo, n_hi):
                wall, triples, load0 = run_once(cpus, src)
                walls[cpus].append(round(wall, 1))
                loads[cpus].append(load0)
    finally:
        shutil.rmtree(src, ignore_errors=True)

    def level(cpus: int) -> dict:
        w = walls[cpus]
        return {
            "walls_sec": w,
            "loadavg_at_start": loads[cpus],
            "min_sec": round(min(w), 1),
            "median_sec": round(statistics.median(w), 1),
            "triples": triples,
            "triples_per_sec_at_min": round(triples / min(w), 1),
        }

    results = {f"local[{n_lo}]": level(n_lo), f"local[{n_hi}]": level(n_hi)}
    factor = n_hi / n_lo
    out = {
        "rows": rows,
        "pairs": pairs,
        "levels": [n_lo, n_hi],
        "methodology": "fresh JVM per run, interleaved levels, min-of-K "
        "(noisy-host de-noising; medians alongside), tmpfs IO",
        "results": results,
        "efficiency_min": round(
            (min(walls[n_lo]) / min(walls[n_hi])) / factor, 3
        ),
        "efficiency_median": round(
            (statistics.median(walls[n_lo]) / statistics.median(walls[n_hi]))
            / factor,
            3,
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
