#!/usr/bin/env python
"""Scaling-efficiency evidence: the same construction job at two
parallelism levels (sandbox proxy for N vs 4N executors).

Runs KG construction over an identical on-disk input at ``local[8]`` and
``local[32]`` in fresh JVMs (subprocesses), several timed runs each, and
reports medians plus efficiency = (T_8 / T_32) / 4. Input, shuffle
partitioning rule and code are identical across levels; only the core
count changes.

Usage: python bench_scaling.py [rows] [runs]   (defaults 1_000_000, 3)
Writes BENCH/scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, sys, time, tempfile
from bench import build_spark
from ontograph_spark.pipeline.construct import construct_kg
from ontograph_spark.pipeline.materialize import salted_repartition

cpus, src, runs = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = build_spark(cpus)
files = spark.read.parquet(src)

def one(frac=None):
    inp = files.sample(frac, seed=7) if frac else files
    out = tempfile.mkdtemp(prefix="og_scale_out_")
    t0 = time.time()
    quads = construct_kg(spark, inp)
    salted_repartition(quads, spark.sparkContext.defaultParallelism).write.mode(
        "overwrite").parquet(out)
    wall = time.time() - t0
    return wall, spark.read.parquet(out).count()

one(0.2)  # warmup: JIT/codegen compile, python worker spin-up (untimed)
walls, triples = [], 0
for _ in range(runs):
    # construct_kg persists intermediates; identical logical plans would
    # otherwise hit the previous run's cache and time nothing
    spark.catalog.clearCache()
    wall, triples = one()
    walls.append(wall)
spark.stop()
print(json.dumps({"walls": walls, "triples": triples}))
"""


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    src = tempfile.mkdtemp(prefix="og_scale_src_")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys\n"
            "from bench import build_spark\n"
            "from ontograph_spark.pipeline.repo_source import synthesize_repo_table\n"
            "spark = build_spark(32)\n"
            f"synthesize_repo_table(spark, {rows}).write.mode('overwrite').parquet('{src}')\n"
            "spark.stop()\n",
        ],
        capture_output=True,
        text=True,
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        sys.exit(1)

    results: dict[str, dict] = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, "-c", RUNNER, str(cpus), src, str(runs)],
            capture_output=True,
            text=True,
        )
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-2000:])
            sys.exit(1)
        r = json.loads(p.stdout.strip().splitlines()[-1])
        walls, triples = r["walls"], r["triples"]
        med = statistics.median(walls)
        results[f"local[{cpus}]"] = {
            "walls_sec": [round(w, 1) for w in walls],
            "median_sec": round(med, 1),
            "triples": triples,
            "triples_per_sec": round(triples / med, 1),
        }

    t8 = results["local[8]"]["median_sec"]
    t32 = results["local[32]"]["median_sec"]
    out = {
        "rows": rows,
        "runs": runs,
        "results": results,
        "efficiency_8_to_32": round((t8 / t32) / 4, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
