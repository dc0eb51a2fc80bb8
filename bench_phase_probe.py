#!/usr/bin/env python
"""Per-phase scaling probe: times each construction phase separately at
two parallelism levels (fresh JVM per level) to locate the phase that
fails to scale. Diagnostic tool behind bench_scaling.py — not part of
the recorded bench.

Usage: python bench_phase_probe.py [rows] [n_lo] [n_hi] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, shutil, sys, time, tempfile
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/og_spark_local"
os.makedirs("/dev/shm/og_spark_local", exist_ok=True)
from bench import build_spark
from pyspark import StorageLevel
from pyspark.sql import functions as F
from ontograph_spark.pipeline.construct import construct_kg, ingest, DEFAULT_GRAPH
from ontograph_spark.pipeline.extract import extract_mentions
from ontograph_spark.pipeline.link import link_imports, module_dictionary, same_as_pairs
from ontograph_spark.pipeline.materialize import salted_repartition

cpus, src = int(sys.argv[1]), sys.argv[2]
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
files = spark.read.parquet(src)

def t(f):
    t0 = time.time(); f(); return round(time.time() - t0, 1)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

phases = {}
# warmup on a slice: codegen + python workers
construct_kg(spark, files.sample(0.05, seed=7)).write.format("noop").mode("overwrite").save()

ingested = ingest(files, DEFAULT_GRAPH)
phases["read_sha"] = t(lambda: noop(ingested.select("repo", "path", "sha256")))
mentions = extract_mentions(ingested)
phases["extract"] = t(lambda: noop(mentions))
mentions_d = mentions.dropDuplicates(["repo", "path", "kind", "name"]).persist(StorageLevel.DISK_ONLY)
linked = link_imports(mentions_d, module_dictionary(spark))
phases["dedup_link"] = t(lambda: noop(linked))
out = tempfile.mkdtemp(prefix="og_probe_out_", dir="/dev/shm")
phases["full_construct_write"] = t(lambda: salted_repartition(
    construct_kg(spark, files), spark.sparkContext.defaultParallelism
).write.mode("overwrite").parquet(out))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
print(json.dumps({"cpus": cpus, "phases": phases}))
"""


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    src = tempfile.mkdtemp(prefix="og_probe_src_", dir="/dev/shm")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            "from bench import build_spark\n"
            "from ontograph_spark.pipeline.repo_source import synthesize_repo_table\n"
            "spark = build_spark(32)\n"
            f"synthesize_repo_table(spark, {rows}, partitions=128)"
            f".write.mode('overwrite').parquet('{src}')\n"
            "spark.stop()\n",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        sys.exit(1)

    try:
        for _ in range(reps):
            for cpus in (n_lo, n_hi):
                p = subprocess.run(
                    [sys.executable, "-c", RUNNER, str(cpus), src],
                    capture_output=True,
                    text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                if p.returncode != 0:
                    sys.stderr.write(p.stderr[-2000:])
                    sys.exit(1)
                print(p.stdout.strip().splitlines()[-1], flush=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
