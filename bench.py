#!/usr/bin/env python
"""Benchmark harness: headline queries + end-to-end KG construction.

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_CONSTRUCT_ROWS  synthetic repo-table rows for the construction
                        bench (default scales with sf: 200k rows/sf)

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "construct": {"rows": N, "triples": N, "wall_sec": s,
                  "triples_per_sec": r}}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession


def build_spark(
    cpus: int, jvm_cpus: int | None = None, aqe: bool = True, ui: bool = False
) -> SparkSession:
    """``jvm_cpus`` caps the JVM's *perceived* processor count
    (-XX:ActiveProcessorCount): GC / JIT / netty pools size to it instead
    of the 32 hardware threads. The scaling harness sets it to the
    parallelism level so a local[N] run behaves like an N-core executor
    container rather than an N-task job with 32-core JVM services.

    ``aqe=False`` swaps the adaptive configs for fixed ``2*cpus`` shuffle
    partitions. AQE's driver-side re-optimization adds a measured
    ~10-20 s of per-query stage barriers (probe: 8-cpu construction wall
    55.0 s with AQE vs 44.1 s without at 2M rows) — negligible against
    hours-long 100 TB jobs, but a fixed serial cost that dominates the
    Amdahl fit on minute-long sandbox proxies, so the scaling-efficiency
    harness turns it off at BOTH levels while the production bench keeps
    it on."""
    builder = SparkSession.builder.master(f"local[{cpus}]")
    if jvm_cpus is not None:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={jvm_cpus}",
        )
    if not aqe:
        return (
            builder.appName("ontograph-spark-bench")
            .config("spark.sql.shuffle.partitions", str(cpus * 2))
            .config("spark.sql.adaptive.enabled", "false")
            .config("spark.sql.files.maxPartitionBytes", "2m")
            .config("spark.sql.files.openCostInBytes", "256k")
            .config("spark.sql.limit.initialNumPartitions", "64")
            .config("spark.sql.session.timeZone", "UTC")
            .config(
                "spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g")
            )
            # ui=True lets harnesses read per-stage executorCpuTime from the
            # status API (the work-conservation instrument); off for benches
            .config("spark.ui.enabled", "true" if ui else "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )
    return (
        builder
        .appName("ontograph-spark-bench")
        # start wide, let AQE coalesce down — an initial value at the slot
        # count leaves heavy shuffles with one monolithic wave
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Bench data is small and compresses hard; default 128m split
        # packing + 64m AQE advisory would run everything on 1-2 tasks and
        # hide per-core scaling. Production datasets have abundant splits,
        # where the defaults are right.
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "256k")
        .config("spark.sql.adaptive.advisoryPartitionSizeInMB", "8")
        # bounded take()s (canonicalization probe) scan all partitions in
        # ONE job instead of the 1, 4, 16... incremental limit retries —
        # each retry is a driver barrier, pure serial time
        .config("spark.sql.limit.initialNumPartitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


#: repetitions per timed unit; the min is reported. The sandbox host
#: carries a 5-7 core background load from other tenants (load avg ≈ 5-7
#: with this JVM idle), which turns random tasks into multi-second
#: stragglers — identical jobs measured 2.2 s and 14.3 s back to back.
#: Min-of-N estimates the uncontended wall, which is the number that
#: scales to a dedicated cluster.
BENCH_REPS = int(os.environ.get("BENCH_REPS", "3"))


def clear_persisted(spark: SparkSession) -> None:
    """Unpersist every cached/localCheckpointed RDD. Operators persist
    intermediates whose lifetime is tied to the returned (lazy) plan, so
    a long benchmarking session accumulates dead caches — measured: the
    last bench query (kg_pipeline_smoke) ran 106.8 s in the polluted
    session vs 28.4 s in a fresh one. Production jobs are one-plan-per
    -session and never see this."""
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.catalog.clearCache()


def _cpu_sample() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — the direct
    signal for 'another tenant took the core while we were timed'."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def bench_queries(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[str, float], dict[str, dict]]:
    """Per-query min-of-N walls PLUS per-query host-noise metadata
    (1-min loadavg at query start; CPU steal share over the query's
    reps) — so a bench artifact showing a 2-3x outlier vs the quiet
    record is self-diagnosing instead of looking like a regression."""
    import __spark_entry__ as entrymod

    out: dict[str, float] = {}
    noise: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        load1 = os.getloadavg()[0]
        s0, t0j = _cpu_sample()
        walls = []
        for _ in range(BENCH_REPS):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # execute fully but keep results off the driver
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        s1, t1j = _cpu_sample()
        out[name] = min(walls)
        noise[name] = {
            "load1": round(load1, 2),
            "steal_pct": round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2),
            "walls": walls,
        }
        clear_persisted(spark)
    return out, noise


def bench_construct(spark: SparkSession, rows: int) -> dict:
    from ontograph_spark.pipeline.construct import construct_kg
    from ontograph_spark.pipeline.materialize import salted_repartition
    from ontograph_spark.pipeline.repo_source import synthesize_repo_table

    import shutil
    import tempfile

    # The input contract is a table on storage (input_hint: Iceberg table
    # of repositories) — synthesize it to parquet untimed, then time the
    # construction reading from storage like production would.
    src = tempfile.mkdtemp(prefix="ontograph_bench_src_")
    synthesize_repo_table(spark, rows).write.mode("overwrite").parquet(src)
    files = spark.read.parquet(src)
    wall, triples, out = None, 0, None
    for _ in range(BENCH_REPS):  # min-of-N (see BENCH_REPS)
        if out is not None:
            shutil.rmtree(out, ignore_errors=True)
        out = tempfile.mkdtemp(prefix="ontograph_bench_out_")
        t0 = time.time()
        quads = construct_kg(spark, files)
        n = spark.sparkContext.defaultParallelism
        salted_repartition(quads, n).write.mode("overwrite").parquet(out)
        w = time.time() - t0
        wall = w if wall is None else min(wall, w)
        triples = spark.read.parquet(out).count()  # metadata-only count
    kg_sparql = bench_kg_sparql(spark, out)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    return {
        "rows": rows,
        "triples": int(triples),
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(triples / wall, 1),
        "kg_sparql": kg_sparql,
    }


def bench_kg_sparql(spark: SparkSession, kg_path: str) -> dict:
    """SPARQL answering at constructed-KG scale: the 3-pattern BGP (the
    documented ~4 s headline) and a GROUP BY aggregation over the same
    join — one hash aggregate over the ~300k-solution BGP, the exact
    plan shape SUM/AVG/MIN/MAX compile to (the full aggregate set runs
    in the suite's sparql_agg entry). Reports wall + result size each."""
    from ontograph_spark.pipeline.construct import DEFAULT_GRAPH
    from ontograph_spark.query import sparql_select

    kg = spark.read.parquet(kg_path)
    bgp = f"""
    PREFIX c: <{DEFAULT_GRAPH}#>
    SELECT ?f ?repo ?label WHERE {{
        ?f c:imports ?m ;
           c:inRepo ?repo .
        ?m rdfs:label ?label .
    }}"""
    agg = f"""
    PREFIX c: <{DEFAULT_GRAPH}#>
    SELECT ?repo (COUNT(?f) AS ?n_imports) (COUNT(DISTINCT ?m) AS ?n_modules)
    WHERE {{
        ?f c:imports ?m ;
           c:inRepo ?repo .
    }} GROUP BY ?repo"""
    # property-path closure over the full KG: the iterative frontier
    # loop — a pushed-down edge scan then O(diameter) join rounds (the
    # alias graph is shallow, so this measures closure machinery +
    # scan cost, not result size). A co-import path (imports/^imports)
    # is deliberately NOT benched: hot modules have ~27k importers at
    # this SF, so that relation is ~1e9 pairs by data shape — the same
    # all-pairs regime the dedup operators guard against.
    path = """
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    SELECT ?x ?y WHERE { ?x owl:sameAs+ ?y }"""
    out: dict = {}
    for name, q in (("bgp", bgp), ("group_agg", agg), ("path_closure", path)):
        walls, rows = [], 0
        for _ in range(BENCH_REPS):
            t0 = time.time()
            df = sparql_select(kg, q)
            rows = df.count()
            walls.append(round(time.time() - t0, 3))
        out[name] = {"wall_sec": min(walls), "rows": int(rows)}
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    rows = int(os.environ.get("BENCH_CONSTRUCT_ROWS", str(int(1_000_000 * sf) or 2000)))

    spark = build_spark(cpus)
    try:
        queries, host_noise = bench_queries(spark, sf_dir)
        construct = bench_construct(spark, rows)
    finally:
        spark.stop()

    total = round(sum(queries.values()) + construct["wall_sec"], 3)
    print(
        json.dumps(
            {
                "metric": "kg_construct_e2e_plus_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "construct": construct,
                "host_noise": host_noise,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
