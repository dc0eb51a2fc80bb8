#!/usr/bin/env python
"""Two-cluster-size scaling evidence on a REAL multi-executor cluster.

The north rule asks for `spark-submit --py-files` on a multi-executor
cluster at N and 4N executors. This harness builds exactly that inside
the sandbox: a standalone master plus N separate 2-core Worker JVMs
(each taskset-pinned to its own disjoint 2-cpu set, i.e. an executor
container), then `spark-submit --master spark://... --py-files og.zip
submit_construct.py` runs the identical construction job at 1 executor
vs 4 executors. Unlike the local[N] proxy (bench_scaling_gated.py),
every executor here is its own JVM with its own heap, GC, and python
workers, and shuffles cross process boundaries through netty — the
actual cluster execution model.

Methodology shared with the gated harness: fresh daemons per run,
interleaved levels, per-run hypervisor steal (quiet gate) and a memcpy
bandwidth probe pinned outside every run's cpu set, min-of-K over quiet
runs as the headline. The driver JVM is pinned to its own 2-cpu set at
BOTH levels (a cluster driver is not an executor); its fixed planning /
canonicalization-take work is an honest serial term amortized by input
size.

Usage: python bench_scaling_cluster.py [rows] [pairs] [n_lo] [n_hi] [levels]
(defaults 4_000_000, 4, 1, 4, "lo,hi" — executor counts, 2 cores each).
`levels` restricts which side of the pair runs (e.g. "hi" to farm more
quiet hi-level windows against already-recorded lo runs). Results
accumulate in BENCH/scaling_cluster_{n_lo}_{n_hi}.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time
import urllib.request

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
REPO = os.path.dirname(os.path.abspath(__file__))
MASTER_PORT = 7077
MASTER_UI = 8090
STEAL_GATE = float(os.environ.get("STEAL_GATE", "0.1"))

#: cpu layout: worker i gets the pair starting at CPU_BASE + 2i; the
#: driver and probe live outside every worker pair. CPU_BASE lets a
#: smoke run coexist with another pinned harness.
CPU_BASE = int(os.environ.get("CLUSTER_CPU_BASE", "0"))
DRIVER_CPUS = os.environ.get("CLUSTER_DRIVER_CPUS", "14-15")
PROBE_CPU = os.environ.get("CLUSTER_PROBE_CPU", "30")

BW_PROBE = r"""
import json, time
import numpy as np
a = np.zeros(200_000_000, dtype=np.uint8)
b = np.zeros_like(a)
while True:
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        b[:] = a
        t.append(time.perf_counter() - t0)
    print(json.dumps({"gbps": round(0.2 / min(t), 2)}), flush=True)
    time.sleep(15)
"""


def steal_ticks() -> int:
    return int(open("/proc/stat").readline().split()[8])


def spark_class(cls: str, *args: str) -> list[str]:
    return [f"{SPARK_HOME}/bin/spark-class", cls, *args]


def wait_port(port: int, timeout: float = 30.0) -> None:
    import socket

    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            s.settimeout(1)
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                time.sleep(0.5)
    raise RuntimeError(f"port {port} not up after {timeout}s")


def wait_workers(n: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{MASTER_UI}/json/", timeout=2
            ) as r:
                st = json.load(r)
            if sum(1 for w in st.get("workers", []) if w["state"] == "ALIVE") >= n:
                return
        except Exception:
            pass
        time.sleep(1)
    raise RuntimeError(f"{n} workers not ALIVE after {timeout}s")


class Cluster:
    """A standalone master + n pinned 2-core worker JVMs (own daemons,
    fresh per run; torn down in __exit__)."""

    def __init__(self, n_workers: int, scratch: str):
        self.n = n_workers
        self.scratch = scratch
        self.procs: list[subprocess.Popen] = []

    def __enter__(self):
        env = dict(
            os.environ,
            SPARK_LOG_DIR=f"{self.scratch}/logs",
            SPARK_LOCAL_IP="127.0.0.1",
            SPARK_NO_DAEMONIZE="1",
        )
        self.procs.append(
            subprocess.Popen(
                spark_class(
                    "org.apache.spark.deploy.master.Master",
                    "--host",
                    "127.0.0.1",
                    "--port",
                    str(MASTER_PORT),
                    "--webui-port",
                    str(MASTER_UI),
                ),
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
        wait_port(MASTER_PORT)
        for i in range(self.n):
            cpuset = f"{CPU_BASE + 2 * i}-{CPU_BASE + 2 * i + 1}"
            wdir = f"{self.scratch}/worker{i}"
            os.makedirs(wdir, exist_ok=True)
            wenv = dict(env, SPARK_WORKER_DIR=wdir, SPARK_LOCAL_DIRS=wdir)
            self.procs.append(
                subprocess.Popen(
                    ["taskset", "-c", cpuset]
                    + spark_class(
                        "org.apache.spark.deploy.worker.Worker",
                        f"spark://127.0.0.1:{MASTER_PORT}",
                        "--cores",
                        "2",
                        "--memory",
                        "10g",
                        "--work-dir",
                        wdir,
                        "--webui-port",
                        str(MASTER_UI + 1 + i),
                    ),
                    env=wenv,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
            )
        wait_workers(self.n)
        return self

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()


def submit(n_exec: int, src: str, out: str, scratch: str) -> dict:
    """spark-submit the construction CLI against the running cluster."""
    pkg_zip = f"{scratch}/ontograph_spark.zip"
    if not os.path.exists(pkg_zip):
        subprocess.run(
            [sys.executable, "-m", "zipfile", "-c", pkg_zip, "ontograph_spark/"],
            check=True,
            cwd=REPO,
        )
    shuffle_parts = str(4 * n_exec)
    cmd = [
        "taskset",
        "-c",
        DRIVER_CPUS,
        f"{SPARK_HOME}/bin/spark-submit",
        "--master",
        f"spark://127.0.0.1:{MASTER_PORT}",
        "--deploy-mode",
        "client",
        "--py-files",
        pkg_zip,
        "--conf",
        "spark.executor.cores=2",
        "--conf",
        "spark.executor.memory=8g",
        "--conf",
        f"spark.cores.max={2 * n_exec}",
        "--conf",
        "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=2",
        "--conf",
        "spark.driver.memory=8g",
        "--conf",
        f"spark.sql.shuffle.partitions={shuffle_parts}",
        "--conf",
        "spark.sql.adaptive.enabled=false",
        "--conf",
        "spark.sql.files.maxPartitionBytes=2m",
        "--conf",
        "spark.sql.files.openCostInBytes=256k",
        "--conf",
        "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf",
        f"spark.local.dir={scratch}/driver_local",
        "submit_construct.py",
        "--input",
        src,
        "--output",
        out,
        "--buckets",
        "0",
        "--write-partitions",
        str(2 * n_exec),
        "--warmup-frac",
        "0.05",
    ]
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise RuntimeError(f"spark-submit ({n_exec} executors) failed")
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            m = json.loads(line)
            if "triples" in m:
                return m
        except ValueError:
            continue
    raise RuntimeError("no metrics line in spark-submit output")


def run_once(n_exec: int, src: str) -> dict:
    scratch = tempfile.mkdtemp(prefix="og_cluster_", dir="/dev/shm")
    out = f"{scratch}/quads"
    load0 = os.getloadavg()[0]
    probe = subprocess.Popen(
        ["taskset", "-c", PROBE_CPU, sys.executable, "-c", BW_PROBE],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        with Cluster(n_exec, scratch):
            s1 = steal_ticks()
            t0 = time.time()
            metrics = submit(n_exec, src, out, scratch)
            wall_total = time.time() - t0
            s2 = steal_ticks()
    finally:
        probe.terminate()
        bw = []
        try:
            for line in probe.stdout:
                try:
                    bw.append(json.loads(line)["gbps"])
                except ValueError:
                    pass
        except Exception:
            pass
        probe.wait()
        shutil.rmtree(scratch, ignore_errors=True)
    r = {
        "executors": n_exec,
        # wall_sec from the CLI metrics line: construction only, excluding
        # session/app startup (the same boundary at both levels)
        "wall": metrics["wall_sec"],
        "wall_with_startup": round(wall_total, 1),
        "triples": metrics["triples"],
        "steal_core_sec": round((s2 - s1) / 100.0, 1),
        "load_at_start": round(load0, 1),
    }
    r["stolen_cores_avg"] = round(r["steal_core_sec"] / max(wall_total, 1e-9), 3)
    r["quiet"] = r["stolen_cores_avg"] <= STEAL_GATE
    if bw:
        r["bw_gbps_med"] = statistics.median(bw)
        r["bw_gbps_min"] = min(bw)
    return r


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    levels_wanted = (sys.argv[5] if len(sys.argv) > 5 else "lo,hi").split(",")
    factor = n_hi / n_lo
    out_path = f"BENCH/scaling_cluster_{n_lo}_{n_hi}.json"

    runs: dict[str, list[dict]] = {"lo": [], "hi": []}
    if os.path.exists(out_path):
        try:
            prior = json.load(open(out_path))
            if prior.get("rows") == rows and prior.get("levels") == [n_lo, n_hi]:
                runs = {
                    "lo": list(prior["runs"]["lo"]),
                    "hi": list(prior["runs"]["hi"]),
                }
        except Exception:
            pass

    def write_out() -> None:
        if not (runs["lo"] and runs["hi"]):
            return
        quiet_lo = [r["wall"] for r in runs["lo"] if r["quiet"]]
        quiet_hi = [r["wall"] for r in runs["hi"] if r["quiet"]]
        all_lo = [r["wall"] for r in runs["lo"]]
        all_hi = [r["wall"] for r in runs["hi"]]
        out = {
            "rows": rows,
            "levels": [n_lo, n_hi],
            "executor_shape": "2 cores / 8g per executor, each worker a "
            "separate taskset-pinned JVM; driver pinned to its own 2-cpu "
            "set at both levels; spark-submit --py-files per run",
            "steal_gate_cores": STEAL_GATE,
            "runs": runs,
            "quiet_runs": {"lo": len(quiet_lo), "hi": len(quiet_hi)},
            "efficiency_quiet_min": (
                round(min(quiet_lo) / (factor * min(quiet_hi)), 3)
                if quiet_lo and quiet_hi
                else None
            ),
            "efficiency_ungated_min": round(
                min(all_lo) / (factor * min(all_hi)), 3
            ),
            "efficiency_median": round(
                statistics.median(all_lo) / (factor * statistics.median(all_hi)), 3
            ),
            "throughput_lo_best": round(runs["lo"][0]["triples"] / min(all_lo), 1),
            "throughput_hi_best": round(runs["hi"][0]["triples"] / min(all_hi), 1),
        }
        os.makedirs("BENCH", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)

    # source table generated once, unpinned, full machine
    src = tempfile.mkdtemp(prefix="og_clsrc_", dir="/dev/shm")
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
        cwd=REPO,
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        sys.exit(1)
    try:
        for _ in range(pairs):
            for level, n_exec in (("lo", n_lo), ("hi", n_hi)):
                if level not in levels_wanted:
                    continue
                try:
                    r = run_once(n_exec, src)
                except RuntimeError as e:
                    sys.stderr.write(f"{e}\n")
                    continue
                r["level"] = level
                runs[level].append(r)
                print(json.dumps(r), flush=True)
                write_out()
    finally:
        shutil.rmtree(src, ignore_errors=True)

    write_out()
    if os.path.exists(out_path):
        summary = json.load(open(out_path))
        print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))


if __name__ == "__main__":
    main()
