"""Parquet-backed quad store with a snapshot commit log.

The persistent backend for graphs bigger than memory. In a production
deployment the quad table is an Iceberg table and every mutation is a
single MERGE/DELETE commit; this sandbox has no Iceberg runtime jar, so the
same commit discipline is reproduced with a minimal snapshot protocol:

```
root/
  _meta.json                  {"uri": ..., "version": 1}
  CURRENT                     text: name of the live snapshot, e.g. "v00000003"
  snapshots/v00000003/        parquet dir (partitioned by graph)
  snapshots/v00000003.json    commit manifest: op, row count, parent
```

* Readers resolve ``CURRENT`` then scan one snapshot directory — filters
  and column pruning push into the parquet scan.
* Writers materialize the next state into a new snapshot dir, then commit
  by atomically replacing ``CURRENT`` (write-temp + ``os.replace``).
  A crashed writer leaves an orphan directory, never a corrupt table —
  the same observable guarantee as an Iceberg commit.
* Data is written repartitioned by a **salted subject** so one hot subject
  (or the ``rdf:type`` fan-in) cannot skew file sizes; see
  pipeline/materialize.py for the salting rationale.

This mirrors the role of the reference's Blazegraph backend
(/root/reference/blazegraph_store.go) — the durable, larger-than-memory
store behind the same GraphStore operator set.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontograph_spark.store.base import QUAD_SCHEMA, QuadStoreBase

CURRENT_FILE = "CURRENT"
SNAPSHOT_DIR = "snapshots"


def _atomic_write(path: str, content: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)


class ParquetQuadStore(QuadStoreBase):
    """One named graph over a snapshot-versioned parquet quad table."""

    def __init__(
        self,
        spark: SparkSession,
        uri: str,
        root: str,
        write_partitions: int | None = None,
        salt_buckets: int = 16,
    ) -> None:
        super().__init__(spark, uri)
        self.root = root
        self.write_partitions = write_partitions
        self.salt_buckets = salt_buckets
        os.makedirs(os.path.join(root, SNAPSHOT_DIR), exist_ok=True)
        meta_path = os.path.join(root, "_meta.json")
        if not os.path.exists(meta_path):
            _atomic_write(meta_path, json.dumps({"uri": uri, "version": 1}))

    # -- snapshot protocol ------------------------------------------------

    def current_snapshot(self) -> str | None:
        path = os.path.join(self.root, CURRENT_FILE)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read().strip() or None

    def _snapshot_path(self, name: str) -> str:
        return os.path.join(self.root, SNAPSHOT_DIR, name)

    def _next_snapshot_name(self) -> str:
        cur = self.current_snapshot()
        n = int(cur[1:]) + 1 if cur else 1
        return f"v{n:08d}"

    def _df(self) -> DataFrame:
        cur = self.current_snapshot()
        if cur is None:
            return self.spark.createDataFrame([], QUAD_SCHEMA)
        return (
            self.spark.read.schema(QUAD_SCHEMA)
            .parquet(self._snapshot_path(cur))
            .select(*QUAD_SCHEMA.fieldNames())
        )

    def _commit(self, df: DataFrame, op: str = "mutate") -> None:
        """Materialize the next table state and swap the pointer."""
        parent = self.current_snapshot()
        name = self._next_snapshot_name()
        path = self._snapshot_path(name)
        out = df.select(*QUAD_SCHEMA.fieldNames())
        # Salted repartition by subject: co-locates a subject's triples for
        # downstream per-subject folds while bounding the damage of a hot
        # subject; rdf:type-heavy batches can't skew a single output file.
        n = self.write_partitions or max(
            2, self.spark.sparkContext.defaultParallelism
        )
        out = out.repartition(
            n,
            F.col("graph"),
            F.pmod(F.xxhash64(F.col("subj")), F.lit(self.salt_buckets)),
        )
        out.write.mode("overwrite").parquet(path)
        count = (
            self.spark.read.schema(QUAD_SCHEMA).parquet(path).count()
        )
        _atomic_write(
            f"{path}.json",
            json.dumps(
                {
                    "snapshot": name,
                    "parent": parent,
                    "op": op,
                    "rows": count,
                    "committed_at": time.time(),
                }
            ),
        )
        _atomic_write(os.path.join(self.root, CURRENT_FILE), name)

    def _drop_backend(self) -> None:
        """DROP GRAPH: rewrite without this graph's partition
        (blazegraph_store.go:289-324 semantics)."""
        self._commit(self._df().where(F.col("graph") != self._uri), op="drop")

    # -- maintenance ------------------------------------------------------

    def expire_snapshots(self, keep: int = 2) -> list[str]:
        """Delete all but the most recent ``keep`` snapshots; returns the
        expired names. Never touches the live snapshot."""
        cur = self.current_snapshot()
        snap_root = os.path.join(self.root, SNAPSHOT_DIR)
        names = sorted(
            n for n in os.listdir(snap_root)
            if n.startswith("v") and os.path.isdir(os.path.join(snap_root, n))
        )
        expired = [n for n in names[:-keep] if n != cur] if keep else []
        for n in expired:
            shutil.rmtree(os.path.join(snap_root, n), ignore_errors=True)
            manifest = os.path.join(snap_root, f"{n}.json")
            if os.path.exists(manifest):
                os.remove(manifest)
        return expired

    def history(self) -> list[dict]:
        """Commit manifests, oldest first."""
        snap_root = os.path.join(self.root, SNAPSHOT_DIR)
        out = []
        for n in sorted(os.listdir(snap_root)):
            if n.endswith(".json"):
                with open(os.path.join(snap_root, n)) as f:
                    out.append(json.load(f))
        return out
