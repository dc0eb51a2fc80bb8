"""Similarity search over an embedding column (``array<float>``).

Three tiers:

* :func:`brute_force_topk` — exact cosine top-k, the correctness
  baseline. The dot product is a left-fold ``F.aggregate`` over
  ``zip_with`` in **double** precision — sequential element order, so the
  result is bit-identical to a sequential SQL implementation (the DuckDB
  oracle) and rank order is deterministic.
* :func:`lsh_topk` — random-hyperplane LSH: sign-bit signatures bucket
  the corpus; queries only score their bucket (plus multi-probe
  neighbors). The scale path when k·n scoring is too expensive.
* :func:`ivf_topk` — inverted-file search: vectors are assigned to their
  nearest centroid (broadcast), queries probe the ``nprobe`` nearest
  cells. Centroids here come from a deterministic sample + one Lloyd
  refinement — enough to exercise the pruned-search plan shape.

Hyperplanes/centroid seeds are deterministic (hash-based), so results are
reproducible run to run.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _cells_array(cells: DataFrame) -> DataFrame:
    """Pack a small (cid, cv) cell table into ONE row holding a
    cid-sorted ``array<struct<cid,cv>>`` — the broadcast side of the
    zero-shuffle assignment in :func:`_nearest_cid`."""
    return cells.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cells")
    )


def _nearest_cid(vec: Column, cells: Column) -> Column:
    """Argmax-cosine cell id as a fold over the packed cell array:
    maximum similarity, ties to the lowest cid — exactly the rank-1 row
    of a ``(d DESC, cid ASC)`` window (``cells`` is cid-sorted and the
    strict ``>`` keeps the earlier cid on ties), but evaluated per-row
    in one projection: no n×nlist row expansion and **no shuffle**,
    where the window form sorts the expanded corpus by vector id."""
    init = F.struct(
        F.lit(float("-inf")).cast("double").alias("d"),
        F.lit(None).cast("bigint").alias("cid"),
    )

    def merge(acc: Column, c: Column) -> Column:
        d = cosine(vec, c["cv"])
        return F.when(
            d > acc["d"], F.struct(d.alias("d"), c["cid"].alias("cid"))
        ).otherwise(acc)

    return F.aggregate(cells, init, merge)["cid"]


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query row: ``(query_id, neighbor_id,
    rank)``. The corpus side streams; the query side broadcasts — at
    scale this is the one-pass scoring join (no n² blowup as long as the
    query set is bounded)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("qv"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("nv")
    )
    scored = q.crossJoin(v).where(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("nv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from sha256."""
    vals = []
    for d in range(dim):
        h = hashlib.sha256(f"plane|{plane}|{d}".encode()).digest()
        vals.append(int.from_bytes(h[:8], "big", signed=True) / 2**63)
    return vals


def lsh_signature(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Sign-bit signature as a long: bit p = sign(vec · hyperplane_p)."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, p))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    LSH bucket. Recall rises with fewer planes (bigger buckets)."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("nv"),
    ).withColumn("bucket", lsh_signature(F.col("nv"), dim, num_planes))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("qv"),
        ).withColumn("bucket", lsh_signature(F.col("qv"), dim, num_planes))
    )
    scored = (
        q.join(v, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _assign_cells(v: DataFrame, cents: DataFrame) -> DataFrame:
    """(neighbor_id, nv, cid): nearest-centroid assignment via the
    packed-broadcast argmax — zero shuffle of the vector stream."""
    return (
        v.crossJoin(F.broadcast(_cells_array(cents)))
        .withColumn("cid", _nearest_cid(F.col("nv"), F.col("cells")))
        .select("neighbor_id", "nv", "cid")
    )


def _seed_centroids(v: DataFrame, k: int, stride: int | None = None) -> DataFrame:
    """Deterministic seed set: vectors with ``id % stride == 0``, capped
    at ``k`` in id order (limit alone isn't deterministic). The default
    stride targets the ~1k-id bench corpus; pass ``stride`` explicitly
    for other id ranges. Raises when the stride selects no ids at all —
    otherwise every downstream assignment would silently be ``cid=NULL``
    (the argmax fold over an empty centroid array returns its init)."""
    seeds = (
        v.withColumn("_m", F.col("neighbor_id") % F.lit(stride or max(1, 997 // k)))
        .where(F.col("_m") == 0)
        .orderBy("neighbor_id")
        .limit(k)
        .select(F.col("neighbor_id").alias("cid"), F.col("nv").alias("cv"))
    )
    if seeds.isEmpty():
        raise ValueError(
            "k-means seed set is empty: no vector id is a multiple of the "
            f"seed stride ({stride or max(1, 997 // k)}). The default stride "
            "assumes ids near 0..1000 — pass seed_stride to match your id "
            "range (e.g. 1 to seed from the first k ids)."
        )
    return seeds


def _lloyd_mean(assigned: DataFrame) -> DataFrame:
    """(cid, cv): element-wise centroid means via a *sequential* fold in
    member-id order — a plain avg() sums partials in partition order,
    which is not bit-deterministic run to run; sorted-fold means are, so
    results are reproducible and cross-engine checkable. Empty cells
    drop out (GROUP BY semantics, same in the SQL oracle)."""
    member_mean = (
        F.aggregate(
            F.transform("xs", lambda s: s["x"]),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        / F.size("xs")
    )
    return (
        assigned.select("neighbor_id", "cid", F.posexplode("nv").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.array_sort(F.collect_list(F.struct("neighbor_id", "x"))).alias("xs"))
        .select("cid", "pos", member_mean.alias("x"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("px"))
        .select("cid", F.transform("px", lambda s: s["x"]).alias("cv"))
    )


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_stride: int | None = None,
) -> DataFrame:
    """Deterministic distributed k-means: ``(id, cid)`` after ``iters``
    Lloyd refinements of the stride-sampled seed set. Every step is
    DataFrame algebra: assignment is the zero-shuffle packed-broadcast
    argmax (n×k cosine folds inside one projection — no row expansion),
    the mean is one (cid, pos) hash aggregate with map-side combine, and
    centroids stay a broadcast-sized table (k rows) throughout. Cosine
    argmax with ties to the lowest cid + sorted-fold means make the
    result bit-deterministic and cross-engine checkable (the DuckDB
    oracle replays the identical iterations).

    At 100 TB the vector stream is never shuffled — each iteration is
    one scan + one k×dim-row aggregate; for many iterations checkpoint
    the (tiny) centroid table between rounds to keep plans bounded.

    ``seed_stride``: seeds are ids divisible by the stride (default
    ``997 // k``, tuned for ids near 0..1000). For other id ranges pass
    an explicit stride; an empty seed set raises instead of silently
    assigning every row a null cluster."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("nv")
    )
    cents = _seed_centroids(v, k, seed_stride)
    for _ in range(iters):
        cents = _lloyd_mean(_assign_cells(v, cents))
    return _assign_cells(v, cents).select(
        F.col("neighbor_id").alias("id"), "cid"
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-file approximate search.

    Centroids: a deterministic sample (vectors with ``id % stride == 0``,
    capped at nlist) refined by one Lloyd step — computed once, broadcast
    everywhere. Cells partition the corpus; a query scores only its
    ``nprobe`` nearest cells."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("nv")
    )
    seeds = _seed_centroids(v, nlist)
    # one Lloyd refinement: assign (zero-shuffle packed-array argmax),
    # then element-wise sorted-fold mean per cell
    centroids = F.broadcast(_lloyd_mean(_assign_cells(v, seeds)))
    cells = _assign_cells(v, centroids)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
        )
    )
    probes = (
        q.crossJoin(centroids)
        .withColumn("d", cosine(F.col("qv"), F.col("cv")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("d").desc(), F.col("cid"))
            ),
        )
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        probes.join(cells, on="cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucketing + exact rerank:
    pairs sharing a signature bucket whose true cosine ≥ threshold."""
    v = vectors.select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v")
    ).withColumn("bucket", lsh_signature(F.col("v"), dim, num_planes))
    a, b = v.alias("a"), v.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    )
    return cand.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
    ).where(F.col("sim") >= threshold)
