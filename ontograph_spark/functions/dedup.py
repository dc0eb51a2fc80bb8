"""Deduplication operators for training-data pipelines.

Four families, each picked for a different scale/recall trade-off:

* **exact** — hash-groupBy on content digest; one shuffle, exact.
* **MinHash + LSH** — shingle → k minhashes → band buckets → candidate
  pairs via an equi-join on (band, signature slice); only candidates pay
  the exact-verification cost. The band join is the classic
  O(n·candidates) near-dup path at corpus scale.
* **SimHash** — 64-bit sign-aggregated token hashes; near-dups are pairs
  within a Hamming radius, found by banding the 64 bits into chunks.
* **n-gram Jaccard** — exact Jaccard on shingle sets for candidate pairs
  (array_intersect/array_union sizes — JVM-side).

Everything is DataFrame algebra over built-ins (xxhash64, explode,
groupBy, equi-joins) — no Python in any hot path. Embedding-cosine
near-dup lives in similarity.py (same candidate-pair machinery over
hyperplane-LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ontograph_spark.functions.text import shingles


def exact_duplicate_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total, distinct, duplicate rows by content digest."""
    return df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(F.sha2(F.col(text_col), 256)).alias("n_unique"),
        (
            F.count(F.lit(1)) - F.countDistinct(F.sha2(F.col(text_col), 256))
        ).alias("n_dup"),
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per exact content digest."""
    ranked = df.withColumn(
        "_digest", F.sha2(F.col(text_col), 256)
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_digest").orderBy(F.col(id_col))
        ),
    )
    return ranked.where(F.col("_rn") == 1).drop("_rn", "_digest")


def _fanout(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition ahead of shingle explode: the shingle table is
    ~200x its input, so partitioning must track the EXPLODED size, not
    the input file splits — a single small parquet file otherwise pins
    the whole shingle pipeline to one task. Identical repartitions in
    sibling branches collapse via ReuseExchange (one shuffle)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(id_col))


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """(id, shingle) rows — the shingle-table shape. Sketches aggregate
    over this with plain hash aggregates, which scales to any corpus and
    keeps codegen small (64 chained array-folds per row do not)."""
    return _fanout(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("s"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig: array<long>) — per id the min over shingles of
    xxhash64(shingle, seed_i), one map-side-combining aggregate. Seeds are
    constant, so signatures are deterministic across runs. Documents too
    short to shingle produce no row (they cannot near-dup anyway)."""
    e = _exploded_shingles(df, id_col, text_col, shingle_k)
    aggs = [
        F.min(F.xxhash64("s", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    return (
        e.groupBy("id")
        .agg(*aggs)
        .select(
            "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) that collide in ≥1 LSH band.

    rows_per_band = num_hashes / bands; a pair colliding in a band shares
    that whole signature slice — the standard S-curve trade-off. The join
    is an equi-join on (band_id, band_signature): shuffle is on the
    banded key, so hot shingles don't concentrate on one reducer."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice(F.col("sig"), b * rows + 1, rows).alias("slice"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs. If ``candidates`` is
    None, MinHash-LSH generates them first (never do the n² self-join)."""
    if candidates is None:
        candidates = minhash_lsh_pairs(df, id_col, text_col, shingle_k=shingle_k)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    joined = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select(
            "id_a",
            "id_b",
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_index_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.5,
    small_side_broadcast: bool = True,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard above ``threshold`` via a
    **prefix-filtered** inverted index (AllPairs/PPJoin family,
    Bayardo et al., WWW'07):

    1. order each document's distinct shingles by global document
       frequency (rarest first; ties lexicographic) — one canonical
       global order;
    2. index only the first ``n - ceil(t*n) + 1`` shingles per doc: any
       pair with J ≥ t MUST share an indexed shingle (if none is shared,
       |A∩B| ≤ ceil(t|A|)-1 < t|A| ≤ t|A∪B| — contradiction);
    3. equi-join on indexed shingles for candidates, then verify exactly
       with array_intersect over the full shingle sets (JVM-side).

    This removes the hot-shingle join blowup that makes the naive
    shingle self-join quadratic on common 5-grams (measured 541 s →
    seconds on 5k docs): frequent shingles sort last and land in almost
    no prefix. Output is exact — identical to the naive algorithm — so
    the DuckDB oracle runs the naive SQL.

    Skew discipline: the candidate join's key space is the prefix
    shingles — on templated corpora those are still few and hot, and a
    shuffled SMJ serializes on them. With ``small_side_broadcast`` (the
    default) the prefix table and the shingle-set table broadcast, so
    pair generation and verification are map-side hash joins with NO
    key-skewed shuffle; the only shuffle left is the distinct over
    candidate pairs (uniform by construction). Flip it off for corpora
    whose prefix table exceeds executor memory — with a realistic
    Zipfian vocabulary the prefix index is rare-shingle-only, so the
    shuffled join is skew-free there anyway.

    Representation discipline: shingles are interned to 64-bit ids
    (``xxhash64`` — dictionary-free, collision odds negligible) the
    moment they exist, so the window sort, the candidate join and the
    per-pair verification all run on longs, not short strings; the
    verification computes |A∪B| as ``n_a + n_b − |A∩B|`` from counts
    rather than materializing ``array_union``. Together ~10x less
    per-row CPU than the string-array formulation.

    The shared intermediates (shingle table, prefix index, set table)
    are eagerly materialized (``localCheckpoint``): each feeds both a
    stream side and one or more broadcast-exchange builds, and broadcast
    builds execute their subtree independently and concurrently —
    unmaterialized, the shingle pipeline re-runs per exchange and the
    racing builds interact badly with AQE (measured 600 s vs ~20 s on 5k
    docs). Checkpointing the two small tables (prefix index, set table)
    costs two bounded actions and makes every downstream read a block
    fetch."""
    sh = (
        _exploded_shingles(df, id_col, text_col, shingle_k)
        .select("id", F.xxhash64("s").alias("s"))
        .distinct()
        .persist()
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(dfreq, "s").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("df"), F.col("s"))
        ),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    prefix_len = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    prefix = (
        ranked.join(sizes, "id")
        .where(F.col("rn") <= prefix_len)
        .select("id", "s")
        .localCheckpoint(eager=True)
    )
    sets = (
        sh.groupBy("id")
        .agg(F.sort_array(F.collect_set("s")).alias("sh"))
        .localCheckpoint(eager=True)
    )
    b = lambda d: F.broadcast(d) if small_side_broadcast else d  # noqa: E731
    cand = (
        prefix.alias("a")
        .join(
            b(prefix).alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    joined = (
        cand.join(
            b(sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))),
            "id_a",
        )
        .join(
            b(sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return joined.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def simhash64_df(
    df: DataFrame, id_col: str, text_col: str = "text", shingle_k: int = 4
) -> DataFrame:
    """(id, sh: long) — 64-bit SimHash per id: per shingle take xxhash64,
    per bit position sum (+1/-1) votes via 64 hash aggregates over the
    shingle table, then sign-pack into one long."""
    e = _exploded_shingles(df, id_col, text_col, shingle_k).withColumn(
        "h", F.xxhash64("s")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v{b}")
        for b in range(64)
    ]
    votes = e.groupBy("id").agg(*aggs)
    out = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return votes.select("id", out.alias("sh"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs within a Hamming radius: band the 64-bit simhash
    into ``chunks`` 16-bit blocks; by pigeonhole, any pair within
    ``chunks - 1`` bit flips collides on ≥1 block. Exact Hamming check
    reranks candidates."""
    sim = simhash64_df(df, id_col, text_col)
    width = 64 // chunks
    banded = sim.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cidx).alias("chunk"),
                        F.shiftright(F.col("sh"), cidx * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for cidx in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "sh", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
