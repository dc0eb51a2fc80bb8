"""Deterministic corpus sampling and sequence packing.

Two training-data-pipeline stages downstream of cleaning/dedup:

* :func:`hash_stratified_sample` — data mixing: keep a per-stratum
  fraction of documents, decided by a cross-engine content hash so the
  sample is reproducible run-to-run and engine-to-engine (no RNG state,
  no ``sample()`` nondeterminism under retries/speculation — at 100 TB a
  re-executed task must keep the same rows).
* :func:`pack_sequences` — contiguous-fill packing of documents into
  fixed token-budget training sequences (the streaming analogue of
  greedy bin packing: docs are laid out in deterministic order and cut
  into ``budget``-token bins by cumulative offset).

Both are pure DataFrame algebra (Column exprs + one window), no Python
UDFs, and both have exact DuckDB twins used by the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h60, h60_sql

#: sampling hashes are 60-bit (see dedup.h60); rates are compared as
#: integers against rate * 2^60 so neither engine does any float math
SPACE = 1 << 60


def sample_thresholds(rate_by_stratum: dict[str, float]) -> dict[str, int]:
    """Per-stratum integer keep-thresholds: ``hash < rate * 2^60``.
    Computed once on the driver so the executors compare longs only."""
    return {s: int(r * SPACE) for s, r in rate_by_stratum.items()}


def hash_stratified_sample(
    df: DataFrame,
    rate_by_stratum: dict[str, float],
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the 60-bit
    md5-derived hash of its id (keyed by ``seed``) falls under the
    stratum's threshold. Strata missing from ``rate_by_stratum`` are
    dropped (rate 0.0).

    100 TB shape: a single whole-stage-codegen filter — no shuffle, no
    sort, pushdown-friendly (the stratum CASE prunes partitions when the
    table is partitioned by stratum). Changing one stratum's rate
    monotonically grows/shrinks only that stratum's sample (hashes don't
    move), which is what incremental data-mixing reweights need.
    """
    thresholds = sample_thresholds(rate_by_stratum)
    h = h60(F.col(id_col).cast("string"), seed)
    thr: Column = F.lit(0).cast("long")
    for s, t in thresholds.items():
        thr = F.when(F.col(stratum_col) == s, F.lit(t)).otherwise(thr)
    return df.where(h < thr)


def hash_stratified_sample_sql(
    rate_by_stratum: dict[str, float],
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 7,
) -> str:
    """DuckDB twin of :func:`hash_stratified_sample`'s predicate (same
    md5 bytes, same integer thresholds)."""
    thresholds = sample_thresholds(rate_by_stratum)
    cases = " ".join(
        f"WHEN '{s}' THEN {t}::BIGINT" for s, t in thresholds.items()
    )
    h = h60_sql(f"CAST({id_col} AS VARCHAR)", seed)
    return f"{h} < (CASE {stratum_col} {cases} ELSE 0 END)"


def pack_sequences(
    df: DataFrame,
    *,
    tokens_col: str,
    budget: int = 2048,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 32,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Within each (stratum, ``id % buckets``) group, documents are laid
    end-to-end in ``id`` order; a document starting at cumulative offset
    ``o`` lands in pack ``floor(o / budget)``. Contiguous-fill is the
    scalable counterpart of greedy first-fit packing (which is inherently
    sequential): deterministic, one shuffle, and each group's window sort
    is bounded by the bucket fan-out — ``buckets`` is the parallelism
    knob that keeps any single sort partition-sized at 100 TB (the
    equivalent un-bucketed window would serialize a whole stratum through
    one task).

    Returns the input columns plus ``bucket``, ``pack_id`` (unique within
    (stratum, bucket)) and ``pack_offset`` (token start offset inside the
    group's layout).
    """
    bucket = F.pmod(F.col(id_col), F.lit(buckets)).alias("bucket")
    w = (
        Window.partitionBy(stratum_col, "bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_b = df.withColumn("bucket", bucket)
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return with_b.withColumn("pack_offset", start.cast("long")).withColumn(
        "pack_id", F.floor(F.col("pack_offset") / F.lit(float(budget))).cast("long")
    )


def importance_weights(
    source: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """Data-selection importance weights (the hashed-n-gram
    importance-resampling scheme of DSIR, Xie et al. 2023): score each
    SOURCE document by how target-like its token distribution is.

    Features are word unigrams hashed into ``num_buckets`` buckets with
    the cross-engine 60-bit md5 hash (functions/dedup.py:h60, so the
    contract oracle reproduces every bucket id exactly); the bucketed
    smoothed unigram distributions ``p_tgt`` / ``p_src`` are estimated
    from the target and source corpora, and a document's weight is

        weight_micro = Σ_w c_dw · round(ln(p_tgt(b_w)/p_src(b_w)) · 1e6)

    — the per-bucket log-ratio micro-scaled to BIGINT before the
    per-document sum, so the aggregate is integer arithmetic
    (order-independent, engine-exact). Downstream mixing resamples
    source docs with probability ∝ exp(weight_micro/(1e6·n_tokens)).

    100 TB plan shape: both corpora reduce to ``num_buckets``-row count
    tables (map-side combined; broadcastable by construction since
    num_buckets is a constant), the log-ratio table broadcast-joins the
    source (doc, bucket) counts, and the final aggregate is doc-keyed.
    The target corpus is typically a curated sliver; the source-side
    pass is one explode + two hash aggregates."""
    from ontograph_spark.functions.dedup import h60

    def buckets(df: DataFrame, with_id: bool) -> DataFrame:
        toks = df.select(
            *( [F.col(id_col).alias("id")] if with_id else [] ),
            F.explode(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
            ).alias("w"),
        ).where(F.col("w") != "")
        return toks.withColumn("b", F.pmod(h60(F.col("w"), 0), F.lit(num_buckets)))

    tgt_counts = buckets(target, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("c_tgt")
    )
    src_counts = buckets(source, False).groupBy("b").agg(
        F.count(F.lit(1)).alias("c_src")
    )
    all_b = source.sparkSession.range(num_buckets).select(
        F.col("id").alias("b")
    )
    totals = (
        all_b.join(tgt_counts, "b", "left")
        .join(src_counts, "b", "left")
        .select(
            "b",
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
            F.coalesce("c_src", F.lit(0)).alias("c_src"),
        )
    )
    n_t = F.sum("c_tgt").alias("n_tgt")
    n_s = F.sum("c_src").alias("n_src")
    tot = totals.agg(n_t, n_s)
    ratio = (
        totals.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("c_tgt") + F.lit(smoothing))
                     / (F.col("n_tgt") + F.lit(smoothing) * num_buckets))
                    / ((F.col("c_src") + F.lit(smoothing))
                       / (F.col("n_src") + F.lit(smoothing) * num_buckets))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lr_micro"),
        )
    )
    doc_b = buckets(source, True).groupBy("id", "b").agg(
        F.count(F.lit(1)).alias("c_db")
    )
    return doc_b.join(F.broadcast(ratio), "b").groupBy("id").agg(
        F.sum("c_db").cast("bigint").alias("n_tokens"),
        F.sum(F.col("c_db") * F.col("lr_micro"))
        .cast("bigint")
        .alias("weight_micro"),
    )
