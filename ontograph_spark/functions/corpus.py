"""Corpus-level statistics and term ranking for training-data curation.

Three report-style stages a 100 TB pipeline runs between cleaning and
mixing:

* :func:`tfidf_top_terms` — per-document top-k terms by smoothed
  TF-IDF: the standard relevance ranking used for keyword extraction,
  topic labeling, and per-shard vocabulary drift checks.
* :func:`source_composition` — the per-(source, lang) corpus mix
  report (doc counts, char volume, corpus share) that data-mixing
  decisions are made from.
* :func:`length_quantiles` — per-group exact length percentiles, the
  signal behind length-based filtering thresholds.
* :func:`vocab_coverage` — the top-``n`` token table with cumulative
  corpus coverage: the statistic tokenizer/vocabulary design reads
  (how much of the corpus the k most frequent words already cover).

All three are pure DataFrame algebra (no Python UDFs) with exact DuckDB
twins in the driver contract. Float outputs are integer-scaled
(``*_milli`` / ``*_micro`` / ``*_centi``) per the repo convention so the
driver's typed value hash compares integers, not doubles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: high-df English function words excluded from TF-IDF ranking. Keeping
#: them out removes both noise and the hottest join keys (see skew note
#: in tfidf_top_terms).
DEFAULT_STOPWORDS: tuple[str, ...] = (
    "the", "and", "for", "that", "with", "this", "from", "are", "was",
    "were", "has", "have", "had", "not", "but", "all", "can", "will",
    "its", "his", "her", "she", "him", "they", "them", "their", "you",
    "your", "our", "out", "into", "over", "under", "than", "then",
    "there", "here", "when", "where", "which", "what", "who", "how",
    "why", "been", "being", "does", "did", "also", "more", "most",
    "some", "such", "only", "other", "these", "those", "each", "any",
)


def vocab_coverage(
    docs: DataFrame,
    *,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Top-``top_n`` whitespace tokens (lowercased) with counts and
    cumulative corpus coverage: ``(rank, word, n, cum_milli)`` where
    ``cum_milli`` = round(1000 · running-total / all-token-count).
    Ordering is total (count desc, word asc), so ranks and the running
    sum are deterministic.

    100 TB shape: one map-side-combining groupBy builds the word-count
    table; the top-n is ``orderBy().limit()`` — Spark's distributed
    TakeOrdered (per-partition heaps + driver merge of n·P rows), never
    a global sort; the total token count joins in as a broadcast one-row
    aggregate; the running sum windows over only the ``top_n`` surviving
    rows. No collect, no vocabulary broadcast."""
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.col("n").desc(), F.col("w").asc()).limit(top_n)
    w = Window.orderBy(F.col("n").desc(), F.col("w").asc())
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_milli",
            F.round(
                F.lit(1000.0)
                * F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("total")
            ).cast("bigint"),
        )
        .select("rank", F.col("w").alias("word"), "n", "cum_milli")
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_token_len: int = 3,
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF.

    Tokenization: lowercase, split on runs of non-alphanumerics, drop
    tokens shorter than ``min_token_len`` and ``stopwords``. Score:
    ``tf * (ln((N+1)/(df+1)) + 1)`` (sklearn's smooth-idf), milli-scaled
    to a bigint so ranking and the driver's value hash are integer-exact
    across engines (only an exact .5 boundary under a 1-ulp ``ln``
    divergence could flip — verified empirically at three SFs).
    Ties in the milli score break by term ascending, so row_number is a
    total order.

    100 TB shape: explode → map-side-combined count per (doc, term) →
    one reshuffle of the term table by term for the document-frequency
    aggregate and self-join (Catalyst reuses the term-hash exchange for
    both consumers); the corpus size N joins in as a broadcast one-row
    aggregate, never a driver action. The df join key is the term —
    after stopword removal residual hot terms are AQE skew-join
    territory (``spark.sql.adaptive.skewJoin`` stays on in this repo's
    sessions). The per-doc top-k window partitions by document, which is
    the same hash the tf aggregate produced. No collect, no vocabulary
    broadcast (vocab at web scale exceeds driver memory — the df table
    stays distributed).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter(
        (F.length("term") >= min_token_len) & ~F.col("term").isin(*stopwords)
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf_milli",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
                * 1000
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf_milli", "rank")
    )


def source_composition(
    docs: DataFrame,
    *,
    stratum_cols: Sequence[str] = ("source", "lang"),
    char_col: str = "n_chars",
) -> DataFrame:
    """Corpus-mix report: per stratum, document count, character volume,
    min/max lengths, mean length (milli), and share of the corpus
    (micro). The numbers data-mixing rates are chosen from.

    100 TB shape: one map-side-combined aggregate over the stratum key
    (strata are few — sources × langs) plus a broadcast one-row total;
    output is stratum-cardinality small. No second pass over the data.
    """
    total = docs.agg(F.count(F.lit(1)).alias("total_docs"))
    return (
        docs.groupBy(*stratum_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(char_col).cast("bigint").alias("total_chars"),
            F.min(char_col).cast("bigint").alias("min_chars"),
            F.max(char_col).cast("bigint").alias("max_chars"),
        )
        .join(F.broadcast(total))
        .withColumn(
            "mean_chars_milli",
            F.round(F.col("total_chars") / F.col("n_docs") * 1000).cast("bigint"),
        )
        .withColumn(
            "share_micro",
            F.round(F.col("n_docs") / F.col("total_docs") * 1000000).cast("bigint"),
        )
        .drop("total_docs")
    )


def source_rollup(
    docs: DataFrame,
    *,
    stratum_cols: Sequence[str] = ("source", "lang"),
    char_col: str = "n_chars",
) -> DataFrame:
    """Hierarchical corpus totals via ``ROLLUP(source, lang)``: one row
    per (source, lang), per source subtotal, and a grand total, tagged
    with the standard ``grouping_id`` bitmask so consumers can tell the
    levels apart (subtotal rows carry NULL in the rolled-up columns).

    100 TB shape: grouping sets compile to ONE shuffle — Spark expands
    the rollup levels map-side (each input row feeds every level's
    partial aggregate before the exchange), so the hierarchy costs the
    same single pass as the leaf groupBy. Never materialize the leaf
    aggregate and re-aggregate it client-side.
    """
    return (
        docs.rollup(*stratum_cols)
        .agg(
            F.grouping_id().cast("bigint").alias("level"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(char_col).cast("bigint").alias("total_chars"),
        )
        .select(*stratum_cols, "level", "n_docs", "total_chars")
    )


def length_quantiles(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    value_col: str = "n_chars",
    quantiles: Sequence[float] = (0.1, 0.5, 0.9),
    approx: bool = False,
) -> DataFrame:
    """Per-group length percentiles (centi-scaled bigints), linear
    interpolation — the thresholds length-filtering rules are set from.

    ``approx=False`` uses Spark's exact ``percentile`` (buffers each
    group's values — fine for per-language groups up to ~10^8 values,
    and required for the DuckDB ``quantile_cont`` oracle twin).
    ``approx=True`` switches to ``approx_percentile`` (t-digest-style
    bounded-memory sketch, mergeable map-side) — the 100 TB default,
    where a percentile estimate with 1e-4 relative error costs O(1)
    memory per group instead of a full buffer.
    """
    fn = (
        (lambda c, q: F.approx_percentile(c, F.lit(q), F.lit(10000)))
        if approx
        else (lambda c, q: F.percentile(c, F.lit(q)))
    )
    aggs = [
        F.round(fn(F.col(value_col), q) * 100)
        .cast("bigint")
        .alias(f"p{int(round(q * 100)):02d}_centi")
        for q in quantiles
    ]
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"), *aggs
    )


def filter_funnel(
    docs: DataFrame,
    rules: Sequence[tuple[str, "F.Column"]],
    *,
    keep_label: str = "kept",
) -> DataFrame:
    """Single-pass filter-funnel report: each row is attributed to the
    FIRST rule it fails (rules in order), or ``keep_label`` if it passes
    all. Returns (stage, rule, n) — the per-rule drop counts a curation
    run reports alongside its output.

    100 TB shape: the attribution is one CASE expression evaluated in
    the scan projection and ONE map-side-combined aggregate over a
    rule-cardinality key — never one pass (or one filter job) per rule.
    The actual filtered corpus is ``docs.where(every rule condition)``,
    which Catalyst folds into the same scan when both are consumed.
    """
    first_fail = F.coalesce(
        *[F.when(~cond, F.lit(name)) for name, cond in rules],
        F.lit(keep_label),
    )
    stage = {name: i + 1 for i, (name, _) in enumerate(rules)}
    stage[keep_label] = 0
    stage_col = F.create_map(
        *[F.lit(x) for kv in stage.items() for x in kv]
    )
    return (
        docs.select(first_fail.alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            stage_col[F.col("rule")].cast("bigint").alias("stage"),
            "rule",
            "n",
        )
    )
