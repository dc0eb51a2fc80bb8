"""Distributed N-Quads text source and sink.

The multi-graph sibling of :mod:`ontograph_spark.sources.ntriples`: one
``<s> <p> <o> <g> .`` statement per line (W3C N-Quads), the bulk
interchange format that preserves named-graph scoping — what a quad
table exports to and imports from when moving BETWEEN stores, where
N-Triples' one-graph-per-directory convention would lose the fourth
column. Same execution shape: reading is a distributed
``spark.read.text`` + one regex split, writing is a text sink over the
encoded columns; no driver round-trip either way. The graph label is
optional per the spec — a triple-shaped line lands in
``default_graph``.

Term encodings pass through verbatim (terms are already N-Triples
encoded in the engine, SURVEY.md §1.2). No quote escaping, matching the
reference (triple.go:21-30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# subject/predicate IRIs, object = anything up to an optional trailing
# graph IRI and the final ' .'
_QUAD_RE = r"^(<[^>]*>)\s+(<[^>]*>)\s+(.+?)(?:\s+(<[^>]*>))?\s*\.\s*$"


def read_nquads(
    spark: SparkSession, path: str, default_graph: str = "", strict: bool = False
) -> DataFrame:
    """N-Quads file(s) → quad DataFrame. Graph-less lines (plain
    N-Triples statements — valid N-Quads) scope to ``default_graph``.

    ``strict=True`` raises :class:`ValueError` (with a sample of the
    offending lines) when any non-blank, non-comment line fails to
    parse, instead of silently dropping it — a corrupt or
    partially-unsupported dump (e.g. blank-node subjects) is then a
    loud error rather than invisible data loss. The check is one extra
    distributed count over the same scan, only when opted in."""
    lines = spark.read.text(path)
    content = lines.where(
        (F.trim("value") != "") & ~F.col("value").startswith("#")
    )
    parsed = content.select(
        "value",
        F.regexp_extract("value", _QUAD_RE, 1).alias("subj"),
        F.regexp_extract("value", _QUAD_RE, 2).alias("pred"),
        F.regexp_extract("value", _QUAD_RE, 3).alias("obj"),
        F.regexp_extract("value", _QUAD_RE, 4).alias("g"),
    )
    if strict:
        bad = parsed.where(F.col("subj") == "")
        sample = [r["value"] for r in bad.take(3)]
        if sample:
            n = bad.count()
            shown = "; ".join(repr(s[:120]) for s in sample)
            raise ValueError(
                f"read_nquads(strict=True): {n} unparseable statement"
                f" line(s) in {path} (first: {shown})"
            )
    return parsed.where(F.col("subj") != "").select(
        "subj",
        "pred",
        "obj",
        F.when(F.col("g") == "", F.lit(default_graph))
        .otherwise(F.expr("substring(g, 2, length(g) - 2)"))
        .alias("graph"),
    )


def write_nquads(quads: DataFrame, path: str) -> None:
    """Quad DataFrame → N-Quads text files (graph column serialized as
    the fourth term — the lossless multi-graph export)."""
    (
        quads.select(
            F.concat(
                F.concat_ws(
                    " ",
                    F.col("subj"),
                    F.col("pred"),
                    F.col("obj"),
                    F.concat(F.lit("<"), F.col("graph"), F.lit(">")),
                ),
                F.lit(" ."),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
