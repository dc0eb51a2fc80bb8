"""Distributed N-Triples text source and sink.

The bulk interchange format for quad tables: one ``<s> <p> <o> .``
statement per line (the same encoding the Turtle serializer's plain mode
writes). Reading is a distributed ``spark.read.text`` + one regex split —
no driver round-trip; writing is a text sink over the encoded columns.
Line order is not significant (triple stores are sets); the reader
tolerates blank lines and ``#`` comments.

Term encodings pass through verbatim — terms are already N-Triples
encoded in the engine (SURVEY.md §1.2), so parse = split into three
fields, serialize = concatenation. No quote escaping, matching the
reference (triple.go:21-30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# subject and predicate are IRIs; the object is the rest up to the final ' .'
_LINE_RE = r"^(<[^>]*>)\s+(<[^>]*>)\s+(.+?)\s*\.\s*$"


def read_ntriples(spark: SparkSession, path: str, graph_uri: str) -> DataFrame:
    """N-Triples file(s) → quad DataFrame scoped to ``graph_uri``."""
    lines = spark.read.text(path)
    parsed = lines.where(
        (F.trim("value") != "") & ~F.col("value").startswith("#")
    ).select(
        F.regexp_extract("value", _LINE_RE, 1).alias("subj"),
        F.regexp_extract("value", _LINE_RE, 2).alias("pred"),
        F.regexp_extract("value", _LINE_RE, 3).alias("obj"),
        F.lit(graph_uri).alias("graph"),
    )
    return parsed.where(F.col("subj") != "")


def write_ntriples(quads: DataFrame, path: str) -> None:
    """Quad DataFrame → N-Triples text files (graph column is dropped —
    N-Triples is per-graph; write one graph per directory)."""
    (
        quads.select(
            F.concat_ws(" ", F.col("subj"), F.col("pred"), F.col("obj")).alias(
                "line"
            )
        )
        .select(F.concat(F.col("line"), F.lit(" .")).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
