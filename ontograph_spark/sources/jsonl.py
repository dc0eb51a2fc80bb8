"""JSONL document source and sink.

Pretraining corpora are most commonly interchanged as JSON Lines (one
document object per line). These wrappers pin an EXPLICIT schema on both
directions — ``spark.read.json`` schema inference is a full extra pass
over the data (and can silently widen/reorder types between shards), so
at 100 TB the schema is always declared, never inferred. Reading is a
distributed line-delimited JSON scan (splittable per file; compressed
shards parallelize per shard); writing is one JSON object per line, no
driver round-trip in either direction.

Corrupt lines follow Spark's PERMISSIVE mode by default: malformed rows
land as nulls in a ``_corrupt_record`` column when requested, or are
dropped under ``mode='DROPMALFORMED'`` — a corpus hygiene decision the
caller makes explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: the documents-table shape used across the contract queries
DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_SCHEMA,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSONL file(s) → documents DataFrame with a declared schema."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_documents_jsonl(
    df: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Documents DataFrame → JSONL shards (one object per line).

    ``partitions`` caps the shard count (coalesce — narrow, no shuffle);
    default keeps the upstream partitioning, which at scale tracks the
    write parallelism the plan already chose."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def jsonl_ingest_invariant(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row ingest check for a JSONL load: row count plus an
    order-insensitive content digest (XOR of per-row sha2 prefixes —
    commutative, and unlike a sum it cannot overflow, which matters
    under ANSI mode at any corpus size) — cheap to recompute on both
    sides of a format hop to verify nothing was dropped or mangled in
    transit. Duplicate-PAIR insensitivity is inherent to XOR; the row
    count catches even-multiplicity drops."""
    digest = F.conv(F.substring(F.sha2(F.col(text_col), 256), 1, 15), 16, 10).cast(
        "long"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(digest).alias("content_digest_xor"),
    )
