"""Deterministic synthetic source-code repository table.

The pipeline's input contract (BASELINE.json ``input_hint``) is an Iceberg
table ``(repo: string, path: string, commit: string, lang: string,
content: string)``. This sandbox has no such dataset, so tests and benches
synthesize one **deterministically** (seeded by row id — same id, same row,
at any scale and parallelism) with a content grammar rich enough to
exercise every extraction rule:

* python / go sources with import statements, function/class/type
  declarations and cross-repo references in comments;
* module names drawn from a fixed vocabulary in either canonical or alias
  form — alias occurrences are what entity linking + sameAs
  canonicalization later merge;
* a hot repo (``repo-0000``) that owns a disproportionate share of rows,
  so skew handling is actually exercised.

Generation is distributed: ``spark.range`` partitions the id space and an
Arrow-batched ``mapInPandas`` stage renders rows — no driver-side
materialization, no per-row Python calls into Spark.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

REPO_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

#: canonical module vocabulary and their alias forms (alias -> canonical)
MODULES = [
    "corelib",
    "datakit",
    "netio",
    "mathx",
    "strfmt",
    "logfwd",
    "cfgldr",
    "tasker",
    "storeng",
    "webfrm",
]
ALIASES = {
    "core-lib": "corelib",
    "data_kit": "datakit",
    "net.io": "netio",
    "math-x": "mathx",
    "str_fmt": "strfmt",
}
ALIAS_LIST = sorted(ALIASES)

_FUNCS = ["load", "parse", "merge", "flush", "score", "index", "emit", "scan"]
_TYPES = ["Record", "Batch", "Cursor", "Plan", "Node", "Edge"]


def _h(seed: int, salt: str) -> int:
    """Deterministic 64-bit hash for (row id, field)."""
    d = hashlib.sha256(f"{seed}|{salt}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def render_row(i: int, n_repos: int) -> tuple[str, str, str, str, str]:
    """Pure-Python row renderer — shared by the distributed generator and
    the golden-oracle tests (same function ⇒ same rows)."""
    # skew: ~20% of rows land in repo-0000, rest spread uniformly
    r = _h(i, "repo") % 100
    repo_idx = 0 if r < 20 else 1 + _h(i, "repo2") % (n_repos - 1)
    repo = f"repo-{repo_idx:04d}"
    lang = "python" if _h(i, "lang") % 5 < 3 else "go"
    ext = "py" if lang == "python" else "go"
    path = f"src/pkg{_h(i, 'dir') % 7}/mod_{i}.{ext}"
    commit = hashlib.sha256(f"commit|{repo}|{i}".encode()).hexdigest()[:12]

    n_imports = 1 + _h(i, "nimp") % 3
    imports = []
    for k in range(n_imports):
        hv = _h(i, f"imp{k}")
        if hv % 4 == 0:  # alias form 25% of the time
            imports.append(ALIAS_LIST[hv % len(ALIAS_LIST)])
        else:
            imports.append(MODULES[hv % len(MODULES)])
    func = _FUNCS[_h(i, "func") % len(_FUNCS)] + f"_{i % 97}"
    typ = _TYPES[_h(i, "type") % len(_TYPES)] + f"{i % 53}"
    ref_repo = f"repo-{_h(i, 'xref') % n_repos:04d}"
    has_ref = _h(i, "hasref") % 3 == 0

    lines: list[str] = []
    if lang == "python":
        for m in imports:
            if _h(i, f"style{m}") % 2 == 0:
                lines.append(f"import {m}")
            else:
                lines.append(f"from {m} import {func.split('_')[0]}")
        if has_ref:
            lines.append(f"# see repo:{ref_repo}")
        lines.append(f"class {typ}:")
        lines.append("    pass")
        lines.append(f"def {func}(x):")
        lines.append("    return x")
    else:
        lines.append(f"package pkg{_h(i, 'dir') % 7}")
        lines.append("import (")
        for m in imports:
            lines.append(f'    "{m}"')
        lines.append(")")
        if has_ref:
            lines.append(f"// see repo:{ref_repo}")
        lines.append(f"type {typ} struct {{}}")
        lines.append(f"func {func}() int {{ return {i % 7} }}")
    return repo, path, commit, lang, "\n".join(lines) + "\n"


def synthesize_repo_table(
    spark: SparkSession, num_rows: int, n_repos: int = 50, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generator; same (num_rows, n_repos) ⇒
    identical table regardless of partitioning."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [render_row(int(i), n_repos) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return (
        spark.range(0, num_rows, numPartitions=parts)
        .mapInPandas(gen, schema=REPO_SCHEMA)
    )
