"""Mention detection over file content.

One Arrow-batched ``mapInPandas`` stage scans file content for code
mentions (imports, function/type/class declarations, cross-repo
references). This is the pipeline's only content-scanning Python stage —
per ``input_hint``, no per-row Python: inside each Arrow batch the work is
vectorized ``pandas.Series.str.extractall`` calls over the whole batch.

``PATTERNS`` is the single source of truth for the extraction grammar: the
distributed stage and the pure-Python golden oracle
(:func:`extract_mentions_py`) compile the same table, so the P/R test
compares two independent execution paths of one specification.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

MENTION_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("name", StringType(), False),
    ]
)

#: lang -> [(mention kind, multiline regex with one capture group)]
PATTERNS: dict[str, list[tuple[str, str]]] = {
    "python": [
        ("import", r"^import ([\w.\-]+)\s*$"),
        ("import", r"^from ([\w.\-]+) import \w+\s*$"),
        ("class", r"^class (\w+):"),
        ("func", r"^def (\w+)\("),
        ("repo_ref", r"^# see repo:([\w\-]+)\s*$"),
    ],
    "go": [
        ("import", r'^\s+"([\w.\-]+)"\s*$'),
        ("type", r"^type (\w+) struct"),
        ("func", r"^func (\w+)\("),
        ("repo_ref", r"^// see repo:([\w\-]+)\s*$"),
    ],
}

_COMPILED = {
    lang: [(kind, re.compile(pat, re.M)) for kind, pat in pats]
    for lang, pats in PATTERNS.items()
}


def _fused(lang: str) -> tuple[str, dict[str, str]]:
    """Fuse a language's rules into ONE alternation regex with named
    groups (g0, g1, …) so the content is scanned once per batch, not once
    per rule. Returns (pattern, group-name → kind)."""
    parts: list[str] = []
    group_kind: dict[str, str] = {}
    for idx, (kind, pat) in enumerate(PATTERNS[lang]):
        g = f"g{idx}"
        group_kind[g] = kind
        parts.append("(?:" + pat.replace("(", f"(?P<{g}>", 1) + ")")
    return "|".join(parts), group_kind


_FUSED = {lang: _fused(lang) for lang in PATTERNS}


def extract_mentions(files: DataFrame) -> DataFrame:
    """``(repo, path, commit, lang, content, ...)`` →
    ``(repo, path, lang, kind, name)`` mention rows."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for lang, (pat, group_kind) in _FUSED.items():
                sub = pdf[pdf["lang"] == lang]
                if sub.empty:
                    continue
                # one vectorized extractall over the whole batch slice;
                # exactly one named group is non-null per match
                m = sub["content"].str.extractall(pat, flags=re.M)
                if m.empty:
                    continue
                melted = m.stack()
                row_idx = melted.index.get_level_values(0)
                groups = melted.index.get_level_values(-1)
                outs.append(
                    pd.DataFrame(
                        {
                            "repo": sub["repo"].loc[row_idx].values,
                            "path": sub["path"].loc[row_idx].values,
                            "lang": lang,
                            "kind": groups.map(group_kind).values,
                            "name": melted.values,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)
            else:
                yield pd.DataFrame(
                    columns=["repo", "path", "lang", "kind", "name"]
                )

    return files.select("repo", "path", "lang", "content").mapInPandas(
        scan, schema=MENTION_SCHEMA
    )


def extract_mentions_py(lang: str, content: str) -> list[tuple[str, str]]:
    """Pure-Python oracle twin: ``[(kind, name)]`` in scan order."""
    out: list[tuple[str, str]] = []
    for kind, rx in _COMPILED.get(lang, []):
        for m in rx.finditer(content):
            out.append((kind, m.group(1)))
    return out
