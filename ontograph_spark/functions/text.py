"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen): token
counting, stopword/punctuation statistics, n-gram-heuristic language
guessing, quality scoring and document fingerprinting. Each has an exact
ANSI-SQL equivalent (used by the DuckDB oracle in ``__spark_entry__``), so
semantics are pinned cross-engine — e.g. token counting is
``split(trim(text), '\\s+')`` in both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword heads for the n-gram language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "es": ["el", "la", "los", "de", "que", "y", "es"],
}

PUNCT_CLASS = r"[.,;:!?]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(c: Column | str) -> Column:
    """Whitespace token count; '' counts as 1 (both engines split '' to
    ['']) — callers filter empties if they care."""
    return F.size(F.split(F.trim(_col(c)), r"\s+"))


def bpe_ish_token_count(c: Column | str) -> Column:
    """A BPE-flavored proxy: word pieces + digits + punctuation marks each
    count as a token (regexp-driven, no model needed)."""
    return F.size(
        F.regexp_extract_all(_col(c), F.lit(r"([A-Za-z]{1,6}|[0-9]|[^\sA-Za-z0-9])"), 1)
    )


def stopword_regex(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def stopword_count(c: Column | str, lang: str = "en") -> Column:
    return F.regexp_count(_col(c), F.lit(stopword_regex(lang)))


def punct_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit(PUNCT_CLASS))


def alpha_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit(r"[A-Za-z]"))


def lang_guess(c: Column | str) -> Column:
    """Argmax of per-language stopword hits; ties and zero-evidence →
    'und' (undetermined). Deterministic tie-break by language order."""
    col = _col(c)
    scores = {lang: stopword_count(col, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed order so that earlier languages win exact ties
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(c: Column | str) -> Column:
    """Length/punctuation/stopword quality heuristic in [0, 1]:
    0.5 * stopword presence + 0.3 * alpha ratio + 0.2 * length band."""
    col = _col(c)
    n = F.length(col).cast("double")
    stop_r = stopword_count(col).cast("double") / (token_count(col) + F.lit(1))
    alpha_r = alpha_count(col).cast("double") / (n + F.lit(1))
    len_band = F.when((n >= 20) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        F.least(stop_r * 2, F.lit(1.0)) * 0.5 + alpha_r * 0.3 + len_band * 0.2
    )


def fingerprint(c: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — identical across engines (md5 is standard)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(_col(c)), r"\s+", " ")))


def shingles(c: Column | str, k: int = 5) -> Column:
    """Character k-gram shingle array (for MinHash / Jaccard stages):
    slide over the normalized text."""
    norm = F.lower(F.regexp_replace(F.trim(_col(c)), r"\s+", " "))
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(norm, i, k))


#: PII surface forms a pretraining scrub pass removes, most-specific
#: first (emails before phone-ish digit runs so an address is consumed
#: whole, not partially as a phone number)
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    # spaces/parens allowed inside so "(555) 123-4567" is consumed whole;
    # a scrubber should over- rather than under-redact digit runs
    ("phone", r"\+?\(?\d[\d()\s.-]{6,}\d"),
]


def pii_count(c: Column | str) -> Column:
    """Total PII hits across the pattern table (pre-redaction count, so
    overlapping classes each report their own hits)."""
    col = _col(c)
    out = F.lit(0)
    for _, pat in PII_PATTERNS:
        out = out + F.regexp_count(col, F.lit(pat))
    return out


def redact_pii(c: Column | str, replacement: str = "[PII]") -> Column:
    """Scrub emails / IPv4s / phone-like digit runs, applied in
    PII_PATTERNS order so broader patterns never bite fragments of an
    already-redacted narrower match. Pure Column regexp chain — stays in
    whole-stage codegen at 100 TB."""
    out = _col(c)
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, replacement)
    return out


def dup_ngram_fraction(c: Column | str, n: int = 3) -> Column:
    """Within-document repetition signal: fraction of word ``n``-grams
    that are repeats of an earlier n-gram in the same document
    (1 - distinct/total; 0.0 for docs shorter than ``n`` words).
    The Gopher-style rep filter a pretraining corpus pass drops
    boilerplate/spam on. Pure Column array exprs — per-row, no shuffle.

    The gram array is BOUND ONCE via a single-element ``transform``
    lambda: referencing ``word_ngrams(...)`` from both ``size`` and
    ``array_distinct`` re-evaluates the whole gram build per reference
    (codegen does no cross-expression CSE for array-valued
    subexpressions — measured 7.7 s vs 2.8 s for the full corpus pass
    at sf0.1)."""
    g = word_ngrams(c, n)
    return F.element_at(
        F.transform(
            F.array(g),
            lambda arr: F.when(
                F.size(arr) > 0,
                F.lit(1.0)
                - F.size(F.array_distinct(arr)).cast("double")
                / F.size(arr).cast("double"),
            ).otherwise(F.lit(0.0)),
        ),
        1,
    )


def top_word_fraction(c: Column | str) -> Column:
    """Frequency share of the most common word (lowercased, whitespace
    tokens). High values flag keyword-stuffed / degenerate documents.

    One ``array_sort`` + one ``aggregate`` pass tracking the longest
    equal-token run — O(tokens log tokens) per row, all inside the row
    (no shuffle, whole-stage codegen). The obvious
    filter-per-distinct-token formulation is O(distinct × tokens) and
    made this the slowest corpus query at sf0.1 (18.2 s → ~3 s)."""
    toks = F.split(F.lower(F.trim(_col(c))), r"\s+")
    total = F.size(toks)
    top = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(total > 0, top.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def word_ngrams(c: Column | str, n: int = 4) -> Column:
    """Word n-gram array over lowercased, whitespace-split text. Docs with
    fewer than ``n`` tokens yield an empty array (mirrors an empty
    ``range()`` in the SQL twin)."""
    toks = F.split(F.lower(F.trim(_col(c))), r"\s+")
    cnt = F.size(toks)
    idx = F.when(cnt >= n, F.sequence(F.lit(1), cnt - n + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def contamination_pairs(
    docs: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: every (corpus doc, probe doc) pair that
    shares ≥1 word n-gram, with the count of distinct shared n-grams.

    The standard pretraining hygiene step (strip eval-set overlap from the
    corpus before training): the probe side is the benchmark suite.

    100 TB plan shape: per-document distinctness via ``array_distinct``
    INSIDE the row (no shuffle), probe n-grams exploded and broadcast
    (a benchmark suite is tiny next to the corpus), so the corpus side is
    one flatMap into a broadcast hash join; the only shuffle is the final
    (doc, probe) count over matched rows — a vanishing fraction of the
    corpus — with map-side partial aggregation.
    """
    corpus_g = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("g"),
    )
    probe_g = probes.select(
        F.col(probe_id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("g"),
    )
    return (
        corpus_g.join(F.broadcast(probe_g), "g")
        .groupBy(id_col, probe_id_col)
        .agg(F.count("*").alias("shared_ngrams"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Corpus-fit unigram language-model score per document — the
    classic perplexity-proxy quality signal (documents whose words are
    improbable under the corpus's own unigram distribution are noise /
    boilerplate / wrong-language candidates).

    Returns ``(doc_id, n_tokens, logprob_micro)`` where
    ``logprob_micro = Σ_w c_dw · round(ln((c_w + s)/(N + s·V)) · 1e6)``
    (Laplace smoothing ``s``; ``c_w`` corpus count, ``N`` corpus token
    total, ``V`` vocabulary size). The per-word log-prob is micro-scaled
    to a BIGINT **before** the per-document sum, so the aggregate is
    integer arithmetic — order-independent and engine-exact (the same
    trick as tfidf_top_terms' milli-scaled score). Mean log-prob =
    logprob_micro / (1e6 · n_tokens) when a float is wanted.

    100 TB plan shape: explode → map-side-combined (doc, word) counts →
    one word-keyed shuffle shared by the vocabulary aggregate and the
    (doc,word)⋈vocab join (same key ⇒ exchange reuse) → a broadcast
    one-row totals frame → doc-keyed final aggregate. No driver loop,
    no collect; the vocabulary never materializes on the driver."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias(
            "w"
        ),
    ).where(F.col("w") != "")
    dw = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c_dw"))
    vocab = dw.groupBy("w").agg(F.sum("c_dw").alias("c_w"))
    totals = vocab.agg(
        F.sum("c_w").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    scored = (
        dw.join(vocab, "w")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            "c_dw",
            F.round(
                F.log(
                    (F.col("c_w") + F.lit(smoothing))
                    / (F.col("n_total") + F.lit(smoothing) * F.col("v_size"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    return scored.groupBy("id").agg(
        F.sum("c_dw").cast("bigint").alias("n_tokens"),
        F.sum(F.col("c_dw") * F.col("lp_micro"))
        .cast("bigint")
        .alias("logprob_micro"),
    )
