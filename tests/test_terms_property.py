"""Property-based tests for the term codec (hypothesis).

The transcribed reference matrix (tests/test_terms.py) pins the known
edge cases; these properties pin the codec on the whole well-formed
input space: encode→inspect round-trips, invalid-term behavior, triple
validation, and a Turtle parse round-trip. Pure-Python twins only (fast,
no Spark session); the Column twins are cross-checked against the Python
twins on a seeded random batch in one DataFrame at the end.

Generation is constrained to the unambiguous subset the reference
supports: no quote escaping exists (triple.go:21-30), so values exclude
``"``; URIs exclude ``<>`` and whitespace; languages match the BCP-47-ish
shapes the reference tests use. Outside that subset the encoding is
lossy BY DESIGN (e.g. a value containing ``"@`` shifts Value()'s
last-@ split) — the matrix tests cover those quirks explicitly.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ontograph_spark.store.turtle import parse_turtle
from ontograph_spark.terms import (
    is_literal,
    is_resource,
    mk_literal,
    mk_resource,
    term_datatype,
    term_language,
    term_value,
    validate_triple,
)

URI_ALPHABET = string.ascii_letters + string.digits + ":/#._-~%?="
VALUE_ALPHABET = string.ascii_letters + string.digits + " .,;:!?_-+()"

uris = st.text(URI_ALPHABET, min_size=1, max_size=40)
values = st.text(VALUE_ALPHABET, min_size=0, max_size=40)
langs = st.from_regex(r"[a-z]{2}(-[A-Z]{2})?", fullmatch=True)


@given(uris)
def test_resource_round_trip(uri):
    t = mk_resource(uri)
    assert is_resource(t) and not is_literal(t)
    assert term_value(t) == uri
    assert term_language(t) == "" and term_datatype(t) == ""


@given(values, st.one_of(st.just(""), langs), st.one_of(st.just(""), uris))
def test_literal_round_trip(value, lang, dt):
    t = mk_literal(value, lang, dt)
    if not (value or lang or dt):
        # the empty plain literal '""' is INVALID (len>2 required,
        # triple.go:44-47; pinned by triple_test.go's '""' case)
        assert not is_literal(t)
        return
    assert is_literal(t) and not is_resource(t)
    assert term_value(t) == value
    # reference quirk (triple.go:71-78): Language() returns EVERYTHING
    # after the last '@', so a datatype suffix rides along
    want_lang = (lang + (f"^^<{dt}>" if dt else "")) if lang else ""
    assert term_language(t) == want_lang
    # reference quirk (triple.go:81-88): Datatype() requires the '^^' to
    # be quote-adjacent ('"^^'), so a language tag in between hides it;
    # the parsed datatype is the bare URI (Value() of the '<dt>' tail)
    want_dt = dt if (dt and not lang) else ""
    assert term_datatype(t) == want_dt
    # encoding order is value, then @lang, then ^^<dt> (triple.go:21-30)
    if lang and dt:
        assert t == f'"{value}"@{lang}^^<{dt}>'


@given(st.text(string.printable, max_size=20))
def test_invalid_terms_yield_empty_value(s):
    # anything not shaped like a resource or literal has Value() == ""
    if not (is_resource(s) or is_literal(s)):
        assert term_value(s) == ""


@given(
    uris,
    uris,
    st.one_of(
        uris.map(mk_resource),
        values.filter(lambda v: v != "").map(mk_literal),
    ),
)
def test_validate_triple_accepts_well_formed(s, p, o):
    validate_triple(mk_resource(s), mk_resource(p), o)  # must not raise


@given(values.filter(lambda v: v != ""), uris, uris)
def test_validate_triple_rejects_literal_subject_or_predicate(v, p, o):
    lit = mk_literal(v)
    for subj, pred in ((lit, mk_resource(p)), (mk_resource(p), lit)):
        try:
            validate_triple(subj, pred, mk_resource(o))
            raised = False
        except Exception:
            raised = True
        assert raised


@settings(max_examples=30)
@given(
    st.lists(
        st.tuples(
            uris,
            uris,
            st.one_of(
                uris.map(mk_resource),
                st.tuples(values, st.one_of(st.just(""), langs)).map(
                    lambda t: mk_literal(t[0], t[1])
                ),
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_turtle_plain_round_trip(triples):
    text = "".join(
        f"{mk_resource(s)} {mk_resource(p)} {o} .\n" for s, p, o in triples
    )
    _, parsed = parse_turtle(text)
    want = {(mk_resource(s), mk_resource(p), o) for s, p, o in triples}
    assert set(parsed) == want


def test_column_twins_match_python_on_random_batch(spark):
    """One DataFrame of 300 seeded random cases through BOTH twins —
    every inspector must agree with its pure-Python oracle byte for
    byte."""
    import random

    from pyspark.sql import functions as F

    from ontograph_spark.terms import (
        is_literal_col,
        is_resource_col,
        term_datatype_col,
        term_language_col,
        term_value_col,
    )

    rng = random.Random(42)

    def rnd(alphabet, lo, hi):
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randint(lo, hi))
        )

    terms = []
    for _ in range(300):
        kind = rng.random()
        if kind < 0.35:
            terms.append(mk_resource(rnd(URI_ALPHABET, 1, 30)))
        elif kind < 0.85:
            lang = rnd(string.ascii_lowercase, 2, 2) if rng.random() < 0.5 else ""
            dt = rnd(URI_ALPHABET, 3, 20) if rng.random() < 0.5 else ""
            terms.append(mk_literal(rnd(VALUE_ALPHABET, 0, 30), lang, dt))
        else:  # garbage
            terms.append(rnd(string.printable.strip(), 0, 10))

    df = spark.createDataFrame([(t,) for t in terms], ["t"])
    got = df.select(
        "t",
        is_resource_col("t").alias("r"),
        is_literal_col("t").alias("l"),
        term_value_col("t").alias("v"),
        term_language_col("t").alias("lang"),
        term_datatype_col("t").alias("dt"),
    ).collect()
    for row in got:
        t = row["t"]
        assert row["r"] == is_resource(t), t
        assert row["l"] == is_literal(t), t
        assert row["v"] == term_value(t), t
        assert row["lang"] == term_language(t), t
        assert row["dt"] == term_datatype(t), t
