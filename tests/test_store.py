"""Quad-store semantics tests.

Scenario matrix transcribed from the reference store suite
(/root/reference/memory_store_test.go:14-401): the canonical 7-triple
fixture, wildcard matching, checked/unchecked add/delete including
atomicity-on-conflict, drop, size, and Turtle round-trip. Both backends
(in-memory DataFrame, parquet snapshot store) run the same matrix — they
share the DataFrame-algebra operator set and must behave identically.
"""

from __future__ import annotations

import io

import pytest

from ontograph_spark.errors import (
    TripleAlreadyExistsError,
    TripleDoesNotExistError,
)
from ontograph_spark.ontology.resources import Triple, new_triple
from ontograph_spark.store import MemoryQuadStore, ParquetQuadStore
from ontograph_spark.store.turtle import parse_turtle
from ontograph_spark.terms import mk_literal, mk_resource

GRAPH_URI = "https://www.ontograph.com/test-store"


def fixture_triples(uri: str) -> list[Triple]:
    """memory_store_test.go:19-44."""
    return [
        new_triple(mk_resource(uri), mk_resource(f"{uri}#rel-1"), mk_resource(f"{uri}#a")),
        new_triple(mk_resource(uri), mk_resource(f"{uri}#rel-1"), mk_resource(f"{uri}#b")),
        new_triple(mk_resource(uri), mk_resource(f"{uri}#rel-1"), mk_resource(f"{uri}#c")),
        new_triple(mk_resource(f"{uri}#a"), mk_resource(f"{uri}#rel-2"), mk_resource(f"{uri}#b")),
        new_triple(mk_resource(f"{uri}#c"), mk_resource(f"{uri}#rel-3"), mk_literal("lit1", "", "")),
        new_triple(mk_resource(f"{uri}#c"), mk_resource(f"{uri}#rel-4"), mk_literal("lit2", "de", "")),
        new_triple(mk_resource(f"{uri}#c"), mk_resource(f"{uri}#rel-5"), mk_literal("lit3", "", f"{uri}#datatype")),
    ]


@pytest.fixture(params=["memory", "parquet"])
def store(request, spark, tmp_path):
    if request.param == "memory":
        s = MemoryQuadStore(spark, GRAPH_URI)
    else:
        s = ParquetQuadStore(spark, GRAPH_URI, str(tmp_path / "quads"), write_partitions=2)
    s.add_triples(fixture_triples(GRAPH_URI))
    return s


TRIPLES = fixture_triples(GRAPH_URI)


def as_set(triples):
    return {t.as_tuple() for t in triples}


def test_get_uri(store):
    assert store.get_uri() == GRAPH_URI


def test_get_first_match_single(store):
    t = store.get_first_match("", mk_resource(f"{GRAPH_URI}#rel-3"), '"lit1"')
    assert t == TRIPLES[4]


def test_get_first_match_multiple(store):
    t = store.get_first_match(mk_resource(GRAPH_URI), mk_resource(f"{GRAPH_URI}#rel-1"), "")
    assert t in TRIPLES[0:3]


def test_get_first_match_none(store):
    assert store.get_first_match("", mk_resource(f"{GRAPH_URI}#rel-42"), "") is None


def test_get_all_matches(store):
    got = store.get_all_matches("", mk_resource(f"{GRAPH_URI}#rel-1"), "")
    assert as_set(got) == as_set(TRIPLES[0:3])


def test_get_all_matches_none(store):
    assert store.get_all_matches("", mk_resource(f"{GRAPH_URI}#rel-1"), '"lit1"') == []


def test_get_all_matches_full_wildcard(store):
    assert as_set(store.get_all_matches()) == as_set(TRIPLES)


def test_delete_all_matches(store):
    store.delete_all_matches("", "", mk_resource(f"{GRAPH_URI}#b"))
    got = as_set(store.get_all_triples())
    assert TRIPLES[0].as_tuple() in got
    assert TRIPLES[1].as_tuple() not in got
    assert TRIPLES[3].as_tuple() not in got
    assert as_set([TRIPLES[0], TRIPLES[2], TRIPLES[4], TRIPLES[5], TRIPLES[6]]) <= got


def test_delete_all_matches_no_match(store):
    store.delete_all_matches(mk_resource(f"{GRAPH_URI}#42"), "", "")
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_add_triple(store):
    t = new_triple(mk_resource(f"{GRAPH_URI}#new"), mk_resource(f"{GRAPH_URI}#rel-1"), '"x"')
    store.add_triple(t)
    assert t.as_tuple() in as_set(store.get_all_triples())


def test_add_triple_conflict(store):
    with pytest.raises(TripleAlreadyExistsError):
        store.add_triple(TRIPLES[0])
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_add_triples_atomic_rollback(store):
    """memory_store_test.go:206-247 — a conflicting batch leaves the store
    unchanged."""
    fresh = new_triple(mk_resource(f"{GRAPH_URI}#n1"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    with pytest.raises(TripleAlreadyExistsError):
        store.add_triples([fresh, TRIPLES[2]])
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_add_triples_duplicate_in_batch(store):
    t = new_triple(mk_resource(f"{GRAPH_URI}#n2"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    with pytest.raises(TripleAlreadyExistsError):
        store.add_triples([t, t])
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_add_triple_unchecked_idempotent(store):
    store.add_triple_unchecked(TRIPLES[0])
    assert store.size() == len(TRIPLES)  # no duplicate row


def test_add_triples_unchecked(store):
    fresh = new_triple(mk_resource(f"{GRAPH_URI}#n3"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    store.add_triples_unchecked([fresh, TRIPLES[0], fresh])
    got = as_set(store.get_all_triples())
    assert got == as_set(TRIPLES) | {fresh.as_tuple()}
    assert store.size() == len(TRIPLES) + 1


def test_delete_triple(store):
    store.delete_triple(TRIPLES[3])
    assert TRIPLES[3].as_tuple() not in as_set(store.get_all_triples())
    assert store.size() == len(TRIPLES) - 1


def test_delete_triple_missing(store):
    ghost = new_triple(mk_resource(f"{GRAPH_URI}#ghost"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    with pytest.raises(TripleDoesNotExistError):
        store.delete_triple(ghost)
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_delete_triples_atomic_rollback(store):
    """memory_store_test.go:317-354 — one missing triple rolls the whole
    batch back."""
    ghost = new_triple(mk_resource(f"{GRAPH_URI}#ghost"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    with pytest.raises(TripleDoesNotExistError):
        store.delete_triples([TRIPLES[0], ghost])
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_delete_triples_repeated_row_rolls_back(store):
    with pytest.raises(TripleDoesNotExistError):
        store.delete_triples([TRIPLES[0], TRIPLES[0]])
    assert as_set(store.get_all_triples()) == as_set(TRIPLES)


def test_delete_triple_unchecked(store):
    ghost = new_triple(mk_resource(f"{GRAPH_URI}#ghost"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    store.delete_triple_unchecked(ghost)  # no error
    store.delete_triple_unchecked(TRIPLES[6])
    assert store.size() == len(TRIPLES) - 1


def test_delete_triples_unchecked(store):
    ghost = new_triple(mk_resource(f"{GRAPH_URI}#ghost"), mk_resource(f"{GRAPH_URI}#r"), '"v"')
    store.delete_triples_unchecked([TRIPLES[0], ghost, TRIPLES[1]])
    assert as_set(store.get_all_triples()) == as_set(TRIPLES[2:])


def test_size(store):
    assert store.size() == len(TRIPLES)


def test_drop(store):
    store.drop()
    assert store.get_uri() == ""


def test_turtle_round_trip(store):
    """memory_store_test.go:363-394 — serialize, reparse, compare sets."""
    buf = io.StringIO()
    store.serialize_to_turtle(buf, pretty=False)
    base, parsed = parse_turtle(buf.getvalue())
    assert {tuple(t) for t in parsed} == as_set(TRIPLES)


def test_turtle_pretty_has_prefixes(store):
    buf = io.StringIO()
    store.serialize_to_turtle(buf, pretty=True)
    text = buf.getvalue()
    assert f"@base <{GRAPH_URI}> ." in text
    assert "@prefix rdf:" in text
    # graph-namespace URIs are rewritten to the empty prefix
    assert ":rel-1" in text


def test_turtle_pretty_golden(spark):
    """Byte-exact pin of the pretty formatter's output shape
    (memory_store.go:242-299): header = @prefix lines (empty prefix first,
    then rdf/rdfs/owl/xsd, then one per owl:imports target abbreviated by
    the segment after the last '/'), one @base line, then statements
    separated by blank lines with graph-namespace URIs rewritten to the
    empty prefix. Statement ORDER follows store iteration (a Go map walk in
    the reference — not part of the pinned contract), so the body is
    compared as a multiset of byte-exact statements."""
    uri = "https://www.ontograph.com/golden"
    s = MemoryQuadStore(spark, uri)
    s.add_triples(
        [
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
                mk_resource("http://www.w3.org/2002/07/owl#Ontology"),
            ),
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/2002/07/owl#imports"),
                mk_resource("https://deps.example/ontologies/core"),
            ),
            new_triple(
                mk_resource(f"{uri}#a"),
                mk_resource("https://deps.example/ontologies/core#rel"),
                mk_literal("lit", "de", ""),
            ),
        ]
    )
    buf = io.StringIO()
    s.serialize_to_turtle(buf, pretty=True)
    text = buf.getvalue()

    header, _, body = text.partition(" .\n\n")
    header += " .\n\n"
    assert header == (
        f"@prefix : <{uri}#> .\n"
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "@prefix core: <https://deps.example/ontologies/core#> .\n"
        f"@base <{uri}> .\n\n"
    )
    statements = sorted(st for st in body.split("\n\n") if st.strip())
    assert statements == sorted(
        [
            f"<{uri}> owl:imports <https://deps.example/ontologies/core> .",
            f"<{uri}> rdf:type owl:Ontology .",
            ':a core:rel "lit"@de .',
        ]
    )


def test_turtle_pretty_multi_import_golden(spark):
    """Byte-exact pin of the multi-import prefix map (memory_store.go:
    268-281 — one @prefix per owl:imports target, abbreviated by the
    URI segment after the last '/'), with three imports, an
    ABBREVIATION collision (two imports end in the same segment: a map
    assignment, so the later import's namespace wins the prefix and the
    earlier one's URIs stay full IRIs — exactly what the Go
    ``prefixMap[abbr] = importURI + "#"`` does), and a CURIE-collision
    pair (one namespace textually containing another). Statement order
    is store iteration (not part of the pinned contract) — the body
    compares as a sorted multiset, the header byte-exactly."""
    uri = "https://www.ontograph.com/multi"
    s = MemoryQuadStore(spark, uri)
    s.add_triples(
        [
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/2002/07/owl#imports"),
                mk_resource("https://deps.example/ontologies/alpha"),
            ),
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/2002/07/owl#imports"),
                mk_resource("https://deps.example/ontologies/beta"),
            ),
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/2002/07/owl#imports"),
                mk_resource("https://other.example/vocab/beta"),
            ),
            new_triple(
                mk_resource(f"{uri}#n1"),
                mk_resource("https://deps.example/ontologies/alpha#rel"),
                mk_literal("one", "", ""),
            ),
            new_triple(
                mk_resource(f"{uri}#n2"),
                mk_resource("https://deps.example/ontologies/beta#rel"),
                mk_literal("two", "", ""),
            ),
            new_triple(
                mk_resource(f"{uri}#n3"),
                mk_resource("https://other.example/vocab/beta#rel"),
                mk_literal("three", "", ""),
            ),
        ]
    )
    buf = io.StringIO()
    s.serialize_to_turtle(buf, pretty=True)
    text = buf.getvalue()
    header, _, body = text.partition(" .\n\n")
    header += " .\n\n"
    assert header == (
        f"@prefix : <{uri}#> .\n"
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "@prefix alpha: <https://deps.example/ontologies/alpha#> .\n"
        # the colliding abbr keeps its first-insertion POSITION with the
        # last-assigned VALUE (dict update ≙ Go map assignment)
        "@prefix beta: <https://other.example/vocab/beta#> .\n"
        f"@base <{uri}> .\n\n"
    )
    statements = sorted(st for st in body.split("\n\n") if st.strip())
    assert statements == sorted(
        [
            f"<{uri}> owl:imports <https://deps.example/ontologies/alpha> .",
            f"<{uri}> owl:imports <https://deps.example/ontologies/beta> .",
            f"<{uri}> owl:imports <https://other.example/vocab/beta> .",
            ':n1 alpha:rel "one" .',
            # the deps beta namespace LOST the abbr — its URIs stay full
            f':n2 <https://deps.example/ontologies/beta#rel> "two" .',
            ':n3 beta:rel "three" .',
        ]
    )


def test_turtle_pretty_reference_quirks(spark):
    """Two byte-level behaviors transcribed from memory_store.go:
    (1) the blank-line pass is a bare ``strings.Replace(content, " .",
    " .\\n\\n", -1)`` — it fires INSIDE literals too, so a literal
    containing ``" ."`` gets split exactly like the reference splits it;
    (2) CURIE rewriting applies per-prefix in map order — insertion
    order here (deterministic, unlike Go's randomized walk) — so when
    one namespace textually contains another, the earlier-inserted
    prefix wins for URIs it matches first."""
    uri = "https://www.ontograph.com/quirks"
    s = MemoryQuadStore(spark, uri)
    s.add_triples(
        [
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/2002/07/owl#imports"),
                mk_resource("https://deps.example/base"),
            ),
            new_triple(
                mk_resource(uri),
                mk_resource("http://www.w3.org/2002/07/owl#imports"),
                mk_resource("https://deps.example/base/sub"),
            ),
            new_triple(
                mk_resource(f"{uri}#n"),
                mk_resource("https://deps.example/base/sub#rel"),
                mk_literal("ends with a dot .", "", ""),
            ),
        ]
    )
    buf = io.StringIO()
    s.serialize_to_turtle(buf, pretty=True)
    text = buf.getvalue()
    # (1) the literal's " ." was split by the blank-line pass, exactly
    # like strings.Replace would
    assert '"ends with a dot .\n\n"' in text
    # (2) both imports got prefixes (abbr = segment after last '/');
    # the sub namespace URI rewrote with its own prefix (the base
    # prefix "https://deps.example/base#" is not a textual prefix of
    # "https://deps.example/base/sub#rel", so no contest on this pair —
    # pin that both CURIEs appear)
    assert "@prefix base: <https://deps.example/base#> .\n" in text
    assert "@prefix sub: <https://deps.example/base/sub#> .\n" in text
    assert "sub:rel" in text


def test_graphs_listing(store):
    """GetGraphs analogue (blazegraph_endpoint.go:158-175)."""
    assert store.graphs() == [GRAPH_URI]


def test_from_turtle_round_trip(spark, store):
    """memory_store_test.go:363-394 — the loaded store matches the test
    triples exactly, for both plain and pretty serialization."""
    for pretty in (False, True):
        buf = io.StringIO()
        store.serialize_to_turtle(buf, pretty=pretty)
        loaded = MemoryQuadStore.from_turtle(spark, buf.getvalue())
        assert as_set(loaded.get_all_triples()) == as_set(TRIPLES), pretty
        assert loaded.size() == len(TRIPLES)


def test_from_turtle_base_uri_rules(spark):
    """memory_store.go:32-60: owl:Ontology marker subject wins; else the
    first triple's subject; empty input errors."""
    marked = (
        f"<{GRAPH_URI}#x> <{GRAPH_URI}#rel> <{GRAPH_URI}#y> .\n"
        f"<https://base.example/ont> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://www.w3.org/2002/07/owl#Ontology> .\n"
    )
    assert (
        MemoryQuadStore.from_turtle(spark, marked).get_uri()
        == "https://base.example/ont"
    )
    unmarked = f"<{GRAPH_URI}#x> <{GRAPH_URI}#rel> <{GRAPH_URI}#y> .\n"
    assert MemoryQuadStore.from_turtle(spark, unmarked).get_uri() == f"{GRAPH_URI}#x"
    with pytest.raises(ValueError, match="No triple found"):
        MemoryQuadStore.from_turtle(spark, "# only a comment\n")


def test_parquet_snapshot_history(spark, tmp_path):
    s = ParquetQuadStore(spark, GRAPH_URI, str(tmp_path / "q2"), write_partitions=2)
    s.add_triples(fixture_triples(GRAPH_URI)[:2])
    s.add_triple(fixture_triples(GRAPH_URI)[2])
    hist = s.history()
    assert len(hist) == 2
    assert hist[-1]["rows"] == 3
    assert hist[-1]["parent"] == hist[0]["snapshot"]
    # a fresh handle over the same root sees the committed state
    s2 = ParquetQuadStore(spark, GRAPH_URI, str(tmp_path / "q2"))
    assert s2.size() == 3
    expired = s.expire_snapshots(keep=1)
    assert expired and s2.size() == 3


def test_nquads_round_trip(spark, tmp_path):
    """N-Quads source/sink: multi-graph round trip preserves the graph
    column; graph-less lines scope to the default graph."""
    from ontograph_spark.sources.nquads import read_nquads, write_nquads

    rows = [
        ("<u:a>", "<u:p>", "<u:b>", "g1"),
        ("<u:a>", "<u:p>", '"lit with spaces"', "g2"),
        ("<u:c>", "<u:q>", '"3"^^<http://www.w3.org/2001/XMLSchema#integer>', "g1"),
    ]
    quads = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string"
    )
    out = str(tmp_path / "nq")
    write_nquads(quads, out)
    back = read_nquads(spark, out)
    assert {tuple(r) for r in back.collect()} == set(rows)
    # graph-less lines (plain N-Triples) land in the default graph
    mixed = str(tmp_path / "mixed.nq")
    with open(mixed, "w") as f:
        f.write("<u:x> <u:p> <u:y> .\n")
        f.write('<u:x> <u:p> "v" <u:g> .\n')
        f.write("# comment\n\n")
    got = {tuple(r) for r in read_nquads(spark, mixed, "fallback").collect()}
    assert got == {
        ("<u:x>", "<u:p>", "<u:y>", "fallback"),
        ("<u:x>", "<u:p>", '"v"', "u:g"),
    }


def test_nquads_strict_mode(spark, tmp_path):
    """strict=True turns silently-dropped unparseable lines into a loud
    ValueError naming a sample; the default stays lenient."""
    import pytest

    from ontograph_spark.sources.nquads import read_nquads

    corrupt = str(tmp_path / "corrupt.nq")
    with open(corrupt, "w") as f:
        f.write("<u:x> <u:p> <u:y> .\n")
        f.write("_:b0 <u:p> <u:y> .\n")  # blank-node subject: unsupported
        f.write("totally not a statement\n")
    # lenient default: the two bad lines vanish
    assert read_nquads(spark, corrupt).count() == 1
    with pytest.raises(ValueError, match="2 unparseable"):
        read_nquads(spark, corrupt, strict=True)
    # a clean file passes strict unchanged
    clean = str(tmp_path / "clean.nq")
    with open(clean, "w") as f:
        f.write("<u:x> <u:p> <u:y> <u:g> .\n")
    assert read_nquads(spark, clean, strict=True).count() == 1
