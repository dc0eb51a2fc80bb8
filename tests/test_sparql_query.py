"""SPARQL SELECT/ASK answering over the quad table.

Parity pin: the reference can only *send* SPARQL to Blazegraph
(/root/reference/blazegraph_store.go:40-53, 126-137, 396-411). Here the
exact query strings :class:`SparqlQuadStore` generates are ANSWERED by
``sparql_select``/``sparql_ask`` over a quad DataFrame and must agree
with the direct store operators (``get_all_matches``/``size``) on the
canonical 7-triple fixture (memory_store_test.go:19-44).
"""

from __future__ import annotations

import pytest

from ontograph_spark.query import SparqlSyntaxError, sparql_ask, sparql_select
from ontograph_spark.store import MemoryQuadStore
from ontograph_spark.store.sparql_store import SparqlQuadStore
from ontograph_spark.terms import mk_literal, mk_resource

from test_store import GRAPH_URI, fixture_triples

U = GRAPH_URI


@pytest.fixture(scope="module")
def store(spark):
    s = MemoryQuadStore(spark, U)
    s.add_triples(fixture_triples(U))
    return s


#: pure string-builder (no server) — source of the reference-shaped queries
BUILDER = SparqlQuadStore(U, "http://unused.invalid/sparql")


PATTERNS = [
    ("", "", ""),
    (mk_resource(U), "", ""),
    ("", mk_resource(f"{U}#rel-1"), ""),
    ("", "", mk_resource(f"{U}#b")),
    ("", "", mk_literal("lit2", "de", "")),
    (mk_resource(f"{U}#c"), mk_resource(f"{U}#rel-5"), ""),
    (mk_resource(U), "", mk_resource(f"{U}#a")),
    (mk_resource(f"{U}#nope"), "", ""),
    (mk_resource(U), mk_resource(f"{U}#rel-1"), mk_resource(f"{U}#a")),
    (mk_resource(U), mk_resource(f"{U}#rel-1"), mk_resource(f"{U}#zzz")),
]


@pytest.mark.parametrize("s,p,o", PATTERNS)
def test_answers_reference_select_strings(store, s, p, o):
    """select_sparql output answered over the quad table == get_all_matches."""
    query = BUILDER.select_sparql(s, p, o)
    df = sparql_select(store.df(), query)
    if s and p and o:
        # all-constant probe: one marker row iff the triple exists
        assert df.count() == (1 if store.get_all_matches(s, p, o) else 0)
        return
    if not any((s, p, o)):
        assert df.columns == ["s", "p", "o"]
    got = {tuple(r) for r in df.collect()}
    want = {
        tuple(
            val
            for fixed, val in ((s, t.subject), (p, t.predicate), (o, t.object))
            if not fixed
        )
        for t in store.get_all_matches(s, p, o)
    }
    assert got == want


def test_answers_reference_count_string(store):
    df = sparql_select(store.df(), BUILDER.count_sparql())
    assert df.columns == ["n"]
    assert df.collect()[0][0] == store.size() == 7


def test_answers_reference_ask_string(store):
    present = store.get_all_matches("", "", "")[0]
    assert sparql_ask(store.df(), BUILDER.ask_sparql(present)) is True
    from ontograph_spark.ontology.resources import new_triple

    absent = new_triple(
        mk_resource(f"{U}#ghost"), mk_resource(f"{U}#rel-1"), mk_resource(f"{U}#a")
    )
    assert sparql_ask(store.df(), BUILDER.ask_sparql(absent)) is False


def test_bgp_join_on_shared_var(store):
    q = f"""
    SELECT ?x ?y WHERE {{ GRAPH <{U}> {{
        <{U}> <{U}#rel-1> ?x .
        ?x <{U}#rel-2> ?y .
    }} }}"""
    rows = {tuple(r) for r in sparql_select(store.df(), q).collect()}
    assert rows == {(f"<{U}#a>", f"<{U}#b>")}


def test_predicate_object_list_sugar_and_prefixes(store):
    q = f"""
    PREFIX t: <{U}#>
    SELECT ?o1 ?o2 WHERE {{
        <{U}#c> t:rel-3 ?o1 ; t:rel-4 ?o2 .
    }}"""
    rows = {tuple(r) for r in sparql_select(store.df(), q).collect()}
    assert rows == {('"lit1"', '"lit2"@de')}


def test_object_list_and_literal_constant(store):
    q = f"""
    SELECT ?s WHERE {{ ?s <{U}#rel-4> "lit2"@de . }}"""
    rows = [r[0] for r in sparql_select(store.df(), q).collect()]
    assert rows == [f"<{U}#c>"]


def test_optional_yields_nulls(store):
    q = f"""
    SELECT ?x ?y WHERE {{
        <{U}> <{U}#rel-1> ?x
        OPTIONAL {{ ?x <{U}#rel-2> ?y }}
    }}"""
    rows = {tuple(r) for r in sparql_select(store.df(), q).collect()}
    assert rows == {
        (f"<{U}#a>", f"<{U}#b>"),
        (f"<{U}#b>", None),
        (f"<{U}#c>", None),
    }


def test_optional_with_negation_idiom(store):
    q = f"""
    SELECT ?x WHERE {{
        <{U}> <{U}#rel-1> ?x
        OPTIONAL {{ ?x <{U}#rel-2> ?y }}
        FILTER(!BOUND(?y))
    }}"""
    rows = {r[0] for r in sparql_select(store.df(), q).collect()}
    assert rows == {f"<{U}#b>", f"<{U}#c>"}


def test_union_merges_branches(store):
    q = f"""
    SELECT ?v WHERE {{
        {{ <{U}#c> <{U}#rel-3> ?v }} UNION {{ <{U}#c> <{U}#rel-4> ?v }}
    }}"""
    rows = {r[0] for r in sparql_select(store.df(), q).collect()}
    assert rows == {'"lit1"', '"lit2"@de'}


def test_union_disjoint_vars_pad_with_null(store):
    q = f"""
    SELECT ?v3 ?v4 WHERE {{
        {{ <{U}#c> <{U}#rel-3> ?v3 }} UNION {{ <{U}#c> <{U}#rel-4> ?v4 }}
    }}"""
    rows = {tuple(r) for r in sparql_select(store.df(), q).collect()}
    assert rows == {('"lit1"', None), (None, '"lit2"@de')}


def test_filter_string_value_and_boolean_ops(store):
    q = f"""
    SELECT ?s ?o WHERE {{
        ?s ?p ?o
        FILTER(?o = "lit1" || ?o = "lit2")
    }}"""
    rows = {tuple(r) for r in sparql_select(store.df(), q).collect()}
    # value-mode compare strips the encoding — both the plain and the
    # @de-tagged literal match on value
    assert rows == {(f"<{U}#c>", '"lit1"'), (f"<{U}#c>", '"lit2"@de')}


def test_filter_full_term_when_tagged(store):
    q = f"""
    SELECT ?s WHERE {{ ?s ?p ?o FILTER(?o = "lit2"@de) }}"""
    assert [r[0] for r in sparql_select(store.df(), q).collect()] == [f"<{U}#c>"]


def test_filter_numeric_comparison(spark):
    store = MemoryQuadStore(spark, "urn:nums")
    from ontograph_spark.ontology.resources import new_triple

    xsd_dec = "http://www.w3.org/2001/XMLSchema#decimal"
    store.add_triples(
        [
            new_triple(
                mk_resource(f"urn:nums#e{i}"),
                mk_resource("urn:nums#val"),
                mk_literal(f"{v:f}", "", xsd_dec),
            )
            for i, v in enumerate([1.5, 10.0, 250.25])
        ]
    )
    q = """
    SELECT ?s WHERE { ?s <urn:nums#val> ?v FILTER(?v > 5 && ?v <= 250.25) }"""
    rows = {r[0] for r in sparql_select(store.df(), q).collect()}
    assert rows == {"<urn:nums#e1>", "<urn:nums#e2>"}


def test_distinct_order_limit_offset(store):
    q = f"""
    SELECT DISTINCT ?o WHERE {{ <{U}> <{U}#rel-1> ?o }}
    ORDER BY DESC(?o) LIMIT 2 OFFSET 1"""
    rows = [r[0] for r in sparql_select(store.df(), q).collect()]
    assert rows == [f"<{U}#b>", f"<{U}#a>"]


def test_graph_variable_binds_graph_column(spark, store):
    other = MemoryQuadStore(spark, "urn:other")
    from ontograph_spark.ontology.resources import new_triple

    other.add_triple(
        new_triple(mk_resource("urn:other#x"), mk_resource("urn:other#p"), mk_resource("urn:other#y"))
    )
    both = store.df().unionByName(other.df())
    q = "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s ?p ?o } }"
    rows = {r[0] for r in sparql_select(both, q).collect()}
    # graph names are IRIs: ?g binds the encoded resource term, so it
    # joins with VALUES/constants and serializes as a uri binding
    assert rows == {f"<{U}>", "<urn:other>"}
    q2 = "SELECT ?s WHERE { GRAPH <urn:other> { ?s ?p ?o } }"
    assert [r[0] for r in sparql_select(both, q2).collect()] == ["<urn:other#x>"]
    # the encoded binding makes ?g a first-class term: VALUES joins it
    # and FILTER equality against an IRI constant works
    q3 = (
        "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } "
        "VALUES ?g { <urn:other> } }"
    )
    assert [r[0] for r in sparql_select(both, q3).collect()] == ["<urn:other#x>"]
    q4 = (
        "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } "
        "FILTER(?g = <urn:other> && isIRI(?g)) }"
    )
    assert [r[0] for r in sparql_select(both, q4).collect()] == ["<urn:other#x>"]


def test_count_distinct_var(store):
    q = "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ?p ?o }"
    assert sparql_select(store.df(), q).collect()[0][0] == 3


def test_repeated_var_within_pattern(spark):
    store = MemoryQuadStore(spark, "urn:self")
    from ontograph_spark.ontology.resources import new_triple

    store.add_triples(
        [
            new_triple(mk_resource("urn:self#a"), mk_resource("urn:self#p"), mk_resource("urn:self#a")),
            new_triple(mk_resource("urn:self#a"), mk_resource("urn:self#p"), mk_resource("urn:self#b")),
        ]
    )
    q = "SELECT ?x WHERE { ?x <urn:self#p> ?x }"
    assert [r[0] for r in sparql_select(store.df(), q).collect()] == ["<urn:self#a>"]


def test_a_keyword_is_rdf_type(spark):
    store = MemoryQuadStore(spark, "urn:types")
    from ontograph_spark import vocab
    from ontograph_spark.ontology.resources import new_triple

    store.add_triple(
        new_triple(
            mk_resource("urn:types#i"),
            mk_resource(vocab.RDF_TYPE),
            mk_resource("urn:types#Klass"),
        )
    )
    q = "SELECT ?i WHERE { ?i a <urn:types#Klass> }"
    assert [r[0] for r in sparql_select(store.df(), q).collect()] == ["<urn:types#i>"]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?x WHERE { ?x unknown:p ?y }",  # unknown prefix
        "SELECT ?x FROM NAMED ?g WHERE { ?x ?p ?y }",  # FROM needs an IRI
        "SELECT ?x WHERE { }",  # empty group
        "SELECT ?x WHERE { ?x ?p ?y } garbage",  # trailing tokens
        "SELECT WHERE { ?x ?p ?y }",  # no projection
        "ASK { ?x ?p ?y } LIMIT",  # dangling modifier token
    ],
)
def test_syntax_errors(store, bad):
    with pytest.raises(SparqlSyntaxError):
        df_or_bool = (
            sparql_ask(store.df(), bad)
            if bad.lstrip().upper().startswith("ASK")
            else sparql_select(store.df(), bad).collect()
        )
        del df_or_bool


def test_select_on_ask_and_vice_versa(store):
    with pytest.raises(SparqlSyntaxError):
        sparql_select(store.df(), f"ASK {{ ?s ?p ?o }}")
    with pytest.raises(SparqlSyntaxError):
        sparql_ask(store.df(), "SELECT ?s WHERE { ?s ?p ?o }")


def test_store_sparql_methods_scope_by_graph(spark, tmp_path):
    """QuadStoreBase.sparql_select/ask run over the FULL backing table
    (GRAPH clauses see every graph; unscoped patterns match all)."""
    from ontograph_spark.ontology.resources import new_triple
    from ontograph_spark.store import ParquetQuadStore

    root = str(tmp_path / "quads")
    s1 = ParquetQuadStore(spark, "urn:g1", root, write_partitions=1)
    s1.add_triple(new_triple(mk_resource("urn:g1#a"), mk_resource("urn:g1#p"), mk_resource("urn:g1#b")))
    s2 = ParquetQuadStore(spark, "urn:g2", root, write_partitions=1)
    s2.add_triple(new_triple(mk_resource("urn:g2#a"), mk_resource("urn:g2#p"), mk_resource("urn:g2#b")))
    scoped = s1.sparql_select("SELECT ?s WHERE { GRAPH <urn:g1> { ?s ?p ?o } }")
    assert [r[0] for r in scoped.collect()] == ["<urn:g1#a>"]
    unscoped = s1.sparql_select("SELECT DISTINCT ?s WHERE { ?s ?p ?o }")
    assert {r[0] for r in unscoped.collect()} == {"<urn:g1#a>", "<urn:g2#a>"}
    assert s1.sparql_ask("ASK { GRAPH <urn:g2> { <urn:g2#a> ?p ?o } }") is True
    assert s1.sparql_ask("ASK { GRAPH <urn:g2> { <urn:g1#a> ?p ?o } }") is False


def test_filter_builtins_regex_strstarts_contains(store):
    q = f"""SELECT ?s ?o WHERE {{ ?s <{U}#rel-1> ?o FILTER(REGEX(STR(?o), "#[ab]$")) }}"""
    rows = {r[1] for r in sparql_select(store.df(), q).collect()}
    assert rows == {f"<{U}#a>", f"<{U}#b>"}
    q2 = f"""SELECT ?o WHERE {{ ?s ?p ?o FILTER(STRSTARTS(?o, "lit")) }}"""
    assert {r[0] for r in sparql_select(store.df(), q2).collect()} == {
        '"lit1"', '"lit2"@de', f'"lit3"^^<{U}#datatype>'
    }
    q3 = f"""SELECT ?o WHERE {{ ?s ?p ?o FILTER(CONTAINS(?o, "it2")) }}"""
    assert [r[0] for r in sparql_select(store.df(), q3).collect()] == ['"lit2"@de']
    q4 = f"""SELECT ?o WHERE {{ ?s ?p ?o FILTER(REGEX(?o, "LIT2", "i")) }}"""
    assert [r[0] for r in sparql_select(store.df(), q4).collect()] == ['"lit2"@de']


def test_filter_lang_and_datatype_accessors(store):
    q = f"""SELECT ?o WHERE {{ ?s ?p ?o FILTER(LANG(?o) = "de") }}"""
    assert [r[0] for r in sparql_select(store.df(), q).collect()] == ['"lit2"@de']
    q2 = f"""SELECT ?o WHERE {{ ?s ?p ?o FILTER(DATATYPE(?o) = <{U}#datatype>) }}"""
    assert [r[0] for r in sparql_select(store.df(), q2).collect()] == [
        f'"lit3"^^<{U}#datatype>'
    ]
    q3 = f"""SELECT ?o WHERE {{ <{U}#c> ?p ?o FILTER(STR(?o) != "lit1" && LANG(?o) = "") }}"""
    assert [r[0] for r in sparql_select(store.df(), q3).collect()] == [
        f'"lit3"^^<{U}#datatype>'
    ]


def test_filter_builtin_errors(store):
    with pytest.raises(SparqlSyntaxError):
        sparql_select(store.df(), "SELECT ?o WHERE { ?s ?p ?o FILTER(REGEX(?o, ?o)) }")


def test_filter_over_never_bound_var_drops_rows(store):
    """A FILTER referencing a variable the pattern never binds is a
    type error per solution (SPARQL §17.2) — every row drops; the
    Blazegraph-backed reference returns the same empty result for a
    typo'd variable rather than erroring."""
    got = sparql_select(
        store.df(), 'SELECT ?o WHERE { ?s ?p ?o FILTER(LANG(?x) = "de") }'
    ).collect()
    assert got == []
    # …and BOUND of a never-bound var is plain false, so !BOUND keeps all
    kept = sparql_select(
        store.df(), "SELECT ?o WHERE { ?s ?p ?o FILTER(!BOUND(?x)) }"
    ).count()
    assert kept == store.df().count()


def test_group_by_count(store):
    q = f"""
    SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s ?p ?o }}
    GROUP BY ?s ORDER BY DESC(?n) ASC(?s)"""
    rows = [tuple(r) for r in sparql_select(store.df(), q).collect()]
    # '#' < '>' so "<…#c>" sorts before the bare "<…>" on the ASC tiebreak
    assert rows == [(f"<{U}#c>", 3), (f"<{U}>", 3), (f"<{U}#a>", 1)]


def test_group_by_count_distinct_and_limit(store):
    q = f"""
    SELECT ?s (COUNT(DISTINCT ?p) AS ?preds) WHERE {{ ?s ?p ?o }}
    GROUP BY ?s ORDER BY DESC(?preds) ASC(?s) LIMIT 1"""
    rows = [tuple(r) for r in sparql_select(store.df(), q).collect()]
    assert rows == [(f"<{U}#c>", 3)]  # rel-3, rel-4, rel-5


def test_group_by_errors(store):
    with pytest.raises(SparqlSyntaxError):
        sparql_select(store.df(), "SELECT ?s ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s")
    with pytest.raises(SparqlSyntaxError):
        sparql_select(store.df(), "SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s")
    with pytest.raises(SparqlSyntaxError):
        sparql_select(store.df(), "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlSyntaxError):
        sparql_select(store.df(), "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?z")
