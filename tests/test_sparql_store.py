"""SPARQL-endpoint store tests (no server): query construction, binding
decoding, and checked-op control flow against a scripted transport."""

from __future__ import annotations

import pytest

from ontograph_spark.errors import (
    TripleAlreadyExistsError,
    TripleDoesNotExistError,
)
from ontograph_spark.ontology.resources import Triple
from ontograph_spark.store.sparql_store import SparqlQuadStore, binding_to_term

URI = "https://g.example/remote"
T1 = Triple(f"<{URI}#a>", f"<{URI}#rel>", '"lit"@en')


class ScriptedStore(SparqlQuadStore):
    """Records updates; serves canned query responses."""

    def __init__(self, ask_results=None, select_bindings=None):
        super().__init__(URI, "http://example.invalid/sparql")
        self.updates: list[str] = []
        self.queries: list[str] = []
        self._asks = list(ask_results or [])
        self._bindings = select_bindings or []

    def _execute_query(self, sparql):
        self.queries.append(sparql)
        if sparql.startswith("ASK"):
            return {"boolean": self._asks.pop(0)}
        return {"results": {"bindings": self._bindings}}

    def _execute_update(self, sparql):
        self.updates.append(sparql)


def test_sparql_strings():
    s = SparqlQuadStore(URI, "http://x/sparql")
    assert s.select_sparql("", f"<{URI}#rel>", "") == (
        f"SELECT ?s ?o WHERE {{ GRAPH <{URI}> {{ ?s <{URI}#rel> ?o }} }}"
    )
    assert s.delete_where_sparql(f"<{URI}#a>", "", "") == (
        f"DELETE WHERE {{ GRAPH <{URI}> {{ <{URI}#a> ?p ?o }} }}"
    )
    assert s.insert_data_sparql([T1]) == (
        f'INSERT DATA {{ GRAPH <{URI}> {{ <{URI}#a> <{URI}#rel> "lit"@en . }} }}'
    )
    assert s.ask_sparql(T1).startswith("ASK { GRAPH")
    assert "COUNT(*)" in s.count_sparql()


def test_binding_decoding():
    assert binding_to_term({"type": "uri", "value": "https://x#a"}) == "<https://x#a>"
    assert binding_to_term({"type": "literal", "value": "v"}) == '"v"'
    assert (
        binding_to_term({"type": "literal", "value": "v", "xml:lang": "de"})
        == '"v"@de'
    )
    assert (
        binding_to_term(
            {"type": "typed-literal", "value": "4", "datatype": "http://x#int"}
        )
        == '"4"^^<http://x#int>'
    )
    with pytest.raises(ValueError):
        binding_to_term({"type": "bnode", "value": "b0"})


def test_fixed_positions_echo_caller_encoding():
    s = ScriptedStore(
        select_bindings=[{"o": {"type": "literal", "value": "x"}}]
    )
    got = s.get_all_matches(f"<{URI}#a>", f"<{URI}#rel>", "")
    assert got == [Triple(f"<{URI}#a>", f"<{URI}#rel>", '"x"')]


def test_checked_add_conflict():
    s = ScriptedStore(ask_results=[True])
    with pytest.raises(TripleAlreadyExistsError):
        s.add_triple(T1)
    assert s.updates == []


def test_batch_add_rollback():
    t2 = Triple(f"<{URI}#b>", f"<{URI}#rel>", '"y"')
    # first add ok (ASK false), second conflicts (ASK true) → rollback
    s = ScriptedStore(ask_results=[False, True])
    with pytest.raises(TripleAlreadyExistsError):
        s.add_triples([t2, T1])
    assert any(u.startswith("INSERT DATA") for u in s.updates)
    assert s.updates[-1].startswith("DELETE DATA")  # compensation
    assert "#b" in s.updates[-1]


def test_batch_delete_rollback():
    t2 = Triple(f"<{URI}#b>", f"<{URI}#rel>", '"y"')
    s = ScriptedStore(ask_results=[True, False])
    with pytest.raises(TripleDoesNotExistError):
        s.delete_triples([t2, T1])
    assert s.updates[-1].startswith("INSERT DATA")  # compensation re-add


def test_drop_and_size():
    s = ScriptedStore()
    s._bindings = [{"n": {"type": "literal", "value": "7"}}]
    assert s.size() == 7
    s.drop()
    assert s.get_uri() == ""
    assert s.updates[-1] == f"DROP GRAPH <{URI}>"


def test_sparql_store_turtle_round_trip():
    """blazegraph_store.go:327-393 parity: the remote backend serializes
    to the same Turtle shapes as the quad-table stores and round-trips
    through the parser."""
    import io

    from ontograph_spark.store.turtle import parse_turtle
    from sparql_fake import FakeSparqlStore

    s = FakeSparqlStore(URI)
    s.add_triples_unchecked(
        [T1, Triple(f"<{URI}#b>", f"<{URI}#rel>", '"4"^^<http://x#int>')]
    )
    buf = io.StringIO()
    s.serialize_to_turtle(buf, pretty=False)
    _, parsed = parse_turtle(buf.getvalue())
    assert {tuple(t) for t in parsed} == {t.as_tuple() for t in s.get_all_triples()}
    pretty = io.StringIO()
    s.serialize_to_turtle(pretty, pretty=True)
    assert f"@base <{URI}> ." in pretty.getvalue()
    assert "@prefix rdf:" in pretty.getvalue()


def test_endpoint_admin_lifecycle():
    """blazegraph_endpoint.go:39-175 parity over the fake REST endpoint:
    status, namespace create/list/exists/drop, graph listing."""
    from sparql_fake import FakeSparqlEndpoint

    ep = FakeSparqlEndpoint()
    assert ep.is_online() is True
    assert ep.get_namespaces() == []
    ep.create_namespace("kb")
    assert ep.get_namespaces() == ["kb"]
    assert ep.namespace_exists("kb") is True
    assert ep.namespace_exists("nope") is False
    with pytest.raises(RuntimeError, match="create"):
        ep.create_namespace("kb")  # HTTP 409 → error
    # stores scoped to the namespace populate graphs the endpoint can list
    from sparql_fake import FakeSparqlStore

    s = FakeSparqlStore(URI, ep.namespaces["kb"])
    s.add_triple_unchecked(T1)
    assert ep.get_graphs("kb") == [URI]
    ep.drop_namespace("kb")
    assert ep.namespace_exists("kb") is False
    ep.drop_namespace("kb")  # idempotent like the reference
    with pytest.raises(RuntimeError, match="graphs"):
        ep.get_graphs("kb")  # missing namespace → HTTP 404 → error


def test_endpoint_offline():
    from sparql_fake import FakeSparqlEndpoint

    ep = FakeSparqlEndpoint(online=False)
    with pytest.raises(RuntimeError, match="status"):
        ep.is_online()


def test_endpoint_store_constructor():
    """NewBlazegraphStore parity: no liveness/existence checks, URL wiring
    only (blazegraph_endpoint.go:28-36)."""
    from ontograph_spark.store.sparql_store import SparqlEndpoint

    ep = SparqlEndpoint("http://db.example:9999/")
    s = ep.store(URI, "my ns")
    assert s.get_uri() == URI
    assert s.query_url == "http://db.example:9999/bigdata/namespace/my%20ns/sparql"
