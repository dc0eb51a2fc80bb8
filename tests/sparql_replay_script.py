"""The scripted operator sequence shared by the SPARQL wire-fixture
recorder and the replay test.

The sequence drives the full :class:`SparqlQuadStore` operator surface —
pattern reads, checked/unchecked adds and deletes (including the batch
rollback paths), size, existence probes, DROP — in a fixed order so the
client emits a deterministic request stream. Run at record time against
the in-process engine endpoint (the independent "second engine") and at
replay time against the recorded wire bytes; the assertions must hold in
both worlds (reference parity: the operator matrix
blazegraph_store_test.go runs against live Blazegraph)."""

from __future__ import annotations

import pytest

from ontograph_spark.errors import (
    TripleAlreadyExistsError,
    TripleDoesNotExistError,
)
from ontograph_spark.ontology.resources import new_triple
from ontograph_spark.terms import mk_literal, mk_resource

GRAPH = "https://www.ontograph.com/replay-graph"


def script_triples(uri: str = GRAPH):
    """The canonical fixture shapes (memory_store_test.go:19-44)."""
    return [
        new_triple(mk_resource(uri), mk_resource(f"{uri}#rel-1"), mk_resource(f"{uri}#a")),
        new_triple(mk_resource(uri), mk_resource(f"{uri}#rel-1"), mk_resource(f"{uri}#b")),
        new_triple(mk_resource(f"{uri}#a"), mk_resource(f"{uri}#rel-2"), mk_resource(f"{uri}#b")),
        new_triple(mk_resource(f"{uri}#c"), mk_resource(f"{uri}#rel-3"), mk_literal("lit1", "", "")),
        new_triple(mk_resource(f"{uri}#c"), mk_resource(f"{uri}#rel-4"), mk_literal("lit2", "de", "")),
        new_triple(mk_resource(f"{uri}#c"), mk_resource(f"{uri}#rel-5"), mk_literal("lit3", "", f"{uri}#dt")),
    ]


def drive(store) -> None:
    """Run the operator sequence; every call maps to ≥1 wire request."""
    uri = store.get_uri()
    fixtures = script_triples(uri)

    # checked batch add, then reads over every slot combination
    store.add_triples(fixtures)
    assert store.size() == 6
    rel1 = {
        t.as_tuple()
        for t in store.get_all_matches("", mk_resource(f"{uri}#rel-1"), "")
    }
    assert rel1 == {fixtures[0].as_tuple(), fixtures[1].as_tuple()}
    all_t = {t.as_tuple() for t in store.get_all_triples()}
    assert all_t == {t.as_tuple() for t in fixtures}
    by_subj = {
        t.as_tuple() for t in store.get_all_matches(mk_resource(f"{uri}#c"))
    }
    assert len(by_subj) == 3
    lang_hit = store.get_all_matches("", "", mk_literal("lit2", "de", ""))
    assert [t.as_tuple() for t in lang_hit] == [fixtures[4].as_tuple()]
    first = store.get_first_match(mk_resource(f"{uri}#a"))
    assert first is not None and first.as_tuple() == fixtures[2].as_tuple()

    # checked add conflict: batch rolls back (post-state unchanged)
    fresh = new_triple(
        mk_resource(f"{uri}#new"), mk_resource(f"{uri}#rel-9"), mk_resource(f"{uri}#a")
    )
    with pytest.raises(TripleAlreadyExistsError):
        store.add_triples([fresh, fixtures[0]])
    assert store.size() == 6

    # checked delete of a missing triple: batch rolls back
    with pytest.raises(TripleDoesNotExistError):
        store.delete_triples([fixtures[0], fresh])
    assert store.size() == 6

    # unchecked add is idempotent at the wire level (INSERT DATA twice)
    store.add_triple_unchecked(fresh)
    store.add_triple_unchecked(fresh)
    assert store.size() == 7

    # checked delete + wildcard delete
    store.delete_triple(fresh)
    assert store.size() == 6
    store.delete_all_matches("", mk_resource(f"{uri}#rel-1"), "")
    assert store.size() == 4

    # drop renders the graph empty
    store.drop()
