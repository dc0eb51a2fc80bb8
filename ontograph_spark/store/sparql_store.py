"""SPARQL-endpoint quad store (driver-side client).

Fills the role of the reference's Blazegraph backend
(/root/reference/blazegraph_store.go): the same GraphStore operator
surface against any SPARQL 1.1 endpoint (Blazegraph, Fuseki, …), every
operation scoped to the named graph with ``GRAPH <uri> { … }``. Pure
stdlib HTTP (urllib) — no extra dependencies; like the reference, blank
nodes are unsupported and results echo the caller's encoding for fixed
pattern positions (blazegraph_store.go:66-77).

This client exists for API completeness (a reference user can point at
their endpoint unchanged); the distributed engine path is the quad-table
stores — bulk data does not round-trip through a SPARQL endpoint.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from ontograph_spark.errors import (
    TripleAlreadyExistsError,
    TripleDoesNotExistError,
)
from ontograph_spark.ontology.resources import Triple
from ontograph_spark.terms import mk_literal, mk_resource


def _pattern_term(term: str, var: str) -> str:
    """Pattern position: empty string → variable, else the encoded term
    verbatim (N-Triples syntax is valid SPARQL)."""
    return term if term else f"?{var}"


def binding_to_term(binding: dict) -> str:
    """SPARQL-JSON binding → encoded term (blazegraph_store.go:434-445
    semantics: uri / literal / typed-literal; others unsupported)."""
    t = binding["type"]
    if t == "uri":
        return mk_resource(binding["value"])
    if t in ("literal", "typed-literal"):
        return mk_literal(
            binding["value"],
            binding.get("xml:lang", ""),
            binding.get("datatype", ""),
        )
    raise ValueError(f"unsupported binding type: {t}")


class SparqlQuadStore:
    """GraphStore operator surface over a remote SPARQL endpoint."""

    def __init__(self, uri: str, query_url: str, update_url: str | None = None) -> None:
        self._uri = uri
        self.query_url = query_url
        self.update_url = update_url or query_url

    def get_uri(self) -> str:
        return self._uri

    # -- SPARQL construction (pure; unit-tested without a server) ---------

    def select_sparql(self, subj: str = "", pred: str = "", obj: str = "") -> str:
        """Variables only for wildcard slots; fixed slots are echoed
        client-side with the caller's encoding (the reference does the
        same, blazegraph_store.go:66-77)."""
        s, p, o = (
            _pattern_term(subj, "s"),
            _pattern_term(pred, "p"),
            _pattern_term(obj, "o"),
        )
        select_vars = " ".join(
            v for v, fixed in (("?s", subj), ("?p", pred), ("?o", obj)) if not fixed
        ) or "*"
        return (
            f"SELECT {select_vars} WHERE {{ GRAPH <{self._uri}> "
            f"{{ {s} {p} {o} }} }}"
        )

    def delete_where_sparql(self, subj: str = "", pred: str = "", obj: str = "") -> str:
        s, p, o = (
            _pattern_term(subj, "s"),
            _pattern_term(pred, "p"),
            _pattern_term(obj, "o"),
        )
        return f"DELETE WHERE {{ GRAPH <{self._uri}> {{ {s} {p} {o} }} }}"

    def insert_data_sparql(self, triples: list[Triple]) -> str:
        body = " ".join(
            f"{t.subject} {t.predicate} {t.object} ." for t in triples
        )
        return f"INSERT DATA {{ GRAPH <{self._uri}> {{ {body} }} }}"

    def delete_data_sparql(self, triples: list[Triple]) -> str:
        body = " ".join(
            f"{t.subject} {t.predicate} {t.object} ." for t in triples
        )
        return f"DELETE DATA {{ GRAPH <{self._uri}> {{ {body} }} }}"

    def ask_sparql(self, triple: Triple) -> str:
        return (
            f"ASK {{ GRAPH <{self._uri}> "
            f"{{ {triple.subject} {triple.predicate} {triple.object} }} }}"
        )

    def count_sparql(self) -> str:
        return (
            f"SELECT (COUNT(*) AS ?n) WHERE {{ GRAPH <{self._uri}> "
            f"{{ ?s ?p ?o }} }}"
        )

    # -- transport (overridable in tests) ---------------------------------

    def _execute_query(self, sparql: str) -> dict:
        data = urllib.parse.urlencode({"query": sparql}).encode()
        req = urllib.request.Request(
            self.query_url,
            data=data,
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
                "Accept": "application/sparql-results+json",
            },
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read().decode())

    def _execute_update(self, sparql: str) -> None:
        data = urllib.parse.urlencode({"update": sparql}).encode()
        req = urllib.request.Request(
            self.update_url,
            data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as resp:
            resp.read()

    # -- operator surface -------------------------------------------------

    def _rows(self, subj: str = "", pred: str = "", obj: str = "") -> list[Triple]:
        res = self._execute_query(self.select_sparql(subj, pred, obj))
        out = []
        for b in res.get("results", {}).get("bindings", []):
            out.append(
                Triple(
                    subj if subj else binding_to_term(b["s"]),
                    pred if pred else binding_to_term(b["p"]),
                    obj if obj else binding_to_term(b["o"]),
                )
            )
        return out

    def get_first_match(self, subj="", pred="", obj="") -> Triple | None:
        rows = self._rows(subj, pred, obj)
        return rows[0] if rows else None

    def get_all_matches(self, subj="", pred="", obj="") -> list[Triple]:
        return self._rows(subj, pred, obj)

    def get_all_triples(self) -> list[Triple]:
        return self._rows()

    def delete_all_matches(self, subj="", pred="", obj="") -> None:
        self._execute_update(self.delete_where_sparql(subj, pred, obj))

    def _exists(self, triple: Triple) -> bool:
        return bool(self._execute_query(self.ask_sparql(triple)).get("boolean"))

    def add_triple(self, triple: Triple) -> None:
        if self._exists(triple):
            raise TripleAlreadyExistsError()
        self._execute_update(self.insert_data_sparql([triple]))

    def add_triples(self, triples: list[Triple]) -> None:
        added: list[Triple] = []
        try:
            for t in triples:
                self.add_triple(t)
                added.append(t)
        except TripleAlreadyExistsError:
            self.delete_triples_unchecked(added)
            raise

    def add_triple_unchecked(self, triple: Triple) -> None:
        self._execute_update(self.insert_data_sparql([triple]))

    def add_triples_unchecked(self, triples: list[Triple]) -> None:
        if triples:
            self._execute_update(self.insert_data_sparql(triples))

    def delete_triple(self, triple: Triple) -> None:
        if not self._exists(triple):
            raise TripleDoesNotExistError()
        self._execute_update(self.delete_data_sparql([triple]))

    def delete_triples(self, triples: list[Triple]) -> None:
        deleted: list[Triple] = []
        try:
            for t in triples:
                self.delete_triple(t)
                deleted.append(t)
        except TripleDoesNotExistError:
            self.add_triples_unchecked(deleted)
            raise

    def delete_triple_unchecked(self, triple: Triple) -> None:
        self._execute_update(self.delete_data_sparql([triple]))

    def delete_triples_unchecked(self, triples: list[Triple]) -> None:
        if triples:
            self._execute_update(self.delete_data_sparql(triples))

    def size(self) -> int:
        res = self._execute_query(self.count_sparql())
        bindings = res["results"]["bindings"]
        return int(bindings[0]["n"]["value"]) if bindings else 0

    def drop(self) -> None:
        self._execute_update(f"DROP GRAPH <{self._uri}>")
        self._uri = ""
