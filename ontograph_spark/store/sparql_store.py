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
import re
import urllib.error
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

    def serialize_to_turtle(self, writer, pretty: bool = False) -> None:
        """Turtle export for the remote backend (the reference's
        CONSTRUCT-based SerializeToTurtle, blazegraph_store.go:327-393):
        the triples come back over SPARQL and the shared formatter
        produces the same plain/pretty shapes as the quad-table stores —
        prefix map from the graph URI + ``owl:imports``, CURIE rewrite,
        ``@prefix``/``@base`` block."""
        from ontograph_spark.store.turtle import serialize_to_turtle

        serialize_to_turtle(self, writer, pretty)


class SparqlEndpoint:
    """Endpoint-level admin surface (the reference's BlazegraphEndpoint,
    blazegraph_endpoint.go:39-244): status probe, namespace lifecycle,
    graph listing, store construction. URL scheme follows Blazegraph's
    REST API (``/bigdata/status``, ``/bigdata/namespace[/<id>]``,
    ``/bigdata/namespace/<id>/sparql``). Pure-stdlib HTTP; the transport
    is a single overridable method so tests (and other endpoint flavors)
    can swap it."""

    def __init__(self, host: str) -> None:
        self.host = host.rstrip("/")

    # -- transport (overridable in tests) ---------------------------------

    def _http(
        self,
        method: str,
        url: str,
        body: bytes | None = None,
        headers: dict | None = None,
    ) -> tuple[int, bytes]:
        req = urllib.request.Request(
            url, data=body, headers=headers or {}, method=method
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # non-2xx still carries a code
            return e.code, e.read()

    # -- store construction (blazegraph_endpoint.go:28-36) ----------------

    def sparql_url(self, namespace: str) -> str:
        return f"{self.host}/bigdata/namespace/{urllib.parse.quote(namespace)}/sparql"

    def store(self, uri: str, namespace: str) -> SparqlQuadStore:
        """NewBlazegraphStore: no existence or liveness checks — same as
        the reference constructor."""
        return SparqlQuadStore(uri, self.sparql_url(namespace))

    # -- admin operators (blazegraph_endpoint.go:39-175) ------------------

    def is_online(self) -> bool:
        code, _ = self._http("GET", f"{self.host}/bigdata/status")
        if code != 200:
            raise RuntimeError(f"Unexpected status response: {code} (Expected 200)")
        return True

    def get_namespaces(self) -> list[str]:
        code, data = self._http(
            "GET", f"{self.host}/bigdata/namespace?describe-each-named-graph=false"
        )
        if code != 200:
            raise RuntimeError(f"Failed to query namespaces (HTTP {code})")
        return re.findall(r"/bigdata/namespace/(.+?)/sparql", data.decode())

    def create_namespace(self, namespace_id: str) -> None:
        """Create a quads namespace (HTTP 201 expected). The properties
        payload mirrors the reference's minimal quads configuration
        (blazegraph_endpoint.go:87-100)."""
        payload = (
            f"com.bigdata.rdf.sail.namespace={namespace_id}\n"
            "com.bigdata.rdf.store.AbstractTripleStore.quads=true\n"
            "com.bigdata.rdf.store.AbstractTripleStore.textIndex=false\n"
            "com.bigdata.rdf.store.AbstractTripleStore.axiomsClass="
            "com.bigdata.rdf.axioms.NoAxioms\n"
        ).encode()
        code, _ = self._http(
            "POST",
            f"{self.host}/bigdata/namespace",
            body=payload,
            headers={"Content-Type": "text/plain"},
        )
        if code != 201:
            raise RuntimeError(
                f"Failed to create namespace '{namespace_id}' (HTTP {code})"
            )

    def drop_namespace(self, namespace_id: str) -> None:
        """Idempotent like the reference: missing namespace is not an
        error there either (blazegraph_endpoint.go:119-139 returns the
        endpoint's 200 regardless; non-200 raises)."""
        code, _ = self._http(
            "DELETE",
            f"{self.host}/bigdata/namespace/{urllib.parse.quote(namespace_id)}",
        )
        if code != 200:
            raise RuntimeError(
                f"Failed to delete namespace '{namespace_id}' (HTTP {code})"
            )

    def namespace_exists(self, namespace_id: str) -> bool:
        return namespace_id in self.get_namespaces()

    def get_graphs(self, namespace: str) -> list[str]:
        """Distinct graph URIs in a namespace (blazegraph_endpoint.go:
        158-175) via ``SELECT DISTINCT ?g``."""
        sparql = "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s ?p ?o } }"
        data = urllib.parse.urlencode({"query": sparql}).encode()
        code, body = self._http(
            "POST",
            self.sparql_url(namespace),
            body=data,
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
                "Accept": "application/sparql-results+json",
            },
        )
        if code != 200:
            raise RuntimeError(f"Unexpected response retrieving graphs (HTTP {code})")
        res = json.loads(body.decode())
        return [b["g"]["value"] for b in res.get("results", {}).get("bindings", [])]
