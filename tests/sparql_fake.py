"""In-memory fake SPARQL endpoint for tests.

Executes the exact query/update grammar :class:`SparqlQuadStore` emits
(SELECT pattern / ASK / COUNT / INSERT DATA / DELETE DATA / DELETE WHERE
/ DROP GRAPH) against a Python set of triples — so the transcribed
ontology test matrix runs over the remote backend without a server,
mirroring the reference, whose suite runs against live Blazegraph
(/root/reference/ontology_graph_test.go over blazegraph_store.go).

Also fakes the Blazegraph REST admin surface (status, namespace
lifecycle, graph listing) for :class:`SparqlEndpoint` tests.
"""

from __future__ import annotations

import json
import re
import urllib.parse

from ontograph_spark.store.sparql_store import SparqlEndpoint, SparqlQuadStore
from ontograph_spark.terms import (
    is_resource,
    term_datatype,
    term_language,
    term_value,
)

#: N-Triples terms (IRI / literal with optional lang+datatype) or ?vars.
TERM_RE = re.compile(r'<[^>]*>|"[^"]*"(?:@[\w-]+)?(?:\^\^<[^>]*>)?|\?[a-z]')


def _toks(s: str) -> list[str]:
    return TERM_RE.findall(s)


def _matches(triple: tuple[str, str, str], pattern: tuple[str, str, str]) -> bool:
    return all(p.startswith("?") or t == p for t, p in zip(triple, pattern))


def _binding(term: str) -> dict:
    if is_resource(term):
        return {"type": "uri", "value": term_value(term)}
    b: dict = {"type": "literal", "value": term_value(term)}
    lang = term_language(term)
    dt = term_datatype(term)
    if lang:
        b["xml:lang"] = lang
    if dt:
        b["type"] = "typed-literal"
        b["datatype"] = dt
    return b


class FakeTripleBase:
    """Shared triple storage: graph URI → set of (s, p, o)."""

    def __init__(self) -> None:
        self.graphs: dict[str, set[tuple[str, str, str]]] = {}

    def graph(self, uri: str) -> set[tuple[str, str, str]]:
        return self.graphs.setdefault(uri, set())


class FakeSparqlStore(SparqlQuadStore):
    """SparqlQuadStore whose transport executes against :class:`FakeTripleBase`."""

    def __init__(self, uri: str, base: FakeTripleBase | None = None) -> None:
        super().__init__(uri, "http://fake.invalid/sparql")
        self.base = base or FakeTripleBase()

    # -- grammar execution -------------------------------------------------

    def _graph_body(self, sparql: str) -> tuple[str, str]:
        m = re.search(r"GRAPH <([^>]*)>\s*\{(.*?)\}", sparql, re.S)
        assert m, sparql
        return m.group(1), m.group(2)

    def _execute_query(self, sparql: str) -> dict:
        g, body = self._graph_body(sparql)
        triples = self.base.graph(g)
        if sparql.startswith("ASK"):
            pat = tuple(_toks(body))
            return {"boolean": any(_matches(t, pat) for t in triples)}
        if "COUNT(*)" in sparql:
            return {
                "results": {
                    "bindings": [{"n": {"type": "literal", "value": str(len(triples))}}]
                }
            }
        pat = tuple(_toks(body))
        names = ("s", "p", "o")
        out = []
        for t in sorted(triples):
            if not _matches(t, pat):
                continue
            out.append(
                {
                    names[i]: _binding(t[i])
                    for i in range(3)
                    if pat[i].startswith("?")
                }
            )
        return {"results": {"bindings": out}}

    def _execute_update(self, sparql: str) -> None:
        if sparql.startswith("DROP GRAPH"):
            uri = re.match(r"DROP GRAPH <([^>]*)>", sparql).group(1)
            self.base.graphs.pop(uri, None)
            return
        g, body = self._graph_body(sparql)
        triples = self.base.graph(g)
        toks = _toks(body)
        if sparql.startswith("INSERT DATA"):
            for i in range(0, len(toks), 3):
                triples.add(tuple(toks[i : i + 3]))
        elif sparql.startswith("DELETE DATA"):
            for i in range(0, len(toks), 3):
                triples.discard(tuple(toks[i : i + 3]))
        elif sparql.startswith("DELETE WHERE"):
            pat = tuple(toks)
            for t in [t for t in triples if _matches(t, pat)]:
                triples.discard(t)
        else:  # pragma: no cover
            raise AssertionError(f"unsupported update: {sparql}")


class FakeSparqlEndpoint(SparqlEndpoint):
    """SparqlEndpoint over an in-memory namespace map implementing the
    Blazegraph REST semantics the admin surface depends on."""

    def __init__(self, online: bool = True) -> None:
        super().__init__("http://fake.invalid")
        self.online = online
        self.namespaces: dict[str, FakeTripleBase] = {}

    def _http(self, method, url, body=None, headers=None):
        path = url[len(self.host) :]
        if path.startswith("/bigdata/status"):
            return (200, b"") if self.online else (503, b"")
        if path.startswith("/bigdata/namespace/") and path.endswith("/sparql"):
            ns = urllib.parse.unquote(path.split("/")[3])
            if ns not in self.namespaces:
                return 404, b""
            q = urllib.parse.parse_qs((body or b"").decode()).get("query", [""])[0]
            assert "SELECT DISTINCT ?g" in q, q
            gs = sorted(self.namespaces[ns].graphs)
            res = {
                "results": {
                    "bindings": [{"g": {"type": "uri", "value": g}} for g in gs]
                }
            }
            return 200, json.dumps(res).encode()
        if path.startswith("/bigdata/namespace"):
            if method == "GET":
                rows = "".join(
                    f"<x>/bigdata/namespace/{ns}/sparql</x>\n" for ns in self.namespaces
                )
                return 200, rows.encode()
            if method == "POST":
                props = dict(
                    line.split("=", 1)
                    for line in (body or b"").decode().splitlines()
                    if "=" in line
                )
                ns = props["com.bigdata.rdf.sail.namespace"]
                if ns in self.namespaces:
                    return 409, b""
                self.namespaces[ns] = FakeTripleBase()
                return 201, b""
            if method == "DELETE":
                ns = urllib.parse.unquote(path.rsplit("/", 1)[1])
                self.namespaces.pop(ns, None)
                return 200, b""
        return 404, b""  # pragma: no cover
