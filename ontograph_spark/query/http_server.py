"""SPARQL 1.1 Protocol HTTP server over the in-process endpoint.

The reference is a *client* of a SPARQL-over-HTTP server (Blazegraph —
blazegraph_store.go POSTs form-encoded ``query``/``update`` and decodes
SPARQL-JSON). This module is the server side for a Spark deployment:
a stdlib ``ThreadingHTTPServer`` that answers the SPARQL 1.1 Protocol
over :class:`~ontograph_spark.query.endpoint.LocalSparqlEndpoint`, so
the reference-shaped client — or curl, or any SPARQL library — talks
**real HTTP** to the engine:

* ``GET  /sparql?query=…``                         (protocol §2.1.1)
* ``POST /sparql`` form-encoded ``query=…``         (§2.1.2 — what the
  reference's client and this repo's ``SparqlQuadStore`` send)
* ``POST /sparql`` raw ``application/sparql-query``  (§2.1.3)
* ``POST /sparql`` form-encoded ``update=…`` or raw
  ``application/sparql-update``                     (§2.2.2/§2.2.3)

Plus the SPARQL 1.1 Graph Store HTTP Protocol at ``/gsp?graph=<uri>``:
``GET`` serializes the graph as N-Triples, ``PUT`` replaces it from an
N-Triples payload (201 on create, 200 on replace), ``POST`` merges,
``DELETE`` drops — the bulk load/export surface every triple store
ships next to its query endpoint.

Results honor the ``Accept`` header via
:func:`~ontograph_spark.query.results.serialize_results` (JSON default;
XML/CSV/TSV negotiated); parse errors are 400 with the message,
unsupported Accept types 406. The server thread shares the driver's
SparkSession — queries still execute distributed; only the protocol
handling is driver-side, exactly like any SPARQL endpoint fronting a
cluster engine.
"""

from __future__ import annotations

import re
import threading
import urllib.parse
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ontograph_spark.query.endpoint import LocalSparqlEndpoint
from ontograph_spark.query.results import serialize_results
from ontograph_spark.query.sparql import SparqlSyntaxError

#: negotiated media type → response Content-Type (the +json alias
#: normalizes to the canonical SPARQL results type)
_MEDIA_TO_CTYPE = {
    "application/sparql-results+json": "application/sparql-results+json",
    "application/json": "application/sparql-results+json",
    "application/sparql-results+xml": "application/sparql-results+xml",
    "text/csv": "text/csv",
    "text/tab-separated-values": "text/tab-separated-values",
}


def _pick_media(accept: str | None) -> str:
    """First supported media type in the Accept list; JSON for absent
    or wildcard Accept."""
    if not accept:
        return "application/sparql-results+json"
    for part in accept.split(","):
        mt = part.split(";")[0].strip().lower()
        if mt in ("*/*", "application/*"):
            return "application/sparql-results+json"
        try:
            serialize_results({"boolean": True}, mt)
        except ValueError:
            continue
        return mt
    raise ValueError(f"no supported media type in Accept: {accept}")


class _Handler(BaseHTTPRequestHandler):
    endpoint: LocalSparqlEndpoint  # set by server factory
    server_ref: "SparqlHttpServer"  # set by server factory
    protocol_version = "HTTP/1.1"

    def log_message(self, *args) -> None:  # quiet test servers
        pass

    def _send(self, code: int, body: str, ctype: str) -> None:
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", f"{ctype}; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _answer_query(self, ep: LocalSparqlEndpoint, query: str) -> None:
        from ontograph_spark.query.federation import service_policy

        try:
            media = _pick_media(self.headers.get("Accept"))
        except ValueError as e:
            self._send(406, str(e), "text/plain")
            return
        try:
            with service_policy(self.server_ref.allow_service):
                result = ep.query(query)
        except SparqlSyntaxError as e:
            self._send(400, str(e), "text/plain")
            return
        except Exception as e:  # noqa: BLE001 — any evaluation failure
            # (AnalysisException, federation transport errors, Py4J)
            # must become an HTTP error, not a dropped connection
            self._send(500, f"{type(e).__name__}: {e}", "text/plain")
            return
        self._send(200, serialize_results(result, media), _MEDIA_TO_CTYPE[media])

    def _answer_update(self, ep: LocalSparqlEndpoint, update: str) -> None:
        from ontograph_spark.query.federation import service_policy

        try:
            with service_policy(self.server_ref.allow_service):
                ep.update(update)
        except SparqlSyntaxError as e:
            self._send(400, str(e), "text/plain")
            return
        except Exception as e:  # noqa: BLE001
            self._send(500, f"{type(e).__name__}: {e}", "text/plain")
            return
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _route(self, path: str) -> LocalSparqlEndpoint | None:
        """``/sparql`` → the default endpoint;
        ``/bigdata/namespace/<id>/sparql`` → that namespace's endpoint
        (Blazegraph's URL scheme, blazegraph_endpoint.go:28-36)."""
        if path == "/sparql":
            return self.endpoint
        m = re.fullmatch(r"/bigdata/namespace/([^/]+)/sparql", path)
        if m:
            return self.server_ref.namespaces.get(
                urllib.parse.unquote(m.group(1))
            )
        return None

    # -- SPARQL 1.1 Graph Store HTTP Protocol (/gsp?graph=<uri>) -------

    def _gsp_graph(self, parsed) -> str | None:
        params = urllib.parse.parse_qs(parsed.query)
        vals = params.get("graph")
        return vals[0] if vals else None

    def _gsp_get(self, graph: str) -> None:
        ep = self.endpoint
        if graph not in ep._stores:
            self._send(404, f"no such graph: {graph}", "text/plain")
            return
        lines = "".join(
            f"{t.subject} {t.predicate} {t.object} .\n"
            for t in ep.store_for(graph).get_all_triples()
        )
        self._send(200, lines, "application/n-triples")

    def _gsp_parse_payload(self, body: str):
        """N-Triples payload → Triple list via the SPARQL triple-block
        grammar (N-Triples is a subset; blank nodes unsupported, as
        everywhere in this engine)."""
        from ontograph_spark.ontology.resources import Triple
        from ontograph_spark.query.sparql import parse_group_text

        group = parse_group_text("{ " + body + " }")
        if not group.is_plain_triples():
            raise SparqlSyntaxError("payload must be plain triples")
        out = []
        for pat in group.patterns:
            for kind, _ in (pat.s, pat.p, pat.o):
                if kind != "term":
                    raise SparqlSyntaxError("payload cannot contain variables")
            out.append(Triple(pat.s[1], pat.p[1], pat.o[1]))
        return out

    def _gsp_write(self, graph: str, body: str, replace: bool) -> None:
        try:
            triples = self._gsp_parse_payload(body) if body.strip() else []
        except SparqlSyntaxError as e:
            self._send(400, str(e), "text/plain")
            return
        ep = self.endpoint
        existed = graph in ep._stores
        store = ep.store_for(graph)
        if replace and existed:
            store.delete_all_matches("", "", "")
        if triples:
            store.add_triples_unchecked(triples)
        code = 200 if existed else 201
        self._send(code, "", "text/plain")

    def _gsp_delete(self, graph: str) -> None:
        ep = self.endpoint
        if graph not in ep._stores:
            self._send(404, f"no such graph: {graph}", "text/plain")
            return
        ep.store_for(graph).drop()
        del ep._stores[graph]
        self._send(200, "", "text/plain")

    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/gsp":
            graph = self._gsp_graph(parsed)
            if graph is None:
                self._send(400, "missing graph parameter", "text/plain")
            else:
                self._gsp_get(graph)
            return
        if parsed.path == "/bigdata/status":
            self._send(200, "Running", "text/plain")
            return
        if parsed.path == "/bigdata/namespace":
            # the admin client greps sparql URLs out of the describe
            # document (sparql_store.py:get_namespaces) — emit one line
            # per namespace in Blazegraph's URL shape
            body = "\n".join(
                f"/bigdata/namespace/{urllib.parse.quote(ns)}/sparql"
                for ns in sorted(self.server_ref.namespaces)
            )
            self._send(200, body, "text/plain")
            return
        ep = self._route(parsed.path)
        if ep is None:
            self._send(404, f"no such endpoint: {parsed.path}", "text/plain")
            return
        params = urllib.parse.parse_qs(parsed.query)
        if "query" in params:
            self._answer_query(ep, params["query"][0])
        else:
            self._send(400, "missing query parameter", "text/plain")

    def do_PUT(self) -> None:  # noqa: N802
        parsed = urllib.parse.urlparse(self.path)
        length = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(length).decode()
        if parsed.path == "/gsp":
            graph = self._gsp_graph(parsed)
            if graph is None:
                self._send(400, "missing graph parameter", "text/plain")
            else:
                self._gsp_write(graph, body, replace=True)
            return
        self._send(404, "not found", "text/plain")

    def do_POST(self) -> None:  # noqa: N802
        parsed = urllib.parse.urlparse(self.path)
        length = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(length).decode()
        if parsed.path == "/gsp":
            graph = self._gsp_graph(parsed)
            if graph is None:
                self._send(400, "missing graph parameter", "text/plain")
            else:
                self._gsp_write(graph, body, replace=False)
            return
        if parsed.path == "/bigdata/namespace":
            m = re.search(
                r"com\.bigdata\.rdf\.sail\.namespace=(\S+)", body
            )
            if not m:
                self._send(400, "missing namespace property", "text/plain")
                return
            ns = m.group(1)
            if ns in self.server_ref.namespaces:
                self._send(409, f"namespace exists: {ns}", "text/plain")
                return
            self.server_ref.namespaces[ns] = self.server_ref.namespace_factory(ns)
            self._send(201, "CREATED", "text/plain")
            return
        ep = self._route(parsed.path)
        if ep is None:
            self._send(404, f"no such endpoint: {parsed.path}", "text/plain")
            return
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        if ctype == "application/sparql-query":
            self._answer_query(ep, body)
            return
        if ctype == "application/sparql-update":
            self._answer_update(ep, body)
            return
        params = urllib.parse.parse_qs(body)
        if "query" in params:
            self._answer_query(ep, params["query"][0])
        elif "update" in params:
            self._answer_update(ep, params["update"][0])
        else:
            self._send(400, "missing query/update parameter", "text/plain")

    def do_DELETE(self) -> None:  # noqa: N802
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/gsp":
            graph = self._gsp_graph(parsed)
            if graph is None:
                self._send(400, "missing graph parameter", "text/plain")
            else:
                self._gsp_delete(graph)
            return
        m = re.fullmatch(
            r"/bigdata/namespace/([^/]+)",
            urllib.parse.urlparse(self.path).path,
        )
        if m:
            # idempotent like Blazegraph (the reference treats missing
            # as success, blazegraph_endpoint.go:119-139)
            self.server_ref.namespaces.pop(
                urllib.parse.unquote(m.group(1)), None
            )
            self._send(200, "DELETED", "text/plain")
            return
        self._send(404, "not found", "text/plain")


class SparqlHttpServer:
    """A live SPARQL-over-HTTP service for a LocalSparqlEndpoint.

    >>> srv = SparqlHttpServer(endpoint).start()
    >>> client = SparqlQuadStore("https://g", srv.url)  # real HTTP
    >>> ...
    >>> srv.stop()

    ``port=0`` (default) binds an ephemeral port; ``url`` is the
    endpoint address after :meth:`start`. The handler thread pool is
    stdlib ``ThreadingHTTPServer`` — fine for the protocol role; the
    data plane stays in Spark."""

    def __init__(
        self,
        endpoint: LocalSparqlEndpoint,
        host: str = "127.0.0.1",
        port: int = 0,
        namespace_factory: "Callable[[str], LocalSparqlEndpoint] | None" = None,
        allow_service: "bool | tuple[str, ...]" = False,
    ) -> None:
        #: SERVICE execution policy for queries arriving over HTTP:
        #: False (default — an HTTP client must not be able to make the
        #: driver fetch arbitrary URLs, i.e. SSRF), True, or a tuple of
        #: allowed endpoint-URL prefixes. Library-direct callers are
        #: unaffected (their own queries keep the permissive default).
        self.allow_service = allow_service
        #: Blazegraph-REST namespace emulation: with a factory, the
        #: server also answers /bigdata/status, namespace CRUD and
        #: /bigdata/namespace/<id>/sparql — the admin surface the
        #: reference's endpoint client drives (blazegraph_endpoint.go).
        self.namespaces: dict[str, LocalSparqlEndpoint] = {}
        self.namespace_factory = namespace_factory or (
            lambda ns: (_ for _ in ()).throw(
                RuntimeError("no namespace_factory configured")
            )
        )
        handler = type(
            "_BoundHandler",
            (_Handler,),
            {"endpoint": endpoint, "server_ref": self},
        )
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/sparql"

    def start(self) -> "SparqlHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
