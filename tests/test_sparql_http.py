"""Real-HTTP SPARQL protocol integration (query/http_server.py).

The round-2 transport tests replayed canned wire responses
(tests/test_sparql_replay.py); here the reference-shaped client
(`SparqlQuadStore`, urllib POST + SPARQL-JSON decode — the Go client's
exact protocol, blazegraph_store.go) talks to a LIVE stdlib HTTP server
fronting the distributed engine: sockets, form encoding, content
negotiation, status codes — the full stack the docker-compose
Blazegraph suite exercises in the reference, with the engine itself in
the Blazegraph role.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from ontograph_spark.ontology.resources import Triple, new_triple
from ontograph_spark.query import LocalSparqlEndpoint, SparqlHttpServer
from ontograph_spark.store.sparql_store import SparqlQuadStore
from ontograph_spark.store.memory import MemoryQuadStore
from ontograph_spark.terms import mk_literal, mk_resource

U = "https://g.example/http-graph"


@pytest.fixture(scope="module")
def server(spark):
    ep = LocalSparqlEndpoint(spark, lambda uri: MemoryQuadStore(spark, uri))
    srv = SparqlHttpServer(ep).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server) -> SparqlQuadStore:
    return SparqlQuadStore(U, server.url)


def _t(n: int) -> Triple:
    return new_triple(
        mk_resource(f"{U}#e{n}"),
        mk_resource(f"{U}#rel"),
        mk_literal(f"v{n}", "", ""),
    )


def test_operator_matrix_over_real_http(client):
    # add (checked), size, match, ask-existence, delete — the client's
    # whole day-to-day surface over live sockets
    client.add_triples([_t(1), _t(2), _t(3)])
    assert client.size() == 3
    rows = client.get_all_matches("", mk_resource(f"{U}#rel"), "")
    assert len(rows) == 3
    first = client.get_first_match(mk_resource(f"{U}#e1"), "", "")
    assert first is not None and first.object == '"v1"'
    client.delete_triple(_t(2))
    assert client.size() == 2
    client.delete_all_matches("", "", "")
    assert client.size() == 0


def test_checked_add_conflict_over_http(client):
    from ontograph_spark.errors import TripleAlreadyExistsError

    client.add_triple(_t(7))
    with pytest.raises(TripleAlreadyExistsError):
        client.add_triple(_t(7))
    client.delete_all_matches("", "", "")


def test_get_vs_post_and_accept_negotiation(server, client):
    client.add_triple(_t(9))
    q = f"SELECT ?o WHERE {{ GRAPH <{U}> {{ <{U}#e9> <{U}#rel> ?o }} }}"
    # GET with query param, JSON default
    url = f"{server.url}?query={urllib.request.quote(q)}"
    with urllib.request.urlopen(url) as resp:
        assert resp.headers["Content-Type"].startswith(
            "application/sparql-results+json"
        )
        doc = json.loads(resp.read().decode())
    assert doc["results"]["bindings"][0]["o"]["value"] == "v9"
    # Accept: CSV
    req = urllib.request.Request(url, headers={"Accept": "text/csv"})
    with urllib.request.urlopen(req) as resp:
        assert resp.read().decode() == "o\r\nv9\r\n"
    # Accept: TSV via POST raw sparql-query body
    req = urllib.request.Request(
        server.url,
        data=q.encode(),
        headers={
            "Content-Type": "application/sparql-query",
            "Accept": "text/tab-separated-values",
        },
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.read().decode() == '?o\n"v9"\n'
    client.delete_all_matches("", "", "")


def test_http_error_codes(server):
    # 400 on a parse error
    bad = f"{server.url}?query={urllib.request.quote('SELECT WHERE}{')}"
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(bad)
    assert e.value.code == 400
    # 406 on an unsupported Accept type
    ok = f"{server.url}?query={urllib.request.quote('ASK { ?s ?p ?o }')}"
    req = urllib.request.Request(ok, headers={"Accept": "application/rdf+xml"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 406
    # 400 on a body with neither query nor update
    req = urllib.request.Request(
        server.url,
        data=b"nope=1",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_raw_update_content_type(server, client):
    update = (
        f"INSERT DATA {{ GRAPH <{U}> {{ <{U}#u1> <{U}#rel> \"via-raw\" }} }}"
    )
    req = urllib.request.Request(
        server.url,
        data=update.encode(),
        headers={"Content-Type": "application/sparql-update"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 204
    assert client.size() == 1
    client.delete_all_matches("", "", "")


def test_admin_client_over_real_http(spark):
    """The reference's endpoint-admin surface (SparqlEndpoint: status,
    namespace CRUD, graph listing — blazegraph_endpoint.go) against the
    live server's Blazegraph-REST emulation."""
    from ontograph_spark.store.sparql_store import SparqlEndpoint

    ep = LocalSparqlEndpoint(spark, lambda uri: MemoryQuadStore(spark, uri))
    srv = SparqlHttpServer(
        ep,
        namespace_factory=lambda ns: LocalSparqlEndpoint(
            spark, lambda uri: MemoryQuadStore(spark, uri)
        ),
    ).start()
    try:
        host = srv.url[: -len("/sparql")]
        admin = SparqlEndpoint(host)
        assert admin.is_online()
        assert admin.get_namespaces() == []
        admin.create_namespace("kb")
        assert admin.namespace_exists("kb")
        with pytest.raises(RuntimeError):
            admin.create_namespace("kb")  # 409 on duplicate
        store = admin.store(U, "kb")
        store.add_triples([_t(1), _t(2)])
        assert store.size() == 2
        assert admin.get_graphs("kb") == [U]
        admin.drop_namespace("kb")
        admin.drop_namespace("kb")  # idempotent
        assert not admin.namespace_exists("kb")
    finally:
        srv.stop()


def test_service_federation_joins_remote_bindings(spark, server, client):
    """SPARQL 1.1 SERVICE: a local query joins bindings fetched from a
    live remote endpoint — the engine federating with itself over HTTP."""
    from ontograph_spark.query import sparql_select

    # remote side: label triples on the live server
    client.add_triples(
        [
            new_triple(
                mk_resource(f"{U}#e1"),
                mk_resource(f"{U}#label"),
                mk_literal("Remote One", "", ""),
            ),
            new_triple(
                mk_resource(f"{U}#e2"),
                mk_resource(f"{U}#label"),
                mk_literal("Remote Two", "", ""),
            ),
        ]
    )
    # local side: a quad table knowing which entities are active
    local = spark.createDataFrame(
        [
            (f"<{U}#e1>", f"<{U}#status>", '"active"', "g"),
            (f"<{U}#e3>", f"<{U}#status>", '"active"', "g"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    q = (
        f"SELECT ?e ?l WHERE {{ ?e <{U}#status> \"active\" . "
        f"SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"?e <{U}#label> ?l }} }} }}"
    )
    rows = {tuple(r) for r in sparql_select(local, q).collect()}
    assert rows == {(f"<{U}#e1>", '"Remote One"')}
    client.delete_all_matches("", "", "")


def test_service_bound_join_ships_values_block(
    spark, server, client, monkeypatch
):
    """SPARQL 1.1 Fed §2.1 bound join: with a small, already-solved
    local side, the shipped SERVICE query carries the local bindings as
    a VALUES block (asserted on the live wire text), returns identical
    results to the unconstrained fallback, and the fallback path stays
    in effect when the binding set exceeds the threshold."""
    from ontograph_spark.query import federation, sparql_select

    client.add_triples(
        [
            new_triple(
                mk_resource(f"{U}#e{n}"),
                mk_resource(f"{U}#label"),
                mk_literal(f"L{n}", "", ""),
            )
            for n in (1, 2, 3)
        ]
    )
    local = spark.createDataFrame(
        [
            (f"<{U}#e1>", f"<{U}#status>", '"active"', "g"),
            (f"<{U}#e3>", f"<{U}#status>", '"active"', "g"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    shipped: list[str] = []
    real_fetch = federation.fetch_service_bindings

    def spy(url, query, timeout=30.0):
        shipped.append(query)
        return real_fetch(url, query, timeout)

    monkeypatch.setattr(federation, "fetch_service_bindings", spy)
    q = (
        f'SELECT ?e ?l WHERE {{ ?e <{U}#status> "active" . '
        f"SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"?e <{U}#label> ?l }} }} }}"
    )
    rows = {tuple(r) for r in sparql_select(local, q).collect()}
    want = {(f"<{U}#e1>", '"L1"'), (f"<{U}#e3>", '"L3"')}
    assert rows == want
    assert len(shipped) == 1 and "VALUES (?e)" in shipped[0]
    assert f"(<{U}#e1>)" in shipped[0] and f"(<{U}#e3>)" in shipped[0]
    # threshold 0 ⇒ unconstrained fallback, same results, no VALUES
    shipped.clear()
    monkeypatch.setattr(federation, "BOUND_JOIN_MAX", 0)
    rows2 = {tuple(r) for r in sparql_select(local, q).collect()}
    assert rows2 == want
    assert len(shipped) == 1 and "VALUES" not in shipped[0]
    client.delete_all_matches("", "", "")


def test_bound_join_skips_remote_optional_vars(spark, server, client):
    """A variable that appears only inside a remote OPTIONAL must NOT
    be constrained by the injected VALUES block — remote rows with it
    unbound are join-compatible with every local binding."""
    from ontograph_spark.query import sparql_select

    client.add_triples(
        [
            new_triple(
                mk_resource(f"{U}#e1"),
                mk_resource(f"{U}#label"),
                mk_literal("L1", "", ""),
            ),
        ]
    )
    # local side binds ?l to something the remote OPTIONAL never yields
    local = spark.createDataFrame(
        [(f"<{U}#e1>", f"<{U}#want>", '"other"', "g")],
        "subj string, pred string, obj string, graph string",
    )
    # remote: ?e mandatory, ?x optional (never present) — ?x shares
    # nothing; ?e ships, and the OPTIONAL-unbound ?x joins compatibly
    q = (
        f"SELECT ?e ?x WHERE {{ ?e <{U}#want> ?x . "
        f"SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"?e <{U}#label> ?l OPTIONAL {{ ?e <{U}#missing> ?x }} }} }} }}"
    )
    rows = {tuple(r) for r in sparql_select(local, q).collect()}
    assert rows == {(f"<{U}#e1>", '"other"')}
    client.delete_all_matches("", "", "")


def test_service_ships_optional_at_textual_position(
    spark, server, client, monkeypatch
):
    """OPTIONAL is a LeftJoin at its textual position (§18.2.2.6): a
    SERVICE body with a pattern AFTER the OPTIONAL that shares its
    variable must ship with the OPTIONAL in the middle — serializing it
    last would flip the answer from empty to one row."""
    from ontograph_spark.query import federation, sparql_select

    client.add_triples(
        [
            new_triple(
                mk_resource(f"{U}#a"),
                mk_resource(f"{U}#p"),
                mk_resource(f"{U}#o1"),
            ),
            new_triple(
                mk_resource(f"{U}#a"),
                mk_resource(f"{U}#q"),
                mk_resource(f"{U}#v1"),
            ),
            new_triple(
                mk_resource(f"{U}#a"),
                mk_resource(f"{U}#r"),
                mk_resource(f"{U}#v2"),
            ),
        ]
    )
    local = spark.createDataFrame(
        [("<u:x>", "<u:y>", '"z"', "g")],
        "subj string, pred string, obj string, graph string",
    )
    shipped: list[str] = []
    real_fetch = federation.fetch_service_bindings

    def spy(url, query, timeout=30.0):
        shipped.append(query)
        return real_fetch(url, query, timeout)

    monkeypatch.setattr(federation, "fetch_service_bindings", spy)
    q = (
        f"SELECT ?s ?o ?v WHERE {{ SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"?s <{U}#p> ?o OPTIONAL {{ ?s <{U}#q> ?v }} ?s <{U}#r> ?v "
        f"}} }} }}"
    )
    # LeftJoin first binds v=v1; the later r-pattern requires v=v2 ⇒ no
    # solution. An OPTIONAL-last serialization would return one row.
    assert sparql_select(local, q).collect() == []
    text = shipped[-1]
    assert text.index("OPTIONAL") < text.index(f"<{U}#r>")
    client.delete_all_matches("", "", "")


def test_service_silent_swallows_dead_endpoint(spark):
    from ontograph_spark.query import sparql_select
    from ontograph_spark.query.sparql import SparqlSyntaxError

    local = spark.createDataFrame(
        [("<u:a>", "<u:p>", '"x"', "g")],
        "subj string, pred string, obj string, graph string",
    )
    dead = "http://127.0.0.1:9/sparql"  # discard port: always refused
    q_silent = (
        "SELECT ?s WHERE { ?s <u:p> ?o . "
        f"SERVICE SILENT <{dead}> {{ ?s <u:q> ?z }} }}"
    )
    assert [r.s for r in sparql_select(local, q_silent).collect()] == ["<u:a>"]
    q_loud = (
        "SELECT ?s WHERE { ?s <u:p> ?o . "
        f"SERVICE <{dead}> {{ ?s <u:q> ?z }} }}"
    )
    with pytest.raises(SparqlSyntaxError, match="SERVICE"):
        sparql_select(local, q_loud).collect()


def test_service_body_restriction_raises(spark):
    """Triple blocks, paths, FILTER, OPTIONAL, UNION and VALUES ship
    to the remote endpoint; the order-sensitive shapes the flat
    serializer cannot reproduce (MINUS/BIND/subqueries) raise loudly
    instead of answering wrong."""
    from ontograph_spark.query import sparql_select
    from ontograph_spark.query.sparql import SparqlSyntaxError

    local = spark.createDataFrame(
        [("<u:a>", "<u:p>", '"x"', "g")],
        "subj string, pred string, obj string, graph string",
    )
    with pytest.raises(SparqlSyntaxError, match="SERVICE bodies"):
        sparql_select(
            local,
            "SELECT ?s WHERE { SERVICE <http://x/sparql> { "
            "?s <u:q> ?z MINUS { ?s <u:r> ?z } } }",
        ).collect()
    with pytest.raises(SparqlSyntaxError, match="SERVICE bodies"):
        sparql_select(
            local,
            "SELECT ?s ?y WHERE { SERVICE <http://x/sparql> { "
            "?s <u:q> ?z BIND(STR(?z) AS ?y) } }",
        ).collect()


def test_service_ships_paths_union_values_graph_var(
    spark, server, client, monkeypatch
):
    """Round-5 SERVICE body widening: property paths, UNION, VALUES
    and GRAPH ?var all serialize into the shipped query and evaluate
    on the live remote endpoint."""
    from ontograph_spark.query import federation, sparql_select

    client.add_triples(
        [
            new_triple(
                mk_resource(f"{U}#a"),
                mk_resource(f"{U}#next"),
                mk_resource(f"{U}#b"),
            ),
            new_triple(
                mk_resource(f"{U}#b"),
                mk_resource(f"{U}#next"),
                mk_resource(f"{U}#c"),
            ),
            new_triple(
                mk_resource(f"{U}#c"),
                mk_resource(f"{U}#alt"),
                mk_literal("tail", "", ""),
            ),
        ]
    )
    local = spark.createDataFrame(
        [(f"<{U}#a>", f"<{U}#status>", '"active"', "g")],
        "subj string, pred string, obj string, graph string",
    )
    shipped: list[str] = []
    real_fetch = federation.fetch_service_bindings

    def spy(url, query, timeout=30.0):
        shipped.append(query)
        return real_fetch(url, query, timeout)

    monkeypatch.setattr(federation, "fetch_service_bindings", spy)
    # path (+ closure) inside SERVICE
    q = (
        f'SELECT ?e ?y WHERE {{ ?e <{U}#status> "active" . '
        f"SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"?e <{U}#next>+ ?y }} }} }}"
    )
    rows = {tuple(r) for r in sparql_select(local, q).collect()}
    assert rows == {
        (f"<{U}#a>", f"<{U}#b>"),
        (f"<{U}#a>", f"<{U}#c>"),
    }
    assert "+" in shipped[-1]
    # UNION + VALUES inside SERVICE
    q2 = (
        f"SELECT ?s ?v WHERE {{ SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"{{ ?s <{U}#next> ?v }} UNION {{ ?s <{U}#alt> ?v }} "
        f"VALUES (?s) {{ (<{U}#b>) (<{U}#c>) }} }} }} }}"
    )
    rows2 = {tuple(r) for r in sparql_select(local, q2).collect()}
    assert rows2 == {
        (f"<{U}#b>", f"<{U}#c>"),
        (f"<{U}#c>", '"tail"'),
    }
    assert "UNION" in shipped[-1] and "VALUES (?s)" in shipped[-1]
    # GRAPH ?var inside SERVICE binds the remote graph name
    q3 = (
        f"SELECT ?g ?y WHERE {{ SERVICE <{server.url}> {{ "
        f"GRAPH ?g {{ <{U}#b> <{U}#next> ?y }} }} }}"
    )
    rows3 = {tuple(r) for r in sparql_select(local, q3).collect()}
    assert rows3 == {(f"<{U}>", f"<{U}#c>")}
    client.delete_all_matches("", "", "")


def test_graph_store_protocol_lifecycle(server):
    """SPARQL 1.1 Graph Store Protocol: PUT (create/replace) -> GET
    (N-Triples export) -> POST (merge) -> DELETE over live HTTP."""
    g = "https://g.example/gsp-graph"
    gsp = server.url.replace("/sparql", "/gsp") + "?graph=" + urllib.request.quote(g, safe="")

    def call(method, data=None):
        req = urllib.request.Request(gsp, data=data, method=method)
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    nt = f'<{g}#a> <{g}#p> "one" .\n<{g}#b> <{g}#p> "two" .\n'
    code, _ = call("PUT", nt.encode())
    assert code == 201  # created
    code, body = call("GET")
    assert code == 200
    assert sorted(body.strip().splitlines()) == sorted(nt.strip().splitlines())
    # POST merges (duplicate rows stay set-semantic)
    code, _ = call("POST", f'<{g}#c> <{g}#p> "three" .\n'.encode())
    assert code == 200
    _, body = call("GET")
    assert len(body.strip().splitlines()) == 3
    # PUT replaces
    code, _ = call("PUT", f'<{g}#only> <{g}#p> "solo" .\n'.encode())
    assert code == 200
    _, body = call("GET")
    assert body.strip() == f'<{g}#only> <{g}#p> "solo" .'
    # DELETE then 404
    assert call("DELETE")[0] == 200
    assert call("GET")[0] == 404
    # bad payload -> 400
    assert call("PUT", b"not triples at all }{")[0] == 400


def _post_query(url: str, q: str):
    import urllib.parse

    body = urllib.parse.urlencode({"query": q}).encode()
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_http_service_disabled_by_default(server, client):
    """SSRF guard: a client POSTing a federated query must not be able
    to make the driver fetch arbitrary URLs — SERVICE execution is
    rejected by default for queries arriving over HTTP, even SILENT."""
    client.add_triple(_t(31))
    q = (
        f"SELECT ?o WHERE {{ GRAPH <{U}> {{ ?s <{U}#rel> ?o }} "
        "SERVICE <http://169.254.169.254/latest/meta-data> { ?a ?b ?c } }"
    )
    code, body = _post_query(server.url, q)
    assert code == 400 and "not permitted" in body
    code, body = _post_query(
        server.url,
        q.replace("SERVICE <", "SERVICE SILENT <"),
    )
    assert code == 400 and "not permitted" in body
    # library-direct evaluation in the same process stays permissive:
    # the local engine federating against the live server still works
    # (covered by test_federated_service_join) — policy is scoped to
    # the HTTP handler thread.
    client.delete_all_matches("", "", "")


def test_http_service_allowlist(spark, server):
    """allow_service as a URL-prefix tuple: the listed endpoint is
    reachable through HTTP-submitted queries; others stay rejected."""
    ep = LocalSparqlEndpoint(spark, lambda uri: MemoryQuadStore(spark, uri))
    srv = SparqlHttpServer(ep, allow_service=(server.url,)).start()
    try:
        back = SparqlQuadStore(U, server.url)
        back.add_triple(_t(41))
        q = (
            f"SELECT ?o WHERE {{ SERVICE <{server.url}> {{ "
            f"GRAPH <{U}> {{ ?s <{U}#rel> ?o }} }} }}"
        )
        code, body = _post_query(srv.url, q)
        assert code == 200 and "v41" in body
        code, body = _post_query(
            srv.url,
            "SELECT ?a WHERE { SERVICE <http://internal.host/x> { ?a ?b ?c } }",
        )
        assert code == 400 and "not permitted" in body
        back.delete_all_matches("", "", "")
    finally:
        srv.stop()


def test_http_internal_error_returns_500(spark):
    """A non-syntax evaluation failure must surface as HTTP 500 with
    the message, not a dropped connection."""
    ep = LocalSparqlEndpoint(spark, lambda uri: MemoryQuadStore(spark, uri))
    orig = ep.query
    ep.query = lambda q: (_ for _ in ()).throw(RuntimeError("boom"))
    srv = SparqlHttpServer(ep).start()
    try:
        code, body = _post_query(srv.url, "SELECT ?s WHERE { ?s ?p ?o }")
        assert code == 500 and "boom" in body
    finally:
        ep.query = orig
        srv.stop()


def test_federated_service_with_filter_and_optional(spark, server):
    """FILTER and OPTIONAL inside a SERVICE body round-trip through the
    expression serializer and evaluate on the remote endpoint."""
    from ontograph_spark.query import sparql_select

    back = SparqlQuadStore(U, server.url)
    back.add_triples(
        [
            new_triple(
                mk_resource(f"{U}#s{i}"),
                mk_resource(f"{U}#score"),
                mk_literal(
                    str(i), "", "http://www.w3.org/2001/XMLSchema#integer"
                ),
            )
            for i in (1, 2, 3)
        ]
        + [
            new_triple(
                mk_resource(f"{U}#s3"),
                mk_resource(f"{U}#label"),
                mk_literal("three", "", ""),
            )
        ]
    )
    local = spark.createDataFrame(
        [(f"<{U}#s2>", "<u:local>", '"l2"', "loc"),
         (f"<{U}#s3>", "<u:local>", '"l3"', "loc")],
        "subj string, pred string, obj string, graph string",
    )
    q = (
        "SELECT ?s ?v ?lab WHERE { ?s <u:local> ?l "
        f"SERVICE <{server.url}> {{ GRAPH <{U}> {{ "
        f"?s <{U}#score> ?v "
        f"OPTIONAL {{ ?s <{U}#label> ?lab }} "
        "FILTER(?v >= 2) } } }"
    )
    got = sorted(tuple(r) for r in sparql_select(local, q).collect())
    assert got == [
        (
            f"<{U}#s2>",
            '"2"^^<http://www.w3.org/2001/XMLSchema#integer>',
            None,
        ),
        (
            f"<{U}#s3>",
            '"3"^^<http://www.w3.org/2001/XMLSchema#integer>',
            '"three"',
        ),
    ]
    back.delete_all_matches("", "", "")


# ---------------------------------------------------------------------------
# federation round-trip differential: local evaluation vs SERVICE-to-self
# ---------------------------------------------------------------------------

FED_CASES = int(os.environ.get("SPARQL_FED_CASES", "20"))


def test_service_roundtrip_matches_local_differential(spark, server):
    """Seeded differential for the SERVICE serializer: random bodies
    (BGP / property path / UNION / VALUES under GRAPH <uri>) evaluate
    once LOCALLY over the same quads and once SHIPPED through the live
    HTTP endpoint hosting those quads — the solution bags must match.
    Certifies that service_query_text's round-trip (incl. the bound
    join's injected VALUES) preserves semantics, not just syntax."""
    import random
    from collections import Counter

    from ontograph_spark.query import sparql_select
    from ontograph_spark.ontology.resources import new_triple
    from ontograph_spark.terms import mk_resource

    G2 = "https://g.example/fed-diff"
    back = SparqlQuadStore(G2, server.url)
    subs = [f"{G2}#n{i}" for i in range(4)]
    preds = [f"{G2}#p", f"{G2}#q"]
    for i, seed in enumerate(range(7000, 7000 + FED_CASES)):
        rng = random.Random(seed)
        n = rng.randint(2, 8)
        triples = sorted({
            (rng.choice(subs), rng.choice(preds), rng.choice(subs))
            for _ in range(n)
        })
        back.delete_all_matches("", "", "")
        back.add_triples(
            [
                new_triple(mk_resource(s), mk_resource(p), mk_resource(o))
                for s, p, o in triples
            ]
        )
        kind = rng.choice(["bgp", "path", "union", "values"])
        p1, p2 = rng.choice(preds), rng.choice(preds)
        if kind == "bgp":
            body = f"?x <{p1}> ?y . ?y <{p2}> ?z ."
            out = ["x", "y", "z"]
        elif kind == "path":
            body = f"?x (<{p1}>|^<{p2}>)+ ?y ."
            out = ["x", "y"]
        elif kind == "union":
            body = f"{{ ?x <{p1}> ?y }} UNION {{ ?x <{p2}> ?y }}"
            out = ["x", "y"]
        else:
            body = (
                f"?x <{p1}> ?y VALUES (?x) {{ (<{subs[0]}>) (<{subs[1]}>) }}"
            )
            out = ["x", "y"]
        proj = " ".join(f"?{v}" for v in out)
        inner = f"GRAPH <{G2}> {{ {body} }}"
        local_df = spark.createDataFrame(
            [(f"<{s}>", f"<{p}>", f"<{o}>", G2) for s, p, o in triples],
            "subj string, pred string, obj string, graph string",
        )
        q_local = f"SELECT {proj} WHERE {{ {inner} }}"
        q_fed = (
            f"SELECT {proj} WHERE {{ SERVICE <{server.url}> "
            f"{{ {inner} }} }}"
        )
        empty_local = local_df.limit(0)
        want = Counter(
            tuple(r) for r in sparql_select(local_df, q_local).collect()
        )
        got = Counter(
            tuple(r) for r in sparql_select(empty_local, q_fed).collect()
        )
        assert got == want, f"case {i} seed {seed} {kind}: {q_fed!r} over {triples}"
    back.delete_all_matches("", "", "")
