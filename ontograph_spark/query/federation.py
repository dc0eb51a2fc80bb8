"""SPARQL 1.1 Federation: ``SERVICE`` execution.

``SERVICE <endpoint> { pattern }`` evaluates the inner pattern on a
REMOTE SPARQL endpoint and joins the returned bindings into the local
solution — SPARQL 1.1 Federated Query. The standard implementation
everywhere (Jena, Virtuoso, Blazegraph) is exactly this shape: the
inner group is shipped as a SELECT over the same wire protocol the
reference's client speaks (form-encoded POST + SPARQL-JSON decode,
blazegraph_store.go), the bindings come back driver-side, and the join
happens in the local engine. Remote result sets are broadcast-sized by
construction (an endpoint answering millions of rows over HTTP is the
anti-pattern federation docs warn about) — so the local join is a
broadcast hash join against the distributed solution set.

Scope (documented): the service body is a plain triple block,
optionally under ``GRAPH <uri>`` — the dominant federation shape
(fetch remote bindings by BGP). ``SERVICE SILENT`` turns endpoint
failures into the empty join-identity per the spec.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


def service_query_text(group) -> tuple[str, list[str]]:
    """Serialize a parsed service body back to a standalone SELECT.

    Prefixed names were already resolved to full terms at parse time,
    so the generated query needs no prologue. Returns (query text,
    variable names in projection order)."""
    from ontograph_spark.query.sparql import SparqlSyntaxError

    if not group.is_plain_triples() or not group.patterns:
        raise SparqlSyntaxError(
            "SERVICE bodies support plain triple blocks (optionally "
            "under GRAPH <uri>) — move filters/joins outside the "
            "SERVICE group"
        )
    vars_: list[str] = []

    def slot(s) -> str:
        kind, val = s
        if kind == "var":
            if val not in vars_:
                vars_.append(val)
            return f"?{val}"
        return val

    by_graph: dict[str | None, list[str]] = {}
    for pat in group.patterns:
        text = f"{slot(pat.s)} {slot(pat.p)} {slot(pat.o)} ."
        if pat.g is None:
            key = None
        elif pat.g[0] == "term":
            key = pat.g[1]
        else:
            raise SparqlSyntaxError(
                "SERVICE bodies support GRAPH <uri> only (a GRAPH ?var "
                "over a remote dataset is not shippable verbatim)"
            )
        by_graph.setdefault(key, []).append(text)
    parts = []
    for key, triples in by_graph.items():
        block = " ".join(triples)
        parts.append(block if key is None else f"GRAPH <{key}> {{ {block} }}")
    if not vars_:
        # all-constant service pattern: probe existence, project nothing
        return f"ASK {{ {' '.join(parts)} }}", []
    return (
        f"SELECT {' '.join(f'?{v}' for v in vars_)} "
        f"WHERE {{ {' '.join(parts)} }}",
        vars_,
    )


def fetch_service_bindings(
    endpoint_url: str, query: str, timeout: float = 30.0
) -> dict:
    """POST the query to the endpoint with the reference client's exact
    protocol (form-encoded, Accept sparql-results+json) and return the
    decoded result document."""
    import urllib.parse

    data = urllib.parse.urlencode({"query": query}).encode()
    req = urllib.request.Request(
        endpoint_url,
        data=data,
        headers={
            "Content-Type": "application/x-www-form-urlencoded",
            "Accept": "application/sparql-results+json",
        },
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode())


def service_solutions(spark, endpoint_url: str, group, silent: bool):
    """Evaluate a SERVICE group against a remote endpoint.

    Returns ``(rows, var_names, nullable_names)`` where rows are
    encoded-term tuples ready for ``createDataFrame`` — or ``None``:
    SILENT + failure (the spec's empty join identity), or an
    all-constant pattern that exists remotely (also join identity).
    Raises the transport/parse error when not SILENT."""
    from ontograph_spark.query.sparql import SparqlSyntaxError
    from ontograph_spark.store.sparql_store import binding_to_term

    query, vars_ = service_query_text(group)
    try:
        doc = fetch_service_bindings(endpoint_url, query)
    except (urllib.error.URLError, OSError, ValueError) as e:
        if silent:
            return None
        raise SparqlSyntaxError(
            f"SERVICE <{endpoint_url}> failed: {e}"
        ) from e
    if not vars_:
        if doc.get("boolean"):
            return None  # exists ⇒ identity
        return ([], [], set())  # fails ⇒ empty solutions (kills the group)
    rows: list[tuple] = []
    nullable: set[str] = set()
    for b in doc.get("results", {}).get("bindings", []):
        row = []
        for v in vars_:
            cell = b.get(v)
            if cell is None:
                nullable.add(v)
                row.append(None)
            else:
                row.append(binding_to_term(cell))
        rows.append(tuple(row))
    return (rows, vars_, nullable)
