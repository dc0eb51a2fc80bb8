"""Replay recorded SPARQL wire fixtures through the REAL transport.

tests/sparql_fake.py overrides ``_execute_query``/``_execute_update`` —
it never exercises the urllib request construction, form encoding, or
response decoding. This suite does: a custom urllib handler serves the
recorded exchanges (tests/fixtures/sparql_replay.json, produced by a
second engine — the in-process SPARQL endpoint) for the ``replay://``
scheme, so ``SparqlQuadStore`` runs its unmodified HTTP code path end to
end. The handler also asserts the client's emitted request stream matches
the recording byte-for-byte, in order — reference parity for the live
Blazegraph suite (blazegraph_store_test.go:51-397) without a server.

No Spark session involved: this is a pure driver-side transport test."""

from __future__ import annotations

import io
import json
import os
import urllib.request
from email.message import Message

import pytest

from ontograph_spark.store.sparql_store import SparqlQuadStore

from record_sparql_fixtures import FIXTURE_PATH, replay_url
from sparql_replay_script import GRAPH, drive


class _ReplayHandler(urllib.request.BaseHandler):
    """Serves the ordered exchange list for the replay:// scheme and
    verifies each incoming request against the recording."""

    def __init__(self, exchanges: list[dict]) -> None:
        self.exchanges = exchanges
        self.cursor = 0

    def replay_open(self, req):
        assert self.cursor < len(self.exchanges), (
            f"client sent more requests than recorded "
            f"({len(self.exchanges)}): {req.full_url}"
        )
        want = self.exchanges[self.cursor]
        self.cursor += 1
        got_body = (req.data or b"").decode()
        assert req.full_url == want["url"], (req.full_url, want["url"])
        assert got_body == want["request_body"], (
            f"request #{self.cursor} drifted from the recording:\n"
            f"  got:  {got_body}\n  want: {want['request_body']}"
        )
        headers = Message()
        headers["Content-Type"] = (
            "application/sparql-results+json"
            if want["kind"] == "query"
            else "text/plain"
        )
        resp = urllib.request.addinfourl(
            io.BytesIO(want["response_body"].encode()),
            headers,
            req.full_url,
            want["status"],
        )
        return resp


@pytest.fixture()
def exchanges():
    if not os.path.exists(FIXTURE_PATH):
        pytest.fail(
            "missing tests/fixtures/sparql_replay.json — regenerate with "
            "`python tests/record_sparql_fixtures.py`"
        )
    with open(FIXTURE_PATH) as f:
        return json.load(f)


def test_replay_full_operator_matrix(exchanges):
    handler = _ReplayHandler(exchanges)
    opener = urllib.request.build_opener(handler)
    urllib.request.install_opener(opener)
    try:
        store = SparqlQuadStore(GRAPH, replay_url(GRAPH))
        drive(store)
    finally:
        urllib.request.install_opener(urllib.request.build_opener())
    assert handler.cursor == len(exchanges), (
        f"client sent fewer requests ({handler.cursor}) than recorded "
        f"({len(exchanges)})"
    )


def test_fixture_responses_are_wire_shaped(exchanges):
    """Every recorded query response parses as SPARQL-JSON with the
    head/results or boolean shape a real endpoint returns."""
    assert exchanges, "fixture is empty"
    for e in exchanges:
        if e["kind"] != "query":
            assert e["response_body"] == ""
            continue
        doc = json.loads(e["response_body"])
        assert "boolean" in doc or "results" in doc
        if "results" in doc:
            assert isinstance(doc["results"]["bindings"], list)
            for b in doc["results"]["bindings"]:
                for var, binding in b.items():
                    assert binding["type"] in ("uri", "literal", "typed-literal")
                    assert "value" in binding
