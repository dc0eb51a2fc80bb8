"""Record SPARQL wire fixtures for the transport replay test.

Runs the shared operator script (tests/sparql_replay_script.py) through a
recording client whose transport forwards every SPARQL string to the
in-process engine endpoint (ontograph_spark/query/endpoint.py — the
independent "second engine") and captures the exact HTTP exchange a real
server would produce: the form-urlencoded request body and the
SPARQL-JSON response bytes. The ordered exchange list is written to
tests/fixtures/sparql_replay.json; tests/test_sparql_replay.py replays it
through the REAL urllib transport path.

Regenerate with:  python tests/record_sparql_fixtures.py
(The fixture is deterministic up to row order inside responses, which the
script's assertions never depend on.)
"""

from __future__ import annotations

import json
import os
import urllib.parse

from ontograph_spark.query.endpoint import LocalSparqlEndpoint
from ontograph_spark.store.memory import MemoryQuadStore
from ontograph_spark.store.sparql_store import SparqlQuadStore

FIXTURE_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "sparql_replay.json"
)


def replay_url(uri: str) -> str:
    return f"replay://endpoint/{urllib.parse.quote(uri, safe='')}/sparql"


class RecordingClient(SparqlQuadStore):
    """SparqlQuadStore whose transport answers from the engine endpoint
    and logs the wire exchange byte-for-byte."""

    def __init__(self, endpoint: LocalSparqlEndpoint, uri: str, log: list) -> None:
        super().__init__(uri, replay_url(uri))
        self._endpoint = endpoint
        self._log = log

    def _execute_query(self, sparql: str) -> dict:
        body = json.dumps(self._endpoint.query(sparql))
        self._log.append(
            {
                "kind": "query",
                "url": self.query_url,
                "request_body": urllib.parse.urlencode({"query": sparql}),
                "status": 200,
                "response_body": body,
            }
        )
        return json.loads(body)

    def _execute_update(self, sparql: str) -> None:
        self._endpoint.update(sparql)
        self._log.append(
            {
                "kind": "update",
                "url": self.update_url,
                "request_body": urllib.parse.urlencode({"update": sparql}),
                "status": 200,
                "response_body": "",
            }
        )


def record(spark) -> list[dict]:
    from sparql_replay_script import GRAPH, drive

    endpoint = LocalSparqlEndpoint(spark, lambda uri: MemoryQuadStore(spark, uri))
    log: list[dict] = []
    client = RecordingClient(endpoint, GRAPH, log)
    endpoint.store_for(GRAPH)
    drive(client)
    return log


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    log = record(spark)
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    with open(FIXTURE_PATH, "w") as f:
        json.dump(log, f, indent=1)
    print(f"recorded {len(log)} exchanges -> {FIXTURE_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
