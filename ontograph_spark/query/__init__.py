"""Distributed SPARQL answering over the quad table."""

from ontograph_spark.query.endpoint import LocalSparqlEndpoint  # noqa: F401
from ontograph_spark.query.http_server import SparqlHttpServer  # noqa: F401
from ontograph_spark.query.results import (  # noqa: F401
    results_csv,
    results_json,
    results_tsv,
    results_xml,
    serialize_results,
)
from ontograph_spark.query.sparql import (  # noqa: F401
    SparqlSyntaxError,
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
)
