"""Distributed SPARQL answering over the quad table."""

from ontograph_spark.query.endpoint import LocalSparqlEndpoint  # noqa: F401
from ontograph_spark.query.sparql import (  # noqa: F401
    SparqlSyntaxError,
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
)
