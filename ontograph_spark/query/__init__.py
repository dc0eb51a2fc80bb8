"""Distributed SPARQL answering over the quad table."""

from ontograph_spark.query.sparql import (  # noqa: F401
    SparqlSyntaxError,
    sparql_ask,
    sparql_select,
)
