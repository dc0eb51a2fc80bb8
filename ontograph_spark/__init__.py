"""ontograph_spark — a PySpark-native RDF triple-store / OWL-ontology engine
and knowledge-graph construction pipeline.

Re-expresses the semantics of the reference library (kahefi/ontograph,
/root/reference/) as distributed DataFrame algebra:

* ``terms`` / ``vocab`` — N-Triples term codec and OWL constants;
* ``store`` — quad-table graph stores (in-memory DataFrame, parquet
  snapshot store with commit log, SPARQL-endpoint client);
* ``ontology`` — typed resources (class / properties / datatype /
  individual), triple emitters and folds, the OntologyGraph API;
* ``pipeline`` — the KG-construction pipeline over a source-code repo
  table: ingest → mention extraction → entity linking → sameAs
  canonicalization (connected components) → salted materialize;
* ``functions`` — large-scale training-data ops (dedup, similarity
  search, text analysis, multimodal column plumbing).
"""

from ontograph_spark import errors, terms, vocab
from ontograph_spark.ontology.literals import (
    GenericLiteral,
    xsd_any_uri,
    xsd_boolean,
    xsd_datetime,
    xsd_decimal,
    xsd_integer,
    xsd_string,
)
from ontograph_spark.ontology.resources import (
    OntologyClass,
    OntologyDataProperty,
    OntologyDatatype,
    OntologyIndividual,
    OntologyObjectProperty,
    Triple,
)

__all__ = [
    "errors",
    "terms",
    "vocab",
    "Triple",
    "GenericLiteral",
    "OntologyClass",
    "OntologyDatatype",
    "OntologyDataProperty",
    "OntologyObjectProperty",
    "OntologyIndividual",
    "xsd_string",
    "xsd_integer",
    "xsd_decimal",
    "xsd_boolean",
    "xsd_any_uri",
    "xsd_datetime",
]
