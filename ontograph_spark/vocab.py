"""OWL/RDF/RDFS/XSD vocabulary constants.

Mirrors the reference constant set (/root/reference/constants.go:5-45) as a
frozen Python module. The hot predicate at scale is ``RDF_TYPE`` — every
resource emitter writes at least one ``rdf:type`` triple, so shuffles keyed
on predicate must salt it (see ontograph_spark/pipeline/materialize.py).
"""

OWL_ONTOLOGY = "http://www.w3.org/2002/07/owl#Ontology"
OWL_VERSION_INFO = "http://www.w3.org/2002/07/owl#versionInfo"
OWL_IMPORTS = "http://www.w3.org/2002/07/owl#imports"
OWL_INVERSE_OF = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_EQUIVALENT_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
OWL_DISJOINT_WITH = "http://www.w3.org/2002/07/owl#disjointWith"
OWL_OBJECT_PROPERTY = "http://www.w3.org/2002/07/owl#ObjectProperty"
OWL_FUNCTIONAL_PROPERTY = "http://www.w3.org/2002/07/owl#FunctionalProperty"
OWL_INVERSE_FUNCTIONAL_PROPERTY = (
    "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"
)
OWL_SYMMETRIC_PROPERTY = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_ASYMMETRIC_PROPERTY = "http://www.w3.org/2002/07/owl#AsymmetricProperty"
OWL_TRANSITIVE_PROPERTY = "http://www.w3.org/2002/07/owl#TransitiveProperty"
OWL_REFLEXIVE_PROPERTY = "http://www.w3.org/2002/07/owl#ReflexiveProperty"
OWL_IRREFLEXIVE_PROPERTY = "http://www.w3.org/2002/07/owl#IrreflexiveProperty"
OWL_PROPERTY_DISJOINT_WITH = "http://www.w3.org/2002/07/owl#propertyDisjointWith"
OWL_EQUIVALENT_PROPERTY = "http://www.w3.org/2002/07/owl#equivalentProperty"
OWL_DATATYPE_PROPERTY = "http://www.w3.org/2002/07/owl#DatatypeProperty"
OWL_NAMED_INDIVIDUAL = "http://www.w3.org/2002/07/owl#NamedIndividual"
OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUB_CLASS_OF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUB_PROPERTY_OF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
RDFS_DATATYPE = "http://www.w3.org/2000/01/rdf-schema#Datatype"

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_FLOAT = "http://www.w3.org/2001/XMLSchema#float"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"
XSD_TIME = "http://www.w3.org/2001/XMLSchema#time"
XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_ANY_URI = "http://www.w3.org/2001/XMLSchema#anyURI"

#: Prefix map used by the pretty Turtle serializer
#: (reference: memory_store.go:249-255).
BASE_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}
