"""Ontology resources: triple emitters and triple folds.

Each resource kind (class, datatype, data/object property, individual) is a
dataclass with

* ``to_triples()`` — the KG-construction rule: exactly which
  ``(subj, pred, obj)`` rows the resource contributes. Emission rules mirror
  the reference emitters (/root/reference/ontology_class.go:19-70,
  ontology_datatype.go:16-45, ontology_data_prop.go:22-100,
  ontology_object_prop.go:29-157, ontology_individual.go:34-101); the
  pipeline's output P/R is scored against these rules.
* a module-level ``fold_*`` — the inverse: grouped (pred, obj) pairs →
  resource, mirroring the Get* folds (ontology_graph.go:290-514) including
  the type-marker gate (no marker triple → not that kind of resource).

Emitters/folds are pure Python: they run driver-side for the OntologyGraph
API and inside Arrow-batched stages for bulk emission. The *bulk* distributed
emitters (column expressions → exploded triple rows, all JVM-side) live in
pipeline/construct.py and are golden-tested against these.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ontograph_spark import vocab
from ontograph_spark.ontology.literals import GenericLiteral
from ontograph_spark.terms import (
    is_literal,
    is_resource,
    mk_literal,
    mk_resource,
    term_language,
    term_value,
    validate_triple,
)


@dataclass(frozen=True)
class Triple:
    """A subject-predicate-object row; all three are encoded terms."""

    subject: str
    predicate: str
    object: str

    def as_tuple(self) -> tuple[str, str, str]:
        return (self.subject, self.predicate, self.object)


def new_triple(subj: str, pred: str, obj: str) -> Triple:
    """Validated constructor (triple.go:102-120)."""
    validate_triple(subj, pred, obj)
    return Triple(subj, pred, obj)


def _label_comment_triples(
    subj: str, label: dict[str, str] | None, comment: dict[str, str] | None
) -> list[Triple]:
    """Language-keyed plain literals with no datatype; ``lang=''`` yields a
    bare ``"value"`` literal (e.g. ontology_class.go:53-67)."""
    out: list[Triple] = []
    for lang, text in (label or {}).items():
        out.append(
            Triple(subj, mk_resource(vocab.RDFS_LABEL), mk_literal(text, lang, ""))
        )
    for lang, text in (comment or {}).items():
        out.append(
            Triple(
                subj, mk_resource(vocab.RDFS_COMMENT), mk_literal(text, lang, "")
            )
        )
    return out


def _uri_list_triples(subj: str, pred_uri: str, uris: list[str] | None) -> list[Triple]:
    pred = mk_resource(pred_uri)
    return [Triple(subj, pred, mk_resource(u)) for u in (uris or [])]


@dataclass
class OntologyClass:
    uri: str
    equivalent_to: list[str] = field(default_factory=list)
    sub_class_of: list[str] = field(default_factory=list)
    disjoint_with: list[str] = field(default_factory=list)
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        """ontology_class.go:19-70."""
        subj = mk_resource(self.uri)
        trps = [
            Triple(subj, mk_resource(vocab.RDF_TYPE), mk_resource(vocab.OWL_CLASS))
        ]
        trps += _uri_list_triples(subj, vocab.OWL_EQUIVALENT_CLASS, self.equivalent_to)
        trps += _uri_list_triples(subj, vocab.RDFS_SUB_CLASS_OF, self.sub_class_of)
        trps += _uri_list_triples(subj, vocab.OWL_DISJOINT_WITH, self.disjoint_with)
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyDatatype:
    uri: str
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        """ontology_datatype.go:16-45."""
        subj = mk_resource(self.uri)
        trps = [
            Triple(
                subj, mk_resource(vocab.RDF_TYPE), mk_resource(vocab.RDFS_DATATYPE)
            )
        ]
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyDataProperty:
    uri: str
    equivalent_to: list[str] = field(default_factory=list)
    sub_property_of: list[str] = field(default_factory=list)
    domains: list[str] = field(default_factory=list)
    ranges: list[str] = field(default_factory=list)
    disjoint_with: list[str] = field(default_factory=list)
    is_functional: bool = False
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        """ontology_data_prop.go:22-100."""
        subj = mk_resource(self.uri)
        rdf_type = mk_resource(vocab.RDF_TYPE)
        trps = [Triple(subj, rdf_type, mk_resource(vocab.OWL_DATATYPE_PROPERTY))]
        trps += _uri_list_triples(
            subj, vocab.OWL_EQUIVALENT_PROPERTY, self.equivalent_to
        )
        trps += _uri_list_triples(
            subj, vocab.RDFS_SUB_PROPERTY_OF, self.sub_property_of
        )
        trps += _uri_list_triples(subj, vocab.RDFS_DOMAIN, self.domains)
        trps += _uri_list_triples(subj, vocab.RDFS_RANGE, self.ranges)
        trps += _uri_list_triples(
            subj, vocab.OWL_PROPERTY_DISJOINT_WITH, self.disjoint_with
        )
        if self.is_functional:
            trps.append(
                Triple(subj, rdf_type, mk_resource(vocab.OWL_FUNCTIONAL_PROPERTY))
            )
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


#: (flag-attribute, characteristic-class URI) in reference emission order
#: (ontology_object_prop.go:88-137).
_OBJECT_PROP_CHARACTERISTICS: list[tuple[str, str]] = [
    ("is_functional", vocab.OWL_FUNCTIONAL_PROPERTY),
    ("is_inverse_functional", vocab.OWL_INVERSE_FUNCTIONAL_PROPERTY),
    ("is_transitive", vocab.OWL_TRANSITIVE_PROPERTY),
    ("is_symmetric", vocab.OWL_SYMMETRIC_PROPERTY),
    ("is_asymmetric", vocab.OWL_ASYMMETRIC_PROPERTY),
    ("is_reflexive", vocab.OWL_REFLEXIVE_PROPERTY),
    ("is_irreflexive", vocab.OWL_IRREFLEXIVE_PROPERTY),
]


@dataclass
class OntologyObjectProperty:
    uri: str
    equivalent_to: list[str] = field(default_factory=list)
    sub_property_of: list[str] = field(default_factory=list)
    inverse_of: list[str] = field(default_factory=list)
    domains: list[str] = field(default_factory=list)
    ranges: list[str] = field(default_factory=list)
    disjoint_with: list[str] = field(default_factory=list)
    is_functional: bool = False
    is_inverse_functional: bool = False
    is_transitive: bool = False
    is_symmetric: bool = False
    is_asymmetric: bool = False
    is_reflexive: bool = False
    is_irreflexive: bool = False
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        """ontology_object_prop.go:29-157."""
        subj = mk_resource(self.uri)
        rdf_type = mk_resource(vocab.RDF_TYPE)
        trps = [Triple(subj, rdf_type, mk_resource(vocab.OWL_OBJECT_PROPERTY))]
        trps += _uri_list_triples(
            subj, vocab.OWL_EQUIVALENT_PROPERTY, self.equivalent_to
        )
        trps += _uri_list_triples(
            subj, vocab.RDFS_SUB_PROPERTY_OF, self.sub_property_of
        )
        trps += _uri_list_triples(subj, vocab.OWL_INVERSE_OF, self.inverse_of)
        trps += _uri_list_triples(subj, vocab.RDFS_DOMAIN, self.domains)
        trps += _uri_list_triples(subj, vocab.RDFS_RANGE, self.ranges)
        trps += _uri_list_triples(
            subj, vocab.OWL_PROPERTY_DISJOINT_WITH, self.disjoint_with
        )
        for attr, cls_uri in _OBJECT_PROP_CHARACTERISTICS:
            if getattr(self, attr):
                trps.append(Triple(subj, rdf_type, mk_resource(cls_uri)))
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyIndividual:
    uri: str
    types: list[str] = field(default_factory=list)
    same_individual_as: list[str] = field(default_factory=list)
    object_properties: dict[str, list[str]] = field(default_factory=dict)
    data_properties: dict[str, list[GenericLiteral]] = field(default_factory=dict)
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def add_object_property(self, prop: str, target: str) -> None:
        self.object_properties.setdefault(prop, []).append(target)

    def add_data_property(self, prop: str, target: GenericLiteral) -> None:
        self.data_properties.setdefault(prop, []).append(target)

    def to_triples(self) -> list[Triple]:
        """ontology_individual.go:34-101. The ``owl:sameAs`` rows are the
        alias edges consumed by connected-components canonicalization."""
        subj = mk_resource(self.uri)
        rdf_type = mk_resource(vocab.RDF_TYPE)
        trps = [Triple(subj, rdf_type, mk_resource(vocab.OWL_NAMED_INDIVIDUAL))]
        trps += [Triple(subj, rdf_type, mk_resource(u)) for u in self.types]
        trps += _uri_list_triples(subj, vocab.OWL_SAME_AS, self.same_individual_as)
        for prop_uri, targets in self.object_properties.items():
            pred = mk_resource(prop_uri)
            trps += [Triple(subj, pred, mk_resource(u)) for u in targets]
        for prop_uri, literals in self.data_properties.items():
            pred = mk_resource(prop_uri)
            trps += [Triple(subj, pred, lit.term) for lit in literals]
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


OntologyResource = (
    OntologyClass
    | OntologyDatatype
    | OntologyDataProperty
    | OntologyObjectProperty
    | OntologyIndividual
)


# ---------------------------------------------------------------------------
# Folds: grouped (pred, obj) pairs -> resource (ontology_graph.go:290-514)
# ---------------------------------------------------------------------------

_RDF_TYPE_T = mk_resource(vocab.RDF_TYPE)
_RDFS_LABEL_T = mk_resource(vocab.RDFS_LABEL)
_RDFS_COMMENT_T = mk_resource(vocab.RDFS_COMMENT)


def fold_class(uri: str, pairs: list[tuple[str, str]]) -> OntologyClass | None:
    """ontology_graph.go:290-325; returns None when the ``rdf:type
    owl:Class`` marker is absent."""
    cls = OntologyClass(uri="")
    for pred, obj in pairs:
        if pred == _RDF_TYPE_T and obj == mk_resource(vocab.OWL_CLASS):
            cls.uri = uri
        elif pred == mk_resource(vocab.OWL_EQUIVALENT_CLASS):
            cls.equivalent_to.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_SUB_CLASS_OF):
            cls.sub_class_of.append(term_value(obj))
        elif pred == mk_resource(vocab.OWL_DISJOINT_WITH):
            cls.disjoint_with.append(term_value(obj))
        elif pred == _RDFS_LABEL_T:
            cls.label[term_language(obj)] = term_value(obj)
        elif pred == _RDFS_COMMENT_T:
            cls.comment[term_language(obj)] = term_value(obj)
    return cls if cls.uri else None


def fold_object_property(
    uri: str, pairs: list[tuple[str, str]]
) -> OntologyObjectProperty | None:
    """ontology_graph.go:328-393."""
    prop = OntologyObjectProperty(uri="")
    char_by_obj = {
        mk_resource(cls_uri): attr for attr, cls_uri in _OBJECT_PROP_CHARACTERISTICS
    }
    for pred, obj in pairs:
        if pred == _RDF_TYPE_T and obj == mk_resource(vocab.OWL_OBJECT_PROPERTY):
            prop.uri = uri
        elif pred == mk_resource(vocab.OWL_EQUIVALENT_PROPERTY):
            prop.equivalent_to.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_SUB_PROPERTY_OF):
            prop.sub_property_of.append(term_value(obj))
        elif pred == mk_resource(vocab.OWL_INVERSE_OF):
            prop.inverse_of.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_DOMAIN):
            prop.domains.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_RANGE):
            prop.ranges.append(term_value(obj))
        elif pred == mk_resource(vocab.OWL_PROPERTY_DISJOINT_WITH):
            prop.disjoint_with.append(term_value(obj))
        elif pred == _RDF_TYPE_T and obj in char_by_obj:
            setattr(prop, char_by_obj[obj], True)
        elif pred == _RDFS_LABEL_T:
            prop.label[term_language(obj)] = term_value(obj)
        elif pred == _RDFS_COMMENT_T:
            prop.comment[term_language(obj)] = term_value(obj)
    return prop if prop.uri else None


def fold_data_property(
    uri: str, pairs: list[tuple[str, str]]
) -> OntologyDataProperty | None:
    """ontology_graph.go:396-440."""
    prop = OntologyDataProperty(uri="")
    for pred, obj in pairs:
        if pred == _RDF_TYPE_T and obj == mk_resource(vocab.OWL_DATATYPE_PROPERTY):
            prop.uri = uri
        elif pred == mk_resource(vocab.OWL_EQUIVALENT_PROPERTY):
            prop.equivalent_to.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_SUB_PROPERTY_OF):
            prop.sub_property_of.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_DOMAIN):
            prop.domains.append(term_value(obj))
        elif pred == mk_resource(vocab.RDFS_RANGE):
            prop.ranges.append(term_value(obj))
        elif pred == mk_resource(vocab.OWL_PROPERTY_DISJOINT_WITH):
            prop.disjoint_with.append(term_value(obj))
        elif pred == _RDF_TYPE_T and obj == mk_resource(
            vocab.OWL_FUNCTIONAL_PROPERTY
        ):
            prop.is_functional = True
        elif pred == _RDFS_LABEL_T:
            prop.label[term_language(obj)] = term_value(obj)
        elif pred == _RDFS_COMMENT_T:
            prop.comment[term_language(obj)] = term_value(obj)
    return prop if prop.uri else None


def fold_datatype(uri: str, pairs: list[tuple[str, str]]) -> OntologyDatatype | None:
    """ontology_graph.go:443-469."""
    dt = OntologyDatatype(uri="")
    for pred, obj in pairs:
        if pred == _RDF_TYPE_T and obj == mk_resource(vocab.RDFS_DATATYPE):
            dt.uri = uri
        elif pred == _RDFS_LABEL_T:
            dt.label[term_language(obj)] = term_value(obj)
        elif pred == _RDFS_COMMENT_T:
            dt.comment[term_language(obj)] = term_value(obj)
    return dt if dt.uri else None


def fold_individual(
    uri: str, pairs: list[tuple[str, str]]
) -> OntologyIndividual | None:
    """ontology_graph.go:472-514. Precedence chain: the NamedIndividual
    marker wins, other ``rdf:type`` rows become Types, ``owl:sameAs`` rows
    become aliases, labels/comments fold into maps, and *everything else*
    splits on the object's shape (resource -> object property, literal ->
    data property)."""
    indiv = OntologyIndividual(uri="")
    named = mk_resource(vocab.OWL_NAMED_INDIVIDUAL)
    same_as = mk_resource(vocab.OWL_SAME_AS)
    for pred, obj in pairs:
        if pred == _RDF_TYPE_T and obj == named:
            indiv.uri = uri
        elif pred == _RDF_TYPE_T:
            indiv.types.append(term_value(obj))
        elif pred == same_as:
            indiv.same_individual_as.append(term_value(obj))
        elif pred == _RDFS_LABEL_T:
            indiv.label[term_language(obj)] = term_value(obj)
        elif pred == _RDFS_COMMENT_T:
            indiv.comment[term_language(obj)] = term_value(obj)
        else:
            prop = term_value(pred)
            if is_resource(obj):
                indiv.object_properties.setdefault(prop, []).append(term_value(obj))
            elif is_literal(obj):
                indiv.data_properties.setdefault(prop, []).append(
                    GenericLiteral(obj)
                )
    return indiv if indiv.uri else None
