"""OntologyGraph semantics tests.

Transcribed from the reference ontology suite
(/root/reference/ontology_graph_test.go:13-630): init/load, label/comment
upsert incl. overwrite, version, imports, per-resource-kind upsert+get
round-trips incl. namespace rejection, and the GetIndividuals filter matrix
(none / single class / AND / OR / object-prop / data-prop / mixed chain).

The whole matrix is parametrized over BOTH backends — the quad-table
MemoryQuadStore (DataFrame plans) and the SPARQL store over the in-memory
fake endpoint (driver-side plans) — mirroring the reference, which runs
ontology_graph_test.go against the memory store AND live Blazegraph.
"""

from __future__ import annotations

import pytest

from ontograph_spark.errors import (
    OntologyAlreadyExistsError,
    OntologyNotFoundError,
    ResourceDoesNotBelongToGraphError,
    ResourceNotFoundError,
    TripleAlreadyExistsError,
)
from ontograph_spark.ontology.graph import OntologyGraph, TripleFilter
from ontograph_spark.ontology.literals import xsd_integer, xsd_string
from ontograph_spark.ontology.resources import (
    OntologyClass,
    OntologyDataProperty,
    OntologyDatatype,
    OntologyIndividual,
    OntologyObjectProperty,
)
from ontograph_spark.store import MemoryQuadStore

URI = "https://www.ontograph.com/test-ont"


@pytest.fixture(params=["memory", "sparql"])
def make_store(request, spark):
    """Factory for a fresh store of the parametrized backend."""
    if request.param == "memory":
        return lambda: MemoryQuadStore(spark, URI)
    from sparql_fake import FakeSparqlStore

    return lambda: FakeSparqlStore(URI)


@pytest.fixture()
def ont(make_store):
    return OntologyGraph.init(make_store())


def test_init_and_load(make_store):
    store = make_store()
    ont = OntologyGraph.init(store)
    assert ont.get_uri() == URI
    with pytest.raises(OntologyAlreadyExistsError):
        OntologyGraph.init(store)
    loaded = OntologyGraph.load(store)
    assert loaded.get_uri() == URI


def test_load_missing(make_store):
    with pytest.raises(OntologyNotFoundError):
        OntologyGraph.load(make_store())


def test_labels_and_comments_upsert(ont):
    ont.set_label("a label", "en")
    ont.set_label("ein Titel", "de")
    assert ont.get_label("en") == "a label"
    assert ont.get_label("de") == "ein Titel"
    # overwrite replaces the stored triple, not just the cache
    ont.set_label("another label", "en")
    assert ont.get_label("en") == "another label"
    labels = ont.store.get_all_matches(
        "", "<http://www.w3.org/2000/01/rdf-schema#label>", ""
    )
    assert {t.object for t in labels} == {'"another label"@en', '"ein Titel"@de'}
    # empty value deletes
    ont.set_label("", "en")
    assert ont.get_label("en") == ""
    ont.set_comment("some comment", "")
    assert ont.get_comment("") == "some comment"
    # reload rebuilds the caches from triples
    reloaded = OntologyGraph.load(ont.store)
    assert reloaded.get_label("de") == "ein Titel"
    assert reloaded.get_comment("") == "some comment"


def test_version(ont):
    assert ont.get_version() == ""
    ont.set_version("1.2.3")
    assert ont.get_version() == "1.2.3"
    ont.set_version("2.0.0")  # previous version removed
    assert ont.get_version() == "2.0.0"
    assert (
        len(
            ont.store.get_all_matches(
                "", "<http://www.w3.org/2002/07/owl#versionInfo>", ""
            )
        )
        == 1
    )


def test_imports(ont):
    assert ont.get_imports() == []
    ont.add_import("https://other.org/ontology")
    assert ont.get_imports() == ["https://other.org/ontology"]
    with pytest.raises(TripleAlreadyExistsError):
        ont.add_import("https://other.org/ontology")


CLASS = OntologyClass(
    uri=URI + "#class",
    equivalent_to=["http://abc.com#class2", "http://abc.com#class3"],
    sub_class_of=["http://abc.com#parent1", "http://abc.com#parent2"],
    disjoint_with=["http://abc.com#notclass"],
    label={"": "a label", "de": "ein title", "en": "a label"},
    comment={"": "some comment", "de": "ein kommentar"},
)


def test_class_round_trip(ont):
    ont.upsert_resource(CLASS)
    got = ont.get_class(CLASS.uri)
    assert got.uri == CLASS.uri
    assert sorted(got.equivalent_to) == sorted(CLASS.equivalent_to)
    assert sorted(got.sub_class_of) == sorted(CLASS.sub_class_of)
    assert sorted(got.disjoint_with) == sorted(CLASS.disjoint_with)
    assert got.label == CLASS.label
    assert got.comment == CLASS.comment


def test_class_namespace_rejection(ont):
    bad = OntologyClass(uri=URI + "x" + "#class")
    with pytest.raises(ResourceDoesNotBelongToGraphError):
        ont.upsert_resource(bad)
    with pytest.raises(ResourceNotFoundError):
        ont.get_class(bad.uri)


def test_object_property_round_trip(ont):
    prop = OntologyObjectProperty(
        uri=URI + "#objectprop",
        equivalent_to=["http://abc.com#prop2", "http://abc.com#prop3"],
        sub_property_of=["http://abc.com#parent1", "http://abc.com#parent2"],
        inverse_of=["http://abc.com#inv"],
        domains=["http://abc.com#class1", "http://abc.com#class2"],
        ranges=["http://abc.com#class3"],
        disjoint_with=["http://abc.com#prop3"],
        is_functional=True,
        is_inverse_functional=True,
        is_transitive=True,
        is_symmetric=True,
        is_asymmetric=True,
        is_reflexive=True,
        is_irreflexive=True,
        label={"": "a label", "de": "ein title", "en": "a label"},
        comment={"": "some comment", "de": "ein kommentar"},
    )
    ont.upsert_resource(prop)
    got = ont.get_object_property(prop.uri)
    assert got.uri == prop.uri
    assert sorted(got.equivalent_to) == sorted(prop.equivalent_to)
    assert sorted(got.sub_property_of) == sorted(prop.sub_property_of)
    assert got.inverse_of == prop.inverse_of
    assert sorted(got.domains) == sorted(prop.domains)
    assert got.ranges == prop.ranges
    assert got.disjoint_with == prop.disjoint_with
    for attr in (
        "is_functional",
        "is_inverse_functional",
        "is_transitive",
        "is_symmetric",
        "is_asymmetric",
        "is_reflexive",
        "is_irreflexive",
    ):
        assert getattr(got, attr) is True
    assert got.label == prop.label
    assert got.comment == prop.comment


def test_data_property_round_trip(ont):
    prop = OntologyDataProperty(
        uri=URI + "#dataprop",
        equivalent_to=["http://abc.com#prop2", "http://abc.com#prop3"],
        sub_property_of=["http://abc.com#parent1", "http://abc.com#parent2"],
        domains=["http://abc.com#class1"],
        ranges=["http://abc.com#datatype1", "http://abc.com#datatype2"],
        disjoint_with=["http://abc.com#prop3"],
        is_functional=True,
        label={"": "a label", "de": "ein title", "en": "a label"},
        comment={"": "some comment", "de": "ein kommentar"},
    )
    ont.upsert_resource(prop)
    got = ont.get_data_property(prop.uri)
    assert got.uri == prop.uri
    assert sorted(got.ranges) == sorted(prop.ranges)
    assert got.is_functional is True
    assert got.label == prop.label


def test_datatype_round_trip(ont):
    dt = OntologyDatatype(
        uri=URI + "#datatype",
        label={"": "a label", "de": "ein title", "en": "a label"},
        comment={"": "some comment", "de": "ein kommentar"},
    )
    ont.upsert_resource(dt)
    got = ont.get_datatype(dt.uri)
    assert got.uri == dt.uri
    assert got.label == dt.label
    assert got.comment == dt.comment


def test_individual_round_trip(ont):
    indiv = OntologyIndividual(
        uri=URI + "#indiv",
        types=["http://abc.com#type1", "http://abc.com#type2", "http://abc.com#type3"],
        same_individual_as=["http://abc.com#indiv2"],
        label={"": "a label", "de": "ein title", "en": "a label"},
        comment={"": "some comment", "de": "ein kommentar"},
    )
    indiv.add_object_property("http://abc.com#prop1", "http://abc.com#indiv3")
    indiv.add_object_property("http://abc.com#prop1", "http://abc.com#indiv4")
    indiv.add_object_property("http://abc.com#prop3", "http://abc.com#indiv4")
    indiv.add_data_property("http://abc.com#dataprop1", xsd_string("Some string literal"))
    indiv.add_data_property("http://abc.com#dataprop2", xsd_integer(42))
    ont.upsert_resource(indiv)
    got = ont.get_individual(indiv.uri)
    assert got.uri == indiv.uri
    assert sorted(got.types) == sorted(indiv.types)
    assert got.same_individual_as == indiv.same_individual_as
    assert {k: sorted(v) for k, v in got.object_properties.items()} == {
        k: sorted(v) for k, v in indiv.object_properties.items()
    }
    assert got.data_properties == indiv.data_properties
    assert got.label == indiv.label
    assert got.comment == indiv.comment


def test_upsert_replaces_and_cleans_references(ont):
    """UpsertResource deletes the old subject rows AND rows referencing the
    URI as object (ontology_graph.go:267-287)."""
    a = OntologyIndividual(uri=URI + "#a", types=["http://abc.com#T"])
    b = OntologyIndividual(uri=URI + "#b")
    b.add_object_property("http://abc.com#refs", URI + "#a")
    ont.upsert_resource(a)
    ont.upsert_resource(b)
    assert ont.get_individual(URI + "#b").object_properties == {
        "http://abc.com#refs": [URI + "#a"]
    }
    # re-upserting a removes b's dangling reference to it
    a2 = OntologyIndividual(uri=URI + "#a", types=["http://abc.com#T2"])
    ont.upsert_resource(a2)
    assert ont.get_individual(URI + "#a").types == ["http://abc.com#T2"]
    assert ont.get_individual(URI + "#b").object_properties == {}


@pytest.fixture()
def populated(ont):
    """ontology_graph_test.go:441-505 individual matrix."""
    i1 = OntologyIndividual(uri=URI + "#indiv1", types=["http://abc.com#type1"])
    i2 = OntologyIndividual(uri=URI + "#indiv2", types=["http://abc.com#type2"])
    i3 = OntologyIndividual(
        uri=URI + "#indiv3",
        types=["http://abc.com#type1", "http://abc.com#type2", "http://abc.com#type3"],
    )
    i4 = OntologyIndividual(
        uri=URI + "#indiv4", types=["http://abc.com#type2", "http://abc.com#type3"]
    )
    i1.add_object_property("http://abc.com#prop1", "http://abc.com#indiv2")
    i3.add_object_property("http://abc.com#prop1", "http://abc.com#indiv2")
    i4.add_object_property("http://abc.com#prop2", "http://abc.com#indiv2")
    i1.add_data_property("http://abc.com#dataprop1", xsd_string("lit1"))
    i3.add_data_property("http://abc.com#dataprop1", xsd_string("lit1"))
    i4.add_data_property("http://abc.com#dataprop1", xsd_string("lit2"))
    ont.upsert_resources([i1, i2, i3, i4])
    return ont


def uris(indivs):
    return sorted(i.uri for i in indivs)


def test_individuals_no_filter(populated):
    got = populated.get_individuals(None)
    assert uris(got) == [URI + "#indiv1", URI + "#indiv2", URI + "#indiv3", URI + "#indiv4"]


def test_individuals_single_class(populated):
    f = TripleFilter().or_with_class("http://abc.com#type1")
    assert uris(populated.get_individuals(f)) == [URI + "#indiv1", URI + "#indiv3"]


def test_individuals_and_classes(populated):
    f = TripleFilter().and_with_class("http://abc.com#type2").and_with_class(
        "http://abc.com#type3"
    )
    assert uris(populated.get_individuals(f)) == [URI + "#indiv3", URI + "#indiv4"]


def test_individuals_or_classes(populated):
    f = TripleFilter().or_with_class("http://abc.com#type1").or_with_class(
        "http://abc.com#type3"
    )
    assert uris(populated.get_individuals(f)) == [
        URI + "#indiv1",
        URI + "#indiv3",
        URI + "#indiv4",
    ]


def test_individuals_object_property(populated):
    f = TripleFilter().or_with_object_property(
        "http://abc.com#prop1", "http://abc.com#indiv2"
    )
    assert uris(populated.get_individuals(f)) == [URI + "#indiv1", URI + "#indiv3"]


def test_individuals_data_property(populated):
    f = TripleFilter().or_with_data_property(
        "http://abc.com#dataprop1", xsd_string("lit2")
    )
    assert uris(populated.get_individuals(f)) == [URI + "#indiv4"]


def test_individuals_mixed_chain(populated):
    """class1 AND class2, OR class1 AND class3 — doc example at
    ontology_graph.go:520-530 shape."""
    f = (
        TripleFilter()
        .and_with_class("http://abc.com#type1")
        .and_with_class("http://abc.com#type2")
        .or_with_class("http://abc.com#type2")
        .and_with_class("http://abc.com#type3")
    )
    assert uris(populated.get_individuals(f)) == [
        URI + "#indiv3",
        URI + "#indiv4",
    ]


def test_individuals_empty_and_group_short_circuit(populated):
    f = TripleFilter().and_with_class("http://abc.com#nope").and_with_class(
        "http://abc.com#type1"
    )
    assert populated.get_individuals(f) == []
