"""Ontology dictionary compile regression tests (S3/A6/SET2)."""

from case_uco_ontology_map_spark.refmap.ontology import (
    compile_dictionary,
    load_dictionary,
    ontology_map_for_classes,
)


def test_compile_matches_committed_dictionary():
    fresh = compile_dictionary()
    committed = load_dictionary()
    assert fresh["classes"].keys() == committed["classes"].keys()
    assert fresh["shapes"].keys() == committed["shapes"].keys()
    assert fresh["facets"] == committed["facets"]


def test_dictionary_shape_goldens():
    d = load_dictionary()
    assert len(d["classes"]) >= 400
    assert len(d["shapes"]) >= 180
    assert len(d["facets"]) >= 140
    mft = d["shapes"]["MftRecordFacet"]
    assert mft["mftFileID"] == {
        "datatype": "xsd:integer", "class": None, "minCount": None,
        "maxCount": 1, "nodeKind": "Literal", "isObjectProp": False,
    }
    supers = d["classes"]["File"]["superclasses"]
    # closure order: direct parents first, then ancestors
    assert supers[0] == "FileSystemObject"
    assert "ObservableObject" in supers and "UcoObject" in supers
    assert "MftRecordFacet" in d["facets"]
    assert d["common_inherited"] == [
        "createdBy", "description", "hasFacet", "name", "tag",
        "externalReference",
    ]


def test_ontology_map_for_classes():
    d = load_dictionary()
    m = ontology_map_for_classes(d, ["File", "MftRecordFacet"])
    assert m["classes"] == ["File"]
    assert m["facets"] == ["FileFacet", "MftRecordFacet"]
    assert "filePath" in m["properties"]["FileFacet"]
