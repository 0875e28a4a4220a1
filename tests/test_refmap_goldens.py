"""Golden unit tests for the refmap kernel vs reference deterministic path.

Expected values are recorded in FIXTURES.md §3 (replayed from the reference's
pure functions at /root/reference/tools.py, agents/uuid_planner.py,
agents/custom_facet.py) — the triple-P/R correctness gate of BASELINE.md.
"""

import uuid

from case_uco_ontology_map_spark.refmap import (
    NS_CASE,
    NS_RECORD,
    NS_SLOT,
    auto_generate_custom_facets,
    extract_records,
    fingerprint_record,
    generate_extension_facet_name,
    infer_xsd_datatype,
    match_property,
    normalize_key,
    plan_records,
    prepare_property_index,
    slugify,
    to_camel_case,
    tokenize,
)
from case_uco_ontology_map_spark.refmap.facets import derive_unmapped_details
from case_uco_ontology_map_spark.refmap.graph import build_graph, nodes_to_triples


def test_uuid5_namespace_chain():
    # FIXTURES.md §3a
    assert str(NS_CASE) == "8df0d4ef-efd2-542a-beb0-363a27a915c1"
    assert str(NS_RECORD) == "9d88459b-3638-5461-a2ec-07c3829ee8ca"
    assert str(NS_SLOT) == "2ceab281-4f60-5286-ba87-d8505d488b45"


def test_fingerprint_and_iris_match_reference_goldens(mft_payload, mft_ontology_map):
    # FIXTURES.md §3b — replayed from tools.py:67-70 + uuid_planner.py:244-257
    records = extract_records(mft_payload)
    assert len(records) == 2
    # shared metadata flattened in (uuid_planner.py:40-49)
    assert records[0]["artifact_type"] == mft_payload["artifact_type"]
    assert records[0]["EntryNumber"] == 42

    plans = plan_records(records, mft_ontology_map)
    p42, p314 = plans

    assert p42["fingerprint"] == (
        "5f4ebde11b39dc9969ea5673e22eec753fbb42e7ff7cb4f030ba436692bc7d9f"
    )
    assert p42["record_uuid"] == "c9add917-4d34-559b-8b59-817a4625fe64"
    slot_ids = {slug: f"kb:{slug}-{u}" for _, slug, u, _ in p42["slots"]}
    assert slot_ids["file"] == "kb:file-db5e7156-888f-535a-b5b3-344cea1d2035"
    assert slot_ids["filefacet"] == (
        "kb:filefacet-0ffc50de-5ebc-5d7f-a5ec-ed8563e978e6"
    )
    assert slot_ids["mftrecordfacet"] == (
        "kb:mftrecordfacet-698de7fe-5555-5b66-b4e0-2f4699d9bd92"
    )

    assert p314["fingerprint"] == (
        "fe99b5340cfd1ed188122cf609321bf5c82bdcadedaaa8da6eb7a72a52a4e4dd"
    )
    assert p314["record_uuid"] == "ed9fb3d7-6654-53fe-a42b-5489cf39d548"
    slot_ids = {slug: f"kb:{slug}-{u}" for _, slug, u, _ in p314["slots"]}
    assert slot_ids["file"] == "kb:file-f2cb0676-2b56-5539-8c42-c94cb5db50ea"
    assert slot_ids["filefacet"] == (
        "kb:filefacet-f5f4b491-e1d1-5118-b402-ff41e5cf6c85"
    )
    assert slot_ids["mftrecordfacet"] == (
        "kb:mftrecordfacet-02a44ee1-191b-53d7-b3e5-485ecae2d961"
    )


def test_property_alias_mapping(mft_payload, mft_ontology_map):
    # FIXTURES.md §3c — alias-map rows (uuid_planner.py:9-23) route fields
    records = extract_records(mft_payload)
    plans = plan_records(records, mft_ontology_map)
    p42 = plans[0]
    all_props = {}
    for props in p42["properties"].values():
        all_props.update(props)
    assert all_props["uco-observable:filePath"] == (
        "\\Windows\\Prefetch\\MALICIOUS.EXE-12345678.pf"
    )
    assert all_props["uco-observable:mftFileID"] == 42
    assert all_props["uco-observable:mftParentID"] == 5
    assert all_props["uco-observable:allocationStatus"] is True
    assert all_props["uco-observable:mftFileNameCreatedTime"] == (
        "2025-09-17T10:30:00Z"
    )


def test_string_functions():
    assert slugify("MFT Record-X") == "mft_record_x"
    assert normalize_key("SI_Created!") == "si_created"
    assert tokenize("mftFileNameCreatedTime") == [
        "mft", "file", "name", "created", "time",
    ]
    assert tokenize("SI_Created") == ["si", "created"]
    assert to_camel_case("RunCount") == "runcount"
    assert to_camel_case("run count") == "runCount"


def test_match_property_tie_break_is_first_in_insertion_order():
    index = prepare_property_index(
        {"AFacet": ["alphaBeta"], "BFacet": ["betaAlpha"]}
    )
    owner, prop = match_property("alpha_beta", index)
    # both score 2; reference keeps the first in dict-insertion order
    assert (owner, prop) == ("afacet", "alphaBeta")


def test_extension_facet_naming_goldens():
    # FIXTURES.md §3d (reference tests/test_dynamic_custom_facet_naming.py)
    assert generate_extension_facet_name("MFT Record") == "MftRecordExtensionFacet"
    assert generate_extension_facet_name(
        "Windows Prefetch execution cache records"
    ) == "WindowsPrefetchExecutionCacheRecordsExtensionFacet"
    assert generate_extension_facet_name(
        "IoT-Sensor_Reading"
    ) == "IotSensorReadingExtensionFacet"
    assert generate_extension_facet_name("") == "UnknownArtifactExtensionFacet"
    assert generate_extension_facet_name(None) == "UnknownArtifactExtensionFacet"
    assert generate_extension_facet_name("   ") == "UnknownArtifactExtensionFacet"


def test_xsd_inference_goldens():
    # FIXTURES.md §3e — bool BEFORE int
    assert infer_xsd_datatype(True) == "xsd:boolean"
    assert infer_xsd_datatype(3) == "xsd:integer"
    assert infer_xsd_datatype(23.5) == "xsd:decimal"
    assert infer_xsd_datatype("abc") == "xsd:string"


def test_auto_custom_facets():
    record = {"RunCount": 3, "PrefetchHash": "12345678"}
    details = derive_unmapped_details(record, mapped_fields=[])
    facets, ttl = auto_generate_custom_facets(
        details, record, "Windows Prefetch", existing_facets=[]
    )
    defs = facets["facetDefinitions"]
    assert list(defs) == ["WindowsPrefetchExtensionFacet"]
    props = defs["WindowsPrefetchExtensionFacet"]["properties"]
    assert props["dfc-ext:runcount"] == {"dataType": "xsd:integer"}
    assert props["dfc-ext:prefetchhash"] == {"dataType": "xsd:string"}
    assignment = facets["facetAssignments"][0]
    assert assignment["values"]["dfc-ext:runcount"] == 3
    assert "dfc-ext:WindowsPrefetchExtensionFacet" in ttl
    assert "rdfs:subClassOf uco-core:Facet" in ttl


def test_auto_custom_facets_collision_suffix():
    record = {"Zzz": 1}
    details = derive_unmapped_details(record, mapped_fields=[])
    facets, _ = auto_generate_custom_facets(
        details, record, "MFT Record",
        existing_facets=["MftRecordExtensionFacet", "MftRecordExtensionFacet2"],
    )
    assert list(facets["facetDefinitions"]) == ["MftRecordExtensionFacet3"]


def test_build_graph_structure(mft_payload, mft_ontology_map):
    records = extract_records(mft_payload)
    graph = build_graph(records, mft_ontology_map)
    nodes = graph["@graph"]
    # 2 records × (1 File + 2 facets), nothing pruned (both facets have payload)
    assert len(nodes) == 6
    by_type = {}
    for n in nodes:
        by_type.setdefault(n["@type"], []).append(n)
    assert len(by_type["uco-observable:File"]) == 2
    file_node = by_type["uco-observable:File"][0]
    refs = {r["@id"] for r in file_node["uco-core:hasFacet"]}
    assert len(refs) == 2
    # facet-owned props never sit on the object node (placement enforcement)
    facet_owned = {"uco-observable:filePath", "uco-observable:mftFileID"}
    assert not facet_owned & set(file_node.keys())
    # no null/empty values anywhere (no-null contract)
    for n in nodes:
        for k, v in n.items():
            assert v is not None and v != ""


def test_empty_facet_pruned():
    payload = {
        "artifact_type": "Thing",
        "records": [{"onlyField": "x"}],
    }
    ontology_map = {
        "classes": ["File"],
        "facets": ["FileFacet", "UnusedFacet"],
        # onlyField matches nothing; UnusedFacet gets no payload
        "properties": {"FileFacet": ["fileName"], "UnusedFacet": ["zipCode"]},
        "relationships": [],
        "additional_details": {},
    }
    records = extract_records(payload)
    graph = build_graph(records, ontology_map)
    types = [n["@type"] for n in graph["@graph"]]
    assert "uco-observable:UnusedFacet" not in types
    assert "uco-observable:FileFacet" not in types  # also empty → pruned
    file_node = graph["@graph"][0]
    # refs to pruned facets are scrubbed
    assert file_node.get("uco-core:hasFacet", []) == []


def test_relationship_gating():
    payload = {"records": [{"a": 1}]}
    ontology_map = {
        "classes": ["File"],
        "facets": [],
        "properties": {"File": ["alpha"]},
        "relationships": [{"type": "Contained_Within", "source": "x", "target": "y"}],
        "additional_details": {},
    }
    records = extract_records(payload)
    plans = plan_records(records, ontology_map)
    slugs = [s for _, s, _, _ in plans[0]["slots"]]
    assert slugs[0] == "file"
    assert slugs[1] == "relationship_contained_within_0"
    graph = build_graph(records, ontology_map)
    # relationship slot has no payload → gated out of skeleton
    types = [n["@type"] for n in graph["@graph"]]
    assert "uco-observable:ObservableRelationship" not in types


def test_relationship_source_target_wiring():
    """J9: a relationships=[{type,source,target}] entry whose endpoints
    resolve to planned slots yields an ObservableRelationship node with
    uco-observable:source/target {"@id"} refs + uco-core:kindOfRelationship
    (reference node shape: config.py:559-567)."""
    payload = {"records": [{"fileName": "x.txt"}]}
    ontology_map = {
        "classes": ["File"],
        "facets": ["FileFacet"],
        "properties": {"FileFacet": ["fileName"]},
        "relationships": [
            {"type": "Contained_Within", "source": "File", "target": "FileFacet"}
        ],
        "additional_details": {},
    }
    records = extract_records(payload)
    graph = build_graph(records, ontology_map)
    by_type = {n["@type"]: n for n in graph["@graph"]}
    rel = by_type["uco-observable:ObservableRelationship"]
    file_node = by_type["uco-observable:File"]
    facet_node = by_type["uco-observable:FileFacet"]
    assert rel["uco-observable:source"] == {"@id": file_node["@id"]}
    assert rel["uco-observable:target"] == {"@id": facet_node["@id"]}
    assert rel["uco-core:kindOfRelationship"] == "Contained_Within"
    # deterministic slot identity: same uuid5 chain as every other slot
    assert rel["@id"].startswith("kb:relationship_contained_within_0-")

    # determinism across runs
    graph2 = build_graph(extract_records(payload), ontology_map)
    assert graph == graph2


def test_relationship_dropped_when_endpoint_pruned():
    """A relationship whose target facet is pruned (empty) must not emit a
    dangling ref — the relationship node is dropped with it."""
    payload = {"records": [{"unrelated": "v"}]}
    ontology_map = {
        "classes": ["File"],
        "facets": ["FileFacet"],
        # nothing maps to FileFacet → it prunes as empty
        "properties": {"FileFacet": ["fileName"]},
        "relationships": [
            {"type": "Contained_Within", "source": "File", "target": "FileFacet"}
        ],
        "additional_details": {},
    }
    graph = build_graph(extract_records(payload), ontology_map)
    types = [n["@type"] for n in graph["@graph"]]
    assert "uco-observable:FileFacet" not in types
    assert "uco-observable:ObservableRelationship" not in types


def test_triples_flatten(mft_payload, mft_ontology_map):
    records = extract_records(mft_payload)
    graph = build_graph(records, mft_ontology_map)
    triples = nodes_to_triples(graph["@graph"], "rec-uuid")
    assert all(len(t) == 6 for t in triples)
    type_triples = [t for t in triples if t[1] == "rdf:type"]
    assert len(type_triples) == 6
    iri_objs = [t for t in triples if t[3]]
    # 6 type triples + 4 hasFacet refs
    assert len(iri_objs) == 10
    lit = {(t[1], t[2]) for t in triples if not t[3]}
    assert ("uco-observable:mftFileID", "42") in lit


def test_f15_uuid4_minting_shapes():
    """F15 (tools.py:34-65): kb:<slug>-<uuid4> mints; paired object/facet
    share ONE uuid; plan allocation pairs a class with its <cls>Facet."""
    import itertools
    import uuid as _uuid

    from case_uco_ontology_map_spark.refmap.identity import (
        make_paired_ids,
        make_uuid,
        plan_record_uuids,
    )

    # default path mints RFC-4122 v4
    minted = make_uuid("file")
    assert minted.startswith("kb:file-")
    assert _uuid.UUID(minted.split("file-", 1)[1]).version == 4

    # injectable factory pins outputs
    seq = itertools.count()
    fake = lambda: _uuid.UUID(int=next(seq), version=4)
    obj_id, facet_id = make_paired_ids("file", uuid_factory=fake)
    u = obj_id.split("file-", 1)[1]
    assert facet_id == f"kb:filefacet-{u}"  # shared uuid, different slug

    plan = plan_record_uuids(
        2, ["file", "url"], ["fileFacet"], uuid_factory=fake
    )
    assert len(plan) == 2
    for rec in plan:
        assert set(rec) == {"file", "fileFacet", "url"}
        shared = rec["file"].split("file-", 1)[1]
        assert rec["fileFacet"] == f"kb:filefacet-{shared}"
        assert rec["url"].split("url-", 1)[1] != shared  # lone mint
