"""Golden end-to-end on the REFERENCE's own fixtures through the Spark
kernel: MFT records (test.json) and Windows Prefetch (array-valued field) —
the triple P/R ≥ 0.95 gate of BASELINE.md, measured exactly."""

import json

import pytest
from pyspark.sql import functions as F

from case_uco_ontology_map_spark.operators.triples import emit_triples
from case_uco_ontology_map_spark.refmap import extract_records
from case_uco_ontology_map_spark.refmap.graph import (
    build_record_nodes,
    enforce_property_placement,
    nodes_to_triples,
)
from case_uco_ontology_map_spark.refmap.planner import OntologyContext, plan_record


def _oracle_triples(records, omap):
    ctx = OntologyContext(omap)
    out = set()
    for rec in records:
        plan = plan_record(rec, ctx)
        nodes = enforce_property_placement(
            build_record_nodes(plan, kb_ids=True), omap
        )
        out.update(nodes_to_triples(nodes, plan["record_uuid"]))
    return out


def _pr(got, expected):
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    return precision, recall


def test_mft_golden_pr(spark, mft_payload, mft_ontology_map):
    """MFT fixture through the Spark kernel vs the refmap oracle replay of
    the reference's deterministic path — P/R must be 1.0 (≥0.95 required)."""
    records = extract_records(mft_payload)
    shared = {k: v for k, v in mft_payload.items() if k != "records"}
    df = spark.createDataFrame(
        [{k: v for k, v in r.items() if k not in shared} for r in records]
    )
    triples = emit_triples(
        df,
        mft_ontology_map,
        shared=shared,
        auto_extension_facet=False,
    )
    got = {
        tuple(r)
        for r in triples.select(
            "subj", "pred", "obj", "obj_is_iri", "obj_datatype", "record_uuid"
        ).collect()
    }
    expected = _oracle_triples(records, mft_ontology_map)
    precision, recall = _pr(got, expected)
    assert precision == 1.0 and recall == 1.0

    # golden IRIs from FIXTURES.md §3b appear as subjects
    subjects = {t[0] for t in got}
    assert "kb:file-db5e7156-888f-535a-b5b3-344cea1d2035" in subjects
    assert "kb:mftrecordfacet-698de7fe-5555-5b66-b4e0-2f4699d9bd92" in subjects


def test_prefetch_golden_with_array_field(spark):
    """Prefetch fixture: array-valued ReferencedPaths must survive the
    Arrow round-trip and fingerprint identically to the pure-Python path."""
    with open("/root/reference/tests/fixtures/windows_prefetch.json") as fh:
        prefetch = json.load(fh)
    payload = {
        "artifact_type": "Windows Prefetch",
        "description": "Prefetch execution evidence",
        "source": "PECmd output",
        "records": prefetch,
    }
    omap = {
        "classes": ["WindowsPrefetch"],
        "facets": ["WindowsPrefetchFacet"],
        "properties": {
            "WindowsPrefetchFacet": [
                "applicationFileName",
                "firstRun",
                "lastRun",
                "prefetchHash",
                "timesExecuted",
                "volume",
            ],
        },
        "relationships": [],
        "additional_details": {
            "propertyFieldMap": {
                "WindowsPrefetchFacet": {
                    "applicationFileName": ["ExecutableName"],
                    "lastRun": ["LastRunTime"],
                    "prefetchHash": ["PrefetchHash"],
                    "timesExecuted": ["RunCount"],
                }
            }
        },
    }
    records = extract_records(payload)
    shared = {k: v for k, v in payload.items() if k != "records"}
    rows = [{k: v for k, v in r.items() if k not in shared} for r in records]
    df = spark.createDataFrame(rows)
    triples = emit_triples(df, omap, shared=shared, auto_extension_facet=True)
    got = {
        tuple(r)
        for r in triples.select(
            "subj", "pred", "obj", "obj_is_iri", "obj_datatype", "record_uuid"
        ).collect()
    }
    from case_uco_ontology_map_spark.operators.triples import (
        extend_ontology_map_for_schema,
    )

    field_types = {
        "SourceFilename": "str", "ExecutableName": "str", "PrefetchHash": "str",
        "RunCount": "int", "LastRunTime": "str", "FileCreatedTime": "str",
        "FileModifiedTime": "str", "VolumeSerialNumber": "str",
        "ReferencedPaths": "str",
    }
    ext_map = extend_ontology_map_for_schema(omap, field_types, "Windows Prefetch")
    expected = _oracle_triples(records, ext_map)
    precision, recall = _pr(got, expected)
    assert precision == 1.0 and recall == 1.0, (
        sorted(got - expected)[:5],
        sorted(expected - got)[:5],
    )
    # the array-valued field landed as one row per element
    paths = [t for t in got if t[1] == "dfc-ext:referencedpaths"]
    assert len(paths) == 4  # 2 records × 2 paths


def test_jsonld_render_roundtrip(spark, mft_payload, mft_ontology_map):
    """Triples → JSON-LD render reproduces the refmap graph node-for-node
    (S5 sink semantics)."""
    from case_uco_ontology_map_spark.operators.render import render_graph_document
    from case_uco_ontology_map_spark.refmap.graph import build_graph

    records = extract_records(mft_payload)
    shared = {k: v for k, v in mft_payload.items() if k != "records"}
    df = spark.createDataFrame(
        [{k: v for k, v in r.items() if k not in shared} for r in records]
    )
    triples = emit_triples(
        df, mft_ontology_map, shared=shared, auto_extension_facet=False
    )
    doc = render_graph_document(triples)
    oracle = build_graph(records, mft_ontology_map)

    assert doc["@context"] == oracle["@context"]
    got_nodes = {n["@id"]: n for n in doc["@graph"]}
    exp_nodes = {n["@id"]: n for n in oracle["@graph"]}
    assert set(got_nodes) == set(exp_nodes)
    for nid, exp in exp_nodes.items():
        got = got_nodes[nid]
        assert got["@type"] == exp["@type"], nid
        # every property value matches (int/bool round-tripped; facet ref
        # lists compared as sets)
        for k, v in exp.items():
            if k in ("@id", "@type"):
                continue
            if k == "uco-core:hasFacet":
                assert {r["@id"] for r in got[k]} == {r["@id"] for r in v}
            else:
                assert got[k] == v, (nid, k, got.get(k), v)
