"""Library-API tests: analyze_payload over reference-shaped payloads."""

import json

import pytest


def test_analyze_mft_payload(spark, mft_payload):
    from case_uco_ontology_map_spark.plans.artifacts import analyze_payload

    result = analyze_payload(spark, mft_payload, class_names=["File"])
    assert result["classes"] == ["File"]
    graph = result["graph"]
    assert "@context" in graph and "@graph" in graph
    ids = {n["@id"] for n in graph["@graph"]}
    # golden IRI from FIXTURES.md §3b
    assert "kb:file-db5e7156-888f-535a-b5b3-344cea1d2035" in ids
    types = {n["@type"] for n in graph["@graph"]}
    assert "uco-observable:File" in types
    assert "uco-observable:FileFacet" in types
    # unmapped fields got an extension facet + TTL stubs
    assert any("ExtensionFacet" in t for t in types)
    assert "rdfs:subClassOf uco-core:Facet" in result["ttl"]


def test_analyze_csv_payload(spark):
    from case_uco_ontology_map_spark.plans.artifacts import analyze_payload

    csv_text = "FileName,Size\nreport.docx,1024\nnotes.txt,2048"
    result = analyze_payload(
        spark, csv_text, class_names=["File"]
    )
    triples = result["triples"]
    names = {
        r["obj"]
        for r in triples.filter("pred = 'uco-observable:fileName'").collect()
    }
    assert names == {"report.docx", "notes.txt"}
    # CSV values are strings; size maps via alias size→sizeInBytes
    sizes = {
        r["obj"]
        for r in triples.filter("pred = 'uco-observable:sizeInBytes'").collect()
    }
    assert sizes == {"1024", "2048"}


def test_analyze_infers_class(spark):
    from case_uco_ontology_map_spark.plans.artifacts import analyze_payload

    payload = {
        "artifact_type": "File Listing",
        "description": "x",
        "source": "y",
        "records": [{"FileName": "a.txt"}],
    }
    result = analyze_payload(spark, payload)
    assert result["classes"] == ["File"]


def test_analyze_deterministic(spark, mft_payload):
    from case_uco_ontology_map_spark.plans.artifacts import analyze_payload

    a = analyze_payload(spark, mft_payload, class_names=["File"])
    b = analyze_payload(spark, mft_payload, class_names=["File"])
    assert json.dumps(a["graph"], sort_keys=True) == json.dumps(
        b["graph"], sort_keys=True
    )


def test_session_cli_runner(spark, tmp_path, capsys):
    """scripts/analyze_session.run_session: payload file → JSON event
    stream (the reference's SSE equivalent) + graph.jsonld + triples +
    session.json audit record, deterministic given the payload."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "analyze_session",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "analyze_session.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    payload = {
        "case_name": "test case",
        "records": [
            {"url": "https://a.example.org", "n_chars": 10},
            {"url": "https://b.example.org", "n_chars": 20},
        ],
    }
    p = tmp_path / "payload.json"
    p.write_text(json.dumps(payload))
    out_dir = str(tmp_path / "session")
    session = mod.run_session(spark, str(p), out_dir, class_names=["URL"])

    events = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    names = [e["event"] for e in events]
    assert names == ["session_start", "ingest", "ontology", "graph", "validation", "complete"]
    assert session["records"] == 2
    assert session["triples"] > 0
    v = [e for e in events if e["event"] == "validation"][0]
    assert v["is_clean"], v
    assert sorted(os.listdir(out_dir)) == session["outputs"]
    assert "graph.jsonld" in session["outputs"]
    with open(os.path.join(out_dir, "graph.jsonld")) as fh:
        g = json.load(fh)
    assert g["@graph"]
    # deterministic session id from the payload bytes
    assert session["session_id"].startswith("session-")
