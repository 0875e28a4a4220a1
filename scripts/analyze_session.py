"""Session-style artifact analysis CLI — the reference's service surface
(FastAPI ``/invoke-streaming`` + Streamlit client,
/root/reference/routes.py:50-129, services.py:82-335) re-expressed as a
runnable session: payload file in → JSON progress events on stdout (the
SSE-equivalent stream) → JSON-LD graph + triples + session record on disk.

    python scripts/analyze_session.py payload.json --out /tmp/session
    python scripts/analyze_session.py artifacts.csv --classes File,URL

Events (one JSON object per line, ``event`` field keyed like the
reference's stream stages): session_start → ingest → ontology → graph →
validation → complete. The session directory holds graph.jsonld,
triples.parquet, ttl stubs, and session.json (id, input fingerprint,
counts, violation census) — the audit-trail equivalent of the reference's
per-session SQLite checkpoint.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(event: str, **fields) -> None:
    print(json.dumps({"event": event, **fields}), flush=True)


def run_session(
    spark,
    payload_path: str,
    out_dir: str,
    class_names=None,
    session_id: str = None,
) -> dict:
    from case_uco_ontology_map_spark.plans.artifacts import analyze_payload
    from case_uco_ontology_map_spark.refmap.ontology import load_dictionary
    from case_uco_ontology_map_spark.validation import validate_all

    with open(payload_path, "rb") as fh:
        raw = fh.read()
    input_sha = hashlib.sha256(raw).hexdigest()
    session_id = session_id or f"session-{input_sha[:16]}"
    _emit("session_start", session_id=session_id, input_sha256=input_sha)

    if payload_path.endswith(".csv"):
        payload = {"csv": raw.decode("utf-8", errors="replace")}
    else:
        payload = json.loads(raw)
    _emit("ingest", format="csv" if "csv" in payload else "json")

    result = analyze_payload(spark, payload, class_names=class_names)
    _emit(
        "ontology",
        classes=result["ontology_map"].get("classes", []),
        facets=result["ontology_map"].get("facets", []),
    )

    os.makedirs(out_dir, exist_ok=True)
    graph_path = os.path.join(out_dir, "graph.jsonld")
    with open(graph_path, "w") as fh:
        json.dump(result["graph"], fh, indent=2, sort_keys=True)
    triples_path = os.path.join(out_dir, "triples.parquet")
    result["triples"].write.mode("overwrite").parquet(triples_path)
    if result["ttl"]:
        with open(os.path.join(out_dir, "extension_facets.ttl"), "w") as fh:
            fh.write(result["ttl"])
    n_triples = spark.read.parquet(triples_path).count()
    n_nodes = len(result["graph"]["@graph"])
    _emit("graph", nodes=n_nodes, triples=n_triples, path=graph_path)

    violations = validate_all(
        spark.read.parquet(triples_path),
        result["ontology_map"],
        load_dictionary(),
    )
    _emit("validation", is_clean=all(v == 0 for v in violations.values()),
          violations=violations)

    session = {
        "session_id": session_id,
        "input_sha256": input_sha,
        "payload_path": os.path.abspath(payload_path),
        "records": result["records"].count(),
        "nodes": n_nodes,
        "triples": n_triples,
        "violations": violations,
        "outputs": sorted(set(os.listdir(out_dir)) | {"session.json"}),
    }
    with open(os.path.join(out_dir, "session.json"), "w") as fh:
        json.dump(session, fh, indent=2, sort_keys=True)
    _emit("complete", session_id=session_id, out_dir=out_dir)
    return session


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("payload", help="JSON payload or CSV file")
    ap.add_argument("--out", default=None, help="session output directory")
    ap.add_argument(
        "--classes",
        default=None,
        help="comma-separated CASE/UCO class names (default: inferred)",
    )
    ap.add_argument("--session-id", default=None)
    ap.add_argument("--cpus", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("kg-session")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        out_dir = args.out or f"/tmp/kg-session-{int(time.time())}"
        classes = args.classes.split(",") if args.classes else None
        run_session(
            spark, args.payload, out_dir,
            class_names=classes, session_id=args.session_id,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
