"""Session-style artifact analysis CLI — the reference's service surface
(FastAPI ``/invoke-streaming`` + Streamlit client,
/root/reference/routes.py:50-129, services.py:82-335) re-expressed as a
runnable session: payload file in → JSON progress events on stdout (the
SSE-equivalent stream) → JSON-LD graph + triples + session record on disk.
The same event generator (``case_uco_ontology_map_spark.service``) also
backs the actual HTTP/SSE server — ``--serve`` starts it.

    python scripts/analyze_session.py payload.json --out /tmp/session
    python scripts/analyze_session.py artifacts.csv --classes File,URL
    python scripts/analyze_session.py --serve --port 8808

Events (one JSON object per line, ``event`` field keyed like the
reference's stream stages): session_start → ingest → ontology → graph →
validation → complete. The session directory holds graph.jsonld,
triples.parquet, ttl stubs, and session.json (id, input fingerprint,
counts, violation census) — the audit-trail equivalent of the reference's
per-session SQLite checkpoint.
"""

from __future__ import annotations

import argparse
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
    from case_uco_ontology_map_spark.service import session_events

    with open(payload_path, "rb") as fh:
        raw = fh.read()
    if payload_path.endswith(".csv"):
        payload = {"csv": raw.decode("utf-8", errors="replace")}
    else:
        payload = json.loads(raw)

    session = None
    for event in session_events(
        spark, payload, out_dir,
        session_id=session_id, class_names=class_names, raw=raw,
    ):
        session = event.pop("session", session)
        _emit(**event)
    return session


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "payload", nargs="?", help="JSON payload or CSV file (omit with --serve)"
    )
    ap.add_argument("--out", default=None, help="session output directory")
    ap.add_argument(
        "--classes",
        default=None,
        help="comma-separated CASE/UCO class names (default: inferred)",
    )
    ap.add_argument("--session-id", default=None)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument(
        "--serve", action="store_true",
        help="start the HTTP/SSE server instead of running one payload",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8808)
    ap.add_argument("--sessions-dir", default=None)
    args = ap.parse_args()
    if not args.serve and not args.payload:
        ap.error("payload is required unless --serve is given")

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
        if args.serve:
            from case_uco_ontology_map_spark.service import serve

            server = serve(
                spark, host=args.host, port=args.port,
                sessions_dir=args.sessions_dir,
            )
            _emit(
                "serving",
                host=server.server_address[0],
                port=server.server_address[1],
                sessions_dir=server.sessions_dir,
            )
            try:
                server.serve_forever()
            except KeyboardInterrupt:
                server.shutdown()
        else:
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
