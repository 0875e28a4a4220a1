"""Programmatic artifact-analysis API — the reference's library surface.

Reference: ``call_forensic_analysis_with_session`` →
``execute_forensic_analysis_session`` (/root/reference/services.py:248-335)
runs the agent graph over one payload and returns the final state with the
JSON-LD graph. Our equivalent is one call:

    result = analyze_payload(spark, payload, class_names=["File"])
    result["triples"]    # triples DataFrame
    result["graph"]      # {@context, @graph} dict (JSON-LD)
    result["ttl"]        # extension-facet Turtle stubs ("" if none)
    result["ontology_map"], result["shared"], result["records"]

The LLM stages are replaced deterministically: class selection comes from
``class_names`` (or gazetteer mentions over the payload's text fields), the
ontology map is compiled from the broadcast dictionary, unmapped fields get
the auto extension facet — the reference's deterministic fallback semantics
throughout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.render import render_graph_document
from ..operators.triples import emit_triples, extension_facet_ttl
from ..refmap.ontology import load_dictionary, ontology_map_for_classes
from ..sources.ingest import payload_to_records_df

_SPARK_TYPE_TAG = {
    "boolean": "bool",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
}


def infer_classes_from_payload(
    records_df: DataFrame, shared: Dict[str, Any]
) -> List[str]:
    """Deterministic class selection when the caller names none: gazetteer
    mentions over the payload's artifact_type + string field names/values
    (the research-stage replacement). Falls back to ObservableObject."""
    from ..operators.mentions import build_gazetteer

    gaz = build_gazetteer()
    votes: Dict[str, int] = {}
    texts = [str(shared.get("artifact_type", ""))] + list(records_df.columns)
    for text in texts:
        spaced = "".join(
            (" " + c.lower()) if c.isupper() else c for c in str(text)
        ).replace("_", " ")
        for token in spaced.split():
            cls = gaz.get(token)
            if cls:
                votes[cls] = votes.get(cls, 0) + 1
    if not votes:
        return ["ObservableObject"]
    best = max(votes.items(), key=lambda kv: (kv[1], -ord(kv[0][0])))
    return [best[0]]


def analyze_payload(
    spark: SparkSession,
    payload: Any,
    class_names: Optional[Sequence[str]] = None,
    property_field_map: Optional[Dict[str, Dict[str, List[str]]]] = None,
    kb_ids: bool = True,
    render: bool = True,
) -> Dict[str, Any]:
    """One payload (dict/list/JSON/CSV/text) → CASE/UCO knowledge graph."""
    records_df, shared = payload_to_records_df(spark, payload)
    dictionary = load_dictionary()

    classes = list(class_names) if class_names else infer_classes_from_payload(
        records_df, shared
    )
    ontology_map = ontology_map_for_classes(dictionary, classes)
    ontology_map["artifacts"] = [shared.get("artifact_type", "")]
    if property_field_map:
        ontology_map.setdefault("additional_details", {})[
            "propertyFieldMap"
        ] = property_field_map

    triples = emit_triples(
        records_df,
        ontology_map,
        shared=shared,
        kb_ids=kb_ids,
        auto_extension_facet=True,
    )

    field_types = {
        f.name: _SPARK_TYPE_TAG.get(f.dataType.simpleString(), "str")
        for f in records_df.schema.fields
    }
    ttl = extension_facet_ttl(
        ontology_map, field_types, shared.get("artifact_type")
    )

    out: Dict[str, Any] = {
        "records": records_df,
        "shared": shared,
        "ontology_map": ontology_map,
        "classes": classes,
        "triples": triples,
        "ttl": ttl,
    }
    if render:
        out["graph"] = render_graph_document(triples)
    return out
