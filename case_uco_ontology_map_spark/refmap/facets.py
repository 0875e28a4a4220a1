"""Custom extension-facet generation for unmapped fields.

Reference semantics replayed:
  * to_camel_case                 /root/reference/agents/custom_facet.py:62-67
  * generate_extension_facet_name /root/reference/agents/custom_facet.py:70-109
  * infer_xsd_datatype            /root/reference/agents/custom_facet.py:112-119
  * auto_generate_custom_facets   /root/reference/agents/custom_facet.py:122-222
  * unmapped-field set diff       /root/reference/agents/ontology_synthesizer.py:31-98

Golden expectations (FIXTURES.md §3d/§3e): "MFT Record"→MftRecordExtensionFacet,
"IoT-Sensor_Reading"→IotSensorReadingExtensionFacet, ""/None→
UnknownArtifactExtensionFacet; bool→xsd:boolean before int→xsd:integer.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

_TOKEN_SPLIT = re.compile(r"[^A-Za-z0-9]+")

_TTL_HEADER = "\n".join(
    [
        "@prefix dfc-ext: <https://www.w3.org/dfc-ext/> .",
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
        "@prefix uco-core: <https://ontology.unifiedcyberontology.org/uco/core/> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
    ]
)

RESERVED_FIELDS = frozenset({"artifact_type", "description", "source"})


def to_camel_case(name: str) -> str:
    """split on non-alnum; first token lowered, rest .capitalize()
    (custom_facet.py:62-67 — note .capitalize() lowercases tails: EXE→Exe)."""
    tokens = _TOKEN_SPLIT.split(name)
    if not tokens:
        return name
    first, *rest = tokens
    return first.lower() + "".join(token.capitalize() for token in rest)


def generate_extension_facet_name(artifact_type: Optional[str]) -> str:
    """PascalCase(artifact_type) + "ExtensionFacet" (custom_facet.py:70-109)."""
    if not artifact_type or not isinstance(artifact_type, str):
        return "UnknownArtifactExtensionFacet"
    cleaned = artifact_type.strip()
    if not cleaned:
        return "UnknownArtifactExtensionFacet"
    tokens = [tok for tok in _TOKEN_SPLIT.split(cleaned) if tok]
    if not tokens:
        return "UnknownArtifactExtensionFacet"
    pascal = "".join(token.capitalize() for token in tokens)
    return f"{pascal}ExtensionFacet"


def infer_xsd_datatype(value: Any) -> str:
    """bool checked BEFORE int (custom_facet.py:112-119)."""
    if isinstance(value, bool):
        return "xsd:boolean"
    if isinstance(value, int) and not isinstance(value, bool):
        return "xsd:integer"
    if isinstance(value, float):
        return "xsd:decimal"
    return "xsd:string"


def derive_unmapped_details(
    record: Dict[str, Any], mapped_fields: Sequence[str]
) -> List[Dict[str, Any]]:
    """Unmapped = sorted(record fields − mapped − reserved); structured details
    with sample values, 120-char truncation (ontology_synthesizer.py:54-98,
    custom_facet.py:283-297)."""
    mapped = set(mapped_fields)
    fields = [
        f
        for f in sorted(record.keys())
        if f not in mapped and f not in RESERVED_FIELDS
    ]
    details: List[Dict[str, Any]] = []
    for field in fields:
        detail: Dict[str, Any] = {"field": field}
        value = record.get(field)
        if isinstance(value, (dict, list, str, int, float, bool)) or value is None:
            sample = value
        else:
            sample = str(value)
        if isinstance(sample, str) and len(sample) > 120:
            detail["sampleValue"] = sample[:117] + "..."
            detail["isTruncated"] = True
        else:
            detail["sampleValue"] = sample
        detail["valueType"] = type(value).__name__
        details.append(detail)
    return details


def auto_generate_custom_facets(
    unmapped_details: Sequence[Dict[str, Any]],
    record: Optional[Dict[str, Any]],
    artifact_type: Optional[str],
    existing_facets: Sequence[str],
) -> Tuple[Dict[str, Any], str]:
    """Deterministic extension-facet definition + assignment + TTL stub
    (custom_facet.py:122-222). Returns ({facetDefinitions, facetAssignments},
    ttl_definitions) — ({}, "") when nothing to do."""
    if not unmapped_details:
        return {}, ""

    record = record or {}
    base_name = generate_extension_facet_name(artifact_type)
    existing = set(existing_facets or [])
    facet_name = base_name
    suffix = 2
    while facet_name in existing:
        facet_name = f"{base_name}{suffix}"
        suffix += 1

    properties: Dict[str, Dict[str, str]] = {}
    values: Dict[str, Any] = {}
    for detail in unmapped_details:
        field = detail.get("field")
        if not field:
            continue
        prop_name = f"dfc-ext:{to_camel_case(field)}"
        sample_value = detail.get("sampleValue")
        if sample_value is None and record:
            sample_value = record.get(field)
        properties[prop_name] = {"dataType": infer_xsd_datatype(sample_value)}
        if sample_value is not None:
            values[prop_name] = sample_value

    if not properties:
        return {}, ""

    match_fields: Dict[str, Any] = {}
    for key in ("EntryNumber", "SequenceNumber", "FileName", "@id"):
        if record and key in record and record[key] not in (None, ""):
            match_fields[key] = record[key]
    if not match_fields and record:
        sample_key = next((k for k, v in record.items() if v not in (None, "")), None)
        if sample_key:
            match_fields[sample_key] = record[sample_key]

    label = artifact_type or "unknown artifact type"
    custom_facets = {
        "facetDefinitions": {
            facet_name: {
                "namespace": "dfc-ext",
                "reasoning": (
                    f"Automatically generated extension facet for {label} "
                    "covering unmapped evidence fields."
                ),
                "properties": properties,
            }
        },
        "facetAssignments": [
            {"match": match_fields, "facet": facet_name, "values": values}
        ],
    }

    ttl_lines = [_TTL_HEADER, "", f"# Auto-generated extension facet for {label}"]
    ttl_lines.append(
        f"dfc-ext:{facet_name}\n  a owl:Class ;\n  rdfs:subClassOf uco-core:Facet ;\n"
        f'  rdfs:label "{facet_name}" ;\n  rdfs:comment "Extension facet for '
        f'{label} capturing unmapped evidence fields." .'
    )
    for prop_name, meta in properties.items():
        local = prop_name.split(":", 1)[1]
        ttl_lines.append(
            f"\ndfc-ext:{local}\n  a owl:DatatypeProperty ;\n"
            f"  rdfs:domain dfc-ext:{facet_name} ;\n"
            f"  rdfs:range {meta['dataType']} ;\n  rdfs:label \"{local}\" ."
        )
    return custom_facets, "\n".join(ttl_lines)
