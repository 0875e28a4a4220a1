"""Ontology research query surface — the deterministic equivalent of the
reference's rdflib tool API (/root/reference/case_uco.py:476-1019):
``list_all_classes``, ``search_classes``, ``get_class_summary``,
``get_property_details``, ``relevant_facets`` (top-10 W2 pattern) and the
facet/inherited/semantic property report, all answered from the broadcast
compiled dictionary with zero RDF parsing at query time.

These are metadata queries (hundreds of rows), so they are plain Python
over the dictionary — the data-scale counterparts (W2 top-k over event
tables etc.) live in the contract queries. A user exploring "which class
fits this artifact?" uses this module.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .ontology import load_dictionary


def _dict(dictionary: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    return dictionary or load_dictionary()


def list_all_classes(dictionary: Optional[Dict[str, Any]] = None) -> List[Dict[str, str]]:
    """All classes as [{name, uri}] sorted by name (case_uco.py:476-490)."""
    d = _dict(dictionary)
    return sorted(
        ({"name": name, "uri": meta.get("uri", "")} for name, meta in d["classes"].items()),
        key=lambda x: x["name"],
    )


def search_classes(
    keyword: str, dictionary: Optional[Dict[str, Any]] = None
) -> List[Dict[str, str]]:
    """Keyword search over class names then descriptions; name matches are
    tagged 'name', description matches 'description' (case_uco.py:686-720)."""
    d = _dict(dictionary)
    kw = keyword.lower()
    matches = []
    for name, meta in d["classes"].items():
        desc = meta.get("description") or f"CASE/UCO {name} class"
        if kw in name.lower():
            matches.append(
                {"name": name, "uri": meta.get("uri", ""), "description": desc,
                 "match_type": "name"}
            )
        elif kw in desc.lower():
            matches.append(
                {"name": name, "uri": meta.get("uri", ""), "description": desc,
                 "match_type": "description"}
            )
    return sorted(matches, key=lambda x: x["name"])


def class_property_report(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, List[str]]:
    """{facet, inherited, semantic} property ownership for a class —
    the reference's _analyze_class_properties categories
    (case_uco.py:341-474): facet = own (+ own-Facet) shape props;
    inherited = superclass(+Facet) shape props + common inherited;
    semantic = comment-mentions-class (precompiled at dictionary build)."""
    d = _dict(dictionary)
    shapes = d.get("shapes", {})
    meta = d["classes"].get(class_name)
    if meta is None:
        return {"facet": [], "inherited": [], "semantic": []}
    facet_props = sorted(
        set(shapes.get(class_name, {})) | set(shapes.get(f"{class_name}Facet", {}))
    )
    inherited = set(d.get("common_inherited", []))
    for anc in meta.get("superclasses", []):
        inherited.update(shapes.get(anc, {}))
        inherited.update(shapes.get(f"{anc}Facet", {}))
    inherited -= set(facet_props)
    return {
        "facet": facet_props,
        "inherited": sorted(inherited),
        "semantic": list(meta.get("semantic_properties", [])),
    }


def get_class_summary(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Summary {name, uri, description, superclasses, property_counts,
    has_facet_pattern} (case_uco.py:492-534); {'error': ...} if unknown."""
    d = _dict(dictionary)
    meta = d["classes"].get(class_name)
    if meta is None:
        return {"error": f"Class '{class_name}' not found in CASE/UCO ontologies"}
    report = class_property_report(class_name, d)
    counts = {k: len(v) for k, v in report.items()}
    counts["total"] = sum(counts.values())
    return {
        "name": class_name,
        "uri": meta.get("uri", ""),
        "description": meta.get("description") or f"CASE/UCO {class_name} class",
        "superclasses": list(meta.get("superclasses", [])),
        "superclass_count": len(meta.get("superclasses", [])),
        "property_counts": counts,
        "has_facet_pattern": counts["facet"] > 0,
    }


def get_property_details(
    property_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """{name, uri, type, description} for one property
    (case_uco.py:722-752); {'error': ...} if unknown."""
    d = _dict(dictionary)
    meta = d.get("properties", {}).get(property_name)
    if meta is None:
        return {
            "error": f"Property '{property_name}' not found in CASE/UCO ontologies"
        }
    return {
        "name": property_name,
        "uri": meta.get("uri", ""),
        "type": meta.get("type", ""),
        "description": meta.get("description") or f"{property_name} property",
    }


def relevant_facets(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None, top: int = 10
) -> List[str]:
    """Facets whose name substring-matches the class (either direction),
    deterministic order, capped at ``top`` — _find_relevant_facets
    (case_uco.py:994-1004; the reference set()s then slices, we sort for
    a stable listing)."""
    d = _dict(dictionary)
    cl = class_name.lower()
    rel = sorted(
        {f for f in d.get("facets", []) if cl in f.lower() or f.lower() in cl}
    )
    return rel[:top]
