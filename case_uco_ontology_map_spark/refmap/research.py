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


def class_hierarchy(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> List[str]:
    """Superclass chain most-general-first, ending at the class itself —
    the reference's _get_superclass_hierarchy (case_uco.py:167-194). The
    reference reverses a set() of traversal results (order is therefore
    hash-dependent within a generality tier); we order ancestors by their
    OWN ancestor count (true generality: a class with no superclasses
    sorts first), name-tiebroken — deterministic, identical membership,
    and actually most-general-first."""
    d = _dict(dictionary)
    meta = d["classes"].get(class_name)
    if meta is None:
        return []
    classes = d["classes"]

    def depth(c: str) -> int:
        m = classes.get(c)
        return len(m.get("superclasses", [])) if m else 0

    supers = sorted(meta.get("superclasses", []), key=lambda c: (depth(c), c))
    return supers + [class_name]


def analyze_facets(dictionary: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Facet census — analyze_facets (case_uco.py:802-830): every
    transitive subclass of core:Facet, total + sorted list (the reference's
    'categories' delegate categorization to the LLM and return the raw
    sorted list, which is what we return too)."""
    d = _dict(dictionary)
    facets = sorted(d.get("facets", []))
    return {
        "total_facets": len(facets),
        "facet_list": facets,
        "categories": {"all_facets": facets, "total_count": len(facets)},
    }


def analyze_relationships(
    dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Relationship census — analyze_relationships (case_uco.py:941-982):
    subclasses of ObservableRelationship plus any class with
    'relationship' in its name."""
    d = _dict(dictionary)
    obs_rel = sorted(
        name
        for name, meta in d["classes"].items()
        if "ObservableRelationship" in meta.get("superclasses", [])
        and name != "ObservableRelationship"
    )
    general = sorted(
        name
        for name, meta in d["classes"].items()
        if "relationship" in name.lower() and len(name) > 2 and name not in obs_rel
    )
    return {
        "observable_relationships": obs_rel,
        "general_relationships": general,
        "total_relationship_types": len(obs_rel) + len(general),
    }


def compare_classes(
    *class_names: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Side-by-side class comparison — compare_classes
    (case_uco.py:655-684): per-class summaries plus the flat summary
    table rows the reference renders."""
    d = _dict(dictionary)
    comparison: Dict[str, Any] = {"classes": {}, "summary_table": []}
    for name in class_names:
        summary = get_class_summary(name, d)
        if "error" in summary:
            continue
        comparison["classes"][name] = summary
        comparison["summary_table"].append(
            {
                "class": name,
                "facet_props": summary["property_counts"]["facet"],
                "inherited_props": summary["property_counts"]["inherited"],
                "semantic_props": summary["property_counts"]["semantic"],
                "total_props": summary["property_counts"]["total"],
                "superclasses": summary["superclass_count"],
                "has_facet": summary["has_facet_pattern"],
            }
        )
    return comparison


def export_class_markdown(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> str:
    """Markdown documentation report for one class — export_to_markdown
    (case_uco.py:754-845): header + URI + description, numbered superclass
    section, the CASE-documentation-format property-shape table grouped by
    source class (hierarchy-important classes first), and the summary/
    usage-pattern footer."""
    d = _dict(dictionary)
    meta = d["classes"].get(class_name)
    if meta is None:
        return f"Error: Class '{class_name}' not found in CASE/UCO ontologies"
    shapes = d.get("shapes", {})
    summary = get_class_summary(class_name, d)

    lines = [
        f"# {class_name}",
        "",
        f"**URI:** `{meta.get('uri', '')}`",
        "",
        f"**Description:** {summary['description']}",
        "",
    ]
    supers = summary["superclasses"]
    if supers:
        lines.append(f"## Superclasses ({len(supers)})")
        lines.append("")
        lines.extend(f"{i}. {s}" for i, s in enumerate(supers, 1))
        lines.append("")

    # property shapes grouped by source class: own shape + own Facet shape
    # + each superclass('s Facet) shape — the same ownership walk as
    # class_property_report, but keyed by source for the table grouping
    by_class: Dict[str, List[str]] = {}
    sources = [class_name, f"{class_name}Facet"]
    for anc in meta.get("superclasses", []):
        sources.extend((anc, f"{anc}Facet"))
    for src in sources:
        props = shapes.get(src)
        if props:
            by_class.setdefault(src, []).extend(sorted(props))

    if by_class:
        lines.append("## Property Shapes")
        lines.append("")
        lines.append(
            "By the associated SHACL property shapes, instances of "
            f"{class_name} can have the following properties:"
        )
        lines.append("")
        lines.append(
            "| PROPERTY | PROPERTY TYPE | DESCRIPTION | MIN COUNT | MAX COUNT "
            "| LOCAL RANGE | GLOBAL RANGE |"
        )
        lines.append(
            "|----------|---------------|-------------|-----------|-----------"
            "|-------------|--------------|"
        )
        class_order = ["UcoObject", "ObservableObject", "Observable", "UcoThing", "Item"]
        ordered = [c for c in class_order if c in by_class] + sorted(
            c for c in by_class if c not in class_order
        )
        props_meta = d.get("properties", {})
        for src in ordered:
            lines.append(f"| **{src}** | | | | | | |")
            for prop in by_class[src]:
                slot = shapes[src][prop]
                pmeta = props_meta.get(prop, {})
                desc = pmeta.get("description") or f"{prop} property"
                if len(desc) > 50:
                    desc = desc[:50] + "..."
                ptype = pmeta.get("type") or (
                    "ObjectProperty" if slot.get("isObjectProp") else "DatatypeProperty"
                )
                local_range = slot.get("datatype") or slot.get("class") or ""
                lines.append(
                    f"| {prop} | {ptype} | {desc} | "
                    f"{slot.get('minCount')} | {slot.get('maxCount')} | "
                    f"{local_range} | {local_range} |"
                )
        lines.append("")

    total = sum(len(v) for v in by_class.values())
    facet_count = sum(
        len(v) for c, v in by_class.items() if "Facet" in c
    )
    lines.append("## Summary")
    lines.append("")
    lines.append(f"- **Total Properties:** {total}")
    lines.append(f"- **Facet Properties:** {facet_count}")
    lines.append(f"- **Inherited Properties:** {total - facet_count}")
    lines.append(
        f"- **Usage Pattern:** Use 'hasFacet' property to link to "
        f"{class_name}Facet"
        if facet_count > 0
        else "- **Usage Pattern:** Direct property usage"
    )
    return "\n".join(lines)


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
