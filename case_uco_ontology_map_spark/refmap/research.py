"""Ontology research query surface — the deterministic equivalent of the
reference's rdflib tool API (/root/reference/case_uco.py:476-1019):
``list_all_classes``, ``search_classes``, ``get_class_summary``,
``get_property_details``, ``relevant_facets`` (top-10 W2 pattern), the
facet/inherited/semantic property report, and (round 5, closing the tool
surface) ``get_shacl_property_shapes``, ``get_structured_property_profile``,
``get_compatible_facets`` and ``common_relationship_patterns`` — all
answered from the broadcast compiled dictionary with zero RDF parsing at
query time.

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


def get_shacl_property_shapes(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Dict[str, Any]]:
    """Merged property → CASE-documentation descriptor
    (case_uco.py:278-341): one dict keyed by property name where facet
    properties carry ``sourceClass = f"{class_name}Facet"``, inherited
    ones the named ancestor ('Inherited' for the common-inherited set
    with no named source), semantic ones 'Semantic'. Mirrors the
    reference's merge order — facet, then inherited, then semantic, later
    assignments overwriting on a name collision. Empty dict for an
    unknown class (reference behavior)."""
    d = _dict(dictionary)
    meta = d["classes"].get(class_name)
    if meta is None:
        return {}
    shapes = d.get("shapes", {})
    props_meta = d.get("properties", {})

    def descriptor(prop: str, slot: Dict[str, Any], source: str) -> Dict[str, Any]:
        pmeta = props_meta.get(prop, {})
        ptype = pmeta.get("type") or (
            "ObjectProperty" if slot.get("isObjectProp") else "DatatypeProperty"
        )
        rng = slot.get("datatype") or slot.get("class") or ""
        return {
            "sourceClass": source,
            "propertyType": ptype,
            "description": pmeta.get("description") or f"{prop} property",
            "minCount": slot.get("minCount") or 0,
            "maxCount": slot.get("maxCount") if slot.get("maxCount") is not None else 1,
            "localRange": rng,
            "globalRange": slot.get("class") or "N/A",
        }

    out: Dict[str, Dict[str, Any]] = {}
    # facet category: own shape + own-Facet shape (class_property_report's
    # facet set), sourceClass = f"{class_name}Facet" per the reference
    for src in (class_name, f"{class_name}Facet"):
        for prop in sorted(shapes.get(src, {})):
            out[prop] = descriptor(prop, shapes[src][prop], f"{class_name}Facet")
    # inherited: each ancestor('s Facet) shape under the ancestor's name,
    # most-general-first so the MOST SPECIFIC ancestor wins a collision
    # (later assignment overwrites — same net result as the reference's
    # specific-first analysis emitting one entry per property)
    facet_names = set(out)
    for anc in reversed(class_hierarchy(class_name, d)[:-1]):
        for src in (anc, f"{anc}Facet"):
            for prop in sorted(shapes.get(src, {})):
                if prop not in facet_names:
                    out[prop] = descriptor(prop, shapes[src][prop], anc)
    for prop in sorted(d.get("common_inherited", [])):
        if prop not in out:
            out[prop] = descriptor(prop, {}, "Inherited")
    # semantic last (overwrites, matching reference merge order)
    for prop in sorted(meta.get("semantic_properties", [])):
        if prop not in facet_names:
            out[prop] = descriptor(prop, {}, "Semantic")
    return out


def get_structured_property_profile(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Class metadata plus property ownership grouped for JSON output —
    get_structured_property_profile (case_uco.py:535-603): the SHACL
    descriptor map routed into direct / facet-grouped / inherited /
    semantic buckets with the reference's exact rules, including the
    ``XFacetFacet`` → ``XFacet`` normalization that makes a facet class's
    own properties 'direct'. Deterministic iteration (sorted by property
    name; the reference iterates dict order)."""
    d = _dict(dictionary)
    summary = get_class_summary(class_name, d)
    if "error" in summary:
        return summary
    shacl = get_shacl_property_shapes(class_name, d)
    profile: Dict[str, Any] = {
        "class_name": summary["name"],
        "uri": summary["uri"],
        "description": summary["description"],
        "superclasses": summary["superclasses"],
        "property_counts": summary["property_counts"],
        "direct_properties": [],
        "facet_properties": {},
        "inherited_properties": [],
        "semantic_properties": [],
    }

    def fmt(name: str, info: Dict[str, Any]) -> Dict[str, Any]:
        return {
            "name": name,
            "type": info.get("propertyType"),
            "description": info.get("description"),
            "min_count": info.get("minCount"),
            "max_count": info.get("maxCount"),
            "local_range": info.get("localRange"),
            "global_range": info.get("globalRange"),
        }

    for prop_name in sorted(shacl):
        info = shacl[prop_name]
        desc = fmt(prop_name, info)
        source = info.get("sourceClass", "") or ""
        if source.endswith("FacetFacet"):
            source = source[:-5]
        if source == summary["name"]:
            profile["direct_properties"].append(desc)
            continue
        if source.endswith("Facet"):
            profile["facet_properties"].setdefault(source, []).append(desc)
            continue
        lowered = source.lower()
        if lowered.startswith("inherited") or source in summary["superclasses"]:
            desc["source"] = source
            profile["inherited_properties"].append(desc)
            continue
        if lowered.startswith("semantic") or source == "Semantic":
            profile["semantic_properties"].append(desc)
            continue
        if source:
            desc["source"] = source
        profile["inherited_properties"].append(desc)
    return profile


def get_compatible_facets(
    class_name: str, dictionary: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Duck-typing facet suggestion — get_compatible_facets
    (case_uco.py:913-939): the full facet census plus name-matched
    relevant facets and the reference's duck-typing framing strings.
    ``usage_example`` uses the first relevant facet (our relevant list is
    sorted, the reference's is set-order — same membership)."""
    d = _dict(dictionary)
    if class_name not in d["classes"]:
        return {"error": f"Class '{class_name}' not found"}
    all_facets = analyze_facets(d)["facet_list"]
    rel = relevant_facets(class_name, d)
    return {
        "class_name": class_name,
        "total_available_facets": len(all_facets),
        "relevant_facets": rel,
        "duck_typing_principle": "Any rational combination of facets can be applied",
        "usage_example": f"{class_name} + {rel[0] if rel else 'AnyFacet'}",
    }


def common_relationship_patterns(
    dictionary: Optional[Dict[str, Any]] = None, top: int = 10
) -> List[str]:
    """Relationship-pattern discovery — _get_common_relationship_patterns
    (case_uco.py:1006-1019): ObjectProperty local names (len > 2)
    containing relation/connect/link, capped at ``top``. On the shipped
    CASE/UCO ontologies this is EMPTY — every matching name
    (kindOfRelationship, *LinkCount, *LinkerVersion) is a
    DatatypeProperty, verified against the reference TTLs — so the
    reference tool returns [] too; the filter logic is pinned by a
    synthetic-dictionary unit test. Sorted (the reference emits rdflib
    traversal order, which is hash-dependent)."""
    d = _dict(dictionary)
    pats = sorted(
        name
        for name, meta in d.get("properties", {}).items()
        if meta.get("type") == "ObjectProperty"
        and len(name) > 2
        and any(k in name.lower() for k in ("relation", "connect", "link"))
    )
    return pats[:top]
