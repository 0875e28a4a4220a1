"""Deterministic JSON-LD graph composition + triple flattening.

Reference semantics replayed:
  * skeleton build (primary-slug choice, relationship gating, hasFacet refs)
        /root/reference/agents/graph_generator.py:268-319
  * property assignment, no-null contract
        /root/reference/agents/graph_generator.py:151-156
  * custom facet assignment
        /root/reference/agents/graph_generator.py:178-197
  * empty-facet pruning + dangling-ref scrub
        /root/reference/agents/graph_generator.py:199-216
  * property-placement enforcement
        /root/reference/agents/graph_generator.py:37-99
  * DEFAULT_CONTEXT
        /root/reference/agents/graph_generator.py:19-35

Scale design: every function is record-local. ``record_to_triples`` goes
from one record dict straight to flat triple rows — the Spark layer runs it
inside mapInPandas so graph materialization is a single narrow (shuffle-free)
stage; the JSON-LD rendering is a separate groupBy(subj) sink, not the
storage model (SURVEY.md §1.4).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterable, List, Optional, Tuple

from .identity import kb_id, slugify
from .planner import OntologyContext, plan_record

DEFAULT_CONTEXT = {
    "case-investigation": "https://ontology.caseontology.org/case/investigation/",
    "kb": "http://example.org/kb/",
    "drafting": "http://example.org/ontology/drafting/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "uco-action": "https://ontology.unifiedcyberontology.org/uco/action/",
    "core": "https://ontology.unifiedcyberontology.org/uco/core/",
    "identity": "https://ontology.unifiedcyberontology.org/uco/identity/",
    "location": "https://ontology.unifiedcyberontology.org/uco/location/",
    "observable": "https://ontology.unifiedcyberontology.org/uco/observable/",
    "tool": "https://ontology.unifiedcyberontology.org/uco/tool/",
    "types": "https://ontology.unifiedcyberontology.org/uco/types/",
    "vocabulary": "https://ontology.unifiedcyberontology.org/uco/vocabulary/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dfc-ext": "https://www.w3.org/dfc-ext/",
}

HAS_FACET = "uco-core:hasFacet"
RDF_TYPE = "rdf:type"
_SKELETON_KEYS = ("@id", "@type", HAS_FACET)


def _node_id(slug: str, slot_uuid: str, kb_ids: bool) -> str:
    """kb:<slug>-<uuid> (documented contract) or bare uuid (reference
    deterministic path, graph_generator.py:298-301) per config toggle."""
    return kb_id(slug, slot_uuid) if kb_ids else slot_uuid


def _choose_primary_slug(slot_slugs: Iterable[str]) -> Optional[str]:
    """First slug containing neither 'facet' nor 'relationship'
    (graph_generator.py:275-283); falls back to the first slug."""
    slugs = list(slot_slugs)
    for slug in slugs:
        lower = slug.lower()
        if "facet" in lower or "relationship" in lower:
            continue
        return slug
    return slugs[0] if slugs else None


def build_record_nodes(
    plan: Dict[str, Any],
    custom_facet_values: Optional[Dict[str, Dict[str, Any]]] = None,
    kb_ids: bool = True,
) -> List[Dict[str, Any]]:
    """Compose the JSON-LD nodes for ONE planned record.

    ``plan`` is the output of refmap.planner.plan_record. ``custom_facet_values``
    maps facet_slug → {qualified_prop → value} for extension-facet assignments
    (graph_generator.py:184-197). Applies the no-null contract, relationship
    gating, empty-facet pruning and placement enforcement — all record-local.
    """
    custom_facet_values = custom_facet_values or {}
    slots = plan["slots"]
    properties = plan["properties"]
    raw = plan["raw"]

    primary_slug = _choose_primary_slug(slug for _, slug, _, _ in slots)

    nodes: List[Dict[str, Any]] = []
    nodes_by_uuid: Dict[str, Dict[str, Any]] = {}
    slug_by_uuid: Dict[str, str] = {}
    included: List[Tuple[str, str]] = []  # (slug, slot_uuid)

    # rel_slug → {kind, source, target} specs (J9); a relationship slot
    # whose source AND target classes resolve to planned slots is wired
    # with refs and therefore has payload — matching the reference's
    # intended node shape (config.py:559-567) where the deterministic
    # replay replaces the LLM's ref wiring
    rel_specs: Dict[str, Dict[str, Any]] = plan.get("relationships") or {}
    slug_set = {slug for _, slug, _, _ in slots}

    def _rel_resolves(spec: Dict[str, Any]) -> bool:
        src, tgt = spec.get("source"), spec.get("target")
        return bool(
            src and tgt
            and slugify(str(src)) in slug_set
            and slugify(str(tgt)) in slug_set
        )

    # --- skeleton (graph_generator.py:284-305) ---
    for _, slug, slot_uuid, type_iri in slots:
        lower = slug.lower()
        include = True
        if slug != primary_slug:
            if "relationship" in lower or type_iri.lower().endswith("relationship"):
                payload = properties.get(slot_uuid) or raw.get(slot_uuid)
                spec = rel_specs.get(slug)
                include = bool(payload) or (
                    spec is not None and _rel_resolves(spec)
                )
        if not include:
            continue
        node = {"@id": _node_id(slug, slot_uuid, kb_ids), "@type": type_iri}
        nodes.append(node)
        nodes_by_uuid[slot_uuid] = node
        slug_by_uuid[slot_uuid] = slug
        included.append((slug, slot_uuid))

    # hasFacet refs on the primary node (graph_generator.py:307-319)
    primary_uuid = None
    facet_refs = []
    for slug, slot_uuid in included:
        if slug == primary_slug:
            primary_uuid = slot_uuid
        elif "facet" in slug.lower():
            facet_refs.append({"@id": _node_id(slug, slot_uuid, kb_ids)})
    if primary_uuid is not None and facet_refs:
        nodes_by_uuid[primary_uuid][HAS_FACET] = facet_refs

    # --- mapped property assignment, no-null (graph_generator.py:151-156,171-176) ---
    for slot_uuid, props in properties.items():
        node = nodes_by_uuid.get(slot_uuid)
        if not node:
            continue
        for prop, value in props.items():
            if value is None or value == "":
                continue
            node[prop] = value

    # --- custom facet assignment (graph_generator.py:184-197) ---
    if custom_facet_values:
        uuid_by_slug = {slug: u for slug, u in included}
        for facet_slug, values in custom_facet_values.items():
            slot_uuid = uuid_by_slug.get(facet_slug)
            if not slot_uuid:
                continue
            node = nodes_by_uuid.get(slot_uuid)
            if not node:
                continue
            for prop, value in values.items():
                if value is None or value == "":
                    continue
                node[prop] = value

    # --- relationship source/target wiring (J9) ---
    # uco-observable:source/target {"@id"} refs + uco-core:kindOfRelationship
    # per the reference's ObservableRelationship shape (config.py:559-567).
    # Refs resolve to the planned node ids by class-name slug; both must
    # resolve or the spec adds nothing (payload-gating then applies as
    # before).
    if rel_specs:
        id_by_slug = {
            slug: _node_id(slug, slot_uuid, kb_ids) for slug, slot_uuid in included
        }
        for slug, slot_uuid in included:
            spec = rel_specs.get(slug)
            if spec is None or not _rel_resolves(spec):
                continue
            node = nodes_by_uuid[slot_uuid]
            src_id = id_by_slug.get(slugify(str(spec["source"])))
            tgt_id = id_by_slug.get(slugify(str(spec["target"])))
            if src_id is None or tgt_id is None:
                continue
            node["uco-observable:source"] = {"@id": src_id}
            node["uco-observable:target"] = {"@id": tgt_id}
            node["uco-core:kindOfRelationship"] = spec["kind"]

    # --- empty-facet prune + ref scrub (graph_generator.py:199-216) ---
    filtered: List[Dict[str, Any]] = []
    empty_ids = set()
    for node in nodes:
        node_type = node.get("@type", "")
        if isinstance(node_type, str) and node_type.lower().endswith("facet"):
            has_payload = any(k not in _SKELETON_KEYS for k in node)
            if not has_payload:
                empty_ids.add(node["@id"])
                continue
        filtered.append(node)
    if empty_ids:
        for node in filtered:
            refs = node.get(HAS_FACET)
            if refs:
                node[HAS_FACET] = [r for r in refs if r.get("@id") not in empty_ids]
        # a relationship whose endpoint was pruned is structurally
        # incomplete — drop it rather than emit a dangling ref
        filtered = [
            n
            for n in filtered
            if not (
                str(n.get("@type", "")).lower().endswith("relationship")
                and (
                    (n.get("uco-observable:source") or {}).get("@id") in empty_ids
                    or (n.get("uco-observable:target") or {}).get("@id") in empty_ids
                )
            )
        ]

    return filtered


def enforce_property_placement(
    nodes: List[Dict[str, Any]], ontology_map: Dict[str, Any]
) -> List[Dict[str, Any]]:
    """Move facet-owned properties off non-facet nodes onto the matching facet
    (graph_generator.py:37-99). Record-local: operates on one record's nodes."""
    nodes_by_id = {node["@id"]: node for node in nodes}
    prop_to_facet: Dict[str, str] = {}
    props_cfg = ontology_map.get("properties")
    if isinstance(props_cfg, dict):
        for owner, props in props_cfg.items():
            if owner.endswith("Facet"):
                for prop in props:
                    prop_to_facet[prop] = owner

    for node in nodes:
        node_type = node.get("@type", "")
        if isinstance(node_type, str) and node_type.endswith("Facet"):
            continue
        to_move = {}
        for prop, value in node.items():
            if prop in _SKELETON_KEYS:
                continue
            local = prop.split(":")[-1]
            if local in prop_to_facet:
                to_move[prop] = value
        if not to_move:
            continue
        facet_refs = node.get(HAS_FACET, [])
        if not facet_refs:
            continue
        for prop, value in to_move.items():
            local = prop.split(":")[-1]
            target_type = prop_to_facet.get(local)
            target = None
            for ref in facet_refs:
                facet_node = nodes_by_id.get(ref.get("@id"))
                if facet_node is not None and facet_node.get("@type") == target_type:
                    target = facet_node
                    break
            if target is not None:
                target[prop] = value
                del node[prop]
    return nodes


def build_graph(
    records: List[Dict[str, Any]],
    ontology_map: Dict[str, Any],
    custom_facet_values: Optional[Dict[str, Dict[str, Any]]] = None,
    kb_ids: bool = True,
) -> Dict[str, Any]:
    """Full deterministic JSON-LD graph for a record batch — the pytest
    oracle for end-to-end parity (mirrors graph_generator_node's
    deterministic path end to end)."""
    ctx = OntologyContext(ontology_map)
    all_nodes: List[Dict[str, Any]] = []
    for record in records:
        plan = plan_record(record, ctx)
        nodes = build_record_nodes(plan, custom_facet_values, kb_ids=kb_ids)
        nodes = enforce_property_placement(nodes, ontology_map)
        all_nodes.extend(nodes)
    return {"@context": DEFAULT_CONTEXT, "@graph": all_nodes}


# ---------------------------------------------------------------------------
# Triple flattening (SURVEY.md §1.4 — columnar at rest)
# ---------------------------------------------------------------------------

def _literal_parts(value: Any) -> Tuple[str, Optional[str]]:
    """Render a literal to (string form, xsd datatype tag or None)."""
    if isinstance(value, bool):
        return ("true" if value else "false", "xsd:boolean")
    if isinstance(value, int):
        return (str(value), "xsd:integer")
    if isinstance(value, float):
        return (repr(value), "xsd:decimal")
    if isinstance(value, dict):
        if "@value" in value:
            inner, _ = _literal_parts(value["@value"])
            return (inner, value.get("@type"))
        return (json.dumps(value, sort_keys=True), None)
    return (str(value), None)


def nodes_to_triples(
    nodes: List[Dict[str, Any]], record_uuid: str
) -> List[Tuple[str, str, str, bool, Optional[str], str]]:
    """Flatten JSON-LD nodes to rows (subj, pred, obj, obj_is_iri,
    obj_datatype, record_uuid). @type → rdf:type; hasFacet/{@id} → IRI
    objects; scalars/lists → literal rows (FIXTURES.md §4)."""
    rows: List[Tuple[str, str, str, bool, Optional[str], str]] = []
    for node in nodes:
        subj = node["@id"]
        for prop, value in node.items():
            if prop == "@id":
                continue
            if prop == "@type":
                rows.append((subj, RDF_TYPE, value, True, None, record_uuid))
                continue
            values = value if isinstance(value, (list, tuple)) else [value]
            for v in values:
                if isinstance(v, dict) and set(v.keys()) == {"@id"}:
                    rows.append((subj, prop, v["@id"], True, None, record_uuid))
                else:
                    obj, dt = _literal_parts(v)
                    rows.append((subj, prop, obj, False, dt, record_uuid))
    return rows


def record_to_triples(
    record: Dict[str, Any],
    ctx: OntologyContext,
    ontology_map: Optional[Dict[str, Any]] = None,
    custom_facet_values: Optional[Dict[str, Dict[str, Any]]] = None,
    kb_ids: bool = True,
) -> List[Tuple[str, str, str, bool, Optional[str], str]]:
    """ONE record → flat triple rows. The per-record kernel the Spark layer
    maps over Arrow batches — zero cross-record state, zero shuffles."""
    plan = plan_record(record, ctx)
    nodes = build_record_nodes(plan, custom_facet_values, kb_ids=kb_ids)
    if ontology_map is not None:
        nodes = enforce_property_placement(nodes, ontology_map)
    return nodes_to_triples(nodes, plan["record_uuid"])
