"""Per-record deterministic UUID planning + source-property mapping.

Reference semantics replayed:
  * extract_records (fan-out + shared-metadata flatten)
        /root/reference/agents/uuid_planner.py:30-66
  * plan row minting (primary slot, facet slots, relationship slots)
        /root/reference/agents/uuid_planner.py:218-267
  * source property map (propertyFieldMap → alias → token-overlap argmax)
        /root/reference/agents/uuid_planner.py:136-191

Scale design: ``plan_record`` is a pure per-record kernel with NO
cross-record state — the Spark layer maps it over Arrow batches
(mapInPandas), so triple planning is embarrassingly parallel with zero
shuffles. The ontology context (property index, facet slugs, primary class)
is precompiled ONCE per broadcast ontology map via ``OntologyContext`` and
shared across all records in an executor.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

from .identity import (
    choose_primary_class,
    fingerprint_record,
    iri_for,
    normalize_key,
    qualify_property,
    record_uuid_for,
    slot_uuid_for,
    slugify,
)
from .matching import PropertyIndex, match_property, prepare_property_index


def extract_records(raw_input: Any) -> List[Dict[str, Any]]:
    """Normalize raw payloads into flat per-record dicts with shared metadata
    merged in (uuid_planner.py:30-66)."""
    if isinstance(raw_input, list):
        return [rec for rec in raw_input if isinstance(rec, dict)]

    if isinstance(raw_input, dict):
        records = raw_input.get("records")
        if isinstance(records, list):
            shared = {
                k: v for k, v in raw_input.items() if k not in ("records", "record")
            }
            normalised: List[Dict[str, Any]] = []
            for rec in records:
                if isinstance(rec, dict):
                    flattened = {**shared}
                    flattened.update(rec)
                    normalised.append(flattened)
            if normalised:
                return normalised

        single = raw_input.get("record")
        if isinstance(single, dict):
            shared = {
                k: v for k, v in raw_input.items() if k not in ("records", "record")
            }
            flattened = {**shared}
            flattened.update(single)
            return [flattened]

        return [raw_input] if raw_input else []

    return []


class OntologyContext:
    """Precompiled, immutable view of an ontology map — built once per
    broadcast value, shared by every record kernel call on the executor."""

    __slots__ = (
        "classes",
        "facets",
        "facet_slugs",
        "relationships",
        "primary_class",
        "primary_slug",
        "property_index",
        "property_field_map",
        "facet_names_by_slug",
        "_match_cache",
    )

    def __init__(self, ontology_map: Dict[str, Any]):
        self.classes = list(ontology_map.get("classes", []) or [])
        facets = list(ontology_map.get("facets", []) or [])
        properties = ontology_map.get("properties", {}) or {}
        # Facet inference from property owners (uuid_planner.py:212-215)
        if not facets:
            for owner in properties.keys():
                if owner not in facets and owner.lower().endswith("facet"):
                    facets.append(owner)
        self.facets = facets
        self.facet_slugs = [slugify(f) for f in facets]
        self.facet_names_by_slug = dict(zip(self.facet_slugs, facets))
        self.relationships = list(ontology_map.get("relationships", []) or [])

        primary = choose_primary_class(self.classes, facets)
        # Fallback selection (uuid_planner.py:219-226)
        if primary == "ObservableObject":
            if self.classes:
                primary = self.classes[0]
            else:
                for owner in properties.keys():
                    if not owner.lower().endswith("facet"):
                        primary = owner
                        break
        self.primary_class = primary
        self.primary_slug = slugify(primary)
        self.property_index: PropertyIndex = prepare_property_index(properties)
        additional = ontology_map.get("additional_details", {}) or {}
        self.property_field_map = additional.get("propertyFieldMap", {}) or {}
        # Per-context memo: raw field name → (owner_slug, qualified_prop).
        # Matching is a pure function of (raw_key, index); at web scale the
        # field vocabulary is tiny relative to record count, so this turns
        # the per-record token matching into a dict hit (hot-path profile:
        # 44% of kernel time without it).
        self._match_cache: Dict[str, Tuple[Optional[str], Optional[str]]] = {}

    def match_field(self, raw_key: str) -> Tuple[Optional[str], Optional[str]]:
        """Memoized (owner_slug, qualified_prop) for a raw record field."""
        hit = self._match_cache.get(raw_key)
        if hit is None:
            owner_slug, prop_name = match_property(
                normalize_key(raw_key), self.property_index
            )
            hit = (
                owner_slug,
                qualify_property(prop_name) if prop_name else None,
            )
            self._match_cache[raw_key] = hit
        return hit


def plan_record(
    record: Dict[str, Any], ctx: OntologyContext
) -> Dict[str, Any]:
    """Plan one record: fingerprint, uuid chain, slot list, property map.

    Returns {fingerprint, record_uuid, slots: [(ord, slug, uuid, type_iri)],
    properties: {slot_uuid → {qualified_prop → value}},
    raw: {slot_uuid → {raw_key → value}}} — the exact information the
    reference stores in uuidPlan/slotTypeMap/sourcePropertyMap
    (uuid_planner.py:279-284), as one self-contained row.
    """
    fingerprint = fingerprint_record(record)
    record_uuid = record_uuid_for(fingerprint)

    slots: List[Tuple[int, str, str, str]] = []
    ordinal = 0

    primary_uuid = slot_uuid_for(record_uuid, ctx.primary_slug)
    slots.append((ordinal, ctx.primary_slug, primary_uuid, iri_for(ctx.primary_class)))
    slug_to_uuid: "OrderedDict[str, str]" = OrderedDict()
    slug_to_uuid[ctx.primary_slug] = primary_uuid

    for facet_name, facet_slug in zip(ctx.facets, ctx.facet_slugs):
        ordinal += 1
        facet_uuid = slot_uuid_for(record_uuid, facet_slug)
        slots.append((ordinal, facet_slug, facet_uuid, iri_for(facet_name)))
        slug_to_uuid[facet_slug] = facet_uuid

    rel_specs: Dict[str, Dict[str, Any]] = {}
    for rel_idx, rel in enumerate(ctx.relationships):
        rel = rel if isinstance(rel, dict) else {}
        kind = rel.get("type") or "relatedTo"
        rel_slug = slugify(f"relationship_{kind}_{rel_idx}")
        ordinal += 1
        rel_uuid = slot_uuid_for(record_uuid, rel_slug)
        slots.append((ordinal, rel_slug, rel_uuid, iri_for("ObservableRelationship")))
        slug_to_uuid[rel_slug] = rel_uuid
        rel_specs[rel_slug] = {
            "kind": kind,
            "source": rel.get("source"),
            "target": rel.get("target"),
        }

    properties: Dict[str, Dict[str, Any]] = {u: {} for u in slug_to_uuid.values()}
    raw: Dict[str, Dict[str, Any]] = {u: {} for u in slug_to_uuid.values()}
    primary_slug = next(iter(slug_to_uuid))

    # 1. Explicit propertyFieldMap rows first (uuid_planner.py:156-175)
    for owner, prop_map in ctx.property_field_map.items():
        owner_slug = slugify(owner)
        target_slug = owner_slug if owner_slug in slug_to_uuid else primary_slug
        slot_uuid = slug_to_uuid.get(target_slug)
        if not slot_uuid:
            continue
        for prop_name, fields in (prop_map or {}).items():
            if not fields:
                continue
            value = None
            for field_name in fields:
                if field_name in record and record[field_name] is not None:
                    value = record[field_name]
                    break
            if value is None:
                continue
            properties[slot_uuid][qualify_property(prop_name)] = value

    # 2. Alias + token-overlap fallback per raw field (uuid_planner.py:177-189)
    for raw_key, value in record.items():
        owner_slug, qualified = ctx.match_field(raw_key)
        target_slug = owner_slug if owner_slug in slug_to_uuid else primary_slug
        slot_uuid = slug_to_uuid[target_slug]
        raw[slot_uuid][raw_key] = value
        if qualified:
            properties[slot_uuid][qualified] = value

    return {
        "fingerprint": fingerprint,
        "record_uuid": record_uuid,
        "slots": slots,
        "properties": properties,
        "raw": raw,
        # rel_slug → {kind, source, target} (J9): the graph composer wires
        # uco-observable:source/target refs from these specs
        # (reference: uuid_planner.py:259-265 mints the slots; the intended
        # node shape is config.py:559-567's ObservableRelationship example)
        "relationships": rel_specs,
    }


def plan_records(
    records: List[Dict[str, Any]], ontology_map: Dict[str, Any]
) -> List[Dict[str, Any]]:
    """Driver/oracle convenience: plan a list of records."""
    ctx = OntologyContext(ontology_map)
    return [plan_record(rec, ctx) for rec in records]
