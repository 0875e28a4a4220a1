"""Record-field → ontology-property matching.

Reference semantics replayed:
  * PROPERTY_ALIAS_MAP       /root/reference/agents/uuid_planner.py:9-23
  * prepare_property_index   /root/reference/agents/uuid_planner.py:92-101
  * match_property           /root/reference/agents/uuid_planner.py:104-127

Determinism note (SURVEY.md §2.5 W1): on tie the reference keeps the FIRST
candidate in dict-insertion order of the prepared index. We preserve that by
building the index as an insertion-ordered list and scanning in order with a
strict ``>`` comparison — identical argmax semantics, no Spark shuffle needed
because the index is tiny and broadcast.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

from .identity import slugify, tokenize

# Hand-curated alias map (uuid_planner.py:9-23) — a broadcast dimension.
PROPERTY_ALIAS_MAP: Dict[str, List[str]] = {
    "entrynumber": ["mftFileID", "entryID"],
    "sequencenumber": ["sequenceNumber", "entrySequence"],
    "parententrynumber": ["mftParentID"],
    "fullpath": ["filePath"],
    "inuse": ["allocationStatus", "isAllocated"],
    "si_created": ["mftFileNameCreatedTime", "createdTime"],
    "si_modified": ["mftFileNameModifiedTime", "modifiedTime"],
    "si_accessed": ["mftFileNameAccessedTime", "accessedTime"],
    "fn_created": ["createdTime"],
    "fn_modified": ["modifiedTime"],
    "size": ["sizeInBytes"],
    "filename": ["fileName"],
    "filesystem": ["fileSystemType"],
}

# (owner_slug, [(prop, token_set), ...]) in insertion order.
PropertyIndex = List[Tuple[str, List[Tuple[str, Set[str]]]]]


def prepare_property_index(ontology_properties: Dict[str, Sequence[str]]) -> PropertyIndex:
    """{owner → [prop]} → ordered [(owner_slug, [(prop, tokens)])]."""
    index: PropertyIndex = []
    for owner, props in ontology_properties.items():
        owner_slug = slugify(owner)
        entries = [(prop, set(tokenize(prop))) for prop in props]
        if entries:
            index.append((owner_slug, entries))
    return index


def match_property(
    raw_key: str, index: PropertyIndex
) -> Tuple[Optional[str], Optional[str]]:
    """Alias exact-match first, then token-overlap argmax with first-wins ties
    (uuid_planner.py:104-127). ``raw_key`` must already be normalize_key()'d.
    """
    alias_candidates = PROPERTY_ALIAS_MAP.get(raw_key)
    if alias_candidates:
        lowered = [alias.lower() for alias in alias_candidates]
        for owner_slug, entries in index:
            for prop, _ in entries:
                if prop in alias_candidates:
                    return owner_slug, prop
                if prop.lower() in lowered:
                    return owner_slug, prop

    raw_tokens = set(tokenize(raw_key))
    best_score = 0
    best_owner: Optional[str] = None
    best_prop: Optional[str] = None
    for owner_slug, entries in index:
        for prop, tokens in entries:
            score = len(raw_tokens & tokens)
            if score > best_score:
                best_score = score
                best_owner = owner_slug
                best_prop = prop
    if best_score > 0:
        return best_owner, best_prop
    return None, None
