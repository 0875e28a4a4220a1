"""Deterministic identity minting — fingerprints, uuid5 chain, slugs.

Reference semantics replayed (parity citations):
  * namespaces            /root/reference/tools.py:26-28
  * fingerprint           /root/reference/tools.py:67-70
  * uuid5                 /root/reference/tools.py:30-32
  * slugify               /root/reference/agents/uuid_planner.py:26-27
  * normalize_key         /root/reference/agents/uuid_planner.py:82-83
  * tokenize              /root/reference/agents/uuid_planner.py:86-89
  * qualify_property      /root/reference/agents/uuid_planner.py:130-133
  * choose_primary_class  /root/reference/agents/uuid_planner.py:69-74

CRITICAL scale note: the fingerprint is sha256 over Python's canonical
``json.dumps(record, sort_keys=True, separators=(",", ":"))``. Spark's
``to_json`` does NOT reproduce that byte stream (key ordering, unicode
escaping, float repr differ), so fingerprinting always happens here, inside
Arrow-batched pandas UDFs — never via Spark SQL JSON functions.
"""

from __future__ import annotations

import hashlib
import json
import re
import uuid
from typing import Any, Dict, Iterable, List, Tuple

# uuid5 namespace chain (tools.py:26-28). Golden values (FIXTURES.md §3a):
#   NS_CASE   = 8df0d4ef-efd2-542a-beb0-363a27a915c1
#   NS_RECORD = 9d88459b-3638-5461-a2ec-07c3829ee8ca
#   NS_SLOT   = 2ceab281-4f60-5286-ba87-d8505d488b45
NS_CASE = uuid.uuid5(uuid.NAMESPACE_DNS, "case.uco.org")
NS_RECORD = uuid.uuid5(NS_CASE, "record")
NS_SLOT = uuid.uuid5(NS_CASE, "slot")

_CAMEL_SPLIT = re.compile(r"([a-z0-9])([A-Z])")
_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def uuid5_str(namespace: uuid.UUID, name: str) -> str:
    """RFC-4122 v5 uuid as string (tools.py:30-32).

    Hand-rolled sha1 path (~3× faster than uuid.uuid5 object churn in the
    hot kernel); test_refmap_goldens pins equality with uuid.uuid5."""
    digest = hashlib.sha1(namespace.bytes + name.encode("utf-8")).digest()
    b = bytearray(digest[:16])
    b[6] = (b[6] & 0x0F) | 0x50  # version 5
    b[8] = (b[8] & 0x3F) | 0x80  # RFC-4122 variant
    h = b.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def fingerprint_record(record: Dict[str, Any]) -> str:
    """sha256 hex of the canonical JSON of a flattened record (tools.py:67-70)."""
    canonical = json.dumps(record, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()


def slugify(name: str) -> str:
    """" "→"_", "-"→"_", lowercase (uuid_planner.py:26-27)."""
    return name.replace(" ", "_").replace("-", "_").lower()


def normalize_key(name: str) -> str:
    """Collapse non-alnum runs to "_", strip edges (uuid_planner.py:82-83)."""
    return _NON_ALNUM.sub("_", name.lower()).strip("_")


def tokenize(name: str) -> List[str]:
    """camelCase split + separator split, lowercased (uuid_planner.py:86-89)."""
    spaced = _CAMEL_SPLIT.sub(r"\1 \2", name)
    spaced = spaced.replace("_", " ").replace("-", " ").replace(":", " ")
    return [tok for tok in spaced.lower().split() if tok]


def qualify_property(prop_name: str) -> str:
    """Prefix uco-observable: unless already qualified (uuid_planner.py:130-133)."""
    if ":" in prop_name:
        return prop_name
    return f"uco-observable:{prop_name}"


def iri_for(name: str) -> str:
    """Default CASE/UCO observable namespace (uuid_planner.py:77-79)."""
    return f"uco-observable:{name}"


def choose_primary_class(classes: Iterable[str], facets: Iterable[str]) -> str:
    """First class that is not a facet (uuid_planner.py:69-74)."""
    facet_set = {f.lower() for f in facets}
    for cls in classes:
        if cls.lower() not in facet_set and not cls.lower().endswith("facet"):
            return cls
    return "ObservableObject"


def record_uuid_for(fingerprint: str) -> str:
    """record_uuid = uuid5(NS_RECORD, fingerprint) (uuid_planner.py:244)."""
    return uuid5_str(NS_RECORD, fingerprint)


def slot_uuid_for(record_uuid: str, slot_slug: str) -> str:
    """slot_uuid = uuid5(NS_SLOT, f"{record_uuid}:{slug}") (uuid_planner.py:249)."""
    return uuid5_str(NS_SLOT, f"{record_uuid}:{slot_slug}")


def kb_id(slug: str, slot_uuid: str) -> str:
    """Documented node-id contract ``kb:<slug>-<uuid>`` (tools.py:34-42,
    config.py prompt examples; validator regex validator.py:125)."""
    return f"kb:{slug}-{slot_uuid}"


def make_uuid(
    entity_type: str, prefix: str = "kb:", uuid_factory=None
) -> str:
    """F15 — non-deterministic id mint ``kb:<entity>-<uuid4>``
    (tools.py:34-36). The reference uses this only on the agentic path
    where no deterministic plan exists; the pipeline never does — the
    uuid5 chain is the production scheme. ``uuid_factory`` (→ uuid4 by
    default) is injectable so tests can pin outputs."""
    factory = uuid_factory or uuid.uuid4
    return f"{prefix}{entity_type}-{factory()}"


def make_paired_ids(
    base_slug: str, prefix: str = "kb:", uuid_factory=None
) -> Tuple[str, str]:
    """F15 — paired object/facet ids sharing ONE uuid4 with different
    slugs: (kb:<slug>-<u>, kb:<slug>facet-<u>) (tools.py:39-42)."""
    factory = uuid_factory or uuid.uuid4
    u = str(factory())
    return f"{prefix}{base_slug}-{u}", f"{prefix}{base_slug}facet-{u}"


def plan_record_uuids(
    record_count: int,
    class_slugs: List[str],
    facet_slugs: List[str],
    prefix: str = "kb:",
    uuid_factory=None,
) -> List[Dict[str, str]]:
    """F15 — per-record id allocation: a class whose ``<cls>Facet`` appears
    in ``facet_slugs`` gets PAIRED ids (shared uuid4), others a lone mint
    (tools.py:44-65)."""
    plan: List[Dict[str, str]] = []
    facet_set = set(facet_slugs)
    for _ in range(record_count):
        rec: Dict[str, str] = {}
        for cls in class_slugs:
            facet_name = f"{cls}Facet"
            if facet_name in facet_set:
                obj_id, facet_id = make_paired_ids(cls, prefix, uuid_factory)
                rec[cls] = obj_id
                rec[facet_name] = facet_id
            else:
                rec[cls] = make_uuid(cls, prefix, uuid_factory)
        plan.append(rec)
    return plan


def pyify(value: Any) -> Any:
    """Convert Arrow/numpy scalars back to plain Python so json.dumps produces
    the same bytes the reference produced from parsed JSON. Used at the
    pandas-UDF boundary only."""
    # local import keeps refmap importable without numpy
    try:
        import numpy as np
    except ImportError:  # pragma: no cover
        np = None
    if np is not None:
        if isinstance(value, np.bool_):
            return bool(value)
        if isinstance(value, np.integer):
            return int(value)
        if isinstance(value, np.floating):
            return float(value)
        if isinstance(value, np.ndarray):
            return [pyify(v) for v in value.tolist()]
    if isinstance(value, (list, tuple)):
        return [pyify(v) for v in value]
    if isinstance(value, dict):
        return {k: pyify(v) for k, v in value.items()}
    return value
