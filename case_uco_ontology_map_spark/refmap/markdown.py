"""F12 — markdown mapping-table parse (golden-parity helper).

The reference's synthesis stage recovers property→record-field mappings
from the research agent's markdown report tables
(/root/reference/agents/ontology_synthesizer.py:101-151). At web scale the
Spark engine derives the propertyFieldMap deterministically from the
dictionary + schema (refmap/planner.py), so this parser exists for parity
replay of reference sessions: given a saved markdown report, it produces
the identical ``propertyFieldMap`` structure the reference's pipeline would
have fed into graph generation.

Table contract (matching the reference byte-for-byte on its fixtures):
  * a table starts at a header row matching ``| PROPERTY |`` (any spacing);
  * ``|---`` separator rows are skipped;
  * a non-``|`` line ends the table;
  * data rows need ≥4 cells: cell 0 is the property name, cell 3 the
    "maps to" expression;
  * empty / ``(none)`` map cells are dropped;
  * the record field is the first ``record["x"]`` / ``record['x']`` /
    ``record.x`` reference in the map cell — rows without one are dropped;
  * output is owner → property → [field, ...] where owners come from the
    inverse of ``ontology_map["properties"]`` (a property mapped in the
    table but owned by no class is dropped).
"""

from __future__ import annotations

import re
from typing import Dict, List

_HEADER = re.compile(r"^\|\s*PROPERTY\s*\|")
_ROW = re.compile(r"^\|")
_FIELD = re.compile(
    r"""record(?:\[(?:["'])([A-Za-z0-9_]+)(?:["'])\]|\.([A-Za-z0-9_]+))"""
)


def parse_mapping_rows(markdown: str) -> List[tuple]:
    """Markdown → ordered [(property_name, field), ...] from PROPERTY tables."""
    rows: List[tuple] = []
    if not markdown:
        return rows
    capturing = False
    for line in markdown.splitlines():
        if _HEADER.match(line):
            capturing = True
            continue
        if not capturing:
            continue
        stripped = line.strip()
        if stripped.startswith("|---"):
            continue
        if not _ROW.match(line):
            capturing = False
            continue
        cells = [c.strip() for c in stripped.split("|")][1:-1]
        if len(cells) < 4:
            continue
        prop, maps_to = cells[0], cells[3]
        if not maps_to or maps_to.lower() == "(none)":
            continue
        m = _FIELD.search(maps_to)
        if not m:
            continue
        field = m.group(1) or m.group(2)
        if field:
            rows.append((prop, field))
    return rows


def parse_property_mappings(
    markdown: str, ontology_map: dict
) -> Dict[str, Dict[str, List[str]]]:
    """Markdown report + ontology map → propertyFieldMap
    (owner class → property → [record fields]), reference-identical."""
    rows = parse_mapping_rows(markdown)
    if not rows:
        return {}
    owners_of: Dict[str, List[str]] = {}
    for owner, props in (ontology_map.get("properties") or {}).items():
        for p in props:
            owners_of.setdefault(p, []).append(owner)
    out: Dict[str, Dict[str, List[str]]] = {}
    for prop, field in rows:
        for owner in owners_of.get(prop) or []:
            out.setdefault(owner, {}).setdefault(prop, []).append(field)
    return out
