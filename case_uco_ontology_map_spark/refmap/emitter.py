"""Compiled per-shape triple emission — the fused kernel's fast path.

The generic record kernel (planner.plan_record → graph.build_record_nodes →
enforce_property_placement → nodes_to_triples) re-derives STRUCTURAL
decisions for every record: which slot owns each field, which slots emit,
where placement moves each property, and the flatten order. But structure
is a pure function of the record's SHAPE — its key set, value types, and
null pattern — not its values: values pass through verbatim (the no-null
contract inspects only None/""), and slugs, not uuids, drive every gate.
A web corpus has a handful of shapes across billions of rows, so at scale
the engine should pay the structural cost once per (shape × executor), not
once per record.

``TripleEmitter`` compiles a shape by running the UNCHANGED generic path
over a sentinel record (unique sentinel string per str field, unique
sentinel int per int field) and pattern-matching the emitted rows into
templates:

    subj       → owning slot slug          (ids are kb:<slug>-<uuid5>)
    obj        → const | str field | int field | slot ref
    pred/flags → constants of the shape

Per record the kernel then only computes what truly varies: fingerprint
(canonical-JSON sha256, byte-identical to tools.py:67-70 — computed by the
same ``fingerprint_record``), the uuid5 chain, and string assembly.

Safety rails, because a specializer must never be trusted on faith:
  * a shape whose values aren't all str/int (or None) refuses to compile
    and the generic path runs — lists/dicts/bools can't be sentineled
    uniquely;
  * a sentinel that fails to round-trip (a future transform that rewrites
    values would break the match) aborts compilation → generic path;
  * the FIRST real record of every compiled shape is ALSO run through the
    generic path and compared row-for-row; any mismatch permanently
    disables the template (and tests assert it never trips);
  * tests pin emitter ≡ generic across shapes (null lang, empty strings,
    relationship maps, custom schemas).

Reference parity is inherited, not re-implemented: the compiler executes
the same functions the generic path does (citations in refmap/planner.py,
refmap/graph.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from .graph import (
    build_record_nodes,
    enforce_property_placement,
    nodes_to_triples,
)
from .identity import fingerprint_record, record_uuid_for, slot_uuid_for
from .planner import OntologyContext, plan_record

# obj template kinds
_CONST = 0
_FIELD = 1
_INT_FIELD = 2
_SLOT = 3

Row = Tuple[str, str, str, bool, Optional[str], str]


class _Template:
    __slots__ = ("slugs", "rows", "verified", "dead")

    def __init__(self, slugs: List[str], rows: List[tuple]):
        self.slugs = slugs  # slot slugs needing uuids, in first-use order
        self.rows = rows  # (subj_slug, pred, kind, payload, is_iri, dt)
        self.verified = False
        self.dead = False  # verification failed → permanent generic path

    def emit(self, rec: Dict[str, Any], fingerprint: str) -> Tuple[str, List[Row]]:
        ruuid = record_uuid_for(fingerprint)
        ids = {
            slug: f"kb:{slug}-{slot_uuid_for(ruuid, slug)}" for slug in self.slugs
        }
        out: List[Row] = []
        for subj_slug, pred, kind, payload, is_iri, dt in self.rows:
            if kind == _CONST:
                obj = payload
            elif kind == _FIELD:
                obj = rec[payload]
            elif kind == _INT_FIELD:
                obj = str(rec[payload])
            else:
                obj = ids[payload]
            out.append((ids[subj_slug], pred, obj, is_iri, dt, ruuid))
        return ruuid, out


class TripleEmitter:
    """Shape-compiled record→triples kernel, semantics-equal to
    ``record_to_triples`` (the generic path it compiles from)."""

    def __init__(self, ontology_map: Dict[str, Any], ctx: Optional[OntologyContext] = None):
        self._omap = ontology_map
        self._ctx = ctx or OntologyContext(ontology_map)
        self._templates: Dict[tuple, Optional[_Template]] = {}

    # -- generic reference path (also the fallback) ---------------------
    def _generic(self, rec: Dict[str, Any], fingerprint: str) -> Tuple[str, List[Row]]:
        plan = plan_record(rec, self._ctx)
        nodes = enforce_property_placement(
            build_record_nodes(plan, kb_ids=True), self._omap
        )
        return plan["record_uuid"], nodes_to_triples(nodes, plan["record_uuid"])

    # -- shape key: (field, kind) in INSERTION order -----------------------
    # Insertion order is semantic, not cosmetic: plan_record's per-field
    # loop iterates record.items(), and when two raw fields alias to the
    # SAME qualified property the last one wins — so records with equal
    # key SETS but different orderings can emit different objects and must
    # not share a template.
    @staticmethod
    def _shape(rec: Dict[str, Any]) -> Optional[tuple]:
        parts = []
        for k in rec:
            v = rec[k]
            if v is None or v == "":
                parts.append((k, "x", v == ""))  # dropped by no-null
            elif isinstance(v, bool):
                return None  # two-valued: cannot sentinel uniquely
            elif isinstance(v, int):
                parts.append((k, "i", False))
            elif isinstance(v, str):
                parts.append((k, "s", False))
            else:
                return None  # list/dict/float: generic path
        return tuple(parts)

    def _compile(self, rec: Dict[str, Any], shape: tuple) -> Optional[_Template]:
        # sentinel record: unique value per dynamic field, same null
        # pattern, SAME INSERTION ORDER (see _shape — order is semantic)
        sent: Dict[str, Any] = {}
        by_str: Dict[str, str] = {}
        by_int: Dict[str, str] = {}
        next_int = 987654321000001
        for i, k in enumerate(rec):
            v = rec[k]
            if v is None or v == "":
                sent[k] = v
            elif isinstance(v, int):
                sent[k] = next_int + i
                by_int[str(next_int + i)] = k
            else:
                s = f"@@S{i}@@{k}@@"
                sent[k] = s
                by_str[s] = k
        fp = fingerprint_record(sent)
        plan = plan_record(sent, self._ctx)
        ruuid, rows = self._generic(sent, fp)
        # slot-uuid → slug map for subj/ref recognition
        id_by_uuid = {u: slug for _, slug, u, _ in plan["slots"]}
        node_ids = {
            f"kb:{slug}-{u}": slug for _, slug, u, _ in plan["slots"]
        }

        slugs: List[str] = []
        compiled: List[tuple] = []
        for subj, pred, obj, is_iri, dt, _ in rows:
            subj_slug = node_ids.get(subj)
            if subj_slug is None:
                return None  # unexpected subject shape
            if subj_slug not in slugs:
                slugs.append(subj_slug)
            if obj in node_ids:
                kind, payload = _SLOT, node_ids[obj]
                if payload not in slugs:
                    slugs.append(payload)
            elif obj in by_str:
                kind, payload = _FIELD, by_str[obj]
            elif obj in by_int:
                kind, payload = _INT_FIELD, by_int[obj]
            else:
                # must be a true constant of the shape: reject anything
                # that still smells like a sentinel (partial transform)
                if "@@S" in obj or obj in (ruuid,):
                    return None
                kind, payload = _CONST, obj
            compiled.append((subj_slug, pred, kind, payload, is_iri, dt))
        return _Template(slugs, compiled)

    # -- public kernel ---------------------------------------------------
    def rows_for(self, rec: Dict[str, Any]) -> Tuple[str, str, List[Row]]:
        """rec → (fingerprint, record_uuid, triple rows); compiled when the
        shape allows, generic otherwise — outputs are identical either way."""
        fp = fingerprint_record(rec)
        shape = self._shape(rec)
        if shape is None:
            ruuid, rows = self._generic(rec, fp)
            return fp, ruuid, rows
        tmpl = self._templates.get(shape, False)
        if tmpl is False:  # not compiled yet
            tmpl = self._compile(rec, shape)
            self._templates[shape] = tmpl
        if tmpl is None or tmpl.dead:
            ruuid, rows = self._generic(rec, fp)
            return fp, ruuid, rows
        ruuid, rows = tmpl.emit(rec, fp)
        if not tmpl.verified:
            g_ruuid, g_rows = self._generic(rec, fp)
            if g_ruuid != ruuid or g_rows != rows:
                tmpl.dead = True
                return fp, g_ruuid, g_rows
            tmpl.verified = True
        return fp, ruuid, rows
