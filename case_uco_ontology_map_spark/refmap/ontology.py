"""Offline ontology-dictionary compile: TTL files → broadcast JSON dimension.

The reference loads 16 TTL ontologies into an rdflib.Graph at runtime and
derives flat caches (/root/reference/case_uco.py:34-157) plus per-class SHACL
property shapes (case_uco.py:253-276,360-385) and the superclass closure
(case_uco.py:167-194). At Spark scale this is a *static dimension*, not data
(SURVEY.md §1.2): we compile it ONCE here — with a dependency-free Turtle
subset parser sufficient for the UCO/CASE serialization style — into a JSON
dict of a few MB that ships to executors as a broadcast variable. No joins
against it ever happen at scale; all lookups are map-side.

Parser scope (deliberate): @prefix, prefixed-name subjects, `a` type lists,
rdfs:subClassOf, rdfs:label/comment, sh:targetClass, and sh:property bracket
blocks with sh:path/sh:datatype/sh:class/sh:minCount/sh:maxCount/sh:nodeKind.
That covers every fact the reference's caches contain.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache
from typing import Any, Dict, Iterator, List, Optional, Tuple

DEFAULT_TTL_DIR = "/root/reference/ttl"
_RESOURCE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")
DEFAULT_DICTIONARY_PATH = os.path.join(_RESOURCE_DIR, "ontology_dictionary.json")

# Hardcoded common inherited property set (case_uco.py:429-448).
COMMON_INHERITED_PROPERTIES = [
    "createdBy",
    "description",
    "hasFacet",
    "name",
    "tag",
    "externalReference",
]

_PREFIX_RE = re.compile(r"@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]+)>\s*\.")


def _split_statements(text: str) -> Iterator[str]:
    """Split Turtle text into top-level statements (terminated by '.' at
    bracket/quote depth 0). Handles [], "", \"\"\" blocks, comments."""
    buf: List[str] = []
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "#":
            # comment to end of line (we never hit '#' inside an IRI here
            # because IRIs are consumed atomically below)
            j = text.find("\n", i)
            i = n if j == -1 else j
            continue
        if ch == "<":
            j = text.find(">", i)
            j = n - 1 if j == -1 else j
            buf.append(text[i : j + 1])
            i = j + 1
            continue
        if text.startswith('"""', i) or text.startswith("'''", i):
            q = text[i : i + 3]
            j = text.find(q, i + 3)
            j = n - 3 if j == -1 else j
            buf.append(text[i : j + 3])
            i = j + 3
            continue
        if ch in "\"'":
            j = i + 1
            while j < n and text[j] != ch:
                if text[j] == "\\":
                    j += 1
                j += 1
            buf.append(text[i : j + 1])
            i = j + 1
            continue
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif ch == "." and depth == 0:
            prev = buf[-1] if buf else ""
            # '.' terminates a statement only when not inside a number/name
            if not prev or prev[-1].isspace() or prev[-1] in ";]":
                stmt = "".join(buf).strip()
                if stmt:
                    yield stmt
                buf = []
                i += 1
                continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        yield tail


def _top_level_blocks(stmt: str) -> List[str]:
    """Extract top-level [...] blocks (sh:property shapes) from a statement."""
    blocks = []
    depth = 0
    start = -1
    for i, ch in enumerate(stmt):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                blocks.append(stmt[start + 1 : i])
                start = -1
    return blocks


def _local_name(curie_or_iri: str) -> str:
    """URI split on '#' else '/'; CURIE split on ':' (case_uco.py:159-165)."""
    s = curie_or_iri.strip("<>")
    if s.startswith("http"):
        if "#" in s:
            return s.rsplit("#", 1)[-1]
        return s.rsplit("/", 1)[-1]
    if ":" in s:
        return s.rsplit(":", 1)[-1]
    return s


def _find_objects(stmt: str, predicate: str) -> List[str]:
    """All prefixed-name / IRI objects of ``predicate`` in a statement
    (comma lists supported)."""
    out: List[str] = []
    for m in re.finditer(
        re.escape(predicate) + r"\s+((?:[<\w][^;\]]*?))\s*(?:;|$)",
        stmt,
        re.DOTALL,
    ):
        chunk = m.group(1)
        for part in chunk.split(","):
            part = part.strip().rstrip(";").strip()
            if part:
                out.append(part)
    return out


def _first_int(stmt: str, predicate: str) -> Optional[int]:
    m = re.search(re.escape(predicate) + r'\s+"?(\d+)"?', stmt)
    return int(m.group(1)) if m else None


def compile_dictionary(ttl_dir: str = DEFAULT_TTL_DIR) -> Dict[str, Any]:
    """Parse every .ttl under ttl_dir into the flat lookup dictionary:

    {classes: {local: {uri, name, label, superclasses[]}},
     properties: {local: {uri, name, type}},
     shapes: {classLocal: {propLocal: {datatype, maxCount, minCount,
                                       isObjectProp, nodeKind}}},
     facets: [classLocal ...]   # transitive subclasses of core:Facet
     common_inherited: [...]}
    """
    classes: Dict[str, Dict[str, Any]] = {}
    properties: Dict[str, Dict[str, Any]] = {}
    shapes: Dict[str, Dict[str, Dict[str, Any]]] = {}
    subclass_of: Dict[str, List[str]] = {}
    # named *-in-shape PropertyShapes (sh:in vocabulary constraints, e.g.
    # observable:AccountFacet-accountType-in-shape) and the classes whose
    # NodeShape references them — attached to `shapes` after all files
    # parse, since the in-shape definition follows its referencing class
    in_shapes: Dict[str, Dict[str, Any]] = {}
    class_in_refs: Dict[str, List[str]] = {}

    for fname in sorted(os.listdir(ttl_dir)):
        if not fname.endswith(".ttl"):
            continue
        with open(os.path.join(ttl_dir, fname), encoding="utf-8") as fh:
            text = fh.read()
        prefixes = dict(_PREFIX_RE.findall(text))

        def expand(name: str) -> str:
            if name.startswith("<"):
                return name.strip("<>")
            if ":" in name:
                pfx, local = name.split(":", 1)
                base = prefixes.get(pfx)
                if base:
                    return base + local
            return name

        for stmt in _split_statements(text):
            head = stmt.split(None, 1)
            if not head:
                continue
            subject = head[0]
            if subject.startswith("@") or subject.startswith("PREFIX"):
                continue
            local = _local_name(subject)
            type_m = re.search(r"(?:^|[;\s])a\s+((?:[^;]|\n)*?)(?:;|$)", stmt)
            types = type_m.group(1) if type_m else ""

            comment_m = re.search(
                r'rdfs:comment\s+(?:"""(.*?)"""|"((?:[^"\\]|\\.)*)")',
                stmt,
                re.DOTALL,
            )
            comment = (
                (comment_m.group(1) or comment_m.group(2)).strip()
                if comment_m
                else None
            )

            if "owl:Class" in types:
                entry = classes.setdefault(
                    local, {"uri": expand(subject), "name": local}
                )
                label_m = re.search(r'rdfs:label\s+"([^"]*)"', stmt)
                if label_m:
                    entry["label"] = label_m.group(1)
                if comment:
                    entry["description"] = comment
                supers = [
                    _local_name(o)
                    for o in _find_objects(stmt, "rdfs:subClassOf")
                    if not o.startswith("[")
                ]
                if supers:
                    subclass_of.setdefault(local, []).extend(
                        s for s in supers if s not in subclass_of.get(local, [])
                    )

            if "owl:ObjectProperty" in types or "owl:DatatypeProperty" in types:
                ptype = (
                    "ObjectProperty"
                    if "owl:ObjectProperty" in types
                    else "DatatypeProperty"
                )
                properties[local] = {
                    "uri": expand(subject),
                    "name": local,
                    "type": ptype,
                }
                if comment:
                    properties[local]["description"] = comment

            # named sh:in vocabulary PropertyShape (severity-tagged open
            # vocabularies — case_utils flags these as Info/Warning).
            # Detection is by CONTENT (standalone shape carrying sh:in),
            # not by name: UCO uses both `...-in-shape` and
            # `...-shape-value-not-vocabulary-member` naming, and gating
            # on a suffix silently skipped the latter. Deactivated shapes
            # are ignored like pySHACL ignores them.
            if (
                "sh:in" in stmt
                and "sh:targetClass" not in stmt
                # pySHACL parity: only sh:deactivated TRUE disables a
                # shape (a value-insensitive substring test would also
                # skip explicitly-active shapes or mere mentions)
                and not re.search(r'sh:deactivated\s+"?true', stmt)
            ):
                in_m = re.search(r"sh:in\s*\(([^)]*)\)", stmt, re.DOTALL)
                path_m = re.search(r"sh:path\s+(\S+)", stmt)
                sev_m = re.search(r"sh:severity\s+sh:(\w+)", stmt)
                if in_m and path_m:
                    in_shapes[local] = {
                        "prop": _local_name(path_m.group(1).rstrip(";")),
                        "values": re.findall(r'"((?:[^"\\]|\\.)*)"', in_m.group(1)),
                        "severity": sev_m.group(1) if sev_m else "Violation",
                    }

            # SHACL shape: property blocks against the target class
            target_m = re.search(r"sh:targetClass\s+(\S+)", stmt)
            if target_m and "sh:property" in stmt:
                target_local = _local_name(target_m.group(1).rstrip(";"))
                shape = shapes.setdefault(target_local, {})
                # every prefixed name in the class statement OUTSIDE quoted
                # literals is a candidate reference to a named vocabulary
                # shape (rdfs:comment / sh:message text routinely mentions
                # shape names — scanning inside strings would graft a
                # vocabulary onto the wrong class); the attach loop below
                # keeps only names that actually compiled into in_shapes
                unquoted = re.sub(r'"(?:[^"\\]|\\.)*"', '""', stmt)
                for ref in re.findall(r"([A-Za-z][\w.\-]*:[\w.\-]+)", unquoted):
                    class_in_refs.setdefault(target_local, []).append(
                        _local_name(ref)
                    )
                for block in _top_level_blocks(stmt):
                    path_m = re.search(r"sh:path\s+(\S+)", block)
                    if not path_m:
                        continue
                    prop_local = _local_name(path_m.group(1).rstrip(";"))
                    dt_m = re.search(r"sh:datatype\s+(\S+)", block)
                    cls_m = re.search(r"sh:class\s+(\S+)", block)
                    nk_m = re.search(r"sh:nodeKind\s+sh:(\w+)", block)
                    # sh:hasValue — required-member constraint: a quoted
                    # literal (optionally ^^typed; we keep the lexical
                    # form, matching the emitted obj column) or an IRI
                    # term kept as its CURIE (e.g. rdf:nil). Only
                    # top-level property blocks reach here; sh:or-nested
                    # hasValue alternatives stay out of scope (COVERAGE.md)
                    hv_m = re.search(
                        r'sh:hasValue\s+(?:"((?:[^"\\]|\\.)*)"(?:\^\^\S+)?'
                        r"|([^\s;\]]+))",
                        block,
                    )
                    shape[prop_local] = {
                        "datatype": dt_m.group(1).rstrip(";") if dt_m else None,
                        "class": (
                            _local_name(cls_m.group(1).rstrip(";")) if cls_m else None
                        ),
                        "minCount": _first_int(block, "sh:minCount"),
                        "maxCount": _first_int(block, "sh:maxCount"),
                        "nodeKind": nk_m.group(1) if nk_m else None,
                        "isObjectProp": bool(cls_m) or (nk_m and nk_m.group(1) == "IRI"),
                        "hasValue": (
                            hv_m.group(1)
                            if hv_m and hv_m.group(1) is not None
                            else (hv_m.group(2) if hv_m else None)
                        ),
                    }
                    # inline anonymous sh:in (e.g. core:objectStatus's
                    # closed Draft/Final/Deprecated list — no sh:severity
                    # means a HARD Violation, unlike the named Info shapes)
                    in_m = re.search(r"sh:in\s*\(([^)]*)\)", block, re.DOTALL)
                    if in_m:
                        sev_m = re.search(r"sh:severity\s+sh:(\w+)", block)
                        shape[prop_local]["vocab"] = re.findall(
                            r'"((?:[^"\\]|\\.)*)"', in_m.group(1)
                        )
                        shape[prop_local]["vocabSeverity"] = (
                            sev_m.group(1) if sev_m else "Violation"
                        )

    # attach sh:in vocabularies to their referencing class shapes
    for cls, refs in class_in_refs.items():
        shape = shapes.setdefault(cls, {})
        for ref in refs:
            meta = in_shapes.get(ref)
            if not meta:
                continue
            slot = shape.setdefault(
                meta["prop"],
                {
                    "datatype": None, "class": None, "minCount": None,
                    "maxCount": None, "nodeKind": None, "isObjectProp": False,
                },
            )
            slot["vocab"] = meta["values"]
            slot["vocabSeverity"] = meta["severity"]

    # superclass transitive closure (case_uco.py:167-194) — iterative walk
    closure: Dict[str, List[str]] = {}

    def walk(cls: str, seen: Tuple[str, ...] = ()) -> List[str]:
        if cls in closure:
            return closure[cls]
        result: List[str] = []
        for parent in subclass_of.get(cls, []):
            if parent in seen:
                continue
            if parent not in result:
                result.append(parent)
            for anc in walk(parent, seen + (cls,)):
                if anc not in result:
                    result.append(anc)
        closure[cls] = result
        return result

    for cls in list(classes):
        classes[cls]["superclasses"] = walk(cls)

    # semantic property ownership (case_uco.py:451-466): a property whose
    # rdfs:comment mentions the class name belongs to the class's research
    # report unless the class (or an ancestor, or their facets) already
    # owns it via a SHACL shape or it's a common-inherited property
    common = set(COMMON_INHERITED_PROPERTIES)
    for cls, meta in classes.items():
        owners = [cls, f"{cls}Facet"]
        for anc in meta.get("superclasses", []):
            owners.extend((anc, f"{anc}Facet"))
        owned = set(common)
        for o in owners:
            owned.update(shapes.get(o, {}))
        cl = cls.lower()
        sem = sorted(
            p
            for p, pmeta in properties.items()
            if p not in owned and cl in (pmeta.get("description") or "").lower()
        )
        if sem:
            meta["semantic_properties"] = sem

    facets = sorted(
        cls
        for cls, meta in classes.items()
        if "Facet" in ([cls] + meta.get("superclasses", []))
        and cls != "Facet"
        and ("Facet" in meta.get("superclasses", []))
    )

    return {
        "classes": classes,
        "properties": properties,
        "shapes": shapes,
        "facets": facets,
        "common_inherited": COMMON_INHERITED_PROPERTIES,
    }


def write_dictionary(
    out_path: str = DEFAULT_DICTIONARY_PATH, ttl_dir: str = DEFAULT_TTL_DIR
) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    dictionary = compile_dictionary(ttl_dir)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(dictionary, fh, sort_keys=True)
    return out_path


@lru_cache(maxsize=1)
def load_dictionary(path: Optional[str] = None) -> Dict[str, Any]:
    """Load the compiled dictionary. Default path goes through
    importlib.resources so it also works when the package ships as a
    spark-submit --py-files zip (plain open() cannot read into a zip)."""
    if path is not None:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    try:
        from importlib.resources import files

        text = (
            files("case_uco_ontology_map_spark.resources")
            .joinpath("ontology_dictionary.json")
            .read_text(encoding="utf-8")
        )
        return json.loads(text)
    except Exception:
        with open(DEFAULT_DICTIONARY_PATH, encoding="utf-8") as fh:
            return json.load(fh)


def ontology_map_for_classes(
    dictionary: Dict[str, Any],
    class_names: List[str],
    include_semantic: bool = False,
) -> Dict[str, Any]:
    """Build a reference-shaped ontology map ({classes, facets, properties})
    for a set of target classes from the compiled dictionary — the
    deterministic replacement for the LLM research/synthesis stages.

    ``include_semantic=True`` additionally assigns the class's SEMANTIC
    properties (comment-mentions-class ownership, case_uco.py:451-466) to
    the class owner, reproducing reference research reports that rely on
    them. Off by default: it widens the alias map and therefore field
    matching, which is a behavior change existing maps must opt into."""
    classes: List[str] = []
    facets: List[str] = []
    properties: Dict[str, List[str]] = {}
    shapes = dictionary.get("shapes", {})
    dict_classes = dictionary.get("classes", {})
    facet_set = set(dictionary.get("facets", []))
    for name in class_names:
        if name.endswith("Facet") or name in facet_set:
            if name not in facets:
                facets.append(name)
        else:
            if name not in classes:
                classes.append(name)
            facet_name = f"{name}Facet"
            if facet_name in shapes and facet_name not in facets:
                facets.append(facet_name)
        for owner in ([name] if name.endswith("Facet") else [name, f"{name}Facet"]):
            shape = shapes.get(owner)
            if shape:
                properties[owner] = sorted(shape.keys())
        if include_semantic:
            sem = (dict_classes.get(name) or {}).get("semantic_properties")
            if sem:
                merged = set(properties.get(name, [])) | set(sem)
                properties[name] = sorted(merged)
    return {
        "artifacts": [],
        "classes": classes,
        "facets": facets,
        "properties": properties,
        "relationships": [],
        "analysis": "",
        "additional_details": {},
    }
