"""Batched mention detection + gazetteer/embedding entity-link scoring.

The deterministic replacement for the reference's LLM ontology-research
stage (SURVEY.md §2.9 row 1; BASELINE.json north_star: "batched mention
detection and gazetteer/embedding entity-link scoring ... via a broadcast
ontology-schema dictionary").

Design:
  gazetteer         compiled once from the ontology dictionary (class local
                    names + labels, lowercased; multi-word supported) —
                    broadcast to executors, a few hundred entries.
  detect_mentions   ONE pandas-UDF pass per document batch: tokenize,
                    scan with the broadcast surface→class dict (longest-
                    match-first for multi-word), emit (url, surface, class,
                    count). Narrow stage, zero shuffles.
  link_mentions     score each mention against per-class embedding
                    centroids (broadcast k×d matrix) with numpy batch
                    cosine — argmax class per mention + margin. The
                    deterministic mention embedding is a hashed
                    bag-of-character-trigrams projection (no external
                    model; pinned + reproducible).
  mention_triples   mentions → CASE/UCO triples: per (record, class) an
                    ObservableObject node typed by the linked class plus an
                    ObservableRelationship("references") from the page
                    object — identity minted with the same uuid5 chain
                    (kb:<slug>-uuid5(NS_SLOT, record_uuid:mention:<slug>)).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..refmap.identity import iri_for, slot_uuid_for, slugify
from ..refmap.ontology import load_dictionary

MENTION_SCHEMA = "url string, record_uuid string, surface string, entity_class string, n_mentions int"


def build_gazetteer(
    dictionary: Optional[Dict[str, Any]] = None,
    min_len: int = 3,
    extra: Optional[Dict[str, str]] = None,
) -> Dict[str, str]:
    """surface (lowercase) → class local name, from dictionary class names
    split on camelCase (e.g. 'DomainName' → 'domain name') plus the raw
    lowercased local name. Deterministic; a few hundred entries."""
    dictionary = dictionary or load_dictionary()
    gaz: Dict[str, str] = {}
    for local in sorted(dictionary.get("classes", {})):
        if local.endswith("Facet"):
            continue
        spaced = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", local).lower()
        for surface in {local.lower(), spaced}:
            if len(surface) >= min_len:
                # first (alphabetically smallest class) wins on collision —
                # deterministic tie-break
                gaz.setdefault(surface, local)
    if extra:
        for k, v in extra.items():
            gaz[k.lower()] = v
    return gaz


def detect_mentions(
    docs: DataFrame,
    gazetteer: Optional[Dict[str, str]] = None,
    text_col: str = "text",
    url_col: str = "url",
    record_uuid_col: Optional[str] = None,
) -> DataFrame:
    """Batched gazetteer scan → (url, record_uuid, surface, entity_class,
    n_mentions). Multi-word surfaces matched longest-first on the token
    stream. One narrow mapInPandas stage."""
    spark = docs.sparkSession
    gaz = gazetteer or build_gazetteer()
    max_words = max(len(s.split()) for s in gaz) if gaz else 1
    # prefix index: first token → longest window worth trying. Most tokens
    # start no multi-word surface, so the scan is one dict probe per token.
    multi_prefix: Dict[str, int] = {}
    for s in gaz:
        words = s.split()
        if len(words) > 1:
            multi_prefix[words[0]] = max(multi_prefix.get(words[0], 0), len(words))
    bc = spark.sparkContext.broadcast((gaz, multi_prefix))
    has_uuid = record_uuid_col is not None
    cols = [url_col, text_col] + ([record_uuid_col] if has_uuid else [])
    src = docs.select(*cols)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gazd, prefixes = bc.value
        gaz_get = gazd.get
        pfx_get = prefixes.get
        for pdf in batches:
            out_rows: List[tuple] = []
            uuids = pdf[record_uuid_col] if has_uuid else [None] * len(pdf)
            for url, text, ruuid in zip(pdf[url_col], pdf[text_col], uuids):
                if not text:
                    continue
                toks = text.lower().split()
                counts: Dict[Tuple[str, str], int] = {}
                i = 0
                n = len(toks)
                while i < n:
                    tok = toks[i]
                    matched = 0
                    pw = pfx_get(tok)
                    if pw:  # longest multi-word window first
                        for w in range(min(pw, n - i), 1, -1):
                            surface = " ".join(toks[i : i + w])
                            cls = gaz_get(surface)
                            if cls is not None:
                                key = (surface, cls)
                                counts[key] = counts.get(key, 0) + 1
                                matched = w
                                break
                    if not matched:
                        cls = gaz_get(tok)
                        if cls is not None:
                            key = (tok, cls)
                            counts[key] = counts.get(key, 0) + 1
                            matched = 1
                    i += matched if matched else 1
                for (surface, cls), c in sorted(counts.items()):
                    out_rows.append((url, ruuid, surface, cls, c))
            yield pd.DataFrame(
                out_rows,
                columns=["url", "record_uuid", "surface", "entity_class", "n_mentions"],
            )

    return src.mapInPandas(kernel, schema=MENTION_SCHEMA)


def _trigram_embed(surface: str, dim: int) -> np.ndarray:
    """Pinned deterministic mention embedding: hashed bag of character
    trigrams, L2-normalized. No external model; same function everywhere."""
    v = np.zeros(dim, dtype=np.float64)
    s = f"^{surface}$"
    for i in range(len(s) - 2):
        v[hash_stable(s[i : i + 3]) % dim] += 1.0
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


def hash_stable(s: str) -> int:
    """Deterministic 64-bit FNV-1a (Python hash() is salted per process —
    never use it in a distributed kernel)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def class_centroids(
    embeddings: DataFrame,
    classes: List[str],
    vec_col: str = "embedding",
    label_col: str = "label",
) -> Dict[str, List[float]]:
    """Per-class embedding centroid from a labeled embedding table: class i
    (sorted order) ↔ label i mod #labels. ONE groupBy(label) avg — the only
    shuffle in the linking path; result is driver-side k×d, broadcast."""
    rows = (
        embeddings.select(label_col, F.posexplode(vec_col).alias("dim", "v"))
        .groupBy(label_col, "dim")
        .agg(F.avg("v").alias("m"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .collect()
    )
    by_label = {r[label_col]: [float(p["m"]) for p in r["dm"]] for r in rows}
    labels = sorted(by_label)
    out = {}
    for i, cls in enumerate(sorted(classes)):
        out[cls] = by_label[labels[i % len(labels)]]
    return out


def link_mentions(
    mentions: DataFrame,
    centroids: Dict[str, List[float]],
) -> DataFrame:
    """Embedding-score each mention surface against the class centroids;
    emit gazetteer class, best embedding class, cosine score and margin.
    Vectorized numpy matmul per Arrow batch; centroids ride a broadcast."""
    spark = mentions.sparkSession
    classes = sorted(centroids)
    mat = np.array([centroids[c] for c in classes], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((classes, mat))
    dim = mat.shape[1]

    out_schema = MENTION_SCHEMA + ", linked_class string, link_score double, link_margin double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cls_list, m = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(
                    linked_class=pd.Series(dtype=str),
                    link_score=pd.Series(dtype=float),
                    link_margin=pd.Series(dtype=float),
                )
                continue
            vecs = np.stack(
                [_trigram_embed(s, dim) for s in pdf["surface"]]
            )  # (n, d)
            scores = vecs @ m.T  # (n, k)
            best_idx = scores.argmax(axis=1)
            best = scores[np.arange(len(pdf)), best_idx]
            scores[np.arange(len(pdf)), best_idx] = -np.inf
            second = scores.max(axis=1)
            yield pdf.assign(
                linked_class=[cls_list[i] for i in best_idx],
                link_score=np.round(best, 6),
                link_margin=np.round(best - np.where(np.isfinite(second), second, 0.0), 6),
            )

    return mentions.mapInPandas(kernel, schema=out_schema)


def mention_triples(mentions: DataFrame) -> DataFrame:
    """Linked mentions → triples: a typed entity node per (record, class)
    and an ObservableRelationship from the page record's primary node.
    Same uuid5 identity chain as the planner; narrow mapInPandas stage."""
    out_schema = (
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, record_uuid string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: List[tuple] = []
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.record_uuid is None:
                    continue
                cls = r.entity_class
                slug = slugify(cls)
                ent_uuid = slot_uuid_for(r.record_uuid, f"mention:{slug}")
                ent_id = f"kb:{slug}-{ent_uuid}"
                rel_uuid = slot_uuid_for(r.record_uuid, f"relationship_references:{slug}")
                rel_id = f"kb:relationship_references-{rel_uuid}"
                page_uuid = slot_uuid_for(r.record_uuid, "url")
                page_id = f"kb:url-{page_uuid}"
                rows.extend(
                    [
                        (ent_id, "rdf:type", iri_for(cls), True, None, r.record_uuid),
                        (ent_id, "uco-core:name", r.surface, False, None, r.record_uuid),
                        (rel_id, "rdf:type", iri_for("ObservableRelationship"), True, None, r.record_uuid),
                        (rel_id, "uco-observable:source", page_id, True, None, r.record_uuid),
                        (rel_id, "uco-observable:target", ent_id, True, None, r.record_uuid),
                        (rel_id, "uco-core:kindOfRelationship", "references", False, None, r.record_uuid),
                        (rel_id, "drafting:mentionCount", str(int(r.n_mentions)), False, "xsd:integer", r.record_uuid),
                    ]
                )
            yield pd.DataFrame(
                rows,
                columns=["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "record_uuid"],
            )

    return mentions.mapInPandas(kernel, schema=out_schema)
