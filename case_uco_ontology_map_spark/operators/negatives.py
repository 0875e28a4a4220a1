"""Negative sampling for KG-embedding training data.

A TransE/DistMult-style trainer consumes (positive triple, k corrupted
triples) pairs; at web scale the corruption draw must be deterministic
(re-materializable bit-identically for ablations, like every sampler in
this repo — see operators/sampling.py) and distributed (no RNG state, no
driver-side entity list). (No reference counterpart: the reference stops
at graph emission; this is the downstream-training surface the 100 TB
corpus exists to feed.)

Mechanism — hash-ring draw over a bucketed entity pool:
  * the ENTITY POOL (distinct subjects + IRI objects) is bucketed by
    ``pmod(hash(node), buckets)`` and reduced to one representative per
    bucket (min node) — a ≤``buckets``-row frame that BROADCASTS;
  * each (triple, i) probes bucket ``pmod(hash(subj‖pred‖obj‖i‖salt),
    buckets)``; empty buckets fall through to the next bucket and then
    to the global min node (a lazy 1-row broadcast, no driver action);
  * accidental positives are removed by an anti-join against the true
    edge set, and draws equal to the original object are dropped.

Every step is a JVM expression, a broadcast join, or one anti-join on
(subj, pred, neg_obj) — the only full shuffle in the plan. The md5_60
hash mode replays bit-exactly in DuckDB (the contract oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import content_hash64


def negative_samples(
    triples: DataFrame,
    k: int = 1,
    buckets: int = 4096,
    salt: str = "",
    hash_mode: str = "xxhash64",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    obj_is_iri_col: "str | None" = None,
    corrupt: str = "object",
) -> DataFrame:
    """→ ``(subj, pred, obj, i, neg_obj)`` (or ``neg_subj`` with
    ``corrupt="subject"``): ``k`` deterministic corruptions per input
    triple, filtered against the true edge set (no accidental
    positives, never the original term). Rows whose draw chain lands
    back on the original term are dropped, so a triple can yield < k
    negatives — the trainer's usual contract. TransE-style training
    corrupts both sides: call once per mode (the subject mode folds a
    marker into the salt, so its draws are independent of the object
    mode's at the same salt).

    When ``obj_is_iri_col`` is given, only IRI-object rows are corrupted
    and only IRI objects join the entity pool (literals are not
    entities)."""
    if corrupt not in ("object", "subject"):
        raise ValueError(f"corrupt must be object|subject, got {corrupt!r}")
    if k < 1:
        raise ValueError("k must be >= 1")
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    t = triples.select(subj_col, pred_col, obj_col, *(
        [obj_is_iri_col] if obj_is_iri_col else []
    ))
    # subjects are entities regardless of their objects' kind — pool the
    # subject side from the UNFILTERED frame so an entity appearing only
    # in literal-object triples can still be drawn as a corruption; only
    # the object side of the pool is IRI-gated
    all_subjects = t.select(F.col(subj_col).alias("node"))
    if obj_is_iri_col:
        t = t.filter(F.col(obj_is_iri_col)).drop(obj_is_iri_col)
    t = t.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    pool = (
        all_subjects
        .unionByName(t.select(F.col("obj").alias("node")))
        .distinct()
    )
    rep = pool.groupBy(
        F.pmod(content_hash64(F.col("node"), hash_mode), F.lit(buckets))
        .alias("bucket")
    ).agg(F.min("node").alias("rep"))
    gmin = pool.agg(F.min("node").alias("gmin"))

    eff_salt = salt if corrupt == "object" else salt + "\x1fsubj"
    probes = t.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("i"),
    ).withColumn(
        "_p",
        F.pmod(
            content_hash64(
                F.concat_ws(
                    "\x1f", "subj", "pred", "obj",
                    F.col("i").cast("string"), F.lit(eff_salt),
                ),
                hash_mode,
            ),
            F.lit(buckets),
        ),
    )
    r1 = F.broadcast(rep.select(F.col("bucket").alias("_p"), F.col("rep").alias("_r1")))
    r2 = F.broadcast(rep.select(F.col("bucket").alias("_p2"), F.col("rep").alias("_r2")))
    neg_col = "neg_obj" if corrupt == "object" else "neg_subj"
    orig_col = "obj" if corrupt == "object" else "subj"
    drawn = (
        probes.join(r1, on="_p", how="left")
        .withColumn("_p2", F.pmod(F.col("_p") + 1, F.lit(buckets)))
        .join(r2, on="_p2", how="left")
        .crossJoin(F.broadcast(gmin))
        .select(
            "subj", "pred", "obj", "i",
            F.coalesce("_r1", "_r2", "gmin").alias(neg_col),
        )
        .filter(F.col(neg_col) != F.col(orig_col))
    )
    if corrupt == "object":
        true_side = t.select(
            F.col("subj"), F.col("pred"), F.col("obj").alias("neg_obj")
        )
        keys = ["subj", "pred", "neg_obj"]
    else:
        true_side = t.select(
            F.col("subj").alias("neg_subj"), F.col("pred"), F.col("obj")
        )
        keys = ["neg_subj", "pred", "obj"]
    return drawn.join(true_side, on=keys, how="left_anti")
