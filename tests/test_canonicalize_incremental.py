"""Incremental canonicalization: equivalence to a full recompute, untouched
pass-through, delta-only pair generation."""

import pytest
from pyspark.sql import functions as F

from case_uco_ontology_map_spark.operators.canonicalize import (
    canonicalize_entities,
    canonicalize_incremental,
    entity_minhash,
    incremental_candidate_edges,
)

# three exact-duplicate clusters + near-dup variants + unique singletons;
# ids chosen so the hash-split below puts members of the same cluster on
# BOTH sides of the prior/new divide (the interesting case)
KEYS = (
    [(i, "alpha-cluster-key") for i in range(0, 6)]
    + [(i, "beta-cluster-node") for i in range(10, 16)]
    + [(i, "gamma-zone-entry") for i in range(20, 26)]
    + [(30 + i, f"unique-entity-{i:03d}-{i * 7 % 97:02d}") for i in range(12)]
    + [(50, "alpha-cluster-kex"), (51, "beta-cluster-nodz")]
)


def _entities(spark, rows):
    return spark.createDataFrame(rows, "entity_id long, entity_key string")


def _split(df):
    prior = df.filter(F.pmod(F.col("entity_id"), F.lit(3)) != 0)
    new = df.filter(F.pmod(F.col("entity_id"), F.lit(3)) == 0)
    return prior, new


def _assignments(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def ents(spark):
    return _entities(spark, KEYS)


def test_incremental_equals_full(spark, ents):
    kw = dict(jaccard_threshold=0.5, max_bucket=10_000)
    prior_e, new_e = _split(ents)
    prior = canonicalize_entities(prior_e, **kw)
    incr = canonicalize_incremental(prior, new_e, **kw)
    full = canonicalize_entities(ents, **kw)
    assert _assignments(incr) == _assignments(full)
    # sanity: the full run actually merges clusters (non-trivial case)
    n_canon = full.select("canonical_id").distinct().count()
    assert n_canon < ents.count()


def test_untouched_prior_rows_pass_through(spark, ents):
    kw = dict(jaccard_threshold=0.5, max_bucket=10_000)
    prior_e, _ = _split(ents)
    prior = canonicalize_entities(prior_e, **kw)
    # a new batch entirely dissimilar from everything prior
    new_e = _entities(
        spark, [(900, "zzz-totally-unrelated-qqq"), (901, "yyy-other-www")]
    )
    incr = canonicalize_incremental(prior, new_e, **kw)
    got_prior = {
        (r.entity_id, r.canonical_id)
        for r in incr.collect()
        if r.entity_id < 900
    }
    want_prior = {(r.entity_id, r.canonical_id) for r in prior.collect()}
    assert got_prior == want_prior
    # dissimilar new entities stay their own canonical
    news = {r.entity_id: r.canonical_id for r in incr.collect() if r.entity_id >= 900}
    assert news == {900: 900, 901: 901}


def test_bridge_merges_two_prior_components(spark):
    kw = dict(jaccard_threshold=0.5, max_bucket=10_000)
    base = _entities(
        spark,
        [(1, "alpha-cluster-key"), (2, "alpha-cluster-key"),
         (11, "beta-cluster-node"), (12, "beta-cluster-node")],
    )
    prior = canonicalize_entities(base, **kw)
    # alpha and beta are separate components before the bridge
    pc = {r.entity_id: r.canonical_id for r in prior.collect()}
    assert pc[1] == pc[2] and pc[11] == pc[12] and pc[1] != pc[11]
    # the bridge key overlaps both clusters above threshold
    bridge = _entities(spark, [(99, "alpha-cluster-node")])
    incr = canonicalize_incremental(prior, bridge, **kw)
    full = canonicalize_entities(
        base.unionByName(bridge), **kw
    )
    assert _assignments(incr) == _assignments(full)
    fc = {r.entity_id: r.canonical_id for r in full.collect()}
    if fc[1] == fc[11]:  # LSH found the bridge in the full run...
        ic = {r.entity_id: r.canonical_id for r in incr.collect()}
        # ...then the incremental run merged identically (min id = 1)
        assert ic[1] == ic[11] == ic[99] == 1


def test_incremental_candidates_touch_new_only(spark, ents):
    sigs = entity_minhash(ents)
    flagged = sigs.withColumn("_is_new", F.col("entity_id") >= 20)
    pairs = incremental_candidate_edges(flagged, max_bucket=10_000).collect()
    assert pairs  # the gamma cluster straddles nothing — ids ≥20 pair up
    for r in pairs:
        assert r.src >= 20 or r.dst >= 20, f"prior-prior pair leaked: {r}"


def test_disjoint_new_batch_all_singletons(spark):
    kw = dict(jaccard_threshold=0.5, max_bucket=10_000)
    prior_e = _entities(spark, [(1, "alpha-cluster-key"), (2, "alpha-cluster-key")])
    prior = canonicalize_entities(prior_e, **kw)
    new_e = _entities(spark, [(7, "first-fresh-key-aa"), (8, "other-novel-zz")])
    incr = canonicalize_incremental(prior, new_e, **kw)
    got = {r.entity_id: r.canonical_id for r in incr.collect()}
    assert got == {1: 1, 2: 1, 7: 7, 8: 8}
