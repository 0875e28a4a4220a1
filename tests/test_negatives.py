"""Negative sampling for KG-embedding training: determinism, pool
membership, accidental-positive filtering, IRI gating."""

import pytest

from case_uco_ontology_map_spark.operators.negatives import negative_samples

TRIPLES = [
    ("e1", "likes", "e2", True),
    ("e2", "likes", "e3", True),
    ("e3", "likes", "e1", True),
    ("e1", "knows", "e4", True),
    ("e4", "name", "Bob", False),
    # a subject that ONLY appears in literal-object triples — still an
    # entity, must be drawable as a corruption (pool is built from the
    # unfiltered subject side)
    ("e0", "name", "Ann", False),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_iri boolean"
    )


def test_structural_properties(spark, triples):
    out = negative_samples(
        triples, k=3, buckets=8, salt="s", obj_is_iri_col="obj_is_iri"
    ).collect()
    true_edges = {(s, p, o) for s, p, o, iri in TRIPLES if iri}
    pool = {s for s, p, o, iri in TRIPLES} | {
        o for s, p, o, iri in TRIPLES if iri
    }
    assert out, "draw chain produced no negatives at all"
    per_triple = {}
    for r in out:
        # corrupted object is a real entity, not the original, and the
        # corrupted triple is not a true edge
        assert r.neg_obj in pool
        assert r.neg_obj != r.obj
        assert (r.subj, r.pred, r.neg_obj) not in true_edges
        assert 1 <= r.i <= 3
        per_triple.setdefault((r.subj, r.pred, r.obj), set()).add(r.i)
    # at most k negatives per positive, keyed by distinct draw index
    assert all(len(v) <= 3 for v in per_triple.values())
    # the literal-object rows were never corrupted
    assert ("e4", "name", "Bob") not in per_triple
    assert ("e0", "name", "Ann") not in per_triple


def test_deterministic_and_salt_sensitive(spark, triples):
    a = set(map(tuple, negative_samples(
        triples, k=2, buckets=8, salt="x", obj_is_iri_col="obj_is_iri"
    ).collect()))
    b = set(map(tuple, negative_samples(
        triples, k=2, buckets=8, salt="x", obj_is_iri_col="obj_is_iri"
    ).collect()))
    assert a == b  # bit-identical re-materialization
    c = set(map(tuple, negative_samples(
        triples, k=2, buckets=8, salt="y", obj_is_iri_col="obj_is_iri"
    ).collect()))
    assert a != c  # independent draw under a different salt


def test_md5_60_mode_and_guards(spark, triples):
    out = negative_samples(
        triples, k=1, buckets=4, hash_mode="md5_60",
        obj_is_iri_col="obj_is_iri",
    ).collect()
    for r in out:
        assert r.neg_obj != r.obj
    with pytest.raises(ValueError):
        negative_samples(triples, k=0)
    with pytest.raises(ValueError):
        negative_samples(triples, buckets=1)


def test_subject_corruption_mode(spark, triples):
    out = negative_samples(
        triples, k=2, buckets=8, salt="s", obj_is_iri_col="obj_is_iri",
        corrupt="subject",
    ).collect()
    true_edges = {(s, p, o) for s, p, o, iri in TRIPLES if iri}
    pool = {s for s, p, o, iri in TRIPLES} | {
        o for s, p, o, iri in TRIPLES if iri
    }
    assert out
    for r in out:
        assert r.neg_subj in pool
        assert r.neg_subj != r.subj
        assert (r.neg_subj, r.pred, r.obj) not in true_edges
    # subject draws are independent of object draws at the same salt:
    # the drawn nodes per (triple, i) differ somewhere
    objs = {
        (r.subj, r.pred, r.obj, r.i): r.neg_obj
        for r in negative_samples(
            triples, k=2, buckets=8, salt="s",
            obj_is_iri_col="obj_is_iri",
        ).collect()
    }
    subjs = {
        (r.subj, r.pred, r.obj, r.i): r.neg_subj for r in out
    }
    common = set(objs) & set(subjs)
    assert any(objs[k] != subjs[k] for k in common)
    with pytest.raises(ValueError):
        negative_samples(triples, corrupt="both")

def test_literal_only_subject_is_drawable(spark):
    """An entity whose ONLY appearances are as subject of literal-object
    triples must be reachable as a corruption (the pool's subject side is
    built from the unfiltered frame)."""
    rows = [
        ("b", "p", "c", True),
        ("aaa", "name", "x", False),  # literal-only subject
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    out = negative_samples(
        df, k=8, buckets=2, salt="s", obj_is_iri_col="obj_is_iri"
    ).collect()
    drawn = {r.neg_obj for r in out}
    assert "aaa" in drawn, drawn
