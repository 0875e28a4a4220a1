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


def test_transe_ranks_hand_computed(spark):
    """2-dim integer embeddings worked by hand: h=(1,0), r=(0,1) →
    h+r=(1,1); true tail t=(1,1) at L1 distance 0 beats every
    corruption, so rank=1; a second triple whose true tail is FARTHER
    than its one corruption ranks 2. A strictly-equal corruption never
    demotes (ties keep the positive)."""
    from case_uco_ontology_map_spark.operators.negatives import (
        transe_ranks,
    )

    ents = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]), ("b", [1.0, 1.0]), ("c", [5.0, 5.0]),
            ("d", [0.0, 0.0]), ("e", [1.0, 1.0]),
        ],
        "id string, vec array<double>",
    )
    rels = spark.createDataFrame(
        [("p", [0.0, 1.0])], "pred string, vec array<double>"
    )
    negs = spark.createDataFrame(
        [
            # positive (a,p,b): dp=0; corruptions c (dist 8000) and
            # e (dist 0 — tie, must NOT demote)
            ("a", "p", "b", 1, "c"),
            ("a", "p", "b", 2, "e"),
            # positive (a,p,c): dp=8000; corruption d (dist 2000) beats it
            ("a", "p", "c", 1, "d"),
        ],
        "subj string, pred string, obj string, i int, neg_obj string",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_neg, r.rank)
        for r in transe_ranks(negs, ents, rels).collect()
    }
    assert got == {("a", "p", "b"): (2, 1), ("a", "p", "c"): (1, 2)}


def test_distmult_ranks_hand_computed_and_oracle(spark):
    """DistMult (model='distmult'): score = Σ hᵢ·rᵢ·tᵢ, LARGER wins.
    h=(1,2), r=(2,1) → h∘r=(2,2) (quantized ×1000 → (2e6, 2e6)):
    true tail b=(1,1) scores 2+2; corruption c=(3,0) scores 6 > 4 →
    demotes (rank 2); corruption d=(0,1) scores 2 < 4 → doesn't; an
    exactly-tied corruption e=(2,0) (score 4) must NOT demote. The
    DuckDB twin replays the product fold with the flipped comparison.
    Unknown model raises on both sides."""
    import duckdb
    import pandas as pd
    import pytest

    from case_uco_ontology_map_spark.operators.negatives import (
        transe_ranks,
        transe_ranks_sql,
    )

    ents_rows = [
        ("a", [1.0, 2.0]), ("b", [1.0, 1.0]), ("c", [3.0, 0.0]),
        ("d", [0.0, 1.0]), ("e", [2.0, 0.0]),
    ]
    rels_rows = [("p", [2.0, 1.0])]
    negs_rows = [
        ("a", "p", "b", 1, "c"),   # 6 > 4 → beats
        ("a", "p", "b", 2, "d"),   # 2 < 4 → doesn't
        ("a", "p", "b", 3, "e"),   # 4 = 4 → tie keeps positive
    ]
    ents = spark.createDataFrame(ents_rows, "id string, vec array<double>")
    rels = spark.createDataFrame(rels_rows, "pred string, vec array<double>")
    negs = spark.createDataFrame(
        negs_rows,
        "subj string, pred string, obj string, i int, neg_obj string",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_neg, r.rank)
        for r in transe_ranks(negs, ents, rels, model="distmult").collect()
    }
    assert got == {("a", "p", "b"): (3, 2)}
    con = duckdb.connect()
    con.register("e_src", pd.DataFrame(ents_rows, columns=["id", "vec"]))
    con.register("r_src", pd.DataFrame(rels_rows, columns=["pred", "vec"]))
    con.register("n_src", pd.DataFrame(
        negs_rows, columns=["subj", "pred", "obj", "i", "neg_obj"]
    ))
    want = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in con.execute(
            "WITH n AS (SELECT * FROM n_src), e AS (SELECT * FROM e_src), "
            f"r AS (SELECT * FROM r_src), "
            f"rk AS ({transe_ranks_sql(model='distmult')}) "
            "SELECT * FROM rk"
        ).fetchall()
    }
    assert got == want
    with pytest.raises(ValueError):
        transe_ranks(negs, ents, rels, model="complex")
    with pytest.raises(ValueError):
        transe_ranks_sql(model="complex")


def test_transe_eval_exact_rational_and_oracle(spark):
    import duckdb
    import pandas as pd

    from case_uco_ontology_map_spark.operators.negatives import (
        kg_embedding_eval,
        kg_embedding_eval_sql,
        transe_ranks,
        transe_ranks_sql,
    )

    ents = [(f"e{i}", [0.1 * i, 0.2 * i, -0.05 * i]) for i in range(12)]
    rels = [("p", [0.3, -0.1, 0.2]), ("q", [-0.7, 0.0, 0.15])]
    negs = [
        (f"e{i}", "p" if i % 2 == 0 else "q", f"e{(i * 3) % 12}",
         j, f"e{(i * 5 + j) % 12}")
        for i in range(12) for j in (1, 2, 3)
    ]
    e = spark.createDataFrame(ents, "id string, vec array<double>")
    r = spark.createDataFrame(rels, "pred string, vec array<double>")
    n = spark.createDataFrame(
        negs, "subj string, pred string, obj string, i int, neg_obj string"
    )
    ranks = transe_ranks(n, e, r)
    ev = kg_embedding_eval(ranks, max_rank=4).collect()[0]
    assert ev["n_over_max"] == 0
    assert ev["mrr_den"] == ev["n_triples"] * 12  # lcm(1..4) = 12
    con = duckdb.connect()
    con.register("n_src", pd.DataFrame(
        negs, columns=["subj", "pred", "obj", "i", "neg_obj"]))
    con.register("e_src", pd.DataFrame(ents, columns=["id", "vec"]))
    con.register("r_src", pd.DataFrame(rels, columns=["pred", "vec"]))
    want = con.execute(
        "WITH n AS (SELECT * FROM n_src), e AS (SELECT * FROM e_src), "
        "r AS (SELECT * FROM r_src), "
        f"rk AS ({transe_ranks_sql()}) "
        + kg_embedding_eval_sql(max_rank=4)
    ).fetchall()[0]
    got = (
        ev["n_triples"], ev["hits_1"], ev["hits_3"], ev["hits_10"],
        ev["mrr_num"], ev["mrr_den"], ev["n_over_max"],
    )
    assert got == want
    # per-triple ranks are also bit-exact
    got_r = {
        (x.subj, x.pred, x.obj): (x.n_neg, x.rank)
        for x in ranks.collect()
    }
    want_r = {
        (a, b, c): (d, e_)
        for a, b, c, d, e_ in con.execute(
            "WITH n AS (SELECT * FROM n_src), e AS (SELECT * FROM e_src), "
            f"r AS (SELECT * FROM r_src), rk AS ({transe_ranks_sql()}) "
            "SELECT * FROM rk"
        ).fetchall()
    }
    assert got_r == want_r
