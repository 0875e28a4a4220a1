"""The driver-side ontology-closure fast path in rdfs_infer_types
(optimization r6) must be pair-for-pair identical to the distributed
semi-naive closure it replaced — on trees, diamonds, cycles, disconnected
pieces, and under every max_hops bound — and the >cap fallback must still
route through the distributed loop.
"""

import pytest

from case_uco_ontology_map_spark.operators import triples as T
from case_uco_ontology_map_spark.operators.graphquery import transitive_closure


def _py(edges, max_hops=None):
    return set(T._py_transitive_closure(edges, max_hops))


def _dist(spark, edges, max_hops=None):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        (r["src"], r["dst"])
        for r in transitive_closure(df, max_hops=max_hops).collect()
    }


GRAPHS = {
    "chain": [("a", "b"), ("b", "c"), ("c", "d")],
    "diamond": [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
    "cycle": [("a", "b"), ("b", "c"), ("c", "a")],
    "self_loop": [("a", "a"), ("a", "b")],
    "disconnected": [("a", "b"), ("x", "y"), ("y", "z")],
    "dup_edges": [("a", "b"), ("a", "b"), ("b", "c")],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("max_hops", [None, 1, 2, 3, 16])
def test_py_closure_matches_distributed(spark, name, max_hops):
    edges = GRAPHS[name]
    assert _py(edges, max_hops) == _dist(spark, edges, max_hops)


def test_py_closure_randomized_against_distributed(spark):
    import random

    rng = random.Random(1291)
    nodes = [f"n{i}" for i in range(12)]
    edges = sorted(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)}
    )
    for mh in (None, 2, 5):
        assert _py(edges, mh) == _dist(spark, edges, mh)


def test_rdfs_infer_types_fastpath_equals_fallback(spark, monkeypatch):
    """Same output whether the ontology closure runs driver-side (the
    default broadcast path) or through the distributed loop (cap forced
    to 0 so the fast path cannot engage)."""
    from pyspark.sql import functions as F

    sc_edges = spark.createDataFrame(
        [("B", "A"), ("C", "B"), ("D", "C"), ("E", "A"), ("A", "E")],
        "sub string, sup string",
    )
    t = spark.createDataFrame(
        [
            ("x1", "rdf:type", "D", True, None),
            ("x2", "rdf:type", "C", True, None),
            ("x3", "other", "D", True, None),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string",
    )

    def rows(df):
        return sorted(
            (r.subj, r.pred, r.obj, r.obj_is_iri, r.obj_datatype)
            for r in df.collect()
        )

    fast = rows(T.rdfs_infer_types(t, sc_edges))
    monkeypatch.setattr(T, "_ONTOLOGY_CLOSURE_MAX", 0)
    slow = rows(T.rdfs_infer_types(t, sc_edges))
    assert fast == slow
    # and the closure actually inferred through the cycle + chain
    assert ("x1", "rdf:type", "A", True, None) in fast
