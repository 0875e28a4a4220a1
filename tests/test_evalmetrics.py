"""Pairwise clustering metrics: hand-computed contingency, edge cases."""

import pytest

from case_uco_ontology_map_spark.operators.evalmetrics import (
    cluster_pair_metrics,
)


def _asg(spark, rows):
    return spark.createDataFrame(rows, "id long, cluster string")


def test_hand_computed(spark):
    gold = _asg(spark, [(1, "g1"), (2, "g1"), (3, "g1"), (4, "g2"), (5, "g2")])
    pred = _asg(spark, [(1, "p1"), (2, "p1"), (3, "p2"), (4, "p2"), (5, "p3")])
    r = cluster_pair_metrics(pred, gold).collect()[0]
    # TP: (1,2). pred pairs: (1,2),(3,4) → FP=1. gold pairs: 3+1=4 → FN=3
    assert (r.tp, r.fp, r.fn) == (1, 1, 3)
    assert r.precision == 0.5
    assert r.recall == 0.25
    assert r.f1 == 2 / 6


def test_perfect_and_degenerate(spark):
    gold = _asg(spark, [(1, "a"), (2, "a"), (3, "b")])
    # identical clustering under different labels is still perfect
    pred = _asg(spark, [(1, "x"), (2, "x"), (3, "y")])
    r = cluster_pair_metrics(pred, gold).collect()[0]
    assert (r.tp, r.fp, r.fn, r.precision, r.recall, r.f1) == (
        1, 0, 0, 1.0, 1.0, 1.0,
    )
    # all-singletons vs all-singletons: zero pairs on both sides →
    # conventionally perfect (1.0), never a division by zero
    s = _asg(spark, [(1, "a"), (2, "b")])
    r = cluster_pair_metrics(s, s).collect()[0]
    assert (r.tp, r.fp, r.fn, r.precision, r.recall, r.f1) == (
        0, 0, 0, 1.0, 1.0, 1.0,
    )


def test_pair_count_exact_past_float53(spark):
    # one cluster of 100_000_001 members has ~5e15 pairs — representable
    # exactly only in integer arithmetic; fake it via a pre-counted cell
    # by checking the shift identity directly on the helper
    from pyspark.sql import functions as F

    from case_uco_ontology_map_spark.operators.evalmetrics import _pairs

    n = 100_000_001
    got = (
        spark.range(1)
        .select(_pairs(F.lit(n)).alias("p"))
        .collect()[0]["p"]
    )
    assert got == n * (n - 1) // 2
