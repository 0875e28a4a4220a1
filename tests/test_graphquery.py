"""BGP query compiler: semantics vs a DuckDB replay of bgp_sql, join-order
heuristics, and error surfaces."""

import duckdb
import pandas as pd
import pytest

from case_uco_ontology_map_spark.operators.graphquery import (
    bgp_query,
    bgp_sql,
    join_order,
    pattern_vars,
)

TRIPLES = [
    # (subj, pred, obj)
    ("kb:rec1", "uco-core:hasFacet", "kb:f1"),
    ("kb:rec1", "uco-core:hasFacet", "kb:f2"),
    ("kb:rec2", "uco-core:hasFacet", "kb:f3"),
    ("kb:f1", "rdf:type", "uco-observable:ContentDataFacet"),
    ("kb:f2", "rdf:type", "uco-observable:URLFacet"),
    ("kb:f3", "rdf:type", "uco-observable:ContentDataFacet"),
    ("kb:f1", "uco-observable:hash", "abc"),
    ("kb:f3", "uco-observable:hash", "def"),
    ("kb:f2", "uco-observable:fullValue", "http://x/"),
    ("kb:rec1", "rdf:type", "uco-observable:URL"),
    ("kb:rec2", "rdf:type", "uco-observable:URL"),
    ("kb:self", "uco-core:sameAs", "kb:self"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def _duck(patterns, select=None, distinct=False):
    con = duckdb.connect()
    con.register("g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"]))
    sql = bgp_sql(patterns, select=select, distinct=distinct)
    return con.execute("WITH g AS (SELECT * FROM g_src) " + sql).df()


def _compare(spark_df, patterns, select):
    got = (
        spark_df.toPandas()
        .sort_values(list(select))
        .reset_index(drop=True)
    )
    want = (
        _duck(patterns, select=select)
        .sort_values(list(select))
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_two_hop_facet_hash(triples):
    patterns = [
        ("?rec", "uco-core:hasFacet", "?facet"),
        ("?facet", "rdf:type", "uco-observable:ContentDataFacet"),
        ("?facet", "uco-observable:hash", "?hash"),
    ]
    out = bgp_query(triples, patterns, select=["rec", "facet", "hash"])
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        ("kb:rec1", "kb:f1", "abc"),
        ("kb:rec2", "kb:f3", "def"),
    }
    _compare(
        bgp_query(triples, patterns, select=["rec", "facet", "hash"]),
        patterns,
        ["rec", "facet", "hash"],
    )


def test_variable_predicate(triples):
    patterns = [("kb:f1", "?p", "?o")]
    out = {tuple(r) for r in bgp_query(triples, patterns).collect()}
    assert out == {
        ("rdf:type", "uco-observable:ContentDataFacet"),
        ("uco-observable:hash", "abc"),
    }


def test_repeated_var_within_pattern(triples):
    out = bgp_query(triples, [("?x", "uco-core:sameAs", "?x")]).collect()
    assert [tuple(r) for r in out] == [("kb:self",)]


def test_bag_semantics_and_distinct(triples):
    # rec1 has two facets -> two bindings for ?rec without distinct
    patterns = [("?rec", "uco-core:hasFacet", "?f")]
    bag = bgp_query(triples, patterns, select=["rec"]).collect()
    assert sorted(r.rec for r in bag) == ["kb:rec1", "kb:rec1", "kb:rec2"]
    dis = bgp_query(triples, patterns, select=["rec"], distinct=True).collect()
    assert sorted(r.rec for r in dis) == ["kb:rec1", "kb:rec2"]


def test_join_order_prefers_bound_subject():
    patterns = [
        ("?rec", "uco-core:hasFacet", "?facet"),   # score 1
        ("kb:f1", "?p", "?facet"),                 # score 4: bound subject
        ("?facet", "uco-observable:hash", "?hash"),  # score 1: ties go earliest
    ]
    assert join_order(patterns) == [1, 0, 2]


def test_join_order_connected_chain():
    patterns = [
        ("?a", "p", "?b"),
        ("?b", "q", "?c"),
        ("?c", "r", "x"),  # bound object: seed
    ]
    order = join_order(patterns)
    assert order == [2, 1, 0]


def test_disconnected_raises(triples):
    patterns = [("?a", "p", "?b"), ("?c", "q", "?d")]
    with pytest.raises(ValueError, match="cartesian"):
        bgp_query(triples, patterns)
    # explicit opt-in plans a cross join instead
    out = bgp_query(
        triples,
        [("?a", "rdf:type", "uco-observable:URL"),
         ("?b", "uco-observable:hash", "abc")],
        allow_cartesian=True,
    )
    assert out.count() == 2  # 2 URL recs x 1 hash match


def test_unbound_select_raises(triples):
    with pytest.raises(ValueError, match="unbound"):
        bgp_query(triples, [("?a", "p", "?b")], select=["z"])


def test_pattern_vars_dedup():
    assert pattern_vars(("?x", "?p", "?x")) == ["x", "p"]


def test_random_bgp_matches_duckdb(triples):
    # a wider conjunction incl. a variable predicate on the join frontier
    patterns = [
        ("?rec", "rdf:type", "uco-observable:URL"),
        ("?rec", "uco-core:hasFacet", "?facet"),
        ("?facet", "?p", "?v"),
    ]
    sel = ["rec", "facet", "p", "v"]
    _compare(bgp_query(triples, patterns, select=sel), patterns, sel)
