"""BGP query compiler: semantics vs a DuckDB replay of bgp_sql, join-order
heuristics, error surfaces; property-path closure, OPTIONAL, FILTER."""

import duckdb
import pandas as pd
import pytest

from case_uco_ontology_map_spark.operators.graphquery import (
    bgp_query,
    bgp_sql,
    closure_sql,
    join_order,
    pattern_vars,
    transitive_closure,
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


def _closure_rows(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        (r.src, r.dst, r.hops)
        for r in transitive_closure(df, **kw).collect()
    }


def test_transitive_closure_chain(spark):
    got = _closure_rows(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
        ("a", "c", 2), ("b", "d", 2), ("a", "d", 3),
    }


def test_transitive_closure_cycle_terminates(spark):
    # 3-cycle: every node reaches every node (incl. itself) at min hops
    got = _closure_rows(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {
        ("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
        ("a", "c", 2), ("b", "a", 2), ("c", "b", 2),
        ("a", "a", 3), ("b", "b", 3), ("c", "c", 3),
    }


def test_transitive_closure_max_hops(spark):
    got = _closure_rows(
        spark, [("a", "b"), ("b", "c"), ("c", "d")], max_hops=2
    )
    assert got == {
        ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
        ("a", "c", 2), ("b", "d", 2),
    }


def test_transitive_closure_matches_duckdb_recursive_cte(spark):
    # a small DAG with diamonds: min-hop semantics must agree with the
    # recursive-CTE oracle generator used by the contract
    edges = [
        ("r", "a"), ("r", "b"), ("a", "c"), ("b", "c"),
        ("c", "d"), ("a", "d"), ("d", "e"),
    ]
    trip = [(s, "derivedFrom", o) for s, o in edges] + [
        ("x", "otherPred", "y")  # must be excluded by the predicate filter
    ]
    got = _closure_rows(
        spark,
        [(s, o) for s, p, o in trip if p == "derivedFrom"],
    )
    con = duckdb.connect()
    con.register("g_src", pd.DataFrame(trip, columns=["subj", "pred", "obj"]))
    want = {
        tuple(r)
        for r in con.execute(
            "WITH g AS (SELECT * FROM g_src) SELECT src, dst, hops FROM ("
            + closure_sql("derivedFrom")
            + ") c"
        ).fetchall()
    }
    assert got == want
    assert ("r", "e", 3) in got and ("r", "c", 2) in got


def test_path_pattern_in_bgp(spark):
    trip = [
        ("a", "derivedFrom", "b"),
        ("b", "derivedFrom", "c"),
        ("c", "rdf:type", "Root"),
    ]
    df = spark.createDataFrame(trip, "subj string, pred string, obj string")
    # ?x derivedFrom+ ?anc . ?anc rdf:type Root  => every x whose ancestor
    # chain reaches a Root-typed node
    out = bgp_query(
        df,
        [("?x", "derivedFrom+", "?anc"), ("?anc", "rdf:type", "Root")],
        select=["x", "anc"],
    )
    assert {tuple(r) for r in out.collect()} == {("a", "c"), ("b", "c")}
    # constant endpoints filter the closure frame
    out2 = bgp_query(df, [("a", "derivedFrom+", "?anc")], select=["anc"])
    assert {r.anc for r in out2.collect()} == {"b", "c"}


def test_bgp_sql_raises_on_path():
    with pytest.raises(ValueError, match="closure_sql"):
        bgp_sql([("?x", "derivedFrom+", "?y")])


def test_optional_and_filter_match_duckdb(triples):
    patterns = [
        ("?rec", "uco-core:hasFacet", "?facet"),
        ("?facet", "rdf:type", "?ftype"),
    ]
    optional = [("?facet", "uco-observable:hash", "?hash")]
    sel = ["rec", "facet", "ftype", "hash"]
    out = bgp_query(triples, patterns, select=sel, optional=optional)
    rows = {tuple(r) for r in out.collect()}
    # URLFacet f2 has no hash -> NULL binding survives (OPTIONAL semantics)
    assert ("kb:rec1", "kb:f2", "uco-observable:URLFacet", None) in rows
    assert ("kb:rec1", "kb:f1", "uco-observable:ContentDataFacet", "abc") in rows
    con = duckdb.connect()
    con.register("g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"]))
    sql = bgp_sql(patterns, select=sel, optional=optional)
    want = {
        tuple(r)
        for r in con.execute(
            "WITH g AS (SELECT * FROM g_src) " + sql
        ).fetchall()
    }
    assert rows == want
    # FILTER applies after the left join, NULLs behave identically
    filt = ["hash IS NOT NULL"]
    got_f = {
        tuple(r)
        for r in bgp_query(
            triples, patterns, select=sel, optional=optional, filters=filt
        ).collect()
    }
    sql_f = bgp_sql(patterns, select=sel, optional=optional, filters=filt)
    want_f = {
        tuple(r)
        for r in con.execute(
            "WITH g AS (SELECT * FROM g_src) " + sql_f
        ).fetchall()
    }
    assert got_f == want_f
    assert all(h is not None for *_, h in got_f)


def test_optional_unshared_raises(triples):
    with pytest.raises(ValueError, match="OPTIONAL"):
        bgp_query(
            triples,
            [("?rec", "uco-core:hasFacet", "?facet")],
            optional=[("?other", "rdf:type", "?t")],
        )
    with pytest.raises(ValueError, match="OPTIONAL"):
        bgp_sql(
            [("?rec", "uco-core:hasFacet", "?facet")],
            optional=[("?other", "rdf:type", "?t")],
        )


def test_filter_on_required_matches_duckdb(triples):
    patterns = [("?facet", "uco-observable:hash", "?hash")]
    filt = ["hash LIKE 'a%'"]
    got = {
        tuple(r)
        for r in bgp_query(
            triples, patterns, select=["facet", "hash"], filters=filt
        ).collect()
    }
    con = duckdb.connect()
    con.register("g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"]))
    sql = bgp_sql(patterns, select=["facet", "hash"], filters=filt)
    want = {
        tuple(r)
        for r in con.execute("WITH g AS (SELECT * FROM g_src) " + sql).fetchall()
    }
    assert got == want == {("kb:f1", "abc")}


def test_random_bgp_matches_duckdb(triples):
    # a wider conjunction incl. a variable predicate on the join frontier
    patterns = [
        ("?rec", "rdf:type", "uco-observable:URL"),
        ("?rec", "uco-core:hasFacet", "?facet"),
        ("?facet", "?p", "?v"),
    ]
    sel = ["rec", "facet", "p", "v"]
    _compare(bgp_query(triples, patterns, select=sel), patterns, sel)


class TestBgpAggregate:
    def test_facet_census(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_aggregate,
            bgp_aggregate_sql,
        )

        patterns = [
            ("?rec", "uco-core:hasFacet", "?f"),
            ("?f", "rdf:type", "?t"),
        ]
        aggs = [("count(*)", "n_facets"), ("count(DISTINCT rec)", "n_records")]
        got = {
            (r.t, r.n_facets, r.n_records)
            for r in bgp_aggregate(
                triples, patterns, group_by=["t"], aggs=aggs
            ).collect()
        }
        # f1 (rec1) + f3 (rec2) are ContentDataFacets; f2 (rec1) URLFacet
        assert got == {
            ("uco-observable:ContentDataFacet", 2, 2),
            ("uco-observable:URLFacet", 1, 1),
        }
        # the SQL replay returns the identical rows
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_aggregate_sql(patterns, group_by=["t"], aggs=aggs)
        want = {
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want

    def test_having_filters_groups(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_aggregate,
        )

        patterns = [
            ("?rec", "uco-core:hasFacet", "?f"),
            ("?f", "rdf:type", "?t"),
        ]
        out = bgp_aggregate(
            triples,
            patterns,
            group_by=["t"],
            aggs=[("count(*)", "n")],
            having=["n >= 2"],
        ).collect()
        assert [(r.t, r.n) for r in out] == [
            ("uco-observable:ContentDataFacet", 2)
        ]

    def test_empty_args_raise(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_aggregate,
        )

        with pytest.raises(ValueError):
            bgp_aggregate(triples, [("?a", "?p", "?b")], [], [("count(*)", "n")])
        with pytest.raises(ValueError):
            bgp_aggregate(triples, [("?a", "?p", "?b")], ["a"], [])


class TestDescribeNodes:
    DESCRIBE_TRIPLES = [
        ("kb:r1", "uco-core:hasFacet", "kb:f1", True),
        ("kb:r1", "rdf:type", "uco-observable:URL", True),
        ("kb:f1", "rdf:type", "uco-observable:URLFacet", True),
        ("kb:f1", "uco-observable:hash", "abc", False),
        ("kb:f1", "drafting:ref", "kb:x1", True),
        ("kb:x1", "rdf:type", "uco-observable:File", True),
        ("kb:x1", "drafting:back", "kb:r1", True),  # cycle back to seed
        ("kb:other", "rdf:type", "uco-observable:URL", True),
    ]

    def _frame(self, spark):
        return spark.createDataFrame(
            self.DESCRIBE_TRIPLES,
            "subj string, pred string, obj string, obj_is_iri boolean",
        )

    def test_hop_bound_and_min_hop(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            describe_nodes,
        )

        t = self._frame(spark)
        seeds = spark.createDataFrame([("kb:r1",)], "node string")
        got1 = {
            (r.subj, r.pred, r.obj, r.hop)
            for r in describe_nodes(t, seeds, hops=1).collect()
        }
        # hop 0: r1's triples; hop 1: f1's triples (and the URL class
        # IRI opens no triples); x1 is 2 hops out — excluded
        assert got1 == {
            ("kb:r1", "uco-core:hasFacet", "kb:f1", 0),
            ("kb:r1", "rdf:type", "uco-observable:URL", 0),
            ("kb:f1", "rdf:type", "uco-observable:URLFacet", 1),
            ("kb:f1", "uco-observable:hash", "abc", 1),
            ("kb:f1", "drafting:ref", "kb:x1", 1),
        }
        got2 = {
            (r.subj, r.hop)
            for r in describe_nodes(t, seeds, hops=2).collect()
        }
        # hops=2 adds x1's triples; the back-edge to the seed does NOT
        # re-describe r1 at a deeper hop (visited set terminates cycles)
        assert ("kb:x1", 2) in got2
        assert ("kb:r1", 0) in got2 and ("kb:r1", 2) not in got2
        # the unrelated node never appears
        assert all(s != "kb:other" for s, _ in got2)

    def test_multi_seed_and_guard(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            describe_nodes,
        )

        t = self._frame(spark)
        seeds = spark.createDataFrame(
            [("kb:r1",), ("kb:other",)], "node string"
        )
        got = describe_nodes(t, seeds, hops=0).collect()
        per_seed = {}
        for r in got:
            per_seed.setdefault(r.seed, set()).add(r.subj)
        assert per_seed == {
            "kb:r1": {"kb:r1"}, "kb:other": {"kb:other"}
        }
        with pytest.raises(ValueError):
            describe_nodes(t, seeds, hops=-1)


class TestAlternation:
    def test_alternation_matches_duckdb(self, triples):
        patterns = [("?s", "uco-observable:hash|uco-observable:fullValue", "?v")]
        sel = ["s", "v"]
        got = {
            tuple(r) for r in bgp_query(triples, patterns, select=sel).collect()
        }
        assert got == {
            ("kb:f1", "abc"), ("kb:f3", "def"), ("kb:f2", "http://x/"),
        }
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(patterns, select=sel)
        want = {
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want

    def test_alternation_in_optional_and_path_mix_raises(self, triples):
        req = [("?rec", "rdf:type", "uco-observable:URL")]
        opt = [("?rec", "uco-core:hasFacet|uco-core:sameAs", "?f")]
        got = {
            (r.rec, r.f)
            for r in bgp_query(triples, req, optional=opt).collect()
        }
        assert got == {
            ("kb:rec1", "kb:f1"), ("kb:rec1", "kb:f2"), ("kb:rec2", "kb:f3"),
        }
        with pytest.raises(ValueError):
            bgp_query(triples, [("?a", "p|q+", "?b")])


class TestBgpConstruct:
    def test_template_instantiation_matches_duckdb(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_construct,
            bgp_construct_sql,
        )

        patterns = [
            ("?rec", "uco-core:hasFacet", "?f"),
            ("?f", "rdf:type", "?t"),
        ]
        template = [
            ("?rec", "drafting:hasFacetType", "?t"),
            ("?rec", "rdf:type", "drafting:Enriched"),
        ]
        got = {
            tuple(r)
            for r in bgp_construct(triples, patterns, template).collect()
        }
        # rec1 has two facet types; the constant row dedups per record
        assert got == {
            ("kb:rec1", "drafting:hasFacetType", "uco-observable:ContentDataFacet"),
            ("kb:rec1", "drafting:hasFacetType", "uco-observable:URLFacet"),
            ("kb:rec2", "drafting:hasFacetType", "uco-observable:ContentDataFacet"),
            ("kb:rec1", "rdf:type", "drafting:Enriched"),
            ("kb:rec2", "rdf:type", "drafting:Enriched"),
        }
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_construct_sql(patterns, template)
        want = {
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want

    def test_optional_null_rows_dropped_and_guards(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_construct,
        )

        patterns = [("?rec", "uco-core:hasFacet", "?f")]
        optional = [("?f", "uco-observable:hash", "?h")]
        # f2 has no hash → its template row would carry NULL → dropped
        got = {
            tuple(r)
            for r in bgp_construct(
                triples, patterns, [("?f", "drafting:hashCopy", "?h")],
                optional=optional,
            ).collect()
        }
        assert got == {
            ("kb:f1", "drafting:hashCopy", "abc"),
            ("kb:f3", "drafting:hashCopy", "def"),
        }
        with pytest.raises(ValueError):
            bgp_construct(triples, patterns, [])
        with pytest.raises(ValueError):
            bgp_construct(triples, patterns, [("?nope", "p", "?f")])


class TestValuesFilter:
    def test_values_matches_duckdb(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            values_filter,
        )

        patterns = [
            ("?rec", "uco-core:hasFacet", "?f"),
            ("?f", "rdf:type", "?t"),
        ]
        vf = values_filter(
            ["rec", "t"],
            [
                ("kb:rec1", "uco-observable:URLFacet"),
                ("kb:rec2", "uco-observable:ContentDataFacet"),
            ],
        )
        got = {
            tuple(r)
            for r in bgp_query(
                triples, patterns, select=["rec", "f"], filters=[vf]
            ).collect()
        }
        assert got == {("kb:rec1", "kb:f2"), ("kb:rec2", "kb:f3")}
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(patterns, select=["rec", "f"], filters=[vf])
        want = {
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want

    def test_single_var_and_guards(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            values_filter,
        )

        assert values_filter(["t"], [("a'b",), ("c",)]) == (
            "t IN ('a''b', 'c')"
        )
        with pytest.raises(ValueError):
            values_filter([], [("a",)])
        with pytest.raises(ValueError):
            values_filter(["a", "b"], [("x",)])


class TestMinus:
    def test_negation_matches_duckdb(self, triples):
        # records that have a facet but NO ContentDataFacet-typed facet
        patterns = [("?rec", "uco-core:hasFacet", "?f")]
        minus = [
            ("?rec", "uco-core:hasFacet", "?g"),
            # NB: each MINUS pattern applies independently; this single
            # pattern pairs with a second constraint below instead
        ]
        # one MINUS pattern with an existential var typed CDF
        minus = [("?f", "rdf:type", "uco-observable:ContentDataFacet")]
        got = {
            tuple(r)
            for r in bgp_query(
                triples, patterns, select=["rec", "f"], minus=minus
            ).collect()
        }
        # f1 (rec1) and f3 (rec2) are ContentDataFacets → dropped;
        # rec1's f2 (URLFacet) survives
        assert got == {("kb:rec1", "kb:f2")}
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(patterns, select=["rec", "f"], minus=minus)
        want = {
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want

    def test_minus_with_existential_var_and_guard(self, triples):
        # drop every record that has ANY facet carrying a hash (the hash
        # value itself is existential — never projected)
        patterns = [("?rec", "rdf:type", "uco-observable:URL")]
        minus = [("?rec", "uco-core:hasFacet", "?anyf")]
        got = {
            r.rec
            for r in bgp_query(triples, patterns, minus=minus).collect()
        }
        assert got == set()  # both records have facets
        with pytest.raises(ValueError):
            bgp_query(triples, patterns, minus=[("?x", "p", "?y")])
        with pytest.raises(ValueError):
            bgp_sql(patterns, minus=[("?x", "p", "?y")])


class TestInversePath:
    def test_inverse_equals_swapped_forward(self, triples):
        # (?f, ^hasFacet, ?rec) ≡ (?rec, hasFacet, ?f)
        inv = bgp_query(
            triples,
            [("?f", "^uco-core:hasFacet", "?rec")],
            select=["rec", "f"],
        )
        fwd = bgp_query(
            triples,
            [("?rec", "uco-core:hasFacet", "?f")],
            select=["rec", "f"],
        )
        got = sorted(tuple(r) for r in inv.collect())
        assert got == sorted(tuple(r) for r in fwd.collect())
        # and the SQL oracle agrees (bgp_sql normalizes identically)
        _compare(inv, [("?f", "^uco-core:hasFacet", "?rec")], ["rec", "f"])

    def test_inverse_in_two_hop_join(self, triples):
        # typed facet joined back to its record through the inverse edge
        patterns = [
            ("?f", "rdf:type", "uco-observable:ContentDataFacet"),
            ("?f", "^uco-core:hasFacet", "?rec"),
        ]
        got = {
            tuple(r)
            for r in bgp_query(
                triples, patterns, select=["rec", "f"]
            ).collect()
        }
        assert got == {("kb:rec1", "kb:f1"), ("kb:rec2", "kb:f3")}
        _compare(
            bgp_query(triples, patterns, select=["rec", "f"]),
            patterns,
            ["rec", "f"],
        )

    def test_inverse_transitive_closure(self, spark):
        rows = [("a", "p", "b"), ("b", "p", "c"), ("x", "q", "a")]
        g = spark.createDataFrame(rows, "subj string, pred string, obj string")
        # (?x, ^p+, 'a'): everything reachable FROM a via p
        got = {
            r.x
            for r in bgp_query(g, [("?x", "^p+", "a")], select=["x"]).collect()
        }
        assert got == {"b", "c"}
        # (?x, ^p+, 'c'): nothing reaches out of c
        assert (
            bgp_query(g, [("?x", "^p+", "c")], select=["x"]).count() == 0
        )

    def test_inverse_in_optional_and_minus(self, triples):
        # OPTIONAL through an inverse edge: every facet, with its record
        # where one exists
        patterns = [("?f", "rdf:type", "?t")]
        optional = [("?f", "^uco-core:hasFacet", "?rec")]
        df = bgp_query(
            triples, patterns, select=["f", "t", "rec"], optional=optional
        )
        got = {tuple(r) for r in df.collect()}
        # records themselves are typed too and have no inverse edge → NULL
        assert ("kb:rec1", "uco-observable:URL", None) in got
        assert (
            "kb:f1",
            "uco-observable:ContentDataFacet",
            "kb:rec1",
        ) in got
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(patterns, select=["f", "t", "rec"], optional=optional)
        want = {
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want
        # MINUS through an inverse edge: facets NOT attached to rec1
        minus = [("?f", "^uco-core:hasFacet", "kb:rec1")]
        got_m = {
            r.f
            for r in bgp_query(
                triples,
                [("?f", "rdf:type", "?t")],
                select=["f"],
                minus=minus,
            ).collect()
        }
        assert "kb:f1" not in got_m and "kb:f3" in got_m

    def test_inverse_alternation_mix_raises(self, triples):
        with pytest.raises(ValueError, match="inverse"):
            bgp_query(triples, [("?s", "^p1|p2", "?o")])
        with pytest.raises(ValueError, match="inverse"):
            bgp_sql([("?s", "^p1|p2", "?o")])


class TestSequencePath:
    def test_sequence_equals_manual_chain(self, triples):
        # rec --hasFacet/rdf:type--> facet type, one sequence predicate
        seq = bgp_query(
            triples,
            [("?rec", "uco-core:hasFacet/rdf:type", "?ftype")],
            select=["rec", "ftype"],
        )
        manual = bgp_query(
            triples,
            [
                ("?rec", "uco-core:hasFacet", "?f"),
                ("?f", "rdf:type", "?ftype"),
            ],
            select=["rec", "ftype"],
        )
        assert sorted(map(tuple, seq.collect())) == sorted(
            map(tuple, manual.collect())
        )
        # internal vars never leak into the default projection
        all_cols = bgp_query(
            triples, [("?rec", "uco-core:hasFacet/rdf:type", "?ftype")]
        ).columns
        assert all_cols == ["rec", "ftype"]
        _compare(
            seq,
            [("?rec", "uco-core:hasFacet/rdf:type", "?ftype")],
            ["rec", "ftype"],
        )

    def test_sequence_with_inverse_element(self, triples):
        # facet --^hasFacet/rdf:type--> its record's type
        pats = [("?f", "^uco-core:hasFacet/rdf:type", "?rtype")]
        got = {
            tuple(r)
            for r in bgp_query(
                triples, pats, select=["f", "rtype"]
            ).collect()
        }
        assert got == {
            ("kb:f1", "uco-observable:URL"),
            ("kb:f2", "uco-observable:URL"),
            ("kb:f3", "uco-observable:URL"),
        }
        _compare(bgp_query(triples, pats, select=["f", "rtype"]), pats,
                 ["f", "rtype"])

    def test_sequence_joins_with_other_patterns(self, triples):
        pats = [
            ("?rec", "uco-core:hasFacet/uco-observable:hash", "?h"),
            ("?rec", "rdf:type", "?rt"),
        ]
        got = {
            tuple(r)
            for r in bgp_query(triples, pats, select=["rec", "h"]).collect()
        }
        assert got == {("kb:rec1", "abc"), ("kb:rec2", "def")}
        _compare(bgp_query(triples, pats, select=["rec", "h"]), pats,
                 ["rec", "h"])

    def test_sequence_guards(self, triples):
        with pytest.raises(ValueError, match="alternation"):
            bgp_query(triples, [("?s", "a|b/c", "?o")])
        with pytest.raises(ValueError, match="empty element"):
            bgp_query(triples, [("?s", "a//b", "?o")])
        with pytest.raises(ValueError, match="OPTIONAL/MINUS"):
            bgp_query(
                triples,
                [("?s", "rdf:type", "?t")],
                optional=[("?s", "a/b", "?o")],
            )
        with pytest.raises(ValueError, match="OPTIONAL/MINUS"):
            bgp_sql(
                [("?s", "rdf:type", "?t")],
                minus=[("?s", "a/b", "?o")],
            )


class TestStarOptionalPaths:
    @pytest.fixture(scope="class")
    def chain(self, spark):
        rows = [("a", "p", "b"), ("b", "p", "c"), ("x", "q", "y")]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_star_from_ground(self, chain):
        got = {
            r.o
            for r in bgp_query(chain, [("a", "p*", "?o")], select=["o"])
            .collect()
        }
        assert got == {"a", "b", "c"}  # zero-length includes a itself

    def test_star_ground_not_in_graph(self, chain):
        # SPARQL ZeroLengthPath(term X, ?v) = {v -> X} regardless of
        # graph membership
        got = {
            r.o
            for r in bgp_query(chain, [("zz", "p*", "?o")], select=["o"])
            .collect()
        }
        assert got == {"zz"}

    def test_star_both_vars_matches_duckdb(self, chain):
        from case_uco_ontology_map_spark.operators.graphquery import (
            path_sql,
        )

        df = bgp_query(chain, [("?s", "p*", "?o")], select=["s", "o"])
        got = sorted(map(tuple, df.collect()))
        con = duckdb.connect()
        con.register(
            "g_src",
            pd.DataFrame(
                [("a", "p", "b"), ("b", "p", "c"), ("x", "q", "y")],
                columns=["subj", "pred", "obj"],
            ),
        )
        want = sorted(
            map(
                tuple,
                con.execute(
                    "WITH g AS (SELECT * FROM g_src) SELECT src, dst FROM ("
                    + path_sql("p", "*")
                    + ") z"
                ).fetchall(),
            )
        )
        assert got == want
        # universe zero-length rows: every term of the graph, incl. q's
        assert ("y", "y") in set(got) and ("x", "x") in set(got)

    def test_zero_or_one(self, chain):
        got = {
            r.o
            for r in bgp_query(chain, [("a", "p?", "?o")], select=["o"])
            .collect()
        }
        assert got == {"a", "b"}  # no closure beyond one hop
        from case_uco_ontology_map_spark.operators.graphquery import (
            path_sql,
        )

        con = duckdb.connect()
        con.register(
            "g_src",
            pd.DataFrame(
                [("a", "p", "b"), ("b", "p", "c"), ("x", "q", "y")],
                columns=["subj", "pred", "obj"],
            ),
        )
        want = {
            r[0]
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) SELECT dst FROM ("
                + path_sql("p", "?", zero_term="a")
                + ") z WHERE src = 'a'"
            ).fetchall()
        }
        assert got == want

    def test_self_loop_min_hop_zero(self, spark):
        g = spark.createDataFrame(
            [("n", "p", "n")], "subj string, pred string, obj string"
        )
        # self-loop node: (n, n) appears once, at hops 0 (zero-length
        # beats the 1-hop loop after the min-hop collapse)
        rows = bgp_query(g, [("?s", "p*", "?o")], select=["s", "o"]).collect()
        assert len(rows) == 1 and tuple(rows[0]) == ("n", "n")

    def test_inverse_star_composes(self, chain):
        # (?x, ^p*, c): c reaches x through reversed edges ∪ zero-length
        got = {
            r.x
            for r in bgp_query(chain, [("?x", "^p*", "a")], select=["x"])
            .collect()
        }
        assert got == {"a", "b", "c"}


class TestNegatedPropertySet:
    def test_negated_set_matches_duckdb(self, triples):
        pats = [("?f", "!rdf:type", "?v")]
        got = {
            tuple(r)
            for r in bgp_query(triples, pats, select=["f", "v"]).collect()
        }
        # every non-type edge in the graph
        assert ("kb:f1", "abc") in got
        assert all(
            not (a == "kb:f1" and b == "uco-observable:ContentDataFacet")
            for a, b in got
        )
        _compare(bgp_query(triples, pats, select=["f", "v"]), pats,
                 ["f", "v"])

    def test_negated_multi_and_in_minus(self, triples):
        pats = [("kb:rec1", "!rdf:type|uco-core:sameAs", "?o")]
        got = {
            r.o for r in bgp_query(triples, pats, select=["o"]).collect()
        }
        assert got == {"kb:f1", "kb:f2"}  # only hasFacet edges survive
        _compare(bgp_query(triples, pats, select=["o"]), pats, ["o"])
        # negated set inside MINUS: drop subjects having any non-type edge
        req = [("?s", "rdf:type", "?t")]
        minus = [("?s", "!rdf:type", "?x")]
        got_m = {
            r.s
            for r in bgp_query(triples, req, select=["s"], minus=minus)
            .collect()
        }
        assert "kb:rec1" not in got_m  # has hasFacet edges
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(req, select=["s"], minus=minus)
        want = {
            r[0]
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got_m == want

    def test_negated_set_guards(self, triples):
        with pytest.raises(ValueError, match="negated property set"):
            bgp_query(triples, [("?s", "!^p", "?o")])
        with pytest.raises(ValueError, match="negated property set"):
            bgp_query(triples, [("?s", "!p+", "?o")])
        with pytest.raises(ValueError, match="empty IRI"):
            bgp_query(triples, [("?s", "!p|", "?o")])


class TestSolutionModifiers:
    def test_order_limit_offset_match_duckdb(self, triples):
        pats = [("?rec", "uco-core:hasFacet", "?f")]
        df = bgp_query(
            triples,
            pats,
            select=["rec", "f"],
            order_by=["rec DESC", "f"],
            limit=2,
            offset=1,
        )
        got = [tuple(r) for r in df.collect()]
        assert got == [("kb:rec1", "kb:f1"), ("kb:rec1", "kb:f2")]
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(
            pats,
            select=["rec", "f"],
            order_by=["rec DESC", "f"],
            limit=2,
            offset=1,
        )
        want = [
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        ]
        assert got == want

    def test_modifiers_on_wrapped_form(self, triples):
        # filters force the wrapped (derived-table) SQL form
        pats = [("?rec", "uco-core:hasFacet", "?f")]
        df = bgp_query(
            triples,
            pats,
            select=["rec", "f"],
            filters=["f <> 'kb:f2'"],
            order_by=["f"],
            limit=1,
        )
        got = [tuple(r) for r in df.collect()]
        assert got == [("kb:rec1", "kb:f1")]
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(
            pats,
            select=["rec", "f"],
            filters=["f <> 'kb:f2'"],
            order_by=["f"],
            limit=1,
        )
        want = [
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        ]
        assert got == want

    def test_guards(self, triples):
        pats = [("?rec", "uco-core:hasFacet", "?f")]
        with pytest.raises(ValueError, match="nondeterministic"):
            bgp_query(triples, pats, limit=3)
        with pytest.raises(ValueError, match="nondeterministic"):
            bgp_sql(pats, offset=3)
        with pytest.raises(ValueError, match="not in the selected"):
            bgp_query(
                triples, pats, select=["rec"], order_by=["f"], limit=1
            )
        with pytest.raises(ValueError, match="not in the selected"):
            bgp_sql(pats, select=["rec"], order_by=["f"], limit=1)
        with pytest.raises(ValueError, match="order direction"):
            bgp_query(triples, pats, order_by=["rec SIDEWAYS"])


class TestExists:
    def test_exists_matches_duckdb(self, triples):
        # records that DO have a ContentDataFacet-typed facet (positive
        # existential — the f/g vars existential, never projected)
        req = [("?rec", "rdf:type", "uco-observable:URL")]
        ex = [
            ("?rec", "uco-core:hasFacet", "?g"),
        ]
        got = {
            r.rec
            for r in bgp_query(triples, req, select=["rec"], exists=ex)
            .collect()
        }
        assert got == {"kb:rec1", "kb:rec2"}
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(req, select=["rec"], exists=ex)
        want = {
            r[0]
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want

    def test_exists_no_multiplicity_change(self, triples):
        # EXISTS must not duplicate bindings (semi-join, not inner):
        # rec1 has TWO facets but stays one row
        req = [("?rec", "rdf:type", "uco-observable:URL")]
        ex = [("?rec", "uco-core:hasFacet", "?any")]
        rows = bgp_query(triples, req, select=["rec"], exists=ex).collect()
        assert sorted(r.rec for r in rows) == ["kb:rec1", "kb:rec2"]

    def test_exists_with_minus_and_guard(self, triples):
        # combined: has a facet (EXISTS) but no hash-carrying one (MINUS)
        req = [("?rec", "rdf:type", "uco-observable:URL")]
        ex = [("?rec", "uco-core:hasFacet", "?f")]
        mi = [
            ("?rec", "uco-core:hasFacet", "?h"),
            # single-pattern MINUS below instead (compiler takes one
            # pattern per entry)
        ]
        mi = [("?f2", "uco-observable:hash", "?v")]
        with pytest.raises(ValueError, match="unscoped|shares no"):
            bgp_query(triples, req, exists=[("?x", "p", "?y")])
        with pytest.raises(ValueError, match="shares no"):
            bgp_sql(req, exists=[("?x", "p", "?y")])
        got = {
            r.rec
            for r in bgp_query(
                triples, req, select=["rec"], exists=ex
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(req, select=["rec"], exists=ex)
        want = {
            r[0]
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        }
        assert got == want


class TestBind:
    def test_bind_matches_duckdb(self, triples):
        pats = [
            ("?rec", "uco-core:hasFacet", "?f"),
            ("?f", "rdf:type", "?t"),
        ]
        bind = [
            ("upper(t)", "t_up"),
            ("concat(rec, '#', t_up)", "tag"),  # references earlier bind
        ]
        df = bgp_query(triples, pats, bind=bind)
        assert df.columns == ["rec", "f", "t", "t_up", "tag"]
        got = sorted(map(tuple, df.collect()))
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(pats, bind=bind)
        want = sorted(
            map(
                tuple,
                con.execute(
                    "WITH g AS (SELECT * FROM g_src) " + sql
                ).fetchall(),
            )
        )
        assert got == want

    def test_bind_select_order_and_filter_scope(self, triples):
        pats = [("?rec", "uco-core:hasFacet", "?f")]
        # bind selectable + orderable; filters CANNOT see binds (they
        # evaluate before) — pinned by the guard below
        df = bgp_query(
            triples,
            pats,
            bind=[("length(f)", "flen")],
            select=["rec", "flen"],
            order_by=["flen", "rec"],
            limit=2,
        )
        got = [tuple(r) for r in df.collect()]
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_sql(
            pats,
            bind=[("length(f)", "flen")],
            select=["rec", "flen"],
            order_by=["flen", "rec"],
            limit=2,
        )
        want = [
            tuple(r)
            for r in con.execute(
                "WITH g AS (SELECT * FROM g_src) " + sql
            ).fetchall()
        ]
        assert got == want

    def test_rebind_raises(self, triples):
        pats = [("?rec", "uco-core:hasFacet", "?f")]
        with pytest.raises(ValueError, match="rebinds"):
            bgp_query(triples, pats, bind=[("upper(f)", "rec")])
        with pytest.raises(ValueError, match="rebinds"):
            bgp_sql(pats, bind=[("upper(f)", "rec")])


class TestUnion:
    def test_union_null_domain_matches_duckdb(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_union,
            bgp_union_sql,
        )

        blocks = [
            # facets with a hash (binds h)
            {
                "patterns": [
                    ("?rec", "uco-core:hasFacet", "?f"),
                    ("?f", "uco-observable:hash", "?h"),
                ]
            },
            # records themselves (binds t, not f/h)
            {"patterns": [("?rec", "rdf:type", "?t")]},
        ]
        df = bgp_union(triples, blocks)
        assert df.columns == ["rec", "f", "h", "t"]
        got = sorted(
            map(tuple, df.collect()),
            key=lambda r: tuple("" if x is None else x for x in r),
        )
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_union_sql(blocks)
        want = sorted(
            map(
                tuple,
                con.execute(
                    "WITH g AS (SELECT * FROM g_src) " + sql
                ).fetchall(),
            ),
            key=lambda r: tuple("" if x is None else x for x in r),
        )
        assert got == want
        # branch-missing vars are NULL
        assert any(r[3] is None for r in got) and any(
            r[1] is None for r in got
        )

    def test_union_block_features_and_guards(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_union,
            bgp_union_sql,
        )

        blocks = [
            {
                "patterns": [("?rec", "uco-core:hasFacet", "?f")],
                "minus": [("?f", "uco-observable:hash", "?x")],
            },
            {
                "patterns": [("?rec", "rdf:type", "?t")],
                "bind": [("lower(t)", "lt")],
            },
        ]
        df = bgp_union(triples, blocks, select=["rec", "f", "lt"])
        got = sorted(
            map(tuple, df.collect()),
            key=lambda r: tuple("" if x is None else x for x in r),
        )
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        sql = bgp_union_sql(blocks, select=["rec", "f", "lt"])
        want = sorted(
            map(
                tuple,
                con.execute(
                    "WITH g AS (SELECT * FROM g_src) " + sql
                ).fetchall(),
            ),
            key=lambda r: tuple("" if x is None else x for x in r),
        )
        assert got == want
        with pytest.raises(ValueError, match="at least two"):
            bgp_union(triples, blocks[:1])
        with pytest.raises(ValueError, match="union-level"):
            bgp_union_sql(
                [{"patterns": blocks[0]["patterns"], "limit": 3}, blocks[1]]
            )


class TestAsk:
    def test_ask_true_false_and_oracle(self, triples):
        from case_uco_ontology_map_spark.operators.graphquery import (
            bgp_ask,
            bgp_ask_sql,
        )

        yes = [("?r", "uco-core:hasFacet", "?f")]
        no = [("?r", "uco-core:noSuchPredicate", "?f")]
        con = duckdb.connect()
        con.register(
            "g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"])
        )
        for pats, expect in ((yes, True), (no, False)):
            got = bgp_ask(triples, pats).collect()
            assert len(got) == 1 and got[0].matched is expect
            want = con.execute(
                "WITH g AS (SELECT * FROM g_src) " + bgp_ask_sql(pats)
            ).fetchone()[0]
            assert want is expect
        # with negation: is there any URL record WITHOUT a facet? (no)
        got = bgp_ask(
            triples,
            [("?r", "rdf:type", "uco-observable:URL")],
            minus=[("?r", "uco-core:hasFacet", "?f")],
        ).collect()
        assert got[0].matched is False


def test_full_iri_predicate_not_a_sequence(spark):
    # slashes in a full-IRI predicate are NOT path syntax
    g = spark.createDataFrame(
        [("s", "https://example.org/ns/p", "o")],
        "subj string, pred string, obj string",
    )
    got = bgp_query(
        g, [("?s", "https://example.org/ns/p", "?o")], select=["s", "o"]
    ).collect()
    assert [tuple(r) for r in got] == [("s", "o")]


class TestQuadQuery:
    """SPARQL 1.1 §13.3 GRAPH semantics, hand-enumerated on a tiny quad
    store — including the cross-graph trap a broken scoping would hit."""

    def _quads(self, spark):
        rows = [
            ("g1", "a", "p", "b"),
            ("g1", "b", "q", "c"),
            ("g2", "a", "p", "b2"),
            ("g2", "b2", "q", "c2"),
            # trap: joins ACROSS graphs (g1's b with g2's q-edge) must
            # never match inside GRAPH ?g
            ("g2", "b", "q", "X"),
        ]
        return spark.createDataFrame(
            rows, "graph string, subj string, pred string, obj string"
        )

    def test_variable_graph_scopes_the_block(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            quad_query,
        )

        out = quad_query(
            self._quads(spark), "?g",
            [("?s", "p", "?o"), ("?o", "q", "?x")],
        )
        got = {tuple(r) for r in out.collect()}
        assert got == {
            ("g1", "a", "b", "c"),
            ("g2", "a", "b2", "c2"),
        }

    def test_constant_graph_delegates_full_bgp(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            quad_query,
        )

        out = quad_query(
            self._quads(spark), "g2",
            [("?s", "p", "?o")],
            optional=[("?o", "q", "?x")],
        )
        got = {tuple(r) for r in out.collect()}
        assert got == {("a", "b2", "c2")}

    def test_graph_var_repeated_in_pattern_position(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            quad_query,
        )

        quads = spark.createDataFrame(
            [("a", "a", "p", "x"), ("g", "a", "p", "y")],
            "graph string, subj string, pred string, obj string",
        )
        # GRAPH ?s { ?s p ?o }: graph must EQUAL the subject
        out = quad_query(quads, "?s", [("?s", "p", "?o")])
        assert {tuple(r) for r in out.collect()} == {("a", "x")}

    def test_variable_graph_subset_refusals(self, spark):
        import pytest

        from case_uco_ontology_map_spark.operators.graphquery import (
            quad_query,
        )

        q = self._quads(spark)
        with pytest.raises(ValueError, match="constant graph"):
            quad_query(q, "?g", [("?s", "p", "?o")],
                       optional=[("?o", "q", "?x")])
        with pytest.raises(ValueError, match="path/alternation"):
            quad_query(q, "?g", [("?s", "p+", "?o")])
        with pytest.raises(ValueError, match="path/alternation"):
            quad_query(q, "?g", [("?s", "p|q", "?o")])
        with pytest.raises(ValueError, match="unbound"):
            quad_query(q, "?g", [("?s", "p", "?o")], select=["nope"])
        with pytest.raises(ValueError, match="nondeterministic"):
            quad_query(q, "?g", [("?s", "p", "?o")], limit=1)

    def test_filters_and_modifiers(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            quad_query,
        )

        out = quad_query(
            self._quads(spark), "?g",
            [("?s", "p", "?o")],
            filters=["o <> 'b'"],
            order_by=["g DESC"],
            limit=1,
        )
        assert [tuple(r) for r in out.collect()] == [("g2", "a", "b2")]
