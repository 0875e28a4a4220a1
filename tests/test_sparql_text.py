"""SPARQL text front end: parse → same results as the programmatic
compiler; SQL twin replays in DuckDB; loud errors on the unsupported."""

import duckdb
import pandas as pd
import pytest

from case_uco_ontology_map_spark.operators.sparql import (
    SparqlSyntaxError,
    parse_sparql,
    sparql_query,
    sparql_to_sql,
)

TRIPLES = [
    ("kb:rec1", "uco-core:hasFacet", "kb:f1"),
    ("kb:rec1", "uco-core:hasFacet", "kb:f2"),
    ("kb:rec2", "uco-core:hasFacet", "kb:f3"),
    ("kb:f1", "rdf:type", "uco-observable:ContentDataFacet"),
    ("kb:f2", "rdf:type", "uco-observable:URLFacet"),
    ("kb:f3", "rdf:type", "uco-observable:ContentDataFacet"),
    ("kb:f1", "uco-observable:hash", "abc"),
    ("kb:f3", "uco-observable:hash", "def"),
    ("kb:rec1", "rdf:type", "uco-observable:URL"),
    ("kb:rec2", "rdf:type", "uco-observable:URL"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def _duck_run(sql):
    con = duckdb.connect()
    con.register("g_src", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"]))
    return con.execute("WITH g AS (SELECT * FROM g_src) " + sql).fetchall()


def _both(triples, text):
    got = sorted(
        map(tuple, sparql_query(triples, text).collect()),
        key=lambda r: tuple("" if x is None else str(x) for x in r),
    )
    want = sorted(
        map(tuple, _duck_run(sparql_to_sql(text))),
        key=lambda r: tuple("" if x is None else str(x) for x in r),
    )
    assert got == want
    return got


class TestParse:
    def test_select_shapes(self, triples):
        q = """
        PREFIX uco-core: <https://ontology.unifiedcyberontology.org/uco/core/>
        SELECT ?rec ?hash WHERE {
          ?rec uco-core:hasFacet ?f .
          ?f a uco-observable:ContentDataFacet ;
             uco-observable:hash ?hash .
        }
        """
        got = _both(triples, q)
        assert got == [("kb:rec1", "abc"), ("kb:rec2", "def")]

    def test_star_semicolon_comma(self, triples):
        # ',' object lists + SELECT * + comments
        q = """
        # every record's facets
        SELECT * WHERE { ?rec uco-core:hasFacet ?f . }
        """
        got = _both(triples, q)
        assert len(got) == 3

    def test_optional_filter_order_limit(self, triples):
        q = """
        SELECT ?f ?t ?h WHERE {
          ?f a ?t .
          OPTIONAL { ?f uco-observable:hash ?h }
          FILTER (?t != "uco-observable:URL" && ?t != "uco-observable:URLFacet")
        }
        ORDER BY ?f DESC(?t) LIMIT 2
        """
        got = sorted(map(tuple, sparql_query(triples, q).collect()))
        want = sorted(map(tuple, _duck_run(sparql_to_sql(q))))
        assert got == want and len(got) == 2

    def test_exists_minus_bind_values(self, triples):
        q = """
        SELECT ?rec ?tag WHERE {
          ?rec uco-core:hasFacet ?f .
          FILTER EXISTS { ?f uco-observable:hash ?h }
          MINUS { ?f a uco-observable:URLFacet }
          BIND (upper(?rec) AS ?tag)
          VALUES ?rec { kb:rec1 kb:rec2 }
        }
        """
        got = _both(triples, q)
        assert ("kb:rec1", "KB:REC1") in got and ("kb:rec2", "KB:REC2") in got

    def test_union_and_paths(self, triples):
        q = """
        SELECT ?rec ?f ?t WHERE {
          { ?rec uco-core:hasFacet ?f }
          UNION
          { ?rec a ?t }
        }
        """
        got = _both(triples, q)
        assert any(r[1] is None for r in got) and any(
            r[2] is None for r in got
        )
        # sequence path through text
        q2 = """SELECT ?rec ?t WHERE {
            ?rec uco-core:hasFacet/rdf:type ?t . }"""
        got2 = _both(triples, q2)
        assert ("kb:rec1", "uco-observable:URLFacet") in got2

    def test_ask_form(self, triples):
        q = """ASK { ?r uco-core:hasFacet ?f .
                     MINUS { ?f uco-observable:hash ?h } }"""
        got = sparql_query(triples, q).collect()
        assert got[0].matched is True  # f2 has no hash
        assert _duck_run(sparql_to_sql(q))[0][0] is True

    def test_distinct_offset(self, triples):
        q = """SELECT DISTINCT ?rec WHERE { ?rec uco-core:hasFacet ?f }
               ORDER BY ?rec LIMIT 5 OFFSET 1"""
        got = _both(triples, q)
        assert got == [("kb:rec2",)]

    def test_loud_unsupported(self, triples):
        with pytest.raises(SparqlSyntaxError, match="REGEX"):
            parse_sparql(
                'SELECT * WHERE { ?s ?p ?o FILTER regex(?o, "x") }'
            )
        spec_c = parse_sparql("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }")
        assert spec_c["form"] == "construct" and spec_c["template"]
        # a braced single group collapses to the group itself
        spec1 = parse_sparql("SELECT * WHERE { { ?s ?p ?o } }")
        assert spec1["blocks"][0]["patterns"] == [("?s", "?p", "?o")]
        with pytest.raises(SparqlSyntaxError, match="UNION inside"):
            parse_sparql(
                "SELECT * WHERE { ?s ?p ?o . "
                "OPTIONAL { { ?s ?q ?x } UNION { ?s ?r ?y } } }"
            )
        with pytest.raises(SparqlSyntaxError):
            parse_sparql("SELECT * WHERE { ?s ?p }")  # dangling triple
        # 'a' maps to rdf:type only as predicate
        spec = parse_sparql("SELECT * WHERE { a a a . }")
        assert spec["blocks"][0]["patterns"] == [("a", "rdf:type", "a")]


class TestConstructDescribeText:
    def test_construct_text_matches_duckdb(self, triples):
        q = """
        CONSTRUCT { ?rec drafting:hasFacetType ?t .
                    ?rec a drafting:Enriched . }
        WHERE { ?rec uco-core:hasFacet ?f .
                ?f a ?t . }
        """
        got = sorted(map(tuple, sparql_query(triples, q).collect()))
        want = sorted(map(tuple, _duck_run(sparql_to_sql(q))))
        assert got == want
        assert ("kb:rec1", "rdf:type", "drafting:Enriched") in got

    def test_describe_text(self, triples, spark):
        got = sparql_query(triples, "DESCRIBE kb:rec1").collect()
        subs = {r.subj for r in got}
        # rec1 plus its facets at hop 1
        assert "kb:rec1" in subs and "kb:f1" in subs
        with pytest.raises(SparqlSyntaxError, match="ground terms"):
            sparql_query(triples, "DESCRIBE ?x")
        with pytest.raises(SparqlSyntaxError, match="no single-SELECT"):
            sparql_to_sql("DESCRIBE kb:rec1")

    def test_construct_guards(self, triples):
        with pytest.raises(SparqlSyntaxError, match="only triple"):
            parse_sparql(
                "CONSTRUCT { ?s ?p ?o . FILTER (?s != 'x') } "
                "WHERE { ?s ?p ?o }"
            )


class TestAggregateText:
    def test_group_count_having_matches_duckdb(self, triples):
        q = """
        SELECT ?t (COUNT(*) AS ?n) (COUNT(DISTINCT ?rec) AS ?nrec)
        WHERE { ?rec uco-core:hasFacet ?f .
                ?f a ?t . }
        GROUP BY ?t
        HAVING (?n >= 1)
        ORDER BY ?t
        """
        got = _both(triples, q)
        assert got == [
            ("uco-observable:ContentDataFacet", 2, 2),
            ("uco-observable:URLFacet", 1, 1),
        ]

    def test_agg_limit_and_guards(self, triples):
        q = """SELECT ?t (COUNT(*) AS ?n) WHERE { ?f a ?t }
               GROUP BY ?t ORDER BY DESC(?n) ?t LIMIT 1"""
        got = _both(triples, q)
        assert got[0][1] == 2  # the commonest type wins
        with pytest.raises(SparqlSyntaxError, match="GROUP BY"):
            parse_sparql_and_run = sparql_to_sql(
                "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
            )
        with pytest.raises(SparqlSyntaxError, match="not in GROUP BY"):
            sparql_to_sql(
                "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p"
            )
        with pytest.raises(SparqlSyntaxError, match="aggregate"):
            parse_sparql(
                "SELECT (MEDIAN(?x) AS ?m) WHERE { ?s ?p ?x } GROUP BY ?s"
            )


def test_aggregate_with_minus_matches_duckdb(triples):
    # census of facet types, excluding hash-carrying facets via MINUS
    q = """
    SELECT ?t (COUNT(*) AS ?n) WHERE {
      ?f a ?t .
      MINUS { ?f uco-observable:hash ?h }
    } GROUP BY ?t ORDER BY ?t
    """
    got = _both(triples, q)
    # f2 (URLFacet, no hash) and the two URL records survive
    assert ("uco-observable:URLFacet", 1) in got
    assert ("uco-observable:URL", 2) in got
    assert all(t != "uco-observable:ContentDataFacet" or n == 0 for t, n in got)


class TestCommentsAndGuardMirrors:
    """Round-5 regressions: # inside literals/IRIs survives comment
    stripping; sparql_to_sql raises exactly where sparql_query does."""

    def test_hash_inside_string_literal(self, triples):
        # FILTER literal containing ' # ' must not be truncated
        q = ('SELECT ?s WHERE { ?s uco-observable:hash ?h . '
             'FILTER(?h != "a # b") } # trailing comment')
        got = _both(triples, q)
        assert {r[0] for r in got} == {"kb:f1", "kb:f3"}

    def test_hash_inside_iri(self):
        from case_uco_ontology_map_spark.operators.sparql import _tokenize

        toks = _tokenize("?s ?p <http://ex.org/x#frag> . # gone")
        assert "<http://ex.org/x#frag>" in toks
        assert not any("gone" in t for t in toks)

    def test_sql_twin_raises_like_engine(self, triples):
        # CONSTRUCT with MINUS: engine raises — the SQL twin must too,
        # never silently emit weaker SQL
        q_c = ("CONSTRUCT { ?s a ?t } WHERE { ?s a ?t . "
               "MINUS { ?s uco-observable:hash ?h } }")
        with pytest.raises(SparqlSyntaxError):
            sparql_query(triples, q_c)
        with pytest.raises(SparqlSyntaxError):
            sparql_to_sql(q_c)
        q_a = 'ASK { ?s a ?t . BIND(?t AS ?x) }'
        with pytest.raises(SparqlSyntaxError):
            sparql_query(triples, q_a)
        with pytest.raises(SparqlSyntaxError):
            sparql_to_sql(q_a)


class TestDefaultHopBound:
    """The text front end bounds user-pasted closure paths by default
    (DEFAULT_PATH_MAX_HOPS) with a loud RuntimeWarning; the programmatic
    API stays unbounded."""

    @pytest.fixture(scope="class")
    def chain(self, spark):
        # linear provenance chain n0 -> n1 -> ... -> n20 (20 edges)
        rows = [(f"n{i}", "derivedFrom", f"n{i+1}") for i in range(20)]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_pasted_closure_stops_at_bound(self, chain):
        import warnings

        from case_uco_ontology_map_spark.operators.sparql import (
            DEFAULT_PATH_MAX_HOPS,
        )

        q = "SELECT ?a ?b WHERE { ?a derivedFrom+ ?b }"
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = sparql_query(chain, q).collect()
        assert any(
            issubclass(x.category, RuntimeWarning)
            and "derivedFrom+" in str(x.message)
            for x in w
        ), [str(x.message) for x in w]
        # pairs per start are capped at the bound; n0 reaches only 16 of
        # its 20 ancestors
        per_a = {}
        for r in got:
            per_a.setdefault(r.a, set()).add(r.b)
        assert len(per_a["n0"]) == DEFAULT_PATH_MAX_HOPS
        assert "n16" in per_a["n0"] and "n17" not in per_a["n0"]

    def test_none_gives_full_closure_no_warning(self, chain):
        import warnings

        q = "SELECT ?a ?b WHERE { ?a derivedFrom+ ?b }"
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = sparql_query(chain, q, path_max_hops=None).collect()
        assert not [x for x in w if issubclass(x.category, RuntimeWarning)]
        full = {(r.a, r.b) for r in got}
        assert ("n0", "n20") in full
        assert len(full) == 20 * 21 // 2

    def test_no_warning_without_path(self, chain):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            sparql_query(chain, "SELECT ?a WHERE { ?a derivedFrom ?b }")
        assert not [x for x in w if issubclass(x.category, RuntimeWarning)]


class TestSparqlUpdate:
    """SPARQL 1.1 Update subset: hand-pinned result sets (independent of
    both engines), cross-engine twin equality, and the loud refusals."""

    ROWS = [
        ("kb:a", "rdf:type", "ex:Old"),
        ("kb:b", "rdf:type", "ex:Old"),
        ("kb:a", "ex:name", "alpha"),
        ("kb:c", "rdf:type", "ex:New"),
    ]

    @pytest.fixture(scope="class")
    def graph(self, spark):
        return spark.createDataFrame(
            self.ROWS, "subj string, pred string, obj string"
        )

    def _duck(self):
        con = duckdb.connect()
        con.register(
            "t_src", pd.DataFrame(self.ROWS, columns=["subj", "pred", "obj"])
        )
        return con

    def _both(self, graph, q):
        from case_uco_ontology_map_spark.operators.sparql import (
            sparql_update,
            sparql_update_sql,
        )

        got = {tuple(r) for r in sparql_update(graph, q).collect()}
        want = {
            tuple(r)
            for r in self._duck().execute(
                "WITH t AS (SELECT * FROM t_src) " + sparql_update_sql(q)
            ).fetchall()
        }
        assert got == want
        return got

    def test_insert_data_set_semantics(self, graph):
        # re-asserting an existing triple is a no-op (graph is a set)
        got = self._both(
            graph,
            "INSERT DATA { kb:d rdf:type ex:New . kb:a rdf:type ex:Old }",
        )
        assert got == set(self.ROWS) | {("kb:d", "rdf:type", "ex:New")}

    def test_delete_data_exact_rows_only(self, graph):
        got = self._both(
            graph, "DELETE DATA { kb:a ex:name alpha . kb:x ex:p y }"
        )
        assert got == set(self.ROWS) - {("kb:a", "ex:name", "alpha")}

    def test_delete_where_pattern_is_template(self, graph):
        got = self._both(graph, "DELETE WHERE { ?x rdf:type ex:Old }")
        assert got == {
            ("kb:a", "ex:name", "alpha"), ("kb:c", "rdf:type", "ex:New")
        }

    def test_modify_delete_insert_original_state(self, graph):
        # schema migration: Old → Migrated; bindings evaluate against
        # the ORIGINAL graph (spec §3.1.3), delete leaves, insert enters
        got = self._both(
            graph,
            "DELETE { ?x rdf:type ex:Old } "
            "INSERT { ?x rdf:type ex:Migrated } "
            "WHERE { ?x rdf:type ex:Old }",
        )
        assert got == {
            ("kb:a", "rdf:type", "ex:Migrated"),
            ("kb:b", "rdf:type", "ex:Migrated"),
            ("kb:a", "ex:name", "alpha"),
            ("kb:c", "rdf:type", "ex:New"),
        }

    def test_insert_where_with_optional_null_drop(self, graph):
        # unbound OPTIONAL var → that template row drops, per spec
        got = self._both(
            graph,
            "INSERT { ?x ex:label ?n } "
            "WHERE { ?x rdf:type ex:Old . OPTIONAL { ?x ex:name ?n } }",
        )
        assert got == set(self.ROWS) | {("kb:a", "ex:label", "alpha")}

    def test_delete_insert_rederive_keeps_triple(self, graph):
        # delete + re-insert the same triple: INSERT wins (G\D ∪ I)
        got = self._both(
            graph,
            "DELETE { ?x ex:name ?n } INSERT { ?x ex:name ?n } "
            "WHERE { ?x ex:name ?n }",
        )
        assert got == set(self.ROWS)

    def test_refusals_mirror_both_engines(self, graph):
        from case_uco_ontology_map_spark.operators.sparql import (
            SparqlSyntaxError,
            sparql_update,
            sparql_update_sql,
        )

        bad = [
            # UNION in WHERE
            "DELETE { ?x ?p ?o } WHERE { { ?x ?p ?o } UNION { ?o ?p ?x } }",
            # property path in a template
            "INSERT { ?x ex:anc+ ?y } WHERE { ?x ex:anc ?y }",
            # variable in ground DATA
            "INSERT DATA { ?x rdf:type ex:T }",
            # FILTER inside DELETE WHERE (pattern doubles as template)
            'DELETE WHERE { ?x ?p ?o FILTER(?p = "rdf:type") }',
            # named-graph forms
            "WITH kb:g DELETE { ?x ?p ?o } WHERE { ?x ?p ?o }",
            # two operations in one request
            "DELETE DATA { kb:a ex:name alpha } ; INSERT DATA { kb:d ex:p v }",
        ]
        for q in bad:
            with pytest.raises(SparqlSyntaxError):
                sparql_update(graph, q)
            with pytest.raises(SparqlSyntaxError):
                sparql_update_sql(q)

    def test_unbound_template_variable_raises(self, graph):
        from case_uco_ontology_map_spark.operators.sparql import (
            SparqlSyntaxError,
            sparql_update,
        )

        with pytest.raises(SparqlSyntaxError):
            sparql_update(
                graph,
                "INSERT { ?x ex:p ?missing } WHERE { ?x rdf:type ex:Old }",
            ).collect()

    def test_bounded_path_in_where_warns(self, spark):
        import warnings

        from case_uco_ontology_map_spark.operators.sparql import (
            sparql_update,
        )

        chain = spark.createDataFrame(
            [(f"n{i}", "ex:anc", f"n{i+1}") for i in range(6)],
            "subj string, pred string, obj string",
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = sparql_update(
                chain,
                "INSERT { ?a ex:reach ?b } WHERE { ?a ex:anc+ ?b }",
                path_max_hops=2,
            )
            got = {tuple(r) for r in out.collect()}
        assert [x for x in w if issubclass(x.category, RuntimeWarning)]
        # hops ≤ 2 only
        assert ("n0", "ex:reach", "n2") in got
        assert ("n0", "ex:reach", "n3") not in got


class TestGraphClause:
    """GRAPH <g> / GRAPH ?g through the text front end — parity with the
    programmatic quad_query, plus the documented-subset refusals on BOTH
    the engine and the SQL twin."""

    def _quads(self, spark):
        rows = [
            ("g1", "a", "p", "b"),
            ("g1", "b", "q", "c"),
            ("g2", "a", "p", "b2"),
            ("g2", "b2", "q", "c2"),
            ("g2", "b", "q", "X"),
        ]
        return spark.createDataFrame(
            rows, "graph string, subj string, pred string, obj string"
        )

    def test_variable_graph_text(self, spark):
        from case_uco_ontology_map_spark.operators.sparql import (
            sparql_query,
        )

        out = sparql_query(
            self._quads(spark),
            "SELECT ?g ?s ?x WHERE { GRAPH ?g { ?s p ?o . ?o q ?x } }",
        )
        assert {tuple(r) for r in out.collect()} == {
            ("g1", "a", "c"), ("g2", "a", "c2")
        }

    def test_constant_graph_text_full_features(self, spark):
        from case_uco_ontology_map_spark.operators.sparql import (
            sparql_query,
        )

        out = sparql_query(
            self._quads(spark),
            "SELECT ?s ?x WHERE { GRAPH g2 { ?s p ?o "
            "OPTIONAL { ?o q ?x } } }",
        )
        assert {tuple(r) for r in out.collect()} == {("a", "c2")}

    def test_graph_refusals_mirror(self, spark):
        import pytest

        from case_uco_ontology_map_spark.operators.sparql import (
            SparqlSyntaxError,
            sparql_query,
            sparql_to_sql,
        )

        q = self._quads(spark)
        ask = "ASK WHERE { GRAPH ?g { ?s p ?o } }"
        with pytest.raises(SparqlSyntaxError, match="SELECT-only"):
            sparql_query(q, ask)
        mixed = ("SELECT ?s WHERE { ?s p ?o . "
                 "GRAPH ?g { ?o q ?x } }")
        with pytest.raises(SparqlSyntaxError, match="only element"):
            sparql_query(q, mixed)
        inside_opt = ("SELECT ?s WHERE { ?s p ?o "
                      "OPTIONAL { GRAPH ?g { ?o q ?x } } }")
        with pytest.raises(SparqlSyntaxError, match="GRAPH inside"):
            sparql_query(q, inside_opt)
        var_with_opt = ("SELECT ?s WHERE { GRAPH ?g { ?s p ?o "
                        "OPTIONAL { ?o q ?x } } }")
        with pytest.raises(ValueError, match="constant graph"):
            sparql_query(q, var_with_opt)
        # the SQL twin refuses loudly instead of emitting
        # graph-blind SQL
        with pytest.raises(SparqlSyntaxError, match="quad-aware"):
            sparql_to_sql(
                "SELECT ?s WHERE { GRAPH ?g { ?s p ?o } }"
            )

    def test_graph_text_matches_programmatic(self, spark):
        from case_uco_ontology_map_spark.operators.graphquery import (
            quad_query,
        )
        from case_uco_ontology_map_spark.operators.sparql import (
            sparql_query,
        )

        q = self._quads(spark)
        text = sparql_query(
            q,
            "SELECT DISTINCT ?g ?s ?o WHERE { GRAPH ?g { ?s p ?o } } "
            "ORDER BY ?g LIMIT 2",
        )
        prog = quad_query(
            q, "?g", [("?s", "p", "?o")],
            distinct=True, order_by=["g"], limit=2,
        )
        assert [tuple(r) for r in text.collect()] == [
            tuple(r) for r in prog.collect()
        ]


class TestAggregateTail:
    """GROUP_CONCAT + SAMPLE (r5s7): the spec leaves both
    nondeterministic; the engine pins GROUP_CONCAT to sorted element
    order and SAMPLE to min() on BOTH engines — hand-pinned here, and
    cross-engine via the independently-written DuckDB expression
    (collect_list/sort_array vs list/list_sort — no shared SQL)."""

    def test_group_concat_hand_pinned(self, triples):
        q = """
        SELECT ?rec (GROUP_CONCAT(?t; SEPARATOR="|") AS ?types)
        WHERE { ?rec uco-core:hasFacet ?f . ?f a ?t . }
        GROUP BY ?rec ORDER BY ?rec
        """
        got = _both(triples, q)
        assert got == [
            ("kb:rec1",
             "uco-observable:ContentDataFacet|uco-observable:URLFacet"),
            ("kb:rec2", "uco-observable:ContentDataFacet"),
        ]

    def test_group_concat_distinct_default_sep(self, triples):
        # two facets of rec1+rec2 share a type → DISTINCT collapses;
        # default separator is a single space per the SPARQL spec
        q = """
        SELECT ?p (GROUP_CONCAT(DISTINCT ?t) AS ?types)
        WHERE { ?s ?p ?f . ?f a ?t . }
        GROUP BY ?p ORDER BY ?p
        """
        got = _both(triples, q)
        assert got == [
            ("uco-core:hasFacet",
             "uco-observable:ContentDataFacet uco-observable:URLFacet"),
        ]

    def test_sample_is_min_both_engines(self, triples):
        q = """
        SELECT ?rec (SAMPLE(?f) AS ?one) (COUNT(*) AS ?n)
        WHERE { ?rec uco-core:hasFacet ?f . }
        GROUP BY ?rec ORDER BY ?rec
        """
        got = _both(triples, q)
        assert got == [("kb:rec1", "kb:f1", 2), ("kb:rec2", "kb:f3", 1)]

    def test_group_concat_optional_null_values_drop(self, triples):
        # f2 has no hash → its NULL must not contribute an element (nor
        # a leading separator) on EITHER engine (collect_list drops
        # NULLs; the DuckDB twin FILTERs them explicitly)
        q = """
        SELECT ?rec (GROUP_CONCAT(?h; SEPARATOR=",") AS ?hashes)
        WHERE { ?rec uco-core:hasFacet ?f .
                OPTIONAL { ?f uco-observable:hash ?h . } }
        GROUP BY ?rec ORDER BY ?rec
        """
        got = _both(triples, q)
        assert got == [("kb:rec1", "abc"), ("kb:rec2", "def")]

    def test_refusals(self, triples):
        with pytest.raises(SparqlSyntaxError, match="SEPARATOR"):
            parse_sparql(
                'SELECT ?r (GROUP_CONCAT(?f; SEP="|") AS ?x) '
                "WHERE { ?r uco-core:hasFacet ?f . } GROUP BY ?r"
            )
        with pytest.raises(SparqlSyntaxError, match="not supported"):
            parse_sparql(
                "SELECT ?r (MEDIAN(?f) AS ?x) "
                "WHERE { ?r uco-core:hasFacet ?f . } GROUP BY ?r"
            )
        with pytest.raises(SparqlSyntaxError, match="quoted string"):
            parse_sparql(
                "SELECT ?r (GROUP_CONCAT(?f; SEPARATOR= bare) AS ?x) "
                "WHERE { ?r uco-core:hasFacet ?f . } GROUP BY ?r"
            )


class TestStringBuiltins:
    """SPARQL 1.1 string builtins in FILTER — the portable subset:
    renames (STRLEN/UCASE/LCASE/SUBSTR/CONTAINS) and the structural
    STRSTARTS/STRENDS → left/right comparison."""

    def test_strstarts_contains_cross_engine(self, triples):
        q = """
        SELECT ?f ?t WHERE {
          ?f a ?t .
          FILTER(STRSTARTS(?t, "uco-observable:") && CONTAINS(?t, "Facet"))
        } ORDER BY ?f
        """
        got = _both(triples, q)
        assert got == [
            ("kb:f1", "uco-observable:ContentDataFacet"),
            ("kb:f2", "uco-observable:URLFacet"),
            ("kb:f3", "uco-observable:ContentDataFacet"),
        ]

    def test_negated_strends_glued_token(self, triples):
        # "!STRENDS" lexes as one word — the rewriter must split the
        # prefix negation, not treat it as an unknown function
        q = """
        SELECT ?f ?t WHERE {
          ?f a ?t .
          FILTER(!STRENDS(?t, "Facet"))
        } ORDER BY ?f
        """
        got = _both(triples, q)
        assert got == [
            ("kb:rec1", "uco-observable:URL"),
            ("kb:rec2", "uco-observable:URL"),
        ]

    def test_nested_renames_substr_ucase_strlen(self, triples):
        q = """
        SELECT ?t WHERE {
          ?f a ?t .
          FILTER(UCASE(SUBSTR(?t, 16, 3)) = "URL" && STRLEN(?t) < 30
                 && LCASE(?t) != ?t)
        } ORDER BY ?t
        """
        got = _both(triples, q)
        # rec1 and rec2 are both typed URL → two URL rows (no DISTINCT)
        assert got == [
            ("uco-observable:URL",),
            ("uco-observable:URL",),
            ("uco-observable:URLFacet",),
        ]

    def test_direct_call_filter_form(self, triples):
        # FILTER STRSTARTS(...) without wrapping parens — the direct
        # constraint-call form re-enters the structural rewriter
        q = """
        SELECT ?f WHERE {
          ?f uco-observable:hash ?h .
          FILTER STRSTARTS(?h, "a")
        }
        """
        got = _both(triples, q)
        assert got == [("kb:f1",)]

    def test_empty_needle_is_true(self, triples):
        # SPARQL: STRSTARTS(x, "") is true for every bound x
        q = """
        SELECT ?f WHERE {
          ?f uco-observable:hash ?h .
          FILTER(STRSTARTS(?h, ""))
        } ORDER BY ?f
        """
        got = _both(triples, q)
        assert got == [("kb:f1",), ("kb:f3",)]

    def test_string_builtin_refusals(self, triples):
        with pytest.raises(SparqlSyntaxError, match="plain string literal"):
            parse_sparql(
                "SELECT ?f WHERE { ?f a ?t . FILTER(STRSTARTS(?t, ?f)) }"
            )
        with pytest.raises(SparqlSyntaxError, match="backslash"):
            parse_sparql(
                'SELECT ?f WHERE { ?f a ?t . FILTER(STRENDS(?t, "a\\\\b")) }'
            )
        with pytest.raises(SparqlSyntaxError, match="datatype/lang"):
            parse_sparql(
                "SELECT ?f WHERE { ?f a ?t . "
                'FILTER(STRSTARTS(?t, "x"@en)) }'
            )
        with pytest.raises(SparqlSyntaxError, match="REGEX"):
            parse_sparql(
                'SELECT ?f WHERE { ?f a ?t . FILTER(REGEX(?t, "x")) }'
            )
        with pytest.raises(SparqlSyntaxError, match="2 arguments"):
            parse_sparql(
                'SELECT ?f WHERE { ?f a ?t . FILTER(STRSTARTS(?t)) }'
            )
