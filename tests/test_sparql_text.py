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
