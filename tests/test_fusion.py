"""Knowledge fusion (operators/fusion.py): corroboration counts,
trust-weighted truth discovery, token-overlap schema alignment, and the
predicate rewrite — expectations hand-computed."""

from pyspark.sql import functions as F

from case_uco_ontology_map_spark.operators.fusion import (
    align_predicates,
    extractor_corroboration,
    fuse_assertions,
    pred_local,
    rewrite_predicates,
)


def test_pred_local_spellings(spark):
    df = spark.createDataFrame(
        [
            ("https://schema.org/name",),
            ("uco-observable:hash",),
            ("og:title",),
            ("http://ex.org/v#frag",),
            ("plain",),
        ],
        "p string",
    )
    got = [r.l for r in df.select(pred_local(F.col("p")).alias("l")).collect()]
    assert got == ["name", "hash", "title", "frag", "plain"]


def test_extractor_corroboration(spark):
    rows = [
        # three channels agree on name=Widget; json adds rank
        ("u1", "s1", "schema:name", "Widget", "jsonld"),
        ("u1", "u1", "meta:name", "Widget", "meta"),
        ("u1", "s2", "https://schema.org/name", "Widget", "microdata"),
        ("u1", "s1", "schema:rank", "3", "jsonld"),
        # same channel twice is ONE extractor
        ("u2", "s3", "schema:name", "Gad", "jsonld"),
        ("u2", "s4", "schema:name", "Gad", "jsonld"),
    ]
    df = spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, "
        "extractor string"
    )
    got = {
        (r.url, r.prop, r.obj, r.n_extractors, r.extractors)
        for r in extractor_corroboration(df).collect()
    }
    assert got == {
        ("u1", "name", "Widget", 3, "jsonld,meta,microdata"),
        ("u1", "rank", "3", 1, "jsonld"),
        ("u2", "name", "Gad", 1, "jsonld"),
    }


def test_fuse_assertions_exact(spark):
    rows = [
        ("e1", "p", "good", "curated"),
        ("e1", "p", "bad", "scrape1"),
        ("e1", "p", "bad", "scrape2"),
        # true tie: two weight-1 sources each side
        ("e2", "p", "bbb", "scrape1"),
        ("e2", "p", "aaa", "scrape2"),
        ("e3", "q", "only", "scrape1"),
    ]
    a = spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string"
    )
    trust = spark.createDataFrame(
        [("curated", 3), ("scrape1", 1), ("scrape2", 1)],
        "source string, weight int",
    )
    got = {
        (r.subj, r.pred, r.obj, r.score, r.n_sources)
        for r in fuse_assertions(a, trust).collect()
    }
    assert got == {
        ("e1", "p", "good", 3, 1),
        ("e2", "p", "aaa", 1, 1),  # 1 vs 1 tie → min object
        ("e3", "q", "only", 1, 1),
    }
    # without a trust table every source votes 1 → majority wins
    got2 = {
        (r.subj, r.pred, r.obj, r.score)
        for r in fuse_assertions(a).collect()
    }
    assert ("e1", "p", "bad", 2) in got2


def test_align_predicates_overlap_and_ties(spark):
    props = spark.createDataFrame(
        [("fileSize",), ("created_time",), ("zzz",)], "prop string"
    )
    vocab = spark.createDataFrame(
        [
            ("File", "fileName"),
            ("File", "createdTime"),
            ("ObservableObject", "sizeInBytes"),
        ],
        "owner string, prop_name string",
    )
    got = {
        (r.prop, r.owner, r.prop_name, r.score)
        for r in align_predicates(props, vocab).collect()
    }
    assert got == {
        # {file,size}: fileName and sizeInBytes both overlap 1 →
        # lexicographic (owner, prop_name) tie-break picks File/fileName
        ("fileSize", "File", "fileName", 1),
        # {created,time} ∩ {created,time} = 2 — unique best
        ("created_time", "File", "createdTime", 2),
        # zzz matches nothing → absent
    }


def test_rewrite_predicates_bridge(spark):
    triples = spark.createDataFrame(
        [
            ("s", "schema:contentSize", "9", False),
            ("s", "schema:unmappable", "x", False),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    alignment = spark.createDataFrame(
        [("contentSize", "ObservableObject", "sizeInBytes", 2)],
        "prop string, owner string, prop_name string, score long",
    )
    got = {
        (r.pred, r.obj) for r in rewrite_predicates(triples, alignment).collect()
    }
    assert got == {
        ("uco-observable:sizeInBytes", "9"),
        ("schema:unmappable", "x"),
    }


def test_fusion_plans(spark):
    """Scale guards: trust and vocab ride broadcasts; no Python; no
    cartesian joins; fuse/align argmax is window-free."""
    a = spark.createDataFrame(
        [("s", "p", "o", "src")],
        "subj string, pred string, obj string, source string",
    )
    trust = spark.createDataFrame(
        [("src", 2)], "source string, weight int"
    )
    fused = fuse_assertions(a, trust)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Cartesian" not in plan
    assert "Window" not in plan, "fuse argmax must be window-free"
    assert "BroadcastHashJoin" in plan, "trust must broadcast"

    props = spark.createDataFrame([("ab",)], "prop string")
    vocab = spark.createDataFrame(
        [("O", "ab")], "owner string, prop_name string"
    )
    al = align_predicates(props, vocab)
    plan2 = al._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan2 and "Window" not in plan2
    assert "BroadcastHashJoin" in plan2, "vocab must broadcast"

    rw = rewrite_predicates(
        spark.createDataFrame(
            [("s", "p:x", "o", False)],
            "subj string, pred string, obj string, obj_is_iri boolean",
        ),
        al,
    )
    plan3 = rw._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan3, "alignment map must broadcast"


def test_property_profile(spark):
    from case_uco_ontology_map_spark.operators.fusion import (
        property_profile,
    )

    rows = [
        # sku: functional AND inverse-functional (1:1), dup collapses
        ("a", "sku", "S1"), ("b", "sku", "S2"), ("b", "sku", "S2"),
        # color: a has two colors → not functional; 'red' shared → not
        # inverse-functional
        ("a", "color", "red"), ("a", "color", "blue"),
        ("b", "color", "red"),
        # type: functional but many subjects share one object
        ("a", "type", "T"), ("b", "type", "T"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (
            r.pred, r.n_assertions, r.n_subjects, r.n_objects,
            r.max_objs_per_subj, r.max_subjs_per_obj,
            r.is_functional, r.is_inverse_functional,
        )
        for r in property_profile(df).collect()
    }
    assert got == {
        ("sku", 2, 2, 2, 1, 1, True, True),
        ("color", 3, 2, 2, 2, 2, False, False),
        ("type", 2, 2, 1, 1, 2, True, False),
    }


def test_fuse_assertions_one_vote_per_fact_and_source(spark):
    """A source re-asserting the same fact on many pages votes once;
    two independent sources beat one spammy source."""
    rows = [
        ("s", "p", "wrong", "A"), ("s", "p", "wrong", "A"),
        ("s", "p", "wrong", "A"),
        ("s", "p", "right", "B"), ("s", "p", "right", "C"),
    ]
    a = spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string"
    )
    got = fuse_assertions(a).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.obj, r.score, r.n_sources) == ("right", 2, 2)


def test_rewrite_predicates_protects_rdf_type(spark):
    """rdf:type must never be remapped even when 'type' is aligned
    (e.g. to mimeType); empty-local-name predicates pass through."""
    triples = spark.createDataFrame(
        [
            ("s", "rdf:type", "schema:Thing", True),
            ("s", "og:type", "article", False),
            ("s", "https://schema.org/", "artifact", False),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    alignment = spark.createDataFrame(
        [("type", "ContentData", "mimeType", 1)],
        "prop string, owner string, prop_name string, score long",
    )
    got = {
        (r.pred, r.obj)
        for r in rewrite_predicates(triples, alignment).collect()
    }
    assert got == {
        ("rdf:type", "schema:Thing"),  # protected
        ("uco-observable:mimeType", "article"),  # og:type DOES map
        ("https://schema.org/", "artifact"),  # empty local: untouched
    }


def test_corroboration_empty_local_name_keeps_full_pred(spark):
    df = spark.createDataFrame(
        [("u", "s", "https://schema.org/", "x", "jsonld")],
        "url string, subj string, pred string, obj string, "
        "extractor string",
    )
    got = extractor_corroboration(df).collect()
    assert got[0].prop == "https://schema.org/"


def test_functional_violations_hand_computed(spark):
    from case_uco_ontology_map_spark.operators.fusion import (
        functional_violations,
    )

    rows = [
        # s1 violates fp:title with 3 distinct objects (one duplicated)
        ("s1", "fp:title", "B"),
        ("s1", "fp:title", "A"),
        ("s1", "fp:title", "C"),
        ("s1", "fp:title", "A"),
        # s2 is clean (one object, re-asserted)
        ("s2", "fp:title", "X"),
        ("s2", "fp:title", "X"),
        # multi-valued predicate not in the functional set: ignored
        ("s1", "mv:tag", "t1"),
        ("s1", "mv:tag", "t2"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.pred, r.subj, r.n_objects, r.objects)
        for r in functional_violations(df, ["fp:title"], sample_k=2).collect()
    }
    assert got == {("fp:title", "s1", 3, "A|B")}


def test_functional_violations_requires_preds(spark):
    import pytest

    from case_uco_ontology_map_spark.operators.fusion import (
        functional_violations,
    )

    df = spark.createDataFrame([("s", "p", "o")],
                               "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        functional_violations(df, [])


def test_ifp_sameas_candidates_star_and_cap(spark):
    from case_uco_ontology_map_spark.operators.fusion import (
        ifp_sameas_candidates,
    )

    rows = [
        # isbn K1 shared by 3 subjects -> 3 star rows, canonical = a
        ("a", "id:isbn", "K1"),
        ("c", "id:isbn", "K1"),
        ("b", "id:isbn", "K1"),
        ("b", "id:isbn", "K1"),      # re-assertion collapses
        # isbn K2 held by one subject -> no candidates
        ("z", "id:isbn", "K2"),
        # junk key shared by 4 subjects > max_group=3 -> dropped
        ("j1", "id:isbn", "N/A"),
        ("j2", "id:isbn", "N/A"),
        ("j3", "id:isbn", "N/A"),
        ("j4", "id:isbn", "N/A"),
        # non-IFP predicate ignored entirely
        ("a", "schema:name", "K1"),
        ("b", "schema:name", "K1"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.pred, r.key, r.subj, r.canonical, r.group_size)
        for r in ifp_sameas_candidates(df, ["id:isbn"], max_group=3).collect()
    }
    assert got == {
        ("id:isbn", "K1", "a", "a", 3),
        ("id:isbn", "K1", "b", "a", 3),
        ("id:isbn", "K1", "c", "a", 3),
    }


def test_induce_shapes_hand_computed(spark):
    """Shape induction on a hand-built graph: min_count only when every
    class subject asserts the predicate; max_count = max distinct objs
    per subject; nodekind IRI/Literal/Mixed; datatype only when every
    literal carries the single tag. Spark and the SQL twin agree."""
    import duckdb
    import pandas as pd

    from case_uco_ontology_map_spark.operators.fusion import (
        induce_shapes,
        induce_shapes_sql,
    )

    rows = [
        ("kb:u1", "rdf:type", "ex:URL", True, None),
        ("kb:u2", "rdf:type", "ex:URL", True, None),
        ("kb:u1", "ex:href", "http://a", False, "xsd:anyURI"),
        ("kb:u2", "ex:href", "http://b", False, "xsd:anyURI"),
        ("kb:u1", "ex:tag", "kb:t1", True, None),
        ("kb:u1", "ex:tag", "kb:t2", True, None),
        ("kb:u1", "ex:mix", "kb:t1", True, None),
        ("kb:u1", "ex:mix", "plain", False, None),
        ("kb:f1", "rdf:type", "ex:Facet", True, None),
        ("kb:f1", "ex:val", "5", False, "xsd:integer"),
        ("kb:f1", "ex:plain", "x", False, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string",
    )
    got = sorted(map(tuple, induce_shapes(df).collect()))
    assert got == [
        ("ex:Facet", "ex:plain", 1, 1, 1, 1, 1, "Literal", None),
        ("ex:Facet", "ex:val", 1, 1, 1, 1, 1, "Literal", "xsd:integer"),
        ("ex:URL", "ex:href", 2, 2, 2, 1, 1, "Literal", "xsd:anyURI"),
        ("ex:URL", "ex:mix", 2, 1, 2, 0, 2, "Mixed", None),
        ("ex:URL", "ex:tag", 2, 1, 2, 0, 2, "IRI", None),
    ]
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            rows,
            columns=["subj", "pred", "obj", "obj_is_iri", "obj_datatype"],
        ),
    )
    want = sorted(map(tuple, con.execute(induce_shapes_sql("t")).fetchall()))
    assert got == want


def test_shape_triples_render_shacl_turtle(spark):
    """induce → shape_triples → turtle_lines produces loadable SHACL
    Turtle: constraints gated correctly (no minCount 0, no unbounded
    maxCount, no nodeKind on Mixed, no datatype when absent), and the
    rendered block matches a hand-written expectation."""
    from case_uco_ontology_map_spark.operators.fusion import (
        induce_shapes,
        shape_triples,
    )
    from case_uco_ontology_map_spark.operators.render import (
        NT_PREFIXES,
        turtle_lines,
    )

    rows = [
        ("kb:u1", "rdf:type", "ex:URL", True, None),
        ("kb:u1", "ex:href", "http://a", False, "xsd:anyURI"),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string",
    )
    st = shape_triples(induce_shapes(df))
    preds = {r.pred for r in st.collect()}
    assert "sh:minCount" in preds and "sh:maxCount" in preds
    pfx = {**NT_PREFIXES, "sh": "http://www.w3.org/ns/shacl#"}
    blocks = {
        r.subj: r.block for r in turtle_lines(st, prefixes=pfx).collect()
    }
    assert blocks["kb:shp-ex_URL-ex_href"] == (
        "kb:shp-ex_URL-ex_href sh:datatype xsd:anyURI ;\n"
        '    sh:maxCount "1"^^xsd:integer ;\n'
        '    sh:minCount "1"^^xsd:integer ;\n'
        "    sh:nodeKind sh:Literal ;\n"
        "    sh:path <ex:href> ."
    )
    assert blocks["kb:shp-ex_URL"] == (
        "kb:shp-ex_URL a sh:NodeShape ;\n"
        "    sh:property kb:shp-ex_URL-ex_href ;\n"
        "    sh:targetClass <ex:URL> ."
    )


def test_shape_conformance_hand_computed(spark):
    """All four constraint families on a hand-corrupted graph: u2 loses
    href (min_count), gains a second size (max_count); u1's size is
    retagged xsd:string (datatype) and gains an IRI href (node_kind —
    which also doubles href's value count, so max_count fires too).
    Spark and the SQL twin agree row for row."""
    import duckdb
    import pandas as pd

    from case_uco_ontology_map_spark.operators.fusion import (
        induce_shapes,
        induce_shapes_sql,
        shape_conformance,
        shape_conformance_sql,
    )

    clean = [
        ("kb:u1", "rdf:type", "ex:URL", True, None),
        ("kb:u2", "rdf:type", "ex:URL", True, None),
        ("kb:u1", "ex:href", "http://a", False, "xsd:anyURI"),
        ("kb:u2", "ex:href", "http://b", False, "xsd:anyURI"),
        ("kb:u1", "ex:size", "5", False, "xsd:integer"),
        ("kb:u2", "ex:size", "6", False, "xsd:integer"),
    ]
    dirty = [
        r for r in clean if not (r[0] == "kb:u2" and r[1] == "ex:href")
    ]
    dirty += [
        ("kb:u2", "ex:size", "7", False, "xsd:integer"),
        ("kb:u1", "ex:href", "kb:link", True, None),
    ]
    dirty = [
        ("kb:u1", "ex:size", "5", False, "xsd:string")
        if r == ("kb:u1", "ex:size", "5", False, "xsd:integer")
        else r
        for r in dirty
    ]
    sch = (
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string"
    )
    out = shape_conformance(
        spark.createDataFrame(dirty, sch),
        induce_shapes(spark.createDataFrame(clean, sch)),
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [
        ("kb:u1", "ex:URL", "ex:href", "max_count", "2"),
        ("kb:u1", "ex:URL", "ex:href", "node_kind", "kb:link"),
        ("kb:u1", "ex:URL", "ex:size", "datatype", "5"),
        ("kb:u2", "ex:URL", "ex:href", "min_count", "0"),
        ("kb:u2", "ex:URL", "ex:size", "max_count", "2"),
    ]
    con = duckdb.connect()
    cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype"]
    con.register("c", pd.DataFrame(clean, columns=cols))
    con.register("d", pd.DataFrame(dirty, columns=cols))
    want = sorted(
        map(
            tuple,
            con.execute(
                shape_conformance_sql("d", induce_shapes_sql("c"))
            ).fetchall(),
        )
    )
    assert got == want
