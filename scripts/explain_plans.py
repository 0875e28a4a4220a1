"""Dump formatted physical plans of the engine's key operators to PLANS.md —
the plan-quality evidence (pushdown, pruning, broadcast choice, shuffle
count, WholeStageCodegen spans) reviewed after each round."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def summarize(plan: str) -> str:
    exchanges = len(re.findall(r"\bExchange\b", plan))
    # Spark 4 formatted explain tags operators inside a whole-stage span
    # with "[codegen id : N]" — distinct ids = distinct codegen spans
    codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    bhj = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    return (
        f"shuffles(Exchange)={exchanges}, codegen_spans={codegen}, "
        f"broadcast_joins={bhj}, sortmerge_joins={smj}, "
        f"pushed_filters={[p for p in pushed if p] or 'none'}"
    )


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from case_uco_ontology_map_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
    )
    from case_uco_ontology_map_spark.operators.mentions import detect_mentions
    from case_uco_ontology_map_spark.operators.similarity import brute_force_topk
    from case_uco_ontology_map_spark.operators.textstats import quality_features
    from case_uco_ontology_map_spark.plans.pipeline import (
        extracted_pages,
        fused_page_triples,
    )
    from case_uco_ontology_map_spark.sources.corpus import web_corpus

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    corpus = web_corpus(spark, SF)
    queries = (
        emb.limit(2)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )

    from case_uco_ontology_map_spark.operators.mentions import (
        mentions_from_triples,
    )

    fused_with_markers = fused_page_triples(
        corpus, mentions=True, surface_markers=True
    )
    derived_mentions = mentions_from_triples(fused_with_markers)
    # single-scan with_mentions invariant: the derived mention stream is a
    # filter+from_json over the ONE fused kernel — exactly one Python
    # (mapInArrow/ArrowEval) node in its whole plan, never a second
    # extraction pass
    mention_plan = (
        derived_mentions._jdf.queryExecution().executedPlan().toString()
    )
    py_nodes = len(re.findall(r"ArrowEvalPython|PythonMapInArrow|MapInPandas", mention_plan))
    assert py_nodes == 1, (
        f"with_mentions mention stream must contain exactly ONE extraction "
        f"kernel, found {py_nodes} Python nodes"
    )

    sections = {
        "fused_page_triples (the 100 TB hot path)": fused_page_triples(corpus),
        "mentions_from_triples over the fused kernel (single-scan with_mentions)": derived_mentions,
        "extracted_pages with lang filter (pushdown check)": extracted_pages(
            corpus, lang="en"
        ),
        "quality_features (JVM-only, codegen)": quality_features(docs),
        "exact_dedup (single hash shuffle)": exact_dedup(docs),
        "minhash_dedup_pairs (LSH self-join)": minhash_dedup_pairs(
            docs.limit(500), threshold=0.5
        ),
        "detect_mentions (broadcast gazetteer)": detect_mentions(
            docs.select(F.col("doc_id").cast("string").alias("url"), "text")
        ),
        "brute_force_topk (broadcast queries + window)": brute_force_topk(
            emb, queries, k=3
        ),
    }

    from case_uco_ontology_map_spark.operators.decontam import decontaminate
    from case_uco_ontology_map_spark.operators.packing import pack_sequences
    from case_uco_ontology_map_spark.operators.sampling import split_columns
    from case_uco_ontology_map_spark.operators.temporal import (
        asof_join,
        range_join_points,
    )
    from case_uco_ontology_map_spark.streaming.ingest import sessionize

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    sessions = sessionize(
        ev, "ts", "30 minutes", keys=("user_id",),
        aggs=[F.count("*").alias("n_events")],
    )
    sections.update(
        {
            "asof_join (union + ONE window shuffle, no candidate explosion)": asof_join(
                clicks, views, ts_col="ts", by=("user_id",),
                right_cols=("event_id",),
            ),
            "range_join_points (bucketized equi-join, residual inside the join)": range_join_points(
                clicks, sessions, "ts", "session_start", "session_end",
                by=("user_id",), bucket="1 hour",
            ),
            "split_columns (hash gate: one filter expression, zero shuffle)": split_columns(
                docs, "doc_id", {"train": 0.8, "val": 0.1}
            ),
            "pack_sequences (one shuffle on bucket + Arrow state machine)": pack_sequences(
                docs.select("doc_id", F.length("text").alias("n_tokens")),
                max_tokens=4096, buckets=8,
            ),
            "decontaminate (benchmark grams broadcast; only (doc,bench) counts shuffle)": decontaminate(
                docs.select("doc_id", "text"),
                docs.filter(F.col("doc_id") % 25 == 0).select(
                    F.col("doc_id").alias("bench_id"), "text"
                ),
            ),
        }
    )
    # decontam scale invariant: the corpus-side gram stream must meet the
    # benchmark grams in a BROADCAST hash join — a sort-merge join here
    # would shuffle every document's gram strings
    decon_plan = plan_of(sections[
        "decontaminate (benchmark grams broadcast; only (doc,bench) counts shuffle)"
    ])
    assert "BroadcastHashJoin" in decon_plan and decon_plan.count(
        "SortMergeJoin"
    ) == 0, "decontaminate gram join must broadcast"

    from case_uco_ontology_map_spark.operators.canonicalize import (
        entity_minhash,
        incremental_candidate_edges,
    )
    from case_uco_ontology_map_spark.operators.dedup import (
        hash_index,
        incremental_exact_dedup,
    )
    from case_uco_ontology_map_spark.operators.graphquery import bgp_query
    from case_uco_ontology_map_spark.operators.spandedup import (
        duplicated_spans,
    )

    trip = spark.createDataFrame(
        [("kb:a", "uco-core:hasFacet", "kb:b")],
        "subj string, pred string, obj string",
    )
    bgp = bgp_query(
        trip,
        [
            ("?rec", "uco-core:hasFacet", "?facet"),
            ("?facet", "rdf:type", "uco-observable:ContentDataFacet"),
            ("?facet", "uco-observable:hash", "?hash"),
        ],
        select=["rec", "facet", "hash"],
    )
    # BGP invariant: a connected conjunction never plans a cartesian
    # product — every join is an equi-join on shared binding columns
    bgp_plan = plan_of(bgp)
    assert "Cartesian" not in bgp_plan, "bgp_query planned a cartesian join"

    ents = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.concat(F.col("source"), F.lit(" "), F.col("lang")).alias(
            "entity_key"
        ),
    )
    flagged = entity_minhash(ents).withColumn(
        "_is_new", F.col("entity_id") % 5 == 0
    )
    incr_cands = incremental_candidate_edges(flagged)
    # delta pairing stays JVM-only: no Python node may appear in the
    # bucket-skip path (exists() is a catalyst higher-order function)
    incr_plan = plan_of(incr_cands)
    assert not re.findall(
        r"ArrowEvalPython|PythonMapInArrow|MapInPandas|BatchEvalPython",
        incr_plan,
    ), "incremental_candidate_edges must not leave the JVM"

    spans = duplicated_spans(docs, width=8)
    span_plan = plan_of(spans)
    assert not re.findall(
        r"ArrowEvalPython|PythonMapInArrow|MapInPandas|BatchEvalPython",
        span_plan,
    ), "duplicated_spans must not leave the JVM"

    corpus_docs = docs.filter(F.col("doc_id") % 5 != 0)
    batch_docs = docs.filter(F.col("doc_id") % 5 == 0)
    incr_dedup = incremental_exact_dedup(batch_docs, hash_index(corpus_docs))

    from case_uco_ontology_map_spark.operators.graphquery import (
        transitive_closure,
    )
    from case_uco_ontology_map_spark.operators.graphstats import pagerank

    graph_edges = docs.select(
        (F.col("doc_id") + 1).alias("src"),
        F.expr("doc_id DIV 2").alias("dst"),
    ).filter(F.col("src") > F.col("dst"))
    # checkpoint_every=0 leaves the full lazy join tree visible so the
    # assertions inspect the REAL per-round shape, not a checkpoint scan
    closure = transitive_closure(graph_edges, max_hops=3, checkpoint_every=0)
    closure_plan = plan_of(closure)
    assert not re.findall(
        r"ArrowEvalPython|PythonMapInArrow|MapInPandas|BatchEvalPython",
        closure_plan,
    ), "transitive_closure must not leave the JVM"
    assert "Cartesian" not in closure_plan, (
        "transitive_closure planned a cartesian join"
    )

    pr = pagerank(graph_edges, iterations=2, checkpoint_every=0)
    pr_plan = plan_of(pr)
    assert not re.findall(
        r"ArrowEvalPython|PythonMapInArrow|MapInPandas|BatchEvalPython",
        pr_plan,
    ), "pagerank must not leave the JVM"
    assert "CartesianProduct" not in pr_plan, (
        "pagerank dangling-mass fold-in must broadcast the 1-row aggregate, "
        "not plan a shuffled cartesian product"
    )
    assert "BroadcastNestedLoopJoin" in pr_plan or "BroadcastExchange" in (
        pr_plan
    ), "pagerank dangling scalar should ride a broadcast"

    # ---- round-4 session additions -----------------------------------
    from case_uco_ontology_map_spark.operators.evalmetrics import (
        cluster_pair_metrics,
    )
    from case_uco_ontology_map_spark.operators.graphstats import (
        neighbor_jaccard,
        triangle_stats,
    )
    from case_uco_ontology_map_spark.operators.negatives import (
        negative_samples,
    )
    from case_uco_ontology_map_spark.operators.render import ntriples_lines
    from case_uco_ontology_map_spark.operators.textstats import (
        tfidf_top_terms,
    )

    _no_python = r"ArrowEvalPython|PythonMapInArrow|MapInPandas|BatchEvalPython"

    tri = triangle_stats(graph_edges)
    tri_plan = plan_of(tri)
    assert not re.findall(_no_python, tri_plan), (
        "triangle_stats must not leave the JVM"
    )
    assert "Cartesian" not in tri_plan, (
        "triangle_stats wedge probe must be an equi-join on the pair key"
    )

    nj = neighbor_jaccard(graph_edges, min_common=2)
    nj_plan = plan_of(nj)
    assert not re.findall(_no_python, nj_plan), (
        "neighbor_jaccard must not leave the JVM"
    )
    assert "Cartesian" not in nj_plan

    # N-Triples serialization is a pure projection: ZERO Exchange, zero
    # joins, no Python — one codegen'd string pipeline per partition
    nt = ntriples_lines(
        trip.withColumn("obj_is_iri", F.lit(True)).withColumn(
            "obj_datatype", F.lit(None).cast("string")
        )
    )
    nt_plan = plan_of(nt)
    assert "Exchange" not in nt_plan, "ntriples_lines must not shuffle"
    assert not re.findall(_no_python, nt_plan), (
        "ntriples_lines must not leave the JVM"
    )

    negs = negative_samples(
        trip.unionByName(
            spark.createDataFrame(
                [("kb:b", "uco-core:hasFacet", "kb:c")],
                "subj string, pred string, obj string",
            )
        ),
        k=2,
        buckets=16,
    )
    neg_plan = plan_of(negs)
    assert not re.findall(_no_python, neg_plan), (
        "negative_samples must not leave the JVM"
    )
    assert "CartesianProduct" not in neg_plan, (
        "negative_samples global-min fallback must broadcast"
    )
    assert neg_plan.count("BroadcastExchange") >= 2, (
        "negative_samples rep-map probes must ride broadcasts"
    )

    tfidf = tfidf_top_terms(docs, "source", k=5)
    tfidf_plan = plan_of(tfidf)
    assert not re.findall(_no_python, tfidf_plan), (
        "tfidf_top_terms must not leave the JVM"
    )

    from case_uco_ontology_map_spark.operators.graphquery import (
        bgp_construct,
        describe_nodes,
    )
    from case_uco_ontology_map_spark.operators.triples import diff_graphs

    two_edge = trip.unionByName(
        spark.createDataFrame(
            [("kb:b", "rdf:type", "uco-observable:URLFacet")],
            "subj string, pred string, obj string",
        )
    )
    cons = bgp_construct(
        two_edge,
        [("?r", "uco-core:hasFacet", "?f"), ("?f", "rdf:type", "?t")],
        [("?r", "drafting:hasFacetType", "?t")],
    )
    cons_plan = plan_of(cons)
    assert not re.findall(_no_python, cons_plan), (
        "bgp_construct must not leave the JVM"
    )
    assert "Cartesian" not in cons_plan

    desc = describe_nodes(
        two_edge.withColumn("obj_is_iri", F.lit(True)),
        spark.createDataFrame([("kb:a",)], "node string"),
        hops=1,
    )
    desc_plan = plan_of(desc)
    assert not re.findall(_no_python, desc_plan), (
        "describe_nodes must not leave the JVM"
    )
    assert "Cartesian" not in desc_plan

    dif = diff_graphs(trip, two_edge)
    dif_plan = plan_of(dif)
    assert not re.findall(_no_python, dif_plan), (
        "diff_graphs must not leave the JVM"
    )

    cpm = cluster_pair_metrics(
        docs.select("doc_id", F.col("source").alias("cluster")),
        docs.select("doc_id", F.col("lang").alias("cluster")),
        id_col="doc_id",
    )
    cpm_plan = plan_of(cpm)
    assert not re.findall(_no_python, cpm_plan), (
        "cluster_pair_metrics must not leave the JVM"
    )
    assert "CartesianProduct" not in cpm_plan, (
        "cluster_pair_metrics 1-row combiners must broadcast"
    )

    # ---- round-4 session-5 additions ---------------------------------
    from case_uco_ontology_map_spark.operators.graphstats import (
        label_propagation,
    )
    from case_uco_ontology_map_spark.operators.textstats import (
        bigram_lm_scores,
    )

    lpa = label_propagation(graph_edges, iterations=2, checkpoint_every=0)
    lpa_plan = plan_of(lpa)
    assert not re.findall(_no_python, lpa_plan), (
        "label_propagation must not leave the JVM"
    )
    assert "CartesianProduct" not in lpa_plan, (
        "label_propagation planned a cartesian join"
    )
    assert "window" not in lpa_plan.lower(), (
        "label_propagation argmax must stay groupBy-shaped (window would "
        "sort a hub's votes into one task)"
    )

    from case_uco_ontology_map_spark.operators.dedup import paragraph_dedup
    from case_uco_ontology_map_spark.operators.graphstats import k_core
    from case_uco_ontology_map_spark.operators.skew import key_skew_report
    from case_uco_ontology_map_spark.operators.textstats import gopher_rules

    pdd = paragraph_dedup(docs)
    pdd_plan = plan_of(pdd)
    assert not re.findall(_no_python, pdd_plan), (
        "paragraph_dedup must not leave the JVM"
    )
    assert "window" not in pdd_plan.lower(), (
        "paragraph_dedup first-occurrence must stay groupBy-min shaped"
    )

    ksr = key_skew_report(docs, "source", k=5)
    ksr_plan = plan_of(ksr)
    assert "TakeOrderedAndProject" in ksr_plan, (
        "key_skew_report top-k should plan TakeOrderedAndProject"
    )

    # a cycle converges in 2 peel rounds, keeping the checkpoint-free
    # lazy tree shallow enough to inspect (a tree graph peels ~log N
    # rounds and the un-truncated plan re-executes per round)
    ring = docs.select(
        F.col("doc_id").alias("src"),
        F.expr("(doc_id + 1) % 500").alias("dst"),
    )
    kc = k_core(ring, k=2, checkpoint_every=0)
    kc_plan = plan_of(kc)
    assert not re.findall(_no_python, kc_plan), (
        "k_core must not leave the JVM"
    )
    assert "CartesianProduct" not in kc_plan

    gop = gopher_rules(docs)
    gop_plan = plan_of(gop)
    assert "Exchange" not in gop_plan, (
        "gopher_rules must be a zero-shuffle single scan"
    )
    assert not re.findall(_no_python, gop_plan), (
        "gopher_rules must not leave the JVM"
    )

    blm = bigram_lm_scores(docs)
    blm_plan = plan_of(blm)
    assert not re.findall(_no_python, blm_plan), (
        "bigram_lm_scores must not leave the JVM"
    )
    assert "CartesianProduct" not in blm_plan, (
        "bigram_lm_scores scalars/left-hand totals must broadcast"
    )
    assert "BroadcastExchange" in blm_plan, (
        "bigram_lm_scores left-hand totals should ride a broadcast"
    )

    bgp_ex = bgp_query(
        trip,
        [("?rec", "uco-core:hasFacet", "?facet")],
        exists=[("?facet", "uco-observable:hash", "?h")],
    )
    ex_plan = plan_of(bgp_ex)
    assert "LeftSemi" in ex_plan, (
        "FILTER EXISTS must plan a left-semi join (no multiplicity change)"
    )

    bgp_mod = bgp_query(
        trip,
        [("?rec", "uco-core:hasFacet", "?facet")],
        select=["rec", "facet"],
        order_by=["rec", "facet"],
        limit=25,
        offset=5,
    )
    mod_plan = plan_of(bgp_mod)
    assert "TakeOrderedAndProject" in mod_plan, (
        "ORDER BY + LIMIT should plan TakeOrderedAndProject (top-k per "
        "partition + single merge), not a global sort"
    )

    star = bgp_query(
        trip.limit(2000),
        [("?a", "uco-core:hasFacet*", "?b")],
        select=["a", "b"],
        path_max_hops=2,
    )
    star_plan = plan_of(star)
    assert not re.findall(_no_python, star_plan), (
        "p* path compilation must not leave the JVM"
    )

    from case_uco_ontology_map_spark.operators.graphquery import bgp_ask
    from case_uco_ontology_map_spark.operators.graphstats import (
        neighbor_sample,
        random_walks,
    )

    walks = random_walks(
        graph_edges, walks_per_node=1, length=2, checkpoint_every=0
    )
    walks_plan = plan_of(walks)
    assert not re.findall(_no_python, walks_plan), (
        "random_walks must not leave the JVM"
    )
    assert "CartesianProduct" not in walks_plan

    samp = neighbor_sample(graph_edges, fanouts=(3,))
    samp_plan = plan_of(samp)
    assert not re.findall(_no_python, samp_plan), (
        "neighbor_sample must not leave the JVM"
    )
    assert "Window" not in samp_plan, (
        "neighbor_sample top-k must stay in-row (array_sort+slice), "
        "never a window"
    )

    ask = bgp_ask(trip, [("?r", "uco-core:hasFacet", "?f")])
    ask_plan = plan_of(ask)
    assert "CollectLimit" in ask_plan or "LocalLimit" in ask_plan, (
        "bgp_ask must short-circuit through a limit before aggregating"
    )

    # r5: hasFacet single-owner SHACL-SPARQL rule — the self-join must be
    # an equi-join on the facet id and the sameAs exception an anti-join,
    # never a cartesian/nested-loop
    from case_uco_ontology_map_spark.validation import (
        check_facet_single_owner,
    )

    fso = check_facet_single_owner(trip)
    fso_plan = plan_of(fso)
    assert "CartesianProduct" not in fso_plan, (
        "facet single-owner rule must not plan a cartesian product"
    )
    assert "LeftAnti" in fso_plan, (
        "sameAs exemption must be an anti-join"
    )

    # r5: context chunking — the zero-shuffle claim is a plan property
    from case_uco_ontology_map_spark.operators.packing import (
        chunk_documents,
    )

    chk = chunk_documents(docs, max_tokens=128, overlap=16)
    chk_plan = plan_of(chk)
    assert "Exchange" not in chk_plan, (
        "chunk_documents must stay zero-shuffle (pure per-row expressions)"
    )

    # r5: WARC export index — envelope assembly, SURT urlkey, and digest
    # are all JVM expressions; the index over an export frame must be a
    # pure zero-shuffle, zero-Python projection
    from case_uco_ontology_map_spark.sources.warc import (
        cdx_index,
        documents_to_warc,
    )

    warc_docs = docs.select(
        F.concat(
            F.lit("http://site"),
            F.col("doc_id").cast("string"),
            F.lit(".example.org/p"),
        ).alias("url"),
        F.col("text").alias("html"),
    )
    warc_recs = documents_to_warc(warc_docs).select(
        "*",
        F.lit("synth.warc.gz").alias("src_file"),
        F.lit(0).cast("long").alias("record_offset"),
        F.octet_length("payload").cast("long").alias("content_length"),
    )
    cdx = cdx_index(warc_recs)
    cdx_plan = plan_of(cdx)
    assert "Exchange" not in cdx_plan, (
        "documents_to_warc + cdx_index must stay zero-shuffle"
    )
    assert not re.findall(_no_python, cdx_plan), (
        "WARC export index must not cross into Python"
    )

    # r5: robots gate — per-host rule arrays broadcast; the url side is
    # an in-row LIKE/argmax fold that never shuffles or crosses to Python
    from case_uco_ontology_map_spark.functions.robots import (
        robots_decisions,
        robots_like_pattern,
    )

    rob_rules = spark.createDataFrame(
        [
            ("h.org", p, a, robots_like_pattern(p), len(p))
            for p, a in [("/private/", False), ("/private/open/", True)]
        ],
        "host string, pattern string, is_allow boolean, "
        "like_pat string, rlen int",
    )
    rob = robots_decisions(warc_docs, rob_rules)
    rob_plan = plan_of(rob)
    assert "BroadcastHashJoin" in rob_plan, (
        "robots rules must meet urls in a broadcast join"
    )
    assert "SortMergeJoin" not in rob_plan and (
        "CartesianProduct" not in rob_plan
    ), "robots gate must not shuffle-join or cartesian the url side"
    assert not re.findall(_no_python, rob_plan), (
        "robots decision fold must stay JVM-side"
    )
    # formatted explain prints each node twice (tree line + detail
    # header), so ONE physical Exchange — the tiny rules-side groupBy —
    # counts as 2 matches
    assert len(re.findall(r"\bExchange\b", rob_plan)) <= 2, (
        "only the tiny rules-side groupBy may shuffle"
    )

    # r5: hyperlink extraction — one regex + CASE resolution, all JVM,
    # zero shuffle (the groupBy lives in link_graph, not here)
    from case_uco_ontology_map_spark.functions.links import extract_links

    lnk = extract_links(
        warc_docs.withColumn(
            "html",
            F.concat(
                F.lit('<a href="/x">a</a><a href="y.html">b</a>'),
                F.col("html"),
            ),
        )
    )
    lnk_plan = plan_of(lnk)
    assert "Exchange" not in lnk_plan, (
        "extract_links must stay zero-shuffle"
    )
    assert not re.findall(_no_python, lnk_plan), (
        "link extraction must not cross into Python"
    )

    # r5 session 2: fused WARC→documents reader — the tier-2 slope fix
    # (3.86 → 1.11) rests on ONE Python crossing and zero payload bytes
    # JVM-side; assert the plan is scan → single MapInPandas, no shuffle
    import tempfile as _tf

    from case_uco_ontology_map_spark.sources.warc import (
        documents_to_warc,
        read_warc_documents,
        write_warc,
    )

    _warc_dir = _tf.mkdtemp(prefix="plans-warc-")
    write_warc(documents_to_warc(warc_docs.limit(4)).coalesce(1), _warc_dir)
    fused = read_warc_documents(spark, os.path.join(_warc_dir, "*.warc.gz"))
    fused_plan = plan_of(fused)
    assert "Exchange" not in fused_plan, (
        "fused WARC reader must not shuffle"
    )
    assert len(re.findall(r"\(\d+\) MapInPandas", fused_plan)) == 1, (
        "fused WARC reader must cross into Python exactly once"
    )

    # r5 session 2: redirect resolution — max_hops-1 chained joins in
    # one lazy plan; no cartesian, no Python, no driver fixed point
    from case_uco_ontology_map_spark.sources.warc import resolve_redirects

    red_edges = docs.selectExpr(
        "concat('u', doc_id) AS src", "concat('u', doc_id + 1) AS dst"
    ).where(F.col("src") != F.lit("u3"))
    red = resolve_redirects(red_edges, max_hops=4)
    red_plan = plan_of(red)
    assert "CartesianProduct" not in red_plan, (
        "redirect resolution must stay equi-join"
    )
    assert not re.findall(_no_python, red_plan), (
        "redirect resolution must stay JVM-side"
    )

    # r5 session 2: anchor index — map-side count partials before the
    # (dst, anchor) shuffle; hub targets never ship raw link rows
    from case_uco_ontology_map_spark.functions.links import (
        anchor_text_index,
    )

    anc = anchor_text_index(
        docs.selectExpr(
            "concat('s', doc_id) AS src",
            "concat('t', doc_id % 7) AS dst",
            "concat('A', doc_id % 3) AS anchor",
        )
    )
    anc_plan = plan_of(anc)
    assert "partial_count" in anc_plan, (
        "anchor counts must pre-aggregate map-side"
    )
    assert "CartesianProduct" not in anc_plan
    assert not re.findall(_no_python, anc_plan)

    # r5 session 3: host graph — page edges roll up to hosts with ONE
    # key shuffle; n_links partial-aggregates map-side (the distinct
    # src-page count plans as the standard two-phase partial-distinct,
    # still no extra logical pass); no Python anywhere
    from case_uco_ontology_map_spark.functions.links import host_graph

    hg = host_graph(
        docs.selectExpr(
            "concat('https://www.s', doc_id % 5, '.test/p', doc_id) AS src",
            "concat('https://d', doc_id % 3, '.test/x') AS dst",
        )
    )
    hg_plan = plan_of(hg)
    assert not re.findall(_no_python, hg_plan), (
        "host_graph must stay JVM-side"
    )
    assert "CartesianProduct" not in hg_plan
    assert "partial_count" in hg_plan, (
        "host_graph n_links must pre-aggregate map-side"
    )

    # r5 session 3: robots Sitemap discovery — group-independent per
    # RFC 9309 so no state machine: split + regexp + DISTINCT is the
    # whole plan; exactly the one distinct Exchange, zero Python
    from case_uco_ontology_map_spark.functions.robots import (
        robots_sitemaps,
    )

    sm = robots_sitemaps(
        docs.selectExpr(
            "concat('h', doc_id % 7, '.test') AS host",
            "concat('Sitemap: https://h', doc_id % 7, "
            "'.test/s.xml', chr(10)) AS robots_txt",
        )
    )
    sm_plan = plan_of(sm)
    assert not re.findall(_no_python, sm_plan), (
        "robots_sitemaps must stay JVM-side"
    )
    assert len(re.findall(r"\(\d+\) Exchange", sm_plan)) == 1, (
        "robots_sitemaps must shuffle exactly once (the DISTINCT)"
    )

    # r5 session 3: HITS round shape — like pagerank, per-round
    # shuffles touch only the N-row score frames; the L1 norm is a lazy
    # broadcast 1-row aggregate, never a driver action
    from case_uco_ontology_map_spark.operators.graphstats import hits

    hi = hits(graph_edges, iterations=1, checkpoint_every=0)
    hi_plan = plan_of(hi)
    assert not re.findall(_no_python, hi_plan), (
        "hits rounds must stay JVM-side"
    )
    assert "CartesianProduct" not in hi_plan, (
        "hits must not plan an unbroadcast cartesian"
    )
    assert "BroadcastExchange" in hi_plan, (
        "the HITS L1-norm total must ride as a broadcast 1-row aggregate"
    )

    # r5 session 3: WAT metadata export — in-row link extraction +
    # string-concat JSON assembly: zero Exchange, zero Python
    from case_uco_ontology_map_spark.sources.warc import documents_to_wat

    wat = documents_to_wat(warc_docs)
    wat_plan = plan_of(wat)
    assert "Exchange" not in wat_plan, (
        "documents_to_wat must not shuffle"
    )
    assert not re.findall(_no_python, wat_plan), (
        "documents_to_wat must stay JVM-side"
    )

    # r5 session 3: WAT import — explicit-schema from_json (no
    # inference scan) + one posexplode: zero Exchange, zero Python
    from case_uco_ontology_map_spark.sources.warc import wat_to_links

    wimp = wat_to_links(wat)
    wimp_plan = plan_of(wimp)
    assert "Exchange" not in wimp_plan, (
        "wat_to_links must not shuffle"
    )
    assert not re.findall(_no_python, wimp_plan), (
        "wat_to_links must stay JVM-side (from_json, not a Python parser)"
    )

    # r5 session 3: TrustRank round shape — seed flag decided by ONE
    # broadcast join; per-round shuffles touch only the N-row trust
    # frame; the dangling term rides a broadcast 1-row aggregate
    from case_uco_ontology_map_spark.operators.graphstats import trustrank

    tr_seeds = docs.limit(3).selectExpr("doc_id + 1 AS node")
    tr = trustrank(graph_edges, tr_seeds, iterations=1, checkpoint_every=0)
    tr_plan = plan_of(tr)
    assert not re.findall(_no_python, tr_plan), (
        "trustrank must stay JVM-side"
    )
    assert "CartesianProduct" not in tr_plan, (
        "trustrank dangling fold-in must broadcast, not cartesian"
    )
    assert "BroadcastExchange" in tr_plan, (
        "trustrank seed flag and dangling scalar should ride broadcasts"
    )

    # r5 session 4: multi-source BFS round shape — the frontier meets the
    # persisted edge frame in an equi-join, known-set dedup is an
    # anti-join; nothing crosses into Python
    from case_uco_ontology_map_spark.operators.graphstats import (
        bfs_distances,
        spam_mass,
    )

    # seeds away from the tree root so hop 1 derives NEW nodes and the
    # returned plan carries a real round (not the broke-instantly scan)
    bfs_seeds = docs.limit(2).selectExpr(
        "CAST(doc_id + 101 AS BIGINT) AS node"
    )
    bfs = bfs_distances(
        graph_edges, bfs_seeds, max_hops=1, checkpoint_every=0
    )
    bfs_plan = plan_of(bfs)
    assert not re.findall(_no_python, bfs_plan), (
        "bfs_distances must stay JVM-side"
    )
    assert "CartesianProduct" not in bfs_plan, (
        "bfs_distances frontier expansion must equi-join, not cartesian"
    )
    assert "Exchange" in bfs_plan, (
        "bfs_distances plan is vacuous — the frontier died at hop 1"
    )

    # r5 session 4: spam mass — two N-row score frames meet in ONE
    # equi-join on node; the mass expression folds in-row
    sm_seeds = docs.limit(3).selectExpr("CAST(doc_id AS BIGINT) AS node")
    smx = spam_mass(graph_edges, sm_seeds, iterations=1, checkpoint_every=0)
    smx_plan = plan_of(smx)
    assert not re.findall(_no_python, smx_plan), (
        "spam_mass must stay JVM-side"
    )
    assert "CartesianProduct" not in smx_plan, (
        "spam_mass score join must equi-join, not cartesian"
    )

    # r5 session 4: domain rollup — ONE key shuffle; n_links sums
    # map-side; the registered-domain CASE folds in-row (zero Python)
    from case_uco_ontology_map_spark.functions.links import domain_graph

    dg = domain_graph(
        hg.select("src_host", "dst_host", "n_links")
    )
    dg_plan = plan_of(dg)
    assert not re.findall(_no_python, dg_plan), (
        "domain_graph must stay JVM-side"
    )
    assert "partial" in dg_plan.lower() or "HashAggregate" in dg_plan, (
        "domain_graph n_links must pre-aggregate map-side"
    )

    sections.update(
        {
            "bgp_query (3-pattern conjunction: equi-joins only, no cartesian)": bgp,
            "random_walks round shape (adjacency equi-join + in-row element_at)": walks,
            "neighbor_sample (in-row decorate/sort/slice; window-free top-k)": samp,
            "bgp_ask (CollectLimit short-circuit before aggregation)": ask,
            "label_propagation round shape (vote count -> groupBy argmax, window-free)": lpa,
            "bigram_lm_scores (in-row pair explode; broadcast LH totals + vocab scalar)": blm,
            "gopher_rules (zero-shuffle integer-exact quality gate)": gop,
            "paragraph_dedup (explode -> groupBy-min first-occurrence, window-free)": pdd,
            "key_skew_report (groupBy + TakeOrderedAndProject top-k)": ksr,
            "k_core peel shape (degree count + two semi-joins per round)": kc,
            "bgp exists= (left-semi join, multiplicity preserved)": bgp_ex,
            "bgp order_by+limit (TakeOrderedAndProject, not global sort)": bgp_mod,
            "p* path (closure  zero-length union, min-hop collapse)": star,
            "triangle_stats (in-row wedge expansion + one pair-key equi-join)": tri,
            "neighbor_jaccard (adjacency in-row pairs + two degree joins)": nj,
            "ntriples_lines (pure projection: zero Exchange)": nt,
            "negative_samples (broadcast rep-map probes + one anti-join)": negs,
            "tfidf_top_terms (explode -> two map-side aggs -> one window)": tfidf,
            "cluster_pair_metrics (contingency counts, no pair enumeration)": cpm,
            "bgp_construct (one binding frame, per-template projections)": cons,
            "describe_nodes (bounded frontier expansion, hops=1)": desc,
            "diff_graphs (two co-partitioned anti-joins)": dif,
            "incremental_candidate_edges (all-prior buckets skipped pre-explode)": incr_cands,
            "duplicated_spans (gram explode -> dup filter -> per-doc interval merge)": spans,
            "incremental_exact_dedup (batch window + corpus index probe)": incr_dedup,
            "transitive_closure round shape (frontier equi-join, JVM-only)": closure,
            "pagerank round shape (rank-frame shuffles only; dangling via broadcast)": pr,
            "check_facet_single_owner (facet-id equi self-join + sameAs anti-join, no cartesian)": fso,
            "chunk_documents (zero-shuffle in-row windows)": chk,
            "warc export index (documents_to_warc + cdx_index: zero-shuffle pure-JVM)": cdx,
            "robots gate (broadcast rule arrays + in-row LIKE/argmax fold)": rob,
            "extract_links (one-regex anchor scan + CASE resolution, zero-shuffle JVM)": lnk,
            "read_warc_documents (fused crawl scan: exactly one Python crossing)": fused,
            "resolve_redirects (bounded chain: max_hops-1 chained equi-joins, one lazy plan)": red,
            "anchor_text_index (map-side count partials + per-target top-k window)": anc,
            "host_graph (one key shuffle; map-side link partials + two-phase distinct)": hg,
            "robots_sitemaps (split + regexp + one DISTINCT Exchange, zero Python)": sm,
            "hits round shape (score-frame shuffles only; L1 norm as broadcast scalar)": hi,
            "documents_to_wat (in-row link extraction + JSON assembly, zero-shuffle)": wat,
            "wat_to_links (explicit-schema from_json + one posexplode, zero-shuffle)": wimp,
            "trustrank round shape (broadcast seed flag; trust-frame shuffles only)": tr,
            "bfs_distances round shape (frontier equi-join + anti-join, JVM-only)": bfs,
            "spam_mass (one node equi-join over two score frames; in-row mass expr)": smx,
            "domain_graph (one key shuffle; map-side link sums + in-row domain CASE)": dg,
        }
    )

    # ---- round-5 session-4 additions ----------------------------------
    from case_uco_ontology_map_spark.functions.links import link_delta
    from case_uco_ontology_map_spark.operators.graphstats import (
        landmark_distances,
    )
    from case_uco_ontology_map_spark.operators.textstats import (
        boilerplate_lines,
        domain_quality_prior,
        strip_boilerplate,
    )
    from case_uco_ontology_map_spark.operators.triples import (
        kg_census,
        sameas_smush,
    )

    bl_docs = docs.select(
        F.concat(
            F.lit("https://d"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".test/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    bl = boilerplate_lines(bl_docs, min_docs=3)
    stripped = strip_boilerplate(bl_docs, bl)
    strip_plan = plan_of(stripped)
    assert not re.findall(_no_python, strip_plan), (
        "strip_boilerplate must stay JVM-side (higher-order filter, "
        "never a Python crossing)"
    )
    assert "BroadcastHashJoin" in strip_plan, (
        "strip_boilerplate per-domain md5 arrays must broadcast"
    )

    dqp = domain_quality_prior(bl_docs)
    dqp_plan = plan_of(dqp)
    assert not re.findall(_no_python, dqp_plan), (
        "domain_quality_prior must stay JVM-side"
    )
    assert "partial" in dqp_plan.lower() or "HashAggregate" in dqp_plan, (
        "domain_quality_prior totals must pre-aggregate map-side"
    )

    smush_in = spark.createDataFrame(
        [
            ("kb:b", "owl:sameAs", "kb:a", True, None),
            ("kb:b", "ex:name", "x", False, None),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string",
    )
    smushed = sameas_smush(smush_in)
    smush_plan = plan_of(smushed)
    assert not re.findall(_no_python, smush_plan), (
        "sameas_smush rewrite must stay JVM-side"
    )
    assert "BroadcastHashJoin" in smush_plan, (
        "sameas_smush alias map must broadcast into the rewrite joins"
    )

    census = kg_census(trip)
    census_plan = plan_of(census)
    assert not re.findall(_no_python, census_plan), (
        "kg_census must stay JVM-side"
    )

    pr_warm = pagerank(
        graph_edges,
        iterations=1,
        checkpoint_every=0,
        init_ranks=docs.select(
            F.col("doc_id").alias("node"), F.lit(1.0).alias("rank")
        ),
    )
    prw_plan = plan_of(pr_warm)
    assert "CartesianProduct" not in prw_plan, (
        "warm-start renormalization scalar must broadcast, not shuffle a "
        "cartesian product"
    )
    assert not re.findall(_no_python, prw_plan), (
        "pagerank warm start must stay JVM-side"
    )

    ld = link_delta(
        graph_edges, graph_edges.filter(F.col("src") % 2 == 0)
    )
    ld_plan = plan_of(ld)
    assert not re.findall(_no_python, ld_plan), (
        "link_delta must stay JVM-side"
    )

    lmd = landmark_distances(
        graph_edges.limit(50),
        docs.limit(2).select(F.col("doc_id").alias("node")),
        max_hops=2,
        checkpoint_every=0,
    )
    lmd_plan = plan_of(lmd)
    assert not re.findall(_no_python, lmd_plan), (
        "landmark_distances round shape must stay JVM-side"
    )
    assert "Cartesian" not in lmd_plan, (
        "landmark_distances planned a cartesian join"
    )

    sections.update(
        {
            "strip_boilerplate (broadcast per-domain md5 arrays; in-row HOF filter)": stripped,
            "domain_quality_prior (map-side integer partials; one domain shuffle)": dqp,
            "sameas_smush rewrite (broadcast alias map; literals guarded)": smushed,
            "kg_census (three map-side-combined grouped scans)": census,
            "pagerank warm start (renormalization scalar rides a broadcast)": pr_warm,
            "link_delta (one co-partitioned full-outer join)": ld,
            "landmark_distances round shape (frontier equi-join + anti-join, JVM-only)": lmd,
        }
    )


    # ---- round-5 session-4 batch 2 -------------------------------------
    from case_uco_ontology_map_spark.operators.render import nquads_lines
    from case_uco_ontology_map_spark.operators.sparql import sparql_update
    from case_uco_ontology_map_spark.operators.triples import (
        apply_diff,
        kg_fingerprint,
        latest_assertions,
        rdfs_infer_types,
        unresolved_refs,
    )

    trip5 = spark.createDataFrame(
        [
            ("kb:a", "rdf:type", "ex:D", True, None, "kb:rec1"),
            ("kb:a", "ex:ref", "kb:gone", True, None, "kb:rec1"),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "obj_datatype string, graph string",
    )

    nq = nquads_lines(trip5)
    nq_plan = plan_of(nq)
    assert not re.findall(_no_python, nq_plan), (
        "nquads_lines must stay JVM-side"
    )
    assert "Exchange" not in nq_plan, (
        "nquads_lines is a pure projection — zero Exchange"
    )

    ur = unresolved_refs(trip5)
    ur_plan = plan_of(ur)
    assert not re.findall(_no_python, ur_plan), (
        "unresolved_refs must stay JVM-side"
    )

    la = latest_assertions(
        docs.select(
            F.concat(F.lit("kb:p"), (F.col("doc_id") % 50).cast("string"))
            .alias("subj"),
            F.lit("ex:t").alias("pred"),
            F.col("doc_id").cast("string").alias("obj"),
            F.col("doc_id").alias("ts"),
        )
    )
    la_plan = plan_of(la)
    assert not re.findall(_no_python, la_plan), (
        "latest_assertions must stay JVM-side"
    )
    assert "Window" not in la_plan, (
        "latest_assertions must use the window-free argmax "
        "(groupBy-max + join + groupBy-min), never a window"
    )

    sc = spark.createDataFrame(
        [("ex:D", "ex:B"), ("ex:B", "ex:A")], "sub string, sup string"
    )
    ri = rdfs_infer_types(trip5.select(
        "subj", "pred", "obj", "obj_is_iri", "obj_datatype"
    ), sc)
    ri_plan = plan_of(ri)
    assert not re.findall(_no_python, ri_plan), (
        "rdfs_infer_types must stay JVM-side"
    )
    assert "BroadcastHashJoin" in ri_plan, (
        "rdfs_infer_types subclass closure must broadcast into the "
        "type-triple join"
    )

    from case_uco_ontology_map_spark.operators.triples import (
        infer_inverse,
        infer_subproperties,
        void_summary,
    )

    sp_edges = spark.createDataFrame(
        [("ex:ref", "ex:link"), ("ex:link", "ex:rel")],
        "sub string, sup string",
    )
    i7 = infer_subproperties(trip5.select(
        "subj", "pred", "obj", "obj_is_iri", "obj_datatype"
    ), sp_edges)
    i7_plan = plan_of(i7)
    assert not re.findall(_no_python, i7_plan), (
        "infer_subproperties must stay JVM-side"
    )
    assert "BroadcastHashJoin" in i7_plan, (
        "infer_subproperties property closure must broadcast into the "
        "pred-keyed instance join"
    )

    ii = infer_inverse(
        trip5.select("subj", "pred", "obj", "obj_is_iri", "obj_datatype"),
        inverse_pairs=[("ex:ref", "ex:refOf")],
    )
    ii_plan = plan_of(ii)
    assert not re.findall(_no_python, ii_plan), (
        "infer_inverse must stay JVM-side"
    )
    assert "BroadcastHashJoin" in ii_plan, (
        "infer_inverse rule table must broadcast — it is axiom-sized"
    )
    assert "SortMergeJoin" not in ii_plan, (
        "infer_inverse must never shuffle the instance frame for the "
        "rule join"
    )

    vs = void_summary(trip5.select(
        "subj", "pred", "obj", "obj_is_iri", "obj_datatype"
    ))
    vs_plan = plan_of(vs)
    assert not re.findall(_no_python, vs_plan), (
        "void_summary must stay JVM-side"
    )
    assert "Window" not in vs_plan, (
        "void_summary is grouped passes + one subj join — no window"
    )

    diff3 = spark.createDataFrame(
        [("kb:x", "ex:p", "1", "added"), ("kb:a", "rdf:type", "ex:D",
                                          "removed")],
        "subj string, pred string, obj string, change string",
    )
    ad = apply_diff(trip5, diff3)
    ad_plan = plan_of(ad)
    assert not re.findall(_no_python, ad_plan), (
        "apply_diff must stay JVM-side"
    )

    fp = kg_fingerprint(trip5.select(
        "subj", "pred", "obj", "obj_is_iri", "obj_datatype"
    ))
    fp_plan = plan_of(fp)
    assert not re.findall(_no_python, fp_plan), (
        "kg_fingerprint must stay JVM-side"
    )
    assert "partial" in fp_plan.lower() or "HashAggregate" in fp_plan, (
        "kg_fingerprint XOR fold must pre-aggregate map-side"
    )

    su = sparql_update(
        trip5.select("subj", "pred", "obj"),
        "DELETE { ?x rdf:type ex:D } INSERT { ?x rdf:type ex:D2 } "
        "WHERE { ?x rdf:type ex:D }",
    )
    su_plan = plan_of(su)
    assert not re.findall(_no_python, su_plan), (
        "sparql_update must stay JVM-side"
    )
    assert "Cartesian" not in su_plan, (
        "sparql_update planned a cartesian join"
    )

    sections.update(
        {
            "nquads_lines (pure projection: zero Exchange)": nq,
            "unresolved_refs (grouped object scan + one anti-join)": ur,
            "latest_assertions (window-free argmax: max-join-min)": la,
            "rdfs_infer_types (broadcast subclass closure into type join)": ri,
            "infer_subproperties (rdfs7: broadcast property closure)": i7,
            "infer_inverse (broadcast axiom rules; swap is a projection)": ii,
            "void_summary (grouped passes + one subj-keyed class join)": vs,
            "apply_diff (one anti-join + union over the patch)": ad,
            "kg_fingerprint (map-side XOR fold, one row out)": fp,
            "sparql_update modify ((G anti del) union ins, equi-joins only)": su,
        }
    )


    from case_uco_ontology_map_spark.operators.negatives import (
        transe_ranks,
    )

    te_ents = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vec"),
    )
    te_rels = emb.limit(2).select(
        F.lit("p").alias("pred"), F.col("embedding").alias("vec")
    ).limit(1)
    te_negs = docs.limit(50).select(
        (F.col("doc_id") % 20).cast("string").alias("subj"),
        F.lit("p").alias("pred"),
        ((F.col("doc_id") + 1) % 20).cast("string").alias("obj"),
        F.lit(1).alias("i"),
        ((F.col("doc_id") + 2) % 20).cast("string").alias("neg_obj"),
    )
    tr = transe_ranks(te_negs, te_ents, te_rels)
    tr_plan = plan_of(tr)
    assert not re.findall(_no_python, tr_plan), (
        "transe_ranks must stay JVM-side (higher-order L1 folds)"
    )
    assert "BroadcastHashJoin" in tr_plan, (
        "transe_ranks relation join must broadcast"
    )

    dm = transe_ranks(te_negs, te_ents, te_rels, model="distmult")
    dm_plan = plan_of(dm)
    assert not re.findall(_no_python, dm_plan), (
        "distmult ranks must stay JVM-side (higher-order product folds)"
    )
    assert dm_plan.count("Join") == tr_plan.count("Join"), (
        "distmult must reuse transe's exact join tree — only the "
        "in-row fold and comparison direction differ"
    )

    sections.update(
        {
            "transe_ranks (3 entity equi-joins + broadcast relations; in-row integer L1 folds)": tr,
            "distmult ranks (same join tree; in-row trilinear product fold)": dm,
        }
    )

    # ---- round-5 session-5: on-page structured data (WDC layer) --------
    from case_uco_ontology_map_spark.operators.structured import (
        annotation_census,
        hearst_isa,
        html_tables,
        jsonld_blocks,
        jsonld_triples,
        meta_tags,
        meta_triples,
        microdata_triples,
        table_triples,
    )

    ann_pages = docs.select(
        F.concat(
            F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".test/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<meta property="og:t" content="v">'
                  '<script type="application/ld+json">{"@type":"P","n":'),
            (F.col("doc_id") % 9).cast("string"),
            F.lit('}</script><div itemscope itemtype="https://s.org/T">'
                  '<span itemprop="a">x</span></div>'
                  "<table><tr><th>H</th></tr><tr><td>c</td></tr></table>"),
        ).alias("html"),
        "text",
    )

    # extraction family: zero Exchange, zero Python — the page body
    # never leaves its partition and never crosses into Python
    jt = jsonld_triples(jsonld_blocks(ann_pages.drop("text")))
    jt_plan = plan_of(jt)
    assert not re.findall(_no_python, jt_plan), (
        "jsonld_triples must stay JVM-side (from_json + in-row explode)"
    )
    assert "Exchange" not in jt_plan, (
        "jsonld_triples is a pure in-row extraction — zero Exchange"
    )

    mt = meta_triples(meta_tags(ann_pages.drop("text")))
    mt_plan = plan_of(mt)
    assert not re.findall(_no_python, mt_plan) and "Exchange" not in mt_plan, (
        "meta extraction must be a zero-shuffle JVM projection"
    )

    md = microdata_triples(ann_pages.drop("text"))
    md_plan = plan_of(md)
    assert not re.findall(_no_python, md_plan) and "Exchange" not in md_plan, (
        "microdata extraction must be a zero-shuffle JVM projection"
    )

    tg = html_tables(ann_pages.drop("text"))
    tg_plan = plan_of(tg)
    assert not re.findall(_no_python, tg_plan) and "Exchange" not in tg_plan, (
        "html_tables (three posexplodes) must be zero-shuffle JVM"
    )

    tk = table_triples(tg)
    tk_plan = plan_of(tk)
    assert not re.findall(_no_python, tk_plan), (
        "table_triples must stay JVM-side"
    )
    assert "Cartesian" not in tk_plan, (
        "table_triples header join must be an equi-join"
    )

    hi_df = hearst_isa(ann_pages.select("url", "text"))
    hi_plan = plan_of(hi_df)
    assert not re.findall(_no_python, hi_plan) and "Exchange" not in hi_plan, (
        "hearst_isa must be a zero-shuffle JVM extraction"
    )

    ac = annotation_census(jt)
    ac_plan = plan_of(ac)
    assert not re.findall(_no_python, ac_plan), (
        "annotation_census must stay JVM-side"
    )
    assert "partial" in ac_plan.lower() or "HashAggregate" in ac_plan, (
        "annotation_census counts must pre-aggregate map-side"
    )

    # fusion layer: trust/vocab/alignment are broadcast dimensions;
    # the vote argmax is window-free
    from case_uco_ontology_map_spark.operators.fusion import (
        align_predicates,
        extractor_corroboration,
        fuse_assertions,
        rewrite_predicates,
    )

    fus_a = docs.select(
        F.concat(F.lit("e"), (F.col("doc_id") % 40).cast("string"))
        .alias("subj"),
        F.lit("name").alias("pred"),
        (F.col("doc_id") % 5).cast("string").alias("obj"),
        F.when(F.col("doc_id") % 2 == 0, "src_a")
        .otherwise("src_b")
        .alias("source"),
    )
    fus_trust = spark.createDataFrame(
        [("src_a", 1), ("src_b", 3)], "source string, weight int"
    )
    fu = fuse_assertions(fus_a, fus_trust)
    fu_plan = plan_of(fu)
    assert not re.findall(_no_python, fu_plan), (
        "fuse_assertions must stay JVM-side"
    )
    assert "Window" not in fu_plan, (
        "fuse_assertions argmax must be window-free"
    )
    assert "BroadcastHashJoin" in fu_plan, (
        "fuse_assertions trust table must broadcast"
    )

    al_props = docs.select(
        F.concat(F.lit("prop"), (F.col("doc_id") % 9).cast("string"))
        .alias("prop")
    ).distinct()
    al_vocab = spark.createDataFrame(
        [("O", "prop1"), ("O", "prop2")], "owner string, prop_name string"
    )
    al = align_predicates(al_props, al_vocab)
    al_plan = plan_of(al)
    assert not re.findall(_no_python, al_plan), (
        "align_predicates must stay JVM-side"
    )
    assert "BroadcastHashJoin" in al_plan and "Window" not in al_plan, (
        "align_predicates: broadcast vocab + window-free argmax"
    )

    rw = rewrite_predicates(jt, al)
    rw_plan = plan_of(rw)
    assert "BroadcastHashJoin" in rw_plan, (
        "rewrite_predicates alignment map must broadcast — the triple "
        "stream never shuffles"
    )
    assert "Exchange hashpartitioning(url" not in rw_plan, (
        "rewrite_predicates must not shuffle the triple stream"
    )

    ec = extractor_corroboration(
        jt.withColumn("extractor", F.lit("jsonld"))
    )
    ec_plan = plan_of(ec)
    assert not re.findall(_no_python, ec_plan), (
        "extractor_corroboration must stay JVM-side"
    )
    assert "partial" in ec_plan.lower() or "HashAggregate" in ec_plan, (
        "extractor_corroboration must pre-aggregate map-side"
    )

    from case_uco_ontology_map_spark.operators.fusion import (
        property_profile,
    )
    from case_uco_ontology_map_spark.operators.structured import (
        rdfa_triples,
    )

    ra_pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.concat(
            F.lit('<div vocab="https://s.org/" typeof="T">'
                  '<span property="a">'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("</span></div>"),
        ).alias("html"),
    )
    ra = rdfa_triples(ra_pages)
    ra_plan = plan_of(ra)
    assert not re.findall(_no_python, ra_plan) and "Exchange" not in ra_plan, (
        "rdfa_triples must be a zero-shuffle JVM projection"
    )

    pp = property_profile(jt)
    pp_plan = plan_of(pp)
    assert not re.findall(_no_python, pp_plan), (
        "property_profile must stay JVM-side"
    )
    assert "Window" not in pp_plan, (
        "property_profile cardinality maxima must be grouped aggregates, "
        "not windows"
    )
    assert "partial" in pp_plan.lower() or "HashAggregate" in pp_plan, (
        "property_profile counts must pre-aggregate map-side"
    )

    # ---- session-6 batch: identity QA, EL priors, serving, quads ----
    from case_uco_ontology_map_spark.functions.links import (
        alias_priors,
        link_by_prior,
    )
    from case_uco_ontology_map_spark.operators.fusion import (
        functional_violations,
        ifp_sameas_candidates,
    )
    from case_uco_ontology_map_spark.operators.graphquery import quad_query
    from case_uco_ontology_map_spark.operators.serving import (
        bm25_topk,
        build_postings,
        entity_summary,
        posting_stats,
    )
    from case_uco_ontology_map_spark.operators.triples import kg_as_of

    fv = functional_violations(jt, ["a", "b"])
    fv_plan = plan_of(fv)
    assert not re.findall(_no_python, fv_plan), (
        "functional_violations must stay JVM-side"
    )
    assert "Window" not in fv_plan and "Join" not in fv_plan, (
        "functional_violations is one grouped pass — no window, no join"
    )
    assert " IN (" in fv_plan or "INSET" in fv_plan, (
        "functional_violations predicate isin must appear as a "
        "pushable IN filter at the scan side of the plan"
    )

    ifp = ifp_sameas_candidates(jt, ["a", "b"])
    ifp_plan = plan_of(ifp)
    assert not re.findall(_no_python, ifp_plan), (
        "ifp_sameas_candidates must stay JVM-side"
    )
    assert "Window" not in ifp_plan, (
        "ifp group canonical/min must be groupBy, not a window"
    )

    ap_links = docs.select(
        F.concat(F.lit("s"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), (F.col("doc_id") % 7).cast("string")).alias(
            "dst"
        ),
        F.concat(F.lit("A"), (F.col("doc_id") % 3).cast("string")).alias(
            "anchor"
        ),
    )
    ap_pe = docs.select(
        F.concat(F.lit("t"), (F.col("doc_id") % 7).cast("string")).alias(
            "url"
        ),
        F.concat(F.lit("E"), (F.col("doc_id") % 3).cast("string")).alias(
            "entity"
        ),
    )
    ap = alias_priors(ap_links, ap_pe)
    ap_plan = plan_of(ap)
    assert not re.findall(_no_python, ap_plan), (
        "alias_priors must stay JVM-side"
    )
    assert "partial" in ap_plan.lower() or "HashAggregate" in ap_plan, (
        "alias_priors vote counts must pre-aggregate map-side"
    )

    lp_mentions = docs.select(
        F.col("doc_id").alias("doc"),
        F.concat(F.lit("A"), (F.col("doc_id") % 4).cast("string")).alias(
            "surface"
        ),
    )
    lp = link_by_prior(lp_mentions, ap)
    lp_plan = plan_of(lp)
    assert not re.findall(_no_python, lp_plan), (
        "link_by_prior must stay JVM-side"
    )
    assert "CartesianProduct" not in lp_plan, (
        "link_by_prior must join on the normalized surface key"
    )

    ao_log = jt.select(
        "subj", "pred", "obj",
        F.when(F.col("obj") > "m", F.lit("del")).otherwise(
            F.lit("add")
        ).alias("op"),
        (F.length("obj") % 10).cast("long").alias("ts"),
    )
    ao = kg_as_of(ao_log, 5)
    ao_plan = plan_of(ao)
    assert not re.findall(_no_python, ao_plan), (
        "kg_as_of must stay JVM-side"
    )
    assert "Window" not in ao_plan and "Join" not in ao_plan, (
        "kg_as_of is one grouped max(struct) pass — no window, no "
        "join-back"
    )

    es = entity_summary(jt, k=3)
    es_plan = plan_of(es)
    assert not re.findall(_no_python, es_plan), (
        "entity_summary must stay JVM-side"
    )
    assert "BroadcastHashJoin" in es_plan, (
        "entity_summary predicate-frequency dimension must broadcast"
    )

    sv_docs = docs.select("doc_id", "text")
    sv_postings = build_postings(sv_docs)
    sv_plan = plan_of(sv_postings)
    assert not re.findall(_no_python, sv_plan), (
        "build_postings must tokenize in-row JVM-side"
    )
    assert len(re.findall(r"\(\d+\) Exchange", sv_plan)) == 1, (
        "build_postings is one (term, doc_id) shuffle"
    )
    sv_stats = posting_stats(sv_postings)
    sv_queries = spark.createDataFrame(
        [("q", "data"), ("q", "spark")], "query_id string, term string"
    )
    bm = bm25_topk(sv_postings, sv_stats, sv_queries, k=5)
    bm_plan = plan_of(bm)
    assert not re.findall(_no_python, bm_plan), (
        "bm25_topk must stay JVM-side"
    )
    assert "CartesianProduct" not in bm_plan, (
        "bm25_topk's only cross join is the broadcast 1-row stats"
    )

    from case_uco_ontology_map_spark.operators.serving import (
        hard_negatives,
    )

    hn_pos = sv_queries.select("query_id").distinct().withColumn(
        "doc_id", F.lit(1).cast("long")
    )
    hn = hard_negatives(sv_postings, sv_stats, sv_queries, hn_pos, k=5)
    hn_plan = plan_of(hn)
    assert not re.findall(_no_python, hn_plan), (
        "hard_negatives must stay JVM-side"
    )
    n_gen = lambda p: len(  # noqa: E731 — local counter
        re.findall(r"Generate \(\d", p.split("\n\n")[0])
    )
    assert n_gen(hn_plan) == n_gen(bm_plan), (
        "hard_negatives must evaluate the BM25 scoring pipeline ONCE — "
        "a self-join for the positive's rank would duplicate the "
        "tokenize/explode subtree"
    )
    n_win = lambda p: len(  # noqa: E731
        re.findall(r"Window \(\d", p.split("\n\n")[0])
    )
    assert n_win(hn_plan) == n_win(bm_plan) + 1, (
        "hard_negatives adds exactly one windowed-min over the "
        "bounded top-(k+1) frame — nothing else"
    )

    qq_quads = docs.select(
        F.concat(F.lit("g"), (F.col("doc_id") % 4).cast("string")).alias(
            "graph"
        ),
        F.concat(F.lit("n"), (F.col("doc_id") % 9).cast("string")).alias(
            "subj"
        ),
        F.when(F.col("doc_id") % 2 == 0, F.lit("p")).otherwise(
            F.lit("q")
        ).alias("pred"),
        F.concat(F.lit("n"), ((F.col("doc_id") + 1) % 9).cast(
            "string"
        )).alias("obj"),
    )
    qq = quad_query(
        qq_quads, "?g", [("?s", "p", "?o"), ("?o", "q", "?x")]
    )
    qq_plan = plan_of(qq)
    assert not re.findall(_no_python, qq_plan), (
        "quad_query must stay JVM-side"
    )
    assert "CartesianProduct" not in qq_plan, (
        "GRAPH ?g joins must carry the graph variable as a join key — "
        "never a cartesian"
    )

    from case_uco_ontology_map_spark.operators.serving import (
        entity_postings,
        merge_postings,
    )
    from case_uco_ontology_map_spark.operators.triples import (
        compact_log,
        kg_completeness,
        literal_stats,
        schema_graph,
    )

    typed = docs.select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias(
            "subj"
        ),
        F.when(F.col("doc_id") % 3 == 0, F.lit("rdf:type"))
        .when(F.col("doc_id") % 3 == 1, F.lit("kb:linksTo"))
        .otherwise(F.lit("kb:rank")).alias("pred"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("Person")
        ).when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("n"), (F.col("doc_id") % 9).cast("string")),
        ).otherwise((F.col("doc_id") % 7).cast("string")).alias("obj"),
        (F.col("doc_id") % 3 != 2).alias("obj_is_iri"),
    )
    sg = schema_graph(typed)
    sg_plan = plan_of(sg)
    assert not re.findall(_no_python, sg_plan), (
        "schema_graph must stay JVM-side"
    )
    assert "Window" not in sg_plan, (
        "schema_graph rollup is grouped counts, not windows"
    )

    ls = literal_stats(typed)
    ls_plan = plan_of(ls)
    assert not re.findall(_no_python, ls_plan), (
        "literal_stats must stay JVM-side"
    )
    assert "Join" not in ls_plan and "Window" not in ls_plan, (
        "literal_stats is one gated grouped pass"
    )

    from case_uco_ontology_map_spark.operators.triples import (
        characteristic_sets,
    )

    cs = characteristic_sets(typed)
    cs_plan = plan_of(cs)
    assert not re.findall(_no_python, cs_plan), (
        "characteristic_sets must stay JVM-side"
    )
    assert "Join" not in cs_plan and "Window" not in cs_plan, (
        "characteristic_sets is two grouped passes — no join, no window"
    )

    from case_uco_ontology_map_spark.operators.triples import (
        star_cardinality,
    )

    sc_est = star_cardinality(cs, ["rdf:type", "ex:name"])
    sc_plan = plan_of(sc_est)
    assert not re.findall(_no_python, sc_plan), (
        "star_cardinality must stay JVM-side"
    )
    assert "Join" not in sc_plan and "Window" not in sc_plan, (
        "star_cardinality is a filter + one global agg over the "
        "statistic — no join, no window"
    )

    cl_log = typed.select(
        "subj", "pred", "obj",
        F.lit("add").alias("op"),
        (F.length("obj") % 9).cast("long").alias("ts"),
    )
    cl = compact_log(cl_log, 5)
    cl_plan = plan_of(cl)
    assert not re.findall(_no_python, cl_plan), (
        "compact_log must stay JVM-side"
    )
    assert "Join" not in cl_plan and "Window" not in cl_plan, (
        "compact_log is the as-of grouped pass plus a filter union — "
        "no join, no window"
    )

    kc_schema = spark.createDataFrame(
        [("Person", "kb:linksTo"), ("Person", "kb:rank")],
        "cls string, prop string",
    )
    kc = kg_completeness(typed, kc_schema)
    kc_plan = plan_of(kc)
    assert not re.findall(_no_python, kc_plan), (
        "kg_completeness must stay JVM-side"
    )
    assert "BroadcastHashJoin" in kc_plan, (
        "kg_completeness schema dimension must broadcast"
    )

    ep = entity_postings(
        docs.select(
            F.col("doc_id").alias("doc"),
            F.concat(
                F.lit("E"), (F.col("doc_id") % 9).cast("string")
            ).alias("entity"),
        ),
        sample_k=3,
    )
    ep_plan = plan_of(ep)
    assert not re.findall(_no_python, ep_plan), (
        "entity_postings must stay JVM-side"
    )
    assert "Window" not in ep_plan, (
        "entity_postings is a grouped bounded-sample pass"
    )

    mp = merge_postings(
        sv_postings,
        build_postings(sv_docs.limit(64)),
    )
    mp_plan = plan_of(mp)
    assert not re.findall(_no_python, mp_plan), (
        "merge_postings must stay JVM-side"
    )
    assert "BroadcastHashJoin" in mp_plan or "Broadcast" in mp_plan, (
        "merge_postings anti-join against the touched-doc set must "
        "broadcast the delta side"
    )

    sections.update(
        {
            "schema_graph (type map joined twice on co-partitioned keys)": sg,
            "literal_stats (regexp gate + one grouped pass)": ls,
            "compact_log (as-of grouped pass + hot filter union)": cl,
            "kg_completeness (broadcast schema; subject-key semi-join)": kc,
            "entity_postings (grouped bounded evidence sample)": ep,
            "merge_postings (broadcast touched-doc anti-join + union)": mp,
        }
    )

    sections.update(
        {
            "functional_violations (pred isin pushed; one grouped pass)": fv,
            "ifp_sameas_candidates (groupBy min/count + key join-back)": ifp,
            "alias_priors (map-side vote partials; capped ranking window)": ap,
            "link_by_prior (rank-1 dictionary equi-join on surface key)": lp,
            "kg_as_of (one grouped max(struct) pass, no join-back)": ao,
            "entity_summary (broadcast pred-frequency; bounded window)": es,
            "build_postings (in-row tokenize; one (term,doc) shuffle)": sv_postings,
            "bm25_topk (broadcast terms/df/stats; bounded top-k window)": bm,
            "hard_negatives (anti-join positives; arithmetic rank gap, no 2nd window)": hn,
            "characteristic_sets (two grouped passes; no join, no window)": cs,
            "star_cardinality (filter + one agg over the statistic)": sc_est,
            "quad_query GRAPH ?g (graph var as join key on every pattern)": qq,
        }
    )

    sections.update(
        {
            "rdfa_triples (flat typeof blocks, vocab prefixing, zero Exchange)": ra,
            "property_profile (two grouped passes on (pred,subj)/(pred,obj) keys)": pp,
            "fuse_assertions (broadcast trust; window-free vote argmax)": fu,
            "align_predicates (broadcast vocab token join; struct-min tie-break)": al,
            "rewrite_predicates (broadcast alignment; stream never shuffles)": rw,
            "extractor_corroboration (one group-key shuffle; bounded collect_set)": ec,
            "jsonld_triples (one from_json parse + in-row map explode, zero Exchange)": jt,
            "meta_tags -> meta_triples (zipped regexp pairs, zero Exchange)": mt,
            "microdata_triples (flat itemscope blocks, zero Exchange)": md,
            "html_tables (three in-row posexplodes, zero Exchange)": tg,
            "table_triples (header equi-join keys data cells)": tk,
            "hearst_isa (three pattern scans + in-row list split, zero Exchange)": hi_df,
            "annotation_census (two-phase distinct; map-side count partials)": ac,
        }
    )

    # ---- round-5 session-8: Turtle interchange ------------------------
    from case_uco_ontology_map_spark.operators.render import (
        read_turtle,
        turtle_lines,
    )

    ttl = turtle_lines(trip5.drop("graph"))
    ttl_plan = plan_of(ttl)
    assert not re.findall(_no_python, ttl_plan), (
        "turtle_lines must stay JVM-side"
    )
    # formatted mode prints each operator twice (tree + detail) — count
    # the numbered detail headers
    assert len(re.findall(r"\(\d+\) Exchange\b", ttl_plan)) <= 2, (
        "turtle_lines is two grouped passes on subject-prefixed keys — "
        "at most two Exchanges"
    )

    raw_blocks = spark.createDataFrame(
        [("kb:a a ex:D ;\n    ex:p kb:b .",)], "block string"
    )
    rt = read_turtle(raw_blocks)
    rt_plan = plan_of(rt)
    assert not re.findall(_no_python, rt_plan), (
        "read_turtle must stay JVM-side"
    )
    assert "Exchange" not in rt_plan, (
        "read_turtle is a narrow in-row parse — zero Exchange"
    )

    import tempfile

    from case_uco_ontology_map_spark.operators.triplestore import (
        read_triple_store,
        scan_pattern,
        write_triple_store,
    )

    store_dir = tempfile.mkdtemp(prefix="plans-store-") + "/store"
    write_triple_store(trip5.drop("graph"), store_dir, subj_buckets=4)
    st = scan_pattern(
        read_triple_store(spark, store_dir),
        pred="ex:ref",
        subj="kb:a",
        subj_buckets=4,
    )
    st_plan = plan_of(st)
    assert re.search(
        r"PartitionFilters: \[[^\]]*pred[^\]]*ex:ref", st_plan
    ), "constant predicate must reach the scan as a PartitionFilter"
    assert re.search(
        r"PartitionFilters: \[[^\]]*sbkt[^\]]*= \d", st_plan
    ), (
        "constant subject must fold to a literal bucket PartitionFilter"
    )

    from case_uco_ontology_map_spark.operators.fusion import (
        induce_shapes,
        shape_triples,
    )

    shp = induce_shapes(trip5.drop("graph"))
    shp_plan = plan_of(shp)
    assert not re.findall(_no_python, shp_plan), (
        "induce_shapes must stay JVM-side"
    )
    assert "BroadcastHashJoin" in shp_plan, (
        "schema-sized class totals must broadcast"
    )
    # ONE subject-keyed join of the instance frame: the value-level
    # stats fold through the per-subject rollup, so the expensive join
    # appears once, not per aggregate branch
    n_smj = len(re.findall(r"\(\d+\) SortMergeJoin\b", shp_plan))
    assert n_smj <= 1, (
        f"induce_shapes must join instance-to-type exactly once, "
        f"found {n_smj} sort-merge joins"
    )
    stp = shape_triples(shp)
    stp_plan = plan_of(stp)
    n_gen = len(re.findall(r"\(\d+\) Generate\b", stp_plan))
    assert n_gen == 1, (
        f"shape_triples adds exactly ONE in-row explode, found {n_gen}"
    )

    from case_uco_ontology_map_spark.operators.fusion import (
        shape_conformance,
    )

    conf = shape_conformance(trip5.drop("graph"), shp)
    conf_plan = plan_of(conf)
    assert not re.findall(_no_python, conf_plan), (
        "shape_conformance must stay JVM-side"
    )
    assert "BroadcastHashJoin" in conf_plan, (
        "schema-sized shapes must broadcast into the value stream"
    )
    assert "CartesianProduct" not in conf_plan, (
        "min_count candidate grid must ride the broadcast join, never "
        "a cross join"
    )

    sections.update(
        {
            "turtle_lines (two subject-keyed grouped passes, JVM-only)": ttl,
            "read_turtle (in-row line/term parse, zero added Exchange)": rt,
            "triple-store scan_pattern (pred + subject-bucket partition pruning)": st,
            "induce_shapes (ONE type join + two-level rollup; class totals broadcast)": shp,
            "shape_triples (one in-row explode over the shapes frame)": stp,
            "shape_conformance (broadcast shapes; subject-keyed type join)": conf,
        }
    )

    lines = [
        "# PLANS — physical-plan review",
        "",
        "Regenerate with `python scripts/explain_plans.py`. Summary line per",
        "operator; the full formatted plans follow. Review criteria: filters",
        "reach the scan, codegen spans are wide, broadcast joins are chosen",
        "for small sides, and no unexpected Exchange appears on narrow paths.",
        "",
    ]
    for name, df in sections.items():
        p = plan_of(df)
        lines.append(f"## {name}\n\n`{summarize(p)}`\n")
        lines.append("```\n" + p.strip()[:4000] + "\n```\n")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(lines))
    print("wrote PLANS.md")
    for name, df in sections.items():
        print(f"{name}: {summarize(plan_of(df))}")
    import shutil

    shutil.rmtree(os.path.dirname(store_dir), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
