"""Capture .explain("formatted") plans for the bench stages touched in
optimization round 6 → plans/r06/<stage>_<label>.txt.

Usage: python scripts/capture_plans_r06.py <label> [only,names]
  label = before|after; the optional comma list restricts which stages
  are captured (so a later 'before' run cannot overwrite earlier ones).

Inputs are small (plan SHAPE is what's captured, not runtime); iterative
operators are captured as ONE representative round's lazy plan (the loop
body), since the full loop materializes per round by design.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LABEL = sys.argv[1] if len(sys.argv) > 1 else "after"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)
os.makedirs(OUT, exist_ok=True)


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def save(name: str, df, note: str = "") -> None:
    if ONLY is not None and name not in ONLY:
        return
    path = os.path.join(OUT, f"{name}_{LABEL}.txt")
    with open(path, "w") as fh:
        if note:
            fh.write("NOTE: " + note + "\n\n")
        fh.write(explain_str(df))
    print("wrote", path)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("capture-plans-r06")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from case_uco_ontology_map_spark.operators.similarity import (
            brute_force_topk,
            centroids_kmeans,
            ivf_topk,
        )

        emb = spark.range(64).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: (F.col("id") * 31 + i).cast("double") / 100.0,
            ).alias("embedding"),
        )
        qs = emb.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        save(
            "ann_brute_topk",
            brute_force_topk(emb, qs, k=3),
            "per-side norm staging: look for the _vn/_qn projections "
            "below the BroadcastNestedLoopJoin vs norms inlined per pair",
        )
        cents = centroids_kmeans(emb, k=2, iterations=1)
        save(
            "ann_ivf_topk",
            ivf_topk(emb, qs, cents, k=3, nprobe=1),
            "same norm staging on the cell-joined candidate path",
        )

        from case_uco_ontology_map_spark.operators.graphstats import hits

        edges = spark.range(1, 64).select(
            F.col("id").alias("src"), F.expr("(id-1) DIV 2").alias("dst")
        )
        save(
            "graph_hits",
            hits(edges, iterations=1, checkpoint_every=0),
            "ONE lazy iteration (checkpoint_every=0): count the "
            "HashAggregate-over-(e join scores) subtrees — each half-step "
            "evaluates its aggregate under BOTH the normalization total "
            "and the outer join when unmaterialized.",
        )
        save(
            "graph_hits_prod",
            hits(edges, iterations=1, checkpoint_every=1),
            "ONE production iteration (checkpoint_every=1): after the "
            "fix each half-step's e-join aggregate is an eagerly "
            "checkpointed LogicalRDD referenced (cheaply) twice; before, "
            "the final-result plan was two bare LogicalRDD scans but the "
            "MATERIALIZATION jobs re-executed the auth half-step inside "
            "the hub checkpoint and every raw subtree twice (timing + "
            "code are the evidence; see OPTIMIZATION_r06.md).",
        )

        from case_uco_ontology_map_spark.operators.graphquery import (
            transitive_closure,
        )

        save(
            "graph_closure",
            transitive_closure(edges, max_hops=3, checkpoint_every=0),
            "3 lazy rounds (checkpoint_every=0; plan shape of the "
            "frontier-join/anti-join rounds).",
        )
        save(
            "graph_closure_prod",
            transitive_closure(edges),
            "production run to the fixed point: after the fix the result "
            "is a UNION of per-round checkpointed frontier frames (no "
            "per-round re-checkpoint of the whole accumulated set; the "
            "emptiness test rides the frontier checkpoint as an observed "
            "metric). Before: one LogicalRDD scan, but each round's "
            "known-checkpoint job re-materialized O(closure) rows.",
        )

        from case_uco_ontology_map_spark.operators import canonicalize as cz

        ents = spark.range(64).select(
            F.col("id").alias("entity_id"),
            F.concat(F.lit("ent-"), (F.col("id") / 4).cast("int").cast("string"),
                     F.lit("-v"), (F.col("id") % 4).cast("string")).alias("entity_key"),
        )
        sigs = cz.entity_minhash(ents)
        cands = cz.candidate_edges(sigs, "entity_id", bands=8, max_bucket=500)
        sa, sb = sigs.alias("sa"), sigs.alias("sb")
        agree = F.size(
            F.filter(
                F.zip_with(
                    F.col("sa.minhash"), F.col("sb.minhash"), lambda x, y: x == y
                ),
                lambda eq: eq,
            )
        )
        est = agree.cast("double") / F.size(F.col("sa.minhash"))
        edges_cz = (
            cands.join(sa, cands["src"] == F.col("sa.entity_id"))
            .join(sb, cands["dst"] == F.col("sb.entity_id"))
            .filter(est >= 0.7)
            .select("src", "dst")
        )
        save(
            "canonicalize_edges",
            edges_cz,
            "signature → LSH candidates → estimate-verify edge plan "
            "(the pre-CC portion of q_canonicalize).",
        )
        pairs = edges_cz.select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        ).where(F.col("a") != F.col("b")).distinct()
        one_round = cz._small_star(cz._large_star(pairs, dedup=False), oriented=True)
        save(
            "canonicalize_cc_round",
            one_round,
            "ONE alternating large-star/small-star CC round (lazy).",
        )

        from case_uco_ontology_map_spark.operators.dedup import (
            exact_dedup,
            minhash_estimate_pairs,
            minhash_signatures,
        )

        docs = spark.range(64).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), (F.col("id") % 8).cast("string"),
                     F.lit(" x y z a b c d e f g")).alias("text"),
        )
        canon_ids = (
            exact_dedup(docs).filter(F.col("is_canonical")).select("doc_id")
        )
        canon_docs = docs.join(F.broadcast(canon_ids), "doc_id")
        mh = minhash_signatures(canon_docs)
        save(
            "minhash_dedup",
            minhash_estimate_pairs(mh, threshold=0.5, cache=False),
            "exact-dedup collapse → signatures → banded estimate pairs "
            "(q_minhash_dedup shape; cache=False for a fully lazy plan).",
        )

        from case_uco_ontology_map_spark.operators.graphstats import (
            pagerank,
            trustrank,
        )

        save(
            "graph_pagerank",
            pagerank(edges, iterations=1, checkpoint_every=0),
            "ONE lazy iteration (checkpoint_every=0): before, each round "
            "joined ranks ⋈ with_deg and that subtree fed BOTH the "
            "contribution aggregate and the dangling sum (two "
            "evaluations) plus a third nodes ⋈ contrib join; after, the "
            "state carries _deg so the dangling sum is a plain aggregate "
            "and the round is exactly two joins.",
        )
        seeds = spark.range(0, 64, 8).select(F.col("id").alias("node"))
        save(
            "graph_trustrank",
            trustrank(edges, seeds, iterations=1, checkpoint_every=0),
            "ONE lazy iteration (checkpoint_every=0): same state-carries-"
            "degree restructure as pagerank.",
        )

        from case_uco_ontology_map_spark.operators.triples import (
            rdfs_infer_types,
        )

        hierarchy = spark.createDataFrame(
            [("B", "A"), ("C", "B"), ("D", "C")], "sub string, sup string"
        )
        t = spark.range(16).select(
            F.concat(F.lit("kb:x-"), F.col("id").cast("string")).alias("subj"),
            F.lit("rdf:type").alias("pred"),
            F.lit("D").alias("obj"),
            F.lit(True).alias("obj_is_iri"),
            F.lit(None).cast("string").alias("obj_datatype"),
        )
        save(
            "kg_entailment",
            rdfs_infer_types(t, hierarchy),
            "before: the ontology subclass closure ran the DISTRIBUTED "
            "semi-naive loop (repartition+persist of an 8-edge frame, one "
            "checkpointed action per stride round) and the plan shows the "
            "union of checkpointed LogicalRDD frontier frames under the "
            "broadcast; after: the closure is computed driver-side "
            "(bounded collect, ontology-scale) and the plan is ONE "
            "broadcast hash join over a local relation — zero closure "
            "jobs.",
        )

        from case_uco_ontology_map_spark.operators.serving import (
            bm25_topk,
            build_postings,
            posting_stats,
        )

        pdocs = spark.range(32).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            F.concat(
                F.lit("spark window hash merge t"),
                (F.col("id") % 7).cast("string"),
            ).alias("text"),
        )
        postings = build_postings(pdocs, id_col="url", text_col="text")
        stats = posting_stats(postings)
        queries = spark.createDataFrame(
            [("q1", "spark"), ("q1", "window")], "query_id string, term string"
        )
        import tempfile as _tf

        from case_uco_ontology_map_spark.operators.similarity import (
            ivf_topk_from_index,
            write_ivf_index,
        )

        _ivf_dir = _tf.mkdtemp(prefix="plans-ivf-")
        cents2 = centroids_kmeans(emb, k=4, iterations=1)
        write_ivf_index(emb, cents2, _ivf_dir)
        save(
            "ann_ivf_from_index",
            ivf_topk_from_index(
                spark, _ivf_dir, qs, cents2, k=3, nprobe=2
            ),
            "the bench serving read (ann_ivf_topk): after, candidate "
            "scoring is ONE MapInArrow above the literal cell-IN pruned "
            "scan (PartitionFilters carry the probe set); before, the "
            "same pruned scan fed a broadcast probe join and interpreted "
            "per-pair cosine folds.",
        )

        save(
            "text_index",
            bm25_topk(postings, stats, queries, k=10),
            "before: the tokenize+explode+groupBy postings build appears "
            "as THREE independent subtrees (stats broadcast, df "
            "broadcast, matched scan) — three full builds per action; "
            "after: build_postings persists (InMemoryTableScan at all "
            "three consumers, one build).",
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
