"""Clustering-quality evaluation for entity canonicalization / near-dup
grouping: pairwise precision/recall/F1 of a predicted assignment against
a gold assignment. (No reference counterpart: the reference has no
clustering stage to grade; this is the measurement harness the north
rule's "exact group recovery" bench guards formalize.)

Scale shape — the classic pair-counting identities, NEVER enumerated
pairs (a 10^6-member cluster holds 5·10^11 pairs; its pair COUNT is one
multiplication):

    TP       = Σ_cells   C(n_ij, 2)   over the pred×gold contingency
    TP + FP  = Σ_pred    C(n_i., 2)
    TP + FN  = Σ_gold    C(n_.j, 2)

Three map-side-combined aggregations over the joined assignment frame;
all counts exact BIGINTs (n·(n−1)/2 in integer arithmetic), each ratio
ONE correctly-rounded double division of exact integers — engine-stable,
so a DuckDB oracle hash-matches without rounding fudges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(n: F.Column) -> F.Column:
    # n·(n−1) is even, so >>1 is the exact half — pure integer
    # arithmetic (float `/` would silently round past 2^53, i.e. any
    # cluster over ~95M members)
    m = n.cast("long")
    return F.shiftright(m * (m - F.lit(1)), 1)


def cluster_pair_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster",
    gold_col: str = "cluster",
) -> DataFrame:
    """→ one row ``(tp, fp, fn, precision, recall, f1)`` grading ``pred``
    against ``gold`` (both ``(id, cluster)`` assignments; every id in
    ``pred`` must appear in ``gold`` — inner-join semantics grade the
    intersection). F1 is computed as ``2·TP / (2·TP + FP + FN)`` — one
    division, no intermediate P/R floats."""
    p = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p"))
    g = gold.select(F.col(id_col).alias("_id"), F.col(gold_col).alias("_g"))
    j = p.join(g, on="_id")
    tp = (
        j.groupBy("_p", "_g")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(_pairs(F.col("n"))), F.lit(0)).alias("tp"))
    )
    tpfp = (
        j.groupBy("_p")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(_pairs(F.col("n"))), F.lit(0)).alias("tpfp"))
    )
    tpfn = (
        j.groupBy("_g")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(_pairs(F.col("n"))), F.lit(0)).alias("tpfn"))
    )
    return (
        tp.crossJoin(tpfp)
        .crossJoin(tpfn)
        .select(
            F.col("tp"),
            (F.col("tpfp") - F.col("tp")).alias("fp"),
            (F.col("tpfn") - F.col("tp")).alias("fn"),
            F.when(F.col("tpfp") == 0, F.lit(1.0))
            .otherwise(
                F.col("tp").cast("double") / F.col("tpfp").cast("double")
            )
            .alias("precision"),
            F.when(F.col("tpfn") == 0, F.lit(1.0))
            .otherwise(
                F.col("tp").cast("double") / F.col("tpfn").cast("double")
            )
            .alias("recall"),
            F.when((F.col("tpfp") + F.col("tpfn")) == 0, F.lit(1.0))
            .otherwise(
                (F.lit(2) * F.col("tp")).cast("double")
                / (F.col("tpfp") + F.col("tpfn")).cast("double")
            )
            .alias("f1"),
        )
    )
