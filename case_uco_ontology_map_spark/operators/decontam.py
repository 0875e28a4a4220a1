"""Test-set decontamination: flag corpus documents that contain verbatim
token n-grams from a benchmark/eval set — the standard pre-training hygiene
pass (the reference engine has no counterpart; this belongs to the
large-scale training-data operator family alongside dedup/sampling).

Scale shape (100 TB corpus, benchmark side ~10^4-10^6 grams):
  * the benchmark n-gram set is exploded, de-duplicated, and BROADCAST —
    the corpus side never shuffles its gram strings. Docs explode their
    distinct grams NARROWLY (linear in tokens, map-side), hit the broadcast
    hash join, and only the surviving (doc_id, bench_id) hit rows reach the
    one real shuffle: the count aggregation (partial map-side combine makes
    it tiny — at most docs x benchmark-items rows, and in practice only
    contaminated pairs).
  * gram JOIN keys stay raw strings: inside a broadcast hash join they
    never cross the wire, so hashing them buys nothing and keeps the whole
    op replayable in ANSI SQL with zero hash-parity machinery. If the
    benchmark side ever outgrows broadcast, switch both sides to
    content_hash64 grams and a shuffle join — same semantics, 8-byte keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_lower_col


def ngram_strings(toks: Column, n: int, distinct: bool = True) -> Column:
    """Token array → space-joined n-gram strings (array<string>), distinct
    by default (containment semantics); ``distinct=False`` keeps every
    occurrence (repetition/frequency semantics — textstats). Empty when
    the document has fewer than n tokens (the guard matters: Spark's
    sequence(1, 0) counts DOWN, yielding phantom indices)."""
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams) if distinct else grams


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    ngram_n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, n_hit_ngrams, bench_ngram_count, overlap_frac)
    for every document sharing >= min_hits distinct token ``ngram_n``-grams
    with a benchmark item. overlap_frac = hits / benchmark item's distinct
    gram count (1.0 = the full benchmark item appears verbatim).

    Join the result's doc_ids back as an anti-join to drop contaminated
    documents, or threshold on overlap_frac for a softer policy."""
    bench_grams = (
        benchmark.select(
            F.col(bench_id_col),
            tokens_lower_col(F.col(bench_text_col)).alias("_toks"),
        )
        .select(
            F.col(bench_id_col),
            F.explode(ngram_strings(F.col("_toks"), ngram_n)).alias("gram"),
        )
    )
    bench_counts = bench_grams.groupBy(bench_id_col).agg(
        F.count("*").alias("bench_ngram_count")
    )
    doc_grams = docs.select(
        F.col(id_col), tokens_lower_col(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(ngram_strings(F.col("_toks"), ngram_n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
        .filter(F.col("n_hit_ngrams") >= min_hits)
    )
    return hits.join(F.broadcast(bench_counts), bench_id_col).select(
        id_col,
        bench_id_col,
        "n_hit_ngrams",
        "bench_ngram_count",
        F.round(
            F.col("n_hit_ngrams").cast("double") / F.col("bench_ngram_count"), 6
        ).alias("overlap_frac"),
    )
