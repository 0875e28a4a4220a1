"""Explicit skew handling: salted repartition / salted aggregation / salted
join (north_rule: "salted repartitioning to defuse hot-domain skew").

Web corpora are Zipfian in host: one domain can be 10%+ of all pages, so
any groupBy(host) or join on host melts one reducer. The standard answers,
as reusable transforms:

  salt_column        add salt = pmod(xxhash64(unique_col), S) — deterministic,
                     no RNG, resume-stable.
  salted_aggregate   two-phase agg: groupBy(key, salt) partial → groupBy(key)
                     final. Turns one hot reducer into S reducers + a tiny
                     second shuffle of S·|keys| rows.
  salted_broadcast_join  replicate the SMALL side S times (explode over
                     salt values) and join on (key, salt) — co-locates a
                     skewed big side without one giant partition.

AQE's skewJoin splitter is the backstop (enabled in every session this repo
creates); these transforms are the explicit, plan-visible version for the
operators where we KNOW the key is Zipfian (host, entity surface).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, unique_col: str, salts: int = 16) -> DataFrame:
    """Deterministic salt ∈ [0, salts): hash of a per-row unique column —
    never a random number (resume/replay stability)."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salts)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_exprs: dict,
    unique_col: str,
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates
    (count/sum/min/max). agg_exprs: {out_col: ("count"|"sum"|"min"|"max",
    in_col)}. Phase 1 groups by (key, salt) — hot keys spread over S
    reducers; phase 2 re-combines per key (S rows per key)."""
    partial_aggs = []
    final_aggs = []
    for out, (fn, col) in agg_exprs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(col if col != "*" else F.lit(1)).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = salt_column(df, unique_col, salts)
    partial = salted.groupBy(*key_cols, "salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a small dimension: salt the big
    side rows, explode the small side across all salts, equi-join on
    (key, salt). The small side grows ×S (still broadcastable); the big
    side's hot key spreads across S partitions."""
    big_salted = salt_column(big, unique_col, salts)
    small_exploded = small.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return big_salted.join(
        F.broadcast(small_exploded), on=[key, "salt"], how=how
    ).drop("salt")


def host_distribution(
    df: DataFrame,
    host_col: str = "host",
    unique_col: Optional[str] = None,
    top: int = 20,
) -> DataFrame:
    """Diagnostic: per-host page counts + share — the skew report a 100 TB
    operator checks before choosing S. Itself salted (the point).

    ``unique_col`` is the per-row-unique column the salt derives from; it
    must NOT be the hot key itself (salt = f(key) sends every hot-key row
    to the same salted reducer — zero skew relief). Defaults to the first
    column that isn't ``host_col``; raises if asked to salt by the key."""
    if unique_col is None:
        candidates = [c for c in df.columns if c != host_col]
        if not candidates:
            raise ValueError("no non-key column available to derive the salt")
        unique_col = candidates[0]
    if unique_col == host_col:
        raise ValueError(
            f"salting by the aggregation key {host_col!r} itself defeats "
            "skew relief — pass a per-row-unique column"
        )
    total = df.count()
    counts = salted_aggregate(
        df, [host_col], {"pages": ("count", "*")}, unique_col=unique_col
    )
    return (
        counts.withColumn("share", F.round(F.col("pages") / F.lit(total), 6))
        .orderBy(F.desc("pages"))
        .limit(top)
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    k: int = 20,
) -> DataFrame:
    """Skew diagnosis — the measurement HALF of every salting/cap
    decision in this repo: the top-``k`` hottest keys of a column with
    exact counts and their share of the table —
    ``(key, n, share, rank)``. Run it BEFORE picking a salt factor or a
    bucket cap (the caps in dedup/cooccurrence/canonicalize all want the
    observed hot-key mass, not a guess).

    Determinism: rank = exact dominance order (n DESC, key ASC) — never
    the float share; computed as orderBy+limit (TakeOrderedAndProject:
    per-partition top-k then one merge — no global sort, no window).
    ``share`` = n/total as a reported double (6-digit hash-safe).

    Scale: one map-side-combined groupBy on the key + a broadcast 1-row
    total; the k-row result is driver-safe by construction.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    total = df.select(F.count("*").cast("double").alias("_total"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(int(k))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("_total")).alias("share"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    # the window runs over AT MOST k rows (post-limit) — single tiny task
    return top.withColumn("rank", F.row_number().over(w))


def key_skew_sql(key_col: str, k: int = 20, table: str = "documents") -> str:
    """DuckDB replay of ``key_skew_report``."""
    return f"""
WITH c AS (
  SELECT {key_col} AS key, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
),
t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM {table}),
top AS (
  SELECT key, n FROM c ORDER BY n DESC, key ASC LIMIT {int(k)}
)
SELECT key, n, CAST(n AS DOUBLE) / (SELECT total FROM t) AS share,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS INT) AS rank
FROM top
"""
