"""Temporal joins Spark lacks as built-ins, composed scale-first.

  asof_join          point-in-time join ("most recent right row at or
                     before each left row's timestamp"). NOT a range join:
                     implemented as union + one window pass, so the cost is
                     ONE shuffle on the by-keys and a per-key sort — no
                     candidate explosion, no driver-side loop. The pandas
                     `merge_asof` / kdb `aj` semantics at DataFrame scale.
  range_join_points  points ⋈ intervals (start <= ts < end) via coarse
                     time-bucket equi-join + residual filter. Each interval
                     explodes into its covered buckets; each point lives in
                     exactly ONE bucket, so a (point, interval) pair can
                     match at most once and no post-join dedup is needed.
                     Bucket width tunes fanout: choose ~ the median
                     interval length so intervals explode into O(1) rows.

100 TB notes: both operators shuffle ONLY on (by-keys [+ bucket]) — the
same hazard class as any groupBy; a hub key (one bot user with 10^8
events) concentrates one partition and is salted/split the same way
(operators/skew.py). No .collect(), no UDF, all whole-stage codegen.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LEFT_MARK = "_asof_is_left"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    right_cols: Optional[Sequence[str]] = None,
    prefix: str = "matched_",
    tolerance: Optional[str] = None,
) -> DataFrame:
    """For each left row: the right row with the greatest ts <= left.ts
    (``backward``) or the smallest ts >= left.ts (``forward``), within the
    same `by` keys. Unmatched left rows keep NULL matched columns (left
    outer semantics, like pandas merge_asof).

    Ties (several right rows at the winning timestamp) break
    deterministically to the LARGEST payload struct (lexicographic over
    `right_cols` in the order given) — pinned by the contract oracle.

    `tolerance` (e.g. "2 hours"): matches farther than the interval from
    the left timestamp are nulled out (state-bounding — the streaming
    watermark analogue for the batch path).

    Plan shape: union → ONE window (shuffle on `by`, sort by ts) →
    last(payload, ignorenulls) → filter left rows. O(N+M) rows through one
    exchange; never builds (point × candidate) pairs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    by = list(by)
    if right_cols is None:
        right_cols = right.columns
    right_cols = [c for c in right_cols if c != ts_col and c not in by]

    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in right_cols]
    )
    # one aligned schema for both sides: (by, ts, left attrs as nullable
    # extras, payload, mark) — right rows carry the payload, left rows
    # carry their own attributes and a NULL payload.
    extra_left = [c for c in left.columns if c not in by and c != ts_col]
    r_full = right.select(
        *by,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in extra_left],
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_LEFT_MARK),
    )
    l_full = left.select(
        *by,
        F.col(ts_col),
        *extra_left,
        F.lit(None).cast(r_full.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_LEFT_MARK),
    )
    unioned = l_full.unionByName(r_full)

    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    # mark asc: right rows sort before the left row at an equal timestamp
    # (inclusive match); payload asc: among tied right rows the LAST — and
    # therefore winning — one is the largest payload struct.
    order = [ts_order, F.col(_LEFT_MARK).asc(), F.col(_PAYLOAD).asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_m", matched)
        .filter(F.col(_LEFT_MARK) == 1)
        .drop(_PAYLOAD, _LEFT_MARK)
    )
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            in_tol = F.col("_m")[ts_col] >= F.col(ts_col) - tol
        else:
            in_tol = F.col("_m")[ts_col] <= F.col(ts_col) + tol
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *by,
        ts_col,
        *[c for c in out.columns if c not in (*by, ts_col, "_m")],
        F.col("_m")[ts_col].alias(f"{prefix}{ts_col}"),
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """points ⋈ intervals on `start <= ts < end` (+ equal `by` keys),
    bucketized: equi-join on (by, coarse time bucket) then the residual
    range filter. Turns the O(N·M) theta join into bucket-local hash joins;
    Catalyst sees a plain equi-join, so AQE/skew handling apply. `how` may
    be "inner" or "left" (left keeps unmatched points with NULL interval
    columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    by = list(by)
    sec = F.lit(_bucket_seconds(bucket))

    def epoch(c: Column) -> Column:
        # TIMESTAMP_NTZ has no direct long cast; route via session-local
        # timestamp (sessions pin UTC) — bucket ids only need consistency
        # between the two sides, not absolute epoch meaning.
        return c.cast("timestamp").cast("long")

    p_bucket = (epoch(F.col(ts_col)) / sec).cast("long")
    i_buckets = F.sequence(
        (epoch(F.col(start_col)) / sec).cast("long"),
        # end is exclusive, but a same-bucket end still covers the bucket
        (epoch(F.col(end_col)) / sec).cast("long"),
    )
    # explicit aliases: points and intervals often share lineage (intervals
    # built by aggregating the points' parent), and frame-indexed columns
    # (p[k] == i[k]) then resolve BOTH sides to one attribute — a silently
    # trivially-true predicate. String-qualified refs cannot mis-resolve.
    p = points.withColumn("_rb", p_bucket).alias("_rjp")
    i = intervals.withColumn("_rb", F.explode(i_buckets)).alias("_rji")
    lc = lambda c: F.col(f"_rjp.{c}")
    rc = lambda c: F.col(f"_rji.{c}")
    cond = [lc("_rb") == rc("_rb")] + [lc(k) == rc(k) for k in by]
    residual = (rc(start_col) <= lc(ts_col)) & (lc(ts_col) < rc(end_col))
    int_cols = [c for c in intervals.columns if c not in by]
    # the residual lives INSIDE the join condition, so "left" is a plain
    # left outer: matched rows keep their (possibly several) intervals,
    # unmatched points get one null-extended row — one join, one pass over
    # the exploded interval side.
    joined = p.join(i, [*cond, residual], how)
    return joined.select(
        *[lc(c) for c in points.columns], *[rc(c) for c in int_cols]
    )


def _bucket_seconds(bucket: str) -> int:
    """'1 hour' / '30 minutes' / '45 seconds' → seconds (static arg, parsed
    once on the driver)."""
    n, unit = bucket.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    if unit not in mult:
        raise ValueError(f"unsupported bucket unit {unit!r}")
    return int(n) * mult[unit]
