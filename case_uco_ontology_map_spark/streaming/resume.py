"""Exact resume + partial invalidation + per-partition lineage.

Reference semantics (SURVEY.md §2.8):
  ST1 exact resume      unchanged fingerprints keep their prior identity; only
                        new/changed records are recomputed
                        (/root/reference/agents/uuid_planner.py:229-241)
  ST2 partial invalidation  drop named record_uuids from the manifest and
                        recompute only those
                        (/root/reference/agents/uuid_planner.py:286-303)
  A7 lineage            per-partition counters (docs, triples, bytes)

Spark design: the checkpoint is a parquet table of (fingerprint,
record_uuid, bucket). Because the whole identity chain is a pure function
of the fingerprint, resume does NOT need to restore any state to produce
identical output — the manifest join serves to (a) SKIP recomputation of
already-materialized records and (b) prove identity stability. The join is
hash-equi on fingerprint; the manifest side is usually the smaller one →
broadcast if it fits, else sort-merge on the shuffle-partitioned key.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.triples import plan_manifest

MANIFEST_SCHEMA = "fingerprint string, record_uuid string"


def write_manifest(manifest: DataFrame, path: str, buckets: int = 16) -> None:
    """Materialize the checkpoint manifest partitioned by a fingerprint
    bucket (uniform key → no skew; bucket pruning on resume)."""
    (
        manifest.withColumn("bucket", F.pmod(F.xxhash64("fingerprint"), F.lit(buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_manifest(spark: SparkSession, path: str) -> Optional[DataFrame]:
    try:
        return spark.read.parquet(path).select("fingerprint", "record_uuid")
    except Exception:
        return None


def split_resume(
    records: DataFrame,
    manifest: Optional[DataFrame],
    record_cols: Optional[Sequence[str]] = None,
    shared: Optional[Dict] = None,
    broadcast_manifest: bool = True,
) -> DataFrame:
    """records → (fingerprint, record_uuid, reused, <record cols>).

    reused=true rows were present in the checkpoint (identical fingerprint →
    identical identity chain, uuid_planner.py:235-241); reused=false rows
    are new/changed and must be (re)computed. ST1 contract: the union of
    prior output for reused rows and fresh output for new rows equals a
    full recompute, byte-for-byte.
    """
    cols = list(record_cols if record_cols is not None else records.columns)
    with_ids = plan_manifest(
        records, record_cols=cols, shared=shared, passthrough_cols=tuple(cols)
    )
    if manifest is None:
        return with_ids.withColumn("reused", F.lit(False))
    cp = manifest.select(
        F.col("fingerprint").alias("cp_fingerprint"),
        F.lit(True).alias("cp_hit"),
    ).dropDuplicates(["cp_fingerprint"])
    if broadcast_manifest:
        cp = F.broadcast(cp)
    return (
        with_ids.join(cp, with_ids["fingerprint"] == cp["cp_fingerprint"], "left")
        .drop("cp_fingerprint")
        .withColumn("reused", F.coalesce(F.col("cp_hit"), F.lit(False)))
        .drop("cp_hit")
    )


def invalidate(
    manifest: DataFrame, record_uuids: Sequence[str]
) -> DataFrame:
    """ST2 partial invalidation: drop the named record_uuids from the
    manifest so their records recompute on the next resume
    (uuid_planner.py:286-300). Everything else stays reused."""
    if not record_uuids:
        return manifest
    return manifest.filter(~F.col("record_uuid").isin(list(record_uuids)))


def lineage(
    triples: DataFrame,
    by: str = "record_uuid",
) -> DataFrame:
    """A7 per-partition lineage rows: docs, triples, bytes, fingerprint
    range per spark partition — written next to the triples table so a
    resume can assert which partitions are complete."""
    return (
        triples.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count_distinct(by).alias("records"),
            F.count("*").alias("triples"),
            F.sum(F.length("obj")).alias("obj_bytes"),
            F.min("fingerprint").alias("fp_min"),
            F.max("fingerprint").alias("fp_max"),
        )
    )
