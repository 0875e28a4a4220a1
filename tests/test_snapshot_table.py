"""Snapshot table layer: atomic commits, append-by-reference, time travel,
and resume integration."""

import os

import pytest
from pyspark.sql import functions as F

from case_uco_ontology_map_spark.sources.tables import SnapshotTable


def test_snapshot_commit_append_timetravel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.current_snapshot_id() is None

    s1 = t.overwrite(spark.range(10).withColumn("v", F.lit("a")))
    assert t.current_snapshot_id() == s1
    assert t.read(spark).count() == 10

    s2 = t.append(spark.range(5).withColumn("v", F.lit("b")))
    assert t.read(spark).count() == 15
    # time travel: s1 still shows 10 rows
    assert t.read(spark, s1).count() == 10

    s3 = t.overwrite(spark.range(3).withColumn("v", F.lit("c")))
    assert t.read(spark).count() == 3
    assert t.read(spark, s2).count() == 15

    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [s1, s2, s3]
    assert snaps[1]["parent"] == s1 and snaps[1]["mode"] == "append"


def test_commit_survives_orphaned_partial_commit(spark, tmp_path):
    """A crash after the data-dir write but before HEAD flip must not wedge
    the table: the orphaned dir is inert and the next commit succeeds with
    a fresh id (previously the retry collided on mode('error'))."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(5)
    s1 = t.append(df)

    # simulate the crash: stage a data dir + claim a snapshot json but
    # never flip HEAD (exactly the state _commit leaves mid-way)
    orphan = os.path.join(t.data_dir, "deadbeef0000")
    df.write.parquet(orphan)
    import json as _json
    with open(os.path.join(t.snap_dir, f"{int(s1)+1:012d}.json"), "w") as fh:
        _json.dump({"snapshot_id": f"{int(s1)+1:012d}", "parent": s1,
                    "mode": "append", "data_dirs": ["deadbeef0000"],
                    "committed_at": 0, "properties": {}}, fh)
    assert t.current_snapshot_id() == s1  # HEAD untouched by the "crash"

    # next commit claims a NEW id past the orphaned json and succeeds
    s2 = t.append(spark.range(5, 8))
    assert int(s2) == int(s1) + 2
    assert t.read(spark).count() == 8
    # time travel to s1 still works
    assert t.read(spark, s1).count() == 5


def test_snapshot_table_resume_integration(spark, sf_dir, tmp_path):
    """Triples materialized as snapshots; incremental run appends only new
    records' triples; HEAD read equals a full recompute."""
    from case_uco_ontology_map_spark.plans.pipeline import fused_page_triples
    from case_uco_ontology_map_spark.sources.corpus import web_corpus
    from case_uco_ontology_map_spark.streaming import resume

    corpus = web_corpus(spark, sf_dir).limit(100).cache()
    half = corpus.filter(F.xxhash64("url") % 2 == 0)

    table = SnapshotTable(str(tmp_path / "triples_tbl"))
    t1 = fused_page_triples(half)
    table.overwrite(t1, properties={"run": 1})
    manifest_path = str(tmp_path / "manifest")
    resume.write_manifest(
        table.read(spark).select("fingerprint", "record_uuid").distinct(),
        manifest_path,
    )

    # incremental: only new urls recompute, appended as snapshot 2
    cp = resume.read_manifest(spark, manifest_path)
    from case_uco_ontology_map_spark.plans.pipeline import (
        PAGE_SHARED_METADATA,
        extracted_pages,
        page_records,
    )

    records = page_records(extracted_pages(corpus)).drop("extracted_text")
    split = resume.split_resume(records, cp, shared=dict(PAGE_SHARED_METADATA))
    new_urls = [r["url"] for r in split.filter("NOT reused").select("url").collect()]
    fresh = fused_page_triples(corpus.filter(F.col("url").isin(new_urls)))
    table.append(fresh, properties={"run": 2})

    key = ["subj", "pred", "obj", "record_uuid"]
    resumed = {tuple(r) for r in table.read(spark).select(*key).collect()}
    full = {tuple(r) for r in fused_page_triples(corpus).select(*key).collect()}
    assert resumed == full
    corpus.unpersist()
