"""End-to-end web-scale KG construction pipeline.

documents/web corpus → HTML→text extraction (Arrow UDF, byte-identical) →
per-page artifact records → deterministic uuid5 planning + ontology mapping →
(subj, pred, obj) triples — the Spark re-expression of the reference's
supervisor graph deterministic path (/root/reference/graph.py:172-210,
SURVEY.md §3.1), with the LLM stages replaced by the broadcast ontology
dictionary + gazetteer per BASELINE.json north_star.

Plan shape (narrow until the sink):
  scan(parquet, pruned cols) → filter(lang) [pushed to scan] →
  extract_text pandas UDF → projections (JVM) → mapInPandas triple kernel.
  No shuffle anywhere on the emission path; canonicalization and rendering
  are separate, explicitly-partitioned jobs (operators/canonicalize.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import extract_text_udf, sha256_utf8_udf
from ..operators.triples import emit_triples
from ..refmap.ontology import load_dictionary, ontology_map_for_classes
from ..sources.corpus import web_corpus

PAGE_SHARED_METADATA = {
    "artifact_type": "Web Page",
    "description": "Crawled web page artifact records",
    "source": "common-crawl-style corpus",
}


def web_ontology_map() -> Dict[str, Any]:
    """Ontology map for web-page artifacts, compiled from the broadcast
    dictionary (deterministic replacement for the LLM research/synthesis
    stages — SURVEY.md §2.9) plus explicit propertyFieldMap rows (J4)."""
    dictionary = load_dictionary()
    omap = ontology_map_for_classes(dictionary, ["URL", "ContentDataFacet"])
    omap["artifacts"] = ["Web Page"]
    omap["additional_details"] = {
        "propertyFieldMap": {
            "URLFacet": {"fullValue": ["url"], "host": ["host"]},
            "ContentDataFacet": {
                "sizeInBytes": ["n_chars"],
                "hash": ["content_sha256"],
                "mimeType": ["mime_type"],
            },
        }
    }
    return omap


def extracted_pages(
    corpus: DataFrame, lang: Optional[str] = None, validate_extraction: bool = False
) -> DataFrame:
    """corpus (url, warc_ts, html, text, lang) → + extracted_text.

    The lang filter sits BEFORE the UDF so Catalyst pushes it into the scan
    (never decode pages we won't keep). When validate_extraction is set the
    golden ``text`` column is checked for byte-identity in-plan (cheap JVM
    comparison; any mismatch kills the job rather than silently drifting).
    """
    df = corpus
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    df = df.withColumn("extracted_text", extract_text_udf(F.col("html")))
    if validate_extraction and "text" in df.columns:
        df = df.withColumn(
            "extracted_text",
            F.when(
                F.col("extracted_text") == F.col("text"), F.col("extracted_text")
            ).otherwise(
                F.raise_error(
                    F.concat(F.lit("extraction drift for url="), F.col("url"))
                )
            ),
        )
    return df


def page_records(pages: DataFrame) -> DataFrame:
    """Per-page artifact record columns (all JSON-native scalar types so the
    canonical fingerprint is well-defined)."""
    return pages.select(
        F.col("url"),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_time"),
        F.col("lang"),
        F.length(F.col("extracted_text")).alias("n_chars"),
        sha256_utf8_udf(F.col("extracted_text")).alias("content_sha256"),
        F.substring_index(F.substring_index(F.col("url"), "/", 3), "//", -1).alias("host"),
        F.lit("text/html").alias("mime_type"),
        F.col("extracted_text"),
    )


def page_triples(
    records: DataFrame,
    ontology_map: Optional[Dict[str, Any]] = None,
    shared: Optional[Dict[str, Any]] = None,
) -> DataFrame:
    """records → triples; record fields exclude the free-text body (the
    reference fingerprints structured records, not raw evidence bytes)."""
    return emit_triples(
        records.drop("extracted_text"),
        ontology_map or web_ontology_map(),
        shared=dict(PAGE_SHARED_METADATA if shared is None else shared),
        passthrough_cols=("url",),
    )


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    lang: Optional[str] = None,
    out_dir: Optional[str] = None,
) -> Dict[str, DataFrame]:
    """Full batch: corpus → triples (+ optional materialization).

    Returns {triples, records, corpus} DataFrames (lazy). Materialization
    partitions triples by pmod(xxhash64(record_uuid), 64) so entity-keyed
    work downstream co-locates without re-shuffling small files.
    """
    corpus = web_corpus(spark, sf_dir)
    pages = extracted_pages(corpus, lang=lang)
    records = page_records(pages)
    triples = page_triples(records)

    if out_dir:
        (
            triples.withColumn(
                "bucket", F.pmod(F.xxhash64("record_uuid"), F.lit(64))
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(out_dir, "triples"))
        )
    return {"corpus": corpus, "pages": pages, "records": records, "triples": triples}
