"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship KG-construction pipeline at sf0.001.
queries()/oracle_sql(): per-operator correctness pairs at sf0.01 vs DuckDB.

Column-name contract: every computed column is aliased identically in the
Spark query and the oracle SQL (the driver sorts columns by name and hashes
values).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"

# Shared constants woven into both the Spark plans and the oracle SQL.
_DESC = "Crawled web page artifact records"
_SRC = "common-crawl-style corpus"

# DuckDB expression fragments reproducing the deterministic corpus derivation
# (sources/corpus.py) and the record build (plans/pipeline.py:page_records).
_URL_SQL = "'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR)"
_WARC_SQL = (
    "strftime(TIMESTAMP '2025-01-01 00:00:00' + to_seconds(doc_id % 31536000), "
    "'%Y-%m-%dT%H:%M:%SZ')"
)
_HOST_SQL = "source || '.example.org'"
_HASH_SQL = "sha256(text)"
_NCHARS_SQL = "length(text)"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full web-KG construction (extract → map → triples)
    over the sf0.001 corpus; returns the triples DataFrame."""
    from case_uco_ontology_map_spark.plans.pipeline import run_pipeline

    return run_pipeline(spark, SF0001)["triples"]


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def _corpus_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from case_uco_ontology_map_spark.plans.pipeline import extracted_pages, page_records
    from case_uco_ontology_map_spark.sources.corpus import web_corpus

    return page_records(extracted_pages(web_corpus(spark, sf_dir)))


def q_page_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end canonical-fingerprint check: html render → byte-identical
    extraction → record build → canonical-JSON sha256 (tools.py:67-70
    semantics). Fully SQL-expressible because every record field is a
    deterministic function of the documents table."""
    from case_uco_ontology_map_spark.operators.triples import plan_manifest
    from case_uco_ontology_map_spark.plans.pipeline import PAGE_SHARED_METADATA

    records = _corpus_records(spark, sf_dir).drop("extracted_text")
    manifest = plan_manifest(
        records,
        shared=dict(PAGE_SHARED_METADATA),
        passthrough_cols=("url",),
    )
    return manifest.select("url", "fingerprint").orderBy("url")


def _oracle_page_fingerprints() -> str:
    canonical = (
        '\'{"artifact_type":"Web Page","content_sha256":"\' || ' + _HASH_SQL +
        " || '\",\"description\":\"" + _DESC + "\",\"host\":\"' || " + _HOST_SQL +
        " || '\",\"lang\":\"' || lang || "
        "'\",\"mime_type\":\"text/html\",\"n_chars\":' || CAST(" + _NCHARS_SQL +
        " AS VARCHAR) || ',\"source\":\"" + _SRC + "\",\"url\":\"' || " + _URL_SQL +
        " || '\",\"warc_time\":\"' || " + _WARC_SQL + " || '\"}'"
    )
    return (
        f"SELECT {_URL_SQL} AS url, sha256({canonical}) AS fingerprint "
        "FROM documents ORDER BY url"
    )


def q_page_literal_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal (non-IRI) triples keyed by url — checks the whole mapping
    layer (propertyFieldMap J4, alias/token matching J3, extension facet,
    no-null P1) against a pure-SQL reconstruction."""
    from pyspark.sql import functions as F

    from case_uco_ontology_map_spark.plans.pipeline import page_triples

    records = _corpus_records(spark, sf_dir)
    triples = page_triples(records)
    return (
        triples.filter(~F.col("obj_is_iri"))
        .select("url", "pred", "obj")
        .orderBy("url", "pred", "obj")
    )


def _oracle_page_literal_triples() -> str:
    base = (
        f"SELECT {_URL_SQL} AS url, {_HASH_SQL} AS hash, {_HOST_SQL} AS host, "
        f"CAST({_NCHARS_SQL} AS VARCHAR) AS n_chars, {_WARC_SQL} AS warc_time, "
        "lang FROM documents"
    )
    return f"""
WITH rec AS ({base})
SELECT url, pred, obj FROM (
  SELECT url, 'uco-observable:fullValue' AS pred, url AS obj FROM rec
  UNION ALL SELECT url, 'uco-observable:host', host FROM rec
  UNION ALL SELECT url, 'uco-observable:sizeInBytes', n_chars FROM rec
  UNION ALL SELECT url, 'uco-observable:hash', hash FROM rec
  UNION ALL SELECT url, 'uco-observable:mimeType', 'text/html' FROM rec
  UNION ALL SELECT url, 'uco-observable:dataPayloadReferenceURL', url FROM rec
  UNION ALL SELECT url, 'dfc-ext:lang', lang FROM rec
  UNION ALL SELECT url, 'dfc-ext:warcTime', warc_time FROM rec
) ORDER BY url, pred, obj
"""


def q_triples_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full triple emission incl. uuid5 IRIs (not SQL-expressible: uuid5 is
    SHA-1-based and DuckDB has no sha1) — rows-only driver check; exact
    golden parity is covered by tests/test_pipeline_spark.py."""
    from case_uco_ontology_map_spark.plans.pipeline import page_triples

    return page_triples(_corpus_records(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "page_fingerprints": q_page_fingerprints,
        "page_literal_triples": q_page_literal_triples,
        "triples_full": q_triples_full,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "page_fingerprints": _oracle_page_fingerprints(),
        "page_literal_triples": _oracle_page_literal_triples(),
    }
