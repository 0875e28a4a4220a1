"""spark-submit entrypoint for the KG pipeline (north_rule contract:
"run via spark-submit --py-files on N and 4N executors").

Usage (local proxy; on a cluster swap --master):

    python scripts/package_pyfiles.py                 # build dist/engine.zip
    spark-submit --master local[32] \
        --py-files dist/engine.zip \
        --conf spark.sql.shuffle.partitions=64 \
        scripts/submit_pipeline.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/kg_out

On a real cluster: --master yarn/k8s, --num-executors N, same zip. The
script only uses the packaged module + SparkSession — no driver-local
imports outside the zip."""

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", default=None)
    parser.add_argument("--lang", default=None)
    parser.add_argument("--with-mentions", action="store_true")
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    from case_uco_ontology_map_spark.plans.pipeline import run_pipeline

    t0 = time.perf_counter()
    out = run_pipeline(
        spark,
        args.sf_dir,
        lang=args.lang,
        out_dir=args.out,
        with_mentions=args.with_mentions,
    )
    from pyspark.sql import functions as F

    from case_uco_ontology_map_spark.operators.mentions import (
        MENTION_MARKER_PRED,
    )

    # count ontology triples and audit marker rows separately — markers
    # (surface_markers pipelines) are engine-internal, not graph content
    by_kind = (
        out["triples"]
        .groupBy((F.col("pred") == MENTION_MARKER_PRED).alias("is_marker"))
        .count()
        .collect()
    )
    n_triples = sum(r["count"] for r in by_kind if not r["is_marker"])
    n_markers = sum(r["count"] for r in by_kind if r["is_marker"])
    elapsed = time.perf_counter() - t0
    report = {
        "triples": n_triples,
        "marker_rows": n_markers,
        "sec": round(elapsed, 3),
        "sf_dir": args.sf_dir,
        "out": args.out,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    if args.with_mentions:
        # canonicalization cap-drop audit (no silent caps). Materialized
        # runs read the metrics off the entities write; lazy runs must
        # act on the entities frame first — count() here is that action.
        if "canonicalize_drops" not in out:
            out["entities"].count()
        from case_uco_ontology_map_spark.operators.dedup import drop_metrics

        report["canonicalize_drops"] = out.get(
            "canonicalize_drops", drop_metrics(out["drop_observation"])
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
