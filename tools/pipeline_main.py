"""spark-submit entrypoint for the KG-construction pipeline.

Cluster launch (the north-rule contract):

    python tools/build_pyfiles.py                 # -> dist/turtle_spark.zip
    spark-submit --py-files dist/turtle_spark.zip \\
        tools/pipeline_main.py \\
        --docs /path/to/docs_parquet \\
        --workdir /path/to/checkpoints \\
        --fingerprint corpus-snapshot-id \\
        [--generate N] [--buckets 64] [--extract-chunks 16]

On a cluster, master/executors come from spark-submit's own flags
(--master yarn/k8s, --num-executors N); this script only builds the
session from the active context.  Re-running with the same workdir +
fingerprint resumes from committed stages/chunks.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", help="input docs parquet (doc_id, spans)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a deterministic corpus of N docs instead of --docs")
    ap.add_argument("--workdir", required=True, help="checkpoint/manifest dir")
    ap.add_argument("--fingerprint", required=True,
                    help="immutable input snapshot id (resume key)")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--extract-chunks", type=int, default=0,
                    help="partition-granular extract commit (0 = stage-level)")
    ap.add_argument("--snapshot-dir", default=None,
                    help="snapshot-catalog table dir: publish the canonical "
                         "table as a new version (idempotent per fingerprint)")
    ap.add_argument("--snapshot-op", default="append",
                    choices=["append", "overwrite"])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit provides master/deploy config; only app-level
    # settings are set here
    spark = (
        SparkSession.builder.appName("turtle-spark-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from turtle_spark.plans.pipeline import run_pipeline
    from turtle_spark.sources.corpus import generate_docs

    if args.generate:
        docs = generate_docs(spark, args.generate, seed=args.seed)
    elif args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        raise SystemExit("one of --docs / --generate is required")

    result = run_pipeline(
        spark,
        docs,
        workdir=args.workdir,
        input_fingerprint=args.fingerprint,
        n_buckets=args.buckets,
        extract_chunks=args.extract_chunks or None,
        snapshot_dir=args.snapshot_dir,
        snapshot_op=args.snapshot_op,
    )
    summary = {
        "rows": result.triples.count(),
        "stages_resumed": result.stages_resumed,
        "metrics": result.metrics,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
