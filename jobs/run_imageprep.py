#!/usr/bin/env python
"""spark-submit entrypoint for image training-prep: aspect-bucket
batch assembly + exact resize/crop execution.

    spark-submit --py-files "$(python -c 'from lbf_spark.packaging import build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_imageprep.py --images <parquet> --out <dir> \
        [--targets 512x512,576x448,448x576 --mode cover \
         --batch-size 32 --n-shards 64 --seed 42 --to-fmt png \
         --plan-only]

Thin adapter over ``lbf_spark.plans.imageprep.prep_images`` (see its
docstring for the chain and the shuffle shape). Writes the prepared
rows as parquet plus a per-bucket histogram JSON (the run's packing
report).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lbf_spark.plans.imageprep import parse_targets, prep_images  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--targets", default="512x512,576x448,448x576")
    ap.add_argument("--mode", choices=["cover", "fit"], default="cover")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--to-fmt", default=None)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--id-col", default="image_id")
    ap.add_argument("--w-col", default="w")
    ap.add_argument("--h-col", default="h")
    args = ap.parse_args()

    from lbf_spark import fsio

    spark = SparkSession.builder.appName("lbf-imageprep").getOrCreate()
    df = spark.read.parquet(args.images)
    out = prep_images(
        df, parse_targets(args.targets), mode=args.mode,
        batch_size=args.batch_size, n_shards=args.n_shards, seed=args.seed,
        to_fmt=args.to_fmt, plan_only=args.plan_only,
        id_col=args.id_col, w_col=args.w_col, h_col=args.h_col,
    )
    out.write.mode("overwrite").parquet(fsio.join(args.out, "prepared"))
    prepared = spark.read.parquet(fsio.join(args.out, "prepared"))
    report = {
        "n_images": prepared.count(),
        "buckets": {
            str(r["bucket_id"]): {
                "n": r["n"], "complete_batches": r["cb"],
            }
            for r in prepared.groupBy("bucket_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(
                    F.when(F.col("is_complete"),
                           F.concat_ws(":", "shard", "batch_no"))
                ).alias("cb"),
            ).collect()
        },
    }
    fsio.write_text_atomic(
        spark, fsio.join(args.out, "report.json"), json.dumps(report, indent=1)
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
