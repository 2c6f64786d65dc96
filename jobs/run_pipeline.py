#!/usr/bin/env python
"""spark-submit entrypoint for the feature pipeline.

    spark-submit --py-files "$(python -c 'from lbf_spark.packaging import build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_pipeline.py --events <parquet> --anchors <parquet> \
        --checkpoint-dir /data/ckpt [--span 2000 --bucket-w 100 ...]

Resumable: re-submitting with the same config reuses every finished
stage from the checkpoint dir (sha1-config run_id lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession

# bare-python fallback (spark-submit --py-files supplies the package on
# a cluster; this makes `python jobs/run_pipeline.py` work for debugging)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--anchors", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--span", type=int, default=2000)
    ap.add_argument("--bucket-w", type=int, default=100)
    ap.add_argument("--flank-n", type=int, default=5)
    ap.add_argument("--rolling-w", type=int, default=16)
    ap.add_argument("--session-gap", type=int, default=1000)
    ap.add_argument("--summary", default="mean")
    ap.add_argument(
        "--config-json",
        default=None,
        help="JSON dict of FeatureConfig overrides; validated+coerced "
        "via plans.registry.validate_config (voluptuous analog) and "
        "taking precedence over the individual flags",
    )
    args = ap.parse_args()

    # spark-submit provides the session; fall back to a local one so the
    # script also runs bare for debugging
    spark = SparkSession.builder.appName("lbf_pipeline").getOrCreate()
    from lbf_spark.packaging import ship_package
    from lbf_spark.plans.pipeline import FeatureConfig, run_pipeline

    ship_package(spark)
    from lbf_spark.plans.registry import validate_config

    base = {
        "span": args.span,
        "bucket_w": args.bucket_w,
        "flank_n": args.flank_n,
        "rolling_w": args.rolling_w,
        "session_gap": args.session_gap,
        "summary": args.summary,
    }
    if args.config_json:
        base.update(json.loads(args.config_json))
    # coercing validation with named stage/field errors (schemas.py analog)
    cfg = validate_config("feature_pipeline", FeatureConfig, base)
    metrics = run_pipeline(
        spark.read.parquet(args.events),
        spark.read.parquet(args.anchors),
        cfg,
        args.checkpoint_dir,
        spark,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
