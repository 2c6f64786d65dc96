#!/usr/bin/env python
"""spark-submit entrypoint for corpus near-dup dedup.

    spark-submit --py-files "$(python -c 'from lbf_spark.packaging import build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_dedup.py --documents <parquet> --out <dir> \
        [--threshold 0.8 --num-hashes 16 --bands 8 --ngram 3]

Pipeline: shingle → MinHash signatures → LSH banding → exact-Jaccard
verification → connected components → per-doc (cluster_id, is_keeper)
written as parquet. Every stage is the bucketed/portable path from
lbf_spark.operators.dedup (no all-pairs joins anywhere).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession, functions as F

# bare-python fallback (spark-submit --py-files supplies the package on
# a cluster; this makes `python jobs/run_dedup.py` work for debugging)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--checkpoint-dir",
        default=None,
        help="DFS dir for reliable per-round checkpoints of the "
        "connected-components labels (hdfs://, s3a://, file:). On a "
        "multi-executor cluster ALWAYS set this: the default "
        "localCheckpoint path stores blocks on executors and an "
        "executor loss kills the run.",
    )
    ap.add_argument("--max-iters", type=int, default=25)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("lbf_dedup").getOrCreate()
    from lbf_spark.operators.dedup import dup_clusters, minhash_dedup_pairs
    from lbf_spark.packaging import ship_package

    ship_package(spark)
    docs = spark.read.parquet(args.documents)
    pairs = minhash_dedup_pairs(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        n=args.ngram,
        num_hashes=args.num_hashes,
        bands=args.bands,
        threshold=args.threshold,
    )
    clusters = dup_clusters(
        pairs,
        max_iters=args.max_iters,
        reliable=args.checkpoint_dir is not None,
        checkpoint_dir=args.checkpoint_dir,
    )
    out = (
        docs.select(args.id_col)
        .join(
            clusters.withColumnRenamed("doc_id", args.id_col), args.id_col, "left"
        )
        .withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col(args.id_col))
        )
        .withColumn("is_keeper", F.col("cluster_id") == F.col(args.id_col))
    )
    out.write.mode("overwrite").parquet(args.out)
    n_docs = out.count()
    n_dupes = out.filter(~F.col("is_keeper")).count()
    from lbf_spark.operators import dedup as _dedup

    _dedup.release_caches()  # scoped ownership: nothing retained post-pass
    print(json.dumps({"n_docs": n_docs, "n_duplicates_marked": n_dupes}))
    spark.stop()


if __name__ == "__main__":
    main()
