#!/usr/bin/env python
"""spark-submit entrypoint for near-dup-filtered corpus ingest.

    spark-submit --py-files "$(python -c 'from lbf_spark.packaging import build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_ingest.py --input <parquet batch> --store <store dir> \
        [--threshold 0.5 --num-hashes 16 --bands 8 --ngram 3]

One invocation = one batch through the STANDING near-dup filter
(streaming/stream_features.dedup_ingest_batch): candidates from the
store's persisted LSH postings (the corpus is never re-signed),
batch-internal clusters collapse to min-id keepers, survivors and
their postings append, and the batch id advances from the store's own
high-water mark — repeated or cron-driven submissions are
exactly-once by construction. Prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from lbf_spark import fsio
    from lbf_spark.packaging import ship_package
    from lbf_spark.streaming.stream_features import dedup_ingest_batch

    spark = SparkSession.builder.appName("lbf_ingest").getOrCreate()
    ship_package(spark)
    try:
        state = json.loads(
            fsio.read_text(spark, f"{args.store}/state.json")
        )
    except Exception:
        state = {"batch_hwm": -1}
    stats = dedup_ingest_batch(
        spark.read.parquet(args.input),
        state["batch_hwm"] + 1,
        args.store,
        threshold=args.threshold,
        n=args.ngram,
        num_hashes=args.num_hashes,
        bands=args.bands,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
