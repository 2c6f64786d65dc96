#!/usr/bin/env python
"""spark-submit entrypoint for the corpus-curation pipeline.

    spark-submit --py-files "$(python -c 'from lbf_spark.packaging import build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_curation.py --documents <parquet> --out <dir> \
        [--quotas '{"web": 1000000}' --min-words 20 \
         --max-dup-ngram-frac 0.3 --near-dup --threshold 0.8 --seed 42]

Pipeline (plans/corpus.py): Gopher quality gates → trigram-repetition
gate → exact dedup → optional MinHash-LSH near-dup removal → exact
per-source mixture quotas. Writes the kept documents as parquet plus a
stage-survivor-count JSON next to it (the run's curation funnel).
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
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--quotas", default=None, help="JSON source→quota map")
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--max-dup-ngram-frac", type=float, default=0.3)
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from lbf_spark import fsio
    from lbf_spark.plans.corpus import curate_corpus, stage_counts

    spark = SparkSession.builder.appName("lbf-curation").getOrCreate()
    docs = spark.read.parquet(args.documents)
    res = curate_corpus(
        docs,
        quotas=json.loads(args.quotas) if args.quotas else None,
        id_col=args.id_col,
        text_col=args.text_col,
        source_col=args.source_col,
        min_words=args.min_words,
        max_dup_ngram_frac=args.max_dup_ngram_frac,
        near_dup=args.near_dup,
        near_dup_threshold=args.threshold,
        seed=args.seed,
    )
    res["kept"].write.mode("overwrite").parquet(fsio.join(args.out, "kept"))
    funnel = {
        r["stage"]: r["n_docs"]
        for r in stage_counts(res["stages"]).collect()
    }
    fsio.write_text_atomic(
        spark, fsio.join(args.out, "funnel.json"), json.dumps(funnel, indent=1)
    )
    print(json.dumps(funnel))
    spark.stop()


if __name__ == "__main__":
    main()
