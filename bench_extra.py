#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the canonical bench (bench.py is frozen for measurement) — this
tool exists to (a) time one query at a time through the noop sink,
(b) capture .explain("formatted") into plans/<round>/, and (c) dump
per-stage metrics (shuffle bytes, task time, spill) from the REST API
so optimization work is targeted at measured cost, not guesses.

Usage:
  python bench_extra.py --queries q23_jaccard_pairs q26_embed_topk \
      --sf-dir /root/testdata/sf1.0 --explain-dir plans/r07 \
      --suffix before --repeats 2 --profile
  python bench_extra.py --queries q23_jaccard_pairs@10x ...   # 10x corpus
  python bench_extra.py --queries flagship ...                # flagship
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def stage_report(spark, port: int, group: str) -> list[dict]:
    """Stage metrics for every job in `group`, heaviest first."""
    try:
        app_id = _rest(port, "applications")[0]["id"]
        tracker = spark.sparkContext.statusTracker()
        stage_ids = set()
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info:
                stage_ids.update(info.stageIds)
        out = []
        for sid in stage_ids:
            try:
                for att in _rest(port, f"applications/{app_id}/stages/{sid}"):
                    out.append(
                        {
                            "stage": sid,
                            "name": att.get("name", "")[:80],
                            "tasks": att.get("numCompleteTasks"),
                            "task_time_s": round(
                                att.get("executorRunTime", 0) / 1000.0, 2
                            ),
                            "cpu_s": round(
                                att.get("executorCpuTime", 0) / 1e9, 2
                            ),
                            "gc_s": round(att.get("jvmGcTime", 0) / 1000.0, 2),
                            "input_mb": round(
                                att.get("inputBytes", 0) / 1e6, 1
                            ),
                            "sh_read_mb": round(
                                att.get("shuffleReadBytes", 0) / 1e6, 1
                            ),
                            "sh_write_mb": round(
                                att.get("shuffleWriteBytes", 0) / 1e6, 1
                            ),
                            "spill_mb": round(
                                att.get("diskBytesSpilled", 0) / 1e6, 1
                            ),
                            "rows_out": att.get("outputRecords"),
                        }
                    )
            except Exception:
                pass
        out.sort(key=lambda s: -s["task_time_s"])
        return out
    except Exception as e:  # UI off / no jobs — profiling is best-effort
        return [{"error": str(e)}]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--ui-port", type=int, default=4055)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir  # for bench helpers
    import bench as B
    from lbf_spark.session import get_spark
    from lbf_spark.operators import dedup as _dedup

    B.SF_DIR = args.sf_dir
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf = {}
    if args.profile:
        conf = {"spark.ui.enabled": "true", "spark.ui.port": str(args.ui_port)}
    spark = get_spark(
        "lbf_bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf=conf,
    )
    from lbf_spark.queries import QUERIES

    results: dict = {"sf_dir": args.sf_dir, "queries": {}}
    try:
        for spec in args.queries:
            name, _, variant = spec.partition("@")
            if name == "flagship":
                wall, n = B.run_flagship(spark, repeats=args.repeats)
                results["queries"][spec] = {"best_s": round(wall, 3), "rows": n}
                print(f"{spec}: {wall:.3f}s", flush=True)
                continue
            data_dir = B._docs10x_dir() if variant == "10x" else args.sf_dir
            fn, _ = QUERIES[name]
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                df = fn(spark, data_dir)
                p = os.path.join(
                    args.explain_dir, f"{spec.replace('@', '_')}_{args.suffix}.txt"
                )
                with open(p, "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    ))
                spark.catalog.clearCache()
                _dedup.release_caches()
            group = f"bx_{spec}"
            spark.sparkContext.setJobGroup(group, spec)
            runs = []
            for rep in range(args.repeats + 1):  # first = warmup
                spark.catalog.clearCache()
                _dedup.release_caches()
                t0 = time.time()
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if rep:
                    runs.append(round(dt, 3))
            entry: dict = {"best_s": min(runs), "runs": runs}
            if args.profile:
                entry["stages"] = stage_report(spark, args.ui_port, group)[:12]
            spark.sparkContext.setJobGroup("idle", "idle")
            results["queries"][spec] = entry
            print(f"{spec}: best {min(runs)}s of {runs}", flush=True)
            _dedup.release_caches()
    finally:
        spark.stop()
    txt = json.dumps(results, indent=1)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(txt)
    print(txt)


if __name__ == "__main__":
    main()
