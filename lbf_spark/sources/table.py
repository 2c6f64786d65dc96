"""Iceberg-style table layout over partitioned parquet.

The north_rule's storage is an Iceberg table of image+caption pairs; no
table-format runtime ships in this sandbox, so this module implements
the parts of that contract the engine actually relies on, on plain
partitioned parquet:

* a **partition spec** `(entity_bucket = hash(entity) % N, ts_day =
  floor(ts / day))` — the bucket keeps any one directory bounded under
  Zipf-skewed entities, the day column gives time-range pruning (the
  Iceberg `bucket(N, entity), days(ts)` transform pair);
* **snapshot manifests**: every write appends a JSON snapshot (schema,
  partition spec, the exact data files the write ADDED, parent pointer)
  — enough lineage to know exactly what a run read, and enough for
  **time travel** (`scan(snapshot_id=…)`) and **incremental reads**
  (`incremental_files` — the Iceberg changelog-read analog);
* **partition pruning**: `scan()` turns entity/time predicates into
  partition-column predicates so the parquet source prunes directories
  (verified via PartitionFilters in the physical plan).

Swapping in real Iceberg later = replacing these writers/readers with
catalog calls; every operator above this layer is unchanged.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

DAY = 86_400


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the same snapshot id first. Safe to
    retry immediately: every write stages its part files in a unique
    ``.staging/<token>`` dir and records EXACTLY those files in its
    manifest (never a directory diff), and the loser's already-moved
    files are best-effort deleted before this is raised — so a retry
    can neither adopt a previous attempt's data nor double-write rows.
    Any debris a *crashed* writer leaves (staging dirs, moved-but-
    uncommitted parts) stays invisible to readers (scans are
    manifest-driven) until ``remove_orphan_files`` reclaims it."""


def _with_partition_cols(df: DataFrame, n_buckets: int, ts_unit_day: int) -> DataFrame:
    return df.withColumn(
        "entity_bucket", F.pmod(F.xxhash64("entity"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.floor(F.col("ts") / F.lit(ts_unit_day)).cast("long"))


def _parse_spec(spec: dict) -> tuple[int, int]:
    """``partition_spec`` manifest entry → (n_buckets, ts_unit_day)."""
    n_buckets = int(spec["entity_bucket"].split("(")[1].split(",")[0])
    ts_unit = int(spec["ts_day"].rsplit("/", 1)[1].rstrip(") ").strip())
    return n_buckets, ts_unit


def _spec_generations(
    snaps: list[dict], snapshot_id: int | None = None
) -> set[tuple[int, int]]:
    """Every (n_buckets, ts_unit_day) generation the chain has carried
    — each snapshot's own spec plus any ``spec_history`` a reset point
    preserved from expired manifests. Scans prune with the UNION of
    the generations' allowed-partition sets: a visible file was
    written (or compaction-preserved) under SOME generation, so the
    union is a conservative superset — never a wrong prune — and the
    exact row predicates run on top."""
    gens: set[tuple[int, int]] = set()
    for s in snaps:
        if snapshot_id is not None and s["snapshot_id"] > snapshot_id:
            break
        gens.add(_parse_spec(s["partition_spec"]))
        for old in s.get("spec_history") or []:
            gens.add(_parse_spec(old))
    return gens


def _check_schema_evolution(prev_schema_json: str, new_schema) -> list[str]:
    """Add-column-only schema evolution (the Iceberg ``union`` subset
    this layer supports): every previously-present column must keep its
    name and type; brand-new columns are allowed and NULL-fill on read
    for older files. Rename / drop / type-change raise — they would
    silently corrupt older snapshots' reads. Returns the new columns."""
    from pyspark.sql.types import StructType

    prev = StructType.fromJson(json.loads(prev_schema_json))
    new_by_name = {f.name: f for f in new_schema.fields}
    for f in prev.fields:
        if f.name not in new_by_name:
            raise ValueError(
                f"schema evolution: column {f.name!r} missing from the "
                "appended frame — drop/rename is unsupported (older "
                "snapshots would read corrupt); add-column only"
            )
        if new_by_name[f.name].dataType != f.dataType:
            raise ValueError(
                f"schema evolution: column {f.name!r} changed type "
                f"{f.dataType.simpleString()} -> "
                f"{new_by_name[f.name].dataType.simpleString()} — type "
                "changes are unsupported; add a new column instead"
            )
    return [f.name for f in new_schema.fields if f.name not in
            {p.name for p in prev.fields}]


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    n_buckets: int | None = None,
    ts_unit_day: int | None = None,
    layout_cols: list[str] | None = None,
    layout_bits: int = 8,
    layout_files: int = 8,
    layout: str = "zorder",
    extra: dict | None = None,
) -> dict:
    """Partitioned write + snapshot manifest. Returns the snapshot.

    ``path`` may be local, ``file:``-prefixed, or a DFS URI — all
    metadata IO goes through the Hadoop FileSystem API (``fsio``), the
    same requirement Iceberg itself has of its warehouse location.

    Appends may ADD columns (recorded in the snapshot schema; older
    files NULL-fill on read) but never drop/rename/retype — validated
    against the current snapshot before any data lands.

    ``layout_cols`` z-orders the write (Iceberg/Delta ``ZORDER BY``):
    rows are range-partitioned and sorted by the Morton key over those
    columns before writing, so parquet min/max stats cluster in EVERY
    listed dimension and multi-column predicates prune files, not just
    the leading key. The key column itself is dropped before write —
    the clustering is carried by row order.

    ``extra`` fields merge into the manifest inside the SAME exclusive
    commit (exactly-once sinks record their batch_id this way — a
    post-commit patch would leave a crash window where the snapshot is
    committed but not yet idempotency-tagged).

    ``mode="overwrite"`` is LOGICAL (Iceberg semantics): the new
    snapshot's ``overwrite`` mode resets the visible file set at
    replay; pre-overwrite data files stay on disk until
    ``remove_orphan_files`` reclaims them. Physically deleting them
    here would race a concurrent writer — a losing overwrite would
    wipe the winner's just-committed files before the manifest race
    was decided."""
    from pyspark import StorageLevel

    from lbf_spark import fsio

    spark = df.sparkSession
    meta_dir = fsio.join(path, "metadata")
    cur = current_snapshot(path, spark)
    prev = cur if mode == "append" else None
    if prev is not None:
        _check_schema_evolution(prev["schema"], df.schema)
    # None = inherit the table's CURRENT spec (the evolve_partition_spec
    # contract: appends after an evolution land under the new layout
    # without every caller re-stating it); fresh tables default 16/DAY
    cur_spec = _parse_spec(cur["partition_spec"]) if cur else (16, DAY)
    n_buckets = int(n_buckets) if n_buckets is not None else cur_spec[0]
    ts_unit_day = (
        int(ts_unit_day) if ts_unit_day is not None else cur_spec[1]
    )
    pdf = _with_partition_cols(df, n_buckets, ts_unit_day)
    if layout_cols:
        from lbf_spark.util import fan_out

        if layout == "hilbert":
            keyed = hilbert_key(pdf, layout_cols, bits=layout_bits, out="__z")
        elif layout == "zorder":
            keyed = zorder_key(pdf, layout_cols, bits=layout_bits, out="__z")
        else:
            raise ValueError("layout must be 'zorder' or 'hilbert'")
        # fan_out: repartitionByRange first runs a SAMPLE job over its
        # child — on a narrow single-row-group scan that sampling (and
        # the range shuffle's map side) runs on ONE task (measured r7:
        # a 2 s single-task stage in the q105 write). Round-robin
        # spreading first is a no-op on multi-file production scans.
        # The persist makes the sample job and the write job share ONE
        # evaluation of the scan+key lineage (the sampler otherwise
        # re-executes it in full — measured r7: ~1.6 s of the q105
        # land); released right after the land below.
        _layout_cache = fan_out(keyed).persist(StorageLevel.MEMORY_AND_DISK)
        pdf = (
            _layout_cache
            .repartitionByRange(layout_files, "entity_bucket", "ts_day", "__z")
            .sortWithinPartitions("entity_bucket", "ts_day", "__z")
            .drop("__z")
        )
    else:
        _layout_cache = None
        # Hash-distribute NARROW inputs by the partition cols before
        # landing (Iceberg's write.distribution-mode=hash, same as
        # merge_upsert): one file per touched partition dir instead of
        # one per (upstream task × dir) — bounded file counts and
        # write parallelism = number of touched dirs regardless of the
        # scan's split count (guide §6 output sizing). A caller that
        # already shuffled (repartition/groupBy upstream) has chosen
        # its layout — leave it alone (same plan-string probe as
        # util.fan_out; nothing executes).
        from lbf_spark.util import _FULL_PARALLEL_MARKERS

        try:
            _plan = pdf._jdf.queryExecution().executedPlan().toString().lower()
            _spread = any(m in _plan for m in _FULL_PARALLEL_MARKERS)
        except Exception:
            _spread = True  # probe failed: preserve old behavior
        if not _spread:
            pdf = pdf.repartition("entity_bucket", "ts_day")
    added = _land_data_files(spark, pdf, path)
    if _layout_cache is not None:
        _layout_cache.unpersist()
    fsio.mkdirs(spark, meta_dir)
    existing = [f for f in fsio.list_names(spark, meta_dir) if f.startswith("snap-") and f.endswith(".json")]
    parent = existing[-1] if existing else None
    # next id = last EXISTING id + 1, never len(existing)+1: snapshot
    # expiration deletes prefix manifests, so after expire(keep_last=1)
    # a count-based id would collide with (or sort before) the retained
    # snapshot and append rows invisibly
    if existing:
        next_id = int(existing[-1].split("-")[1].split(".")[0]) + 1
    else:
        next_id = 1
    snapshot = dict(extra or {})
    snapshot.update(
        {
            "snapshot_id": next_id,
            "parent": parent,
            "schema": df.schema.json(),
            "partition_spec": {
                "entity_bucket": f"bucket({n_buckets}, entity)",
                "ts_day": f"floor(ts / {ts_unit_day})",
            },
            "added_files": added,
            "file_stats": _file_ts_stats(spark, fsio.join(path, "data"), added),
            "n_data_files": fsio.count_files_recursive(
                spark, fsio.join(path, "data"), ".parquet"
            ),
            "mode": mode,
        }
    )
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    _commit_or_cleanup(spark, fsio.join(meta_dir, name), snapshot, path, added)
    return snapshot


#: write-path physical mode: "staged" (stage-then-adopt — the safe
#: default: exactly-once under retry/concurrency) or "direct" (the
#: pre-r5 semantics: write straight into data/ and dir-diff for the
#: added list — UNSAFE under concurrent writers/retries; retained ONLY
#: as the control arm of the staged-write A/B benchmark).
LAND_MODE = "staged"

class ExpectationsError(RuntimeError):
    """A quality-gated write refused to land: one or more expectations
    failed (or saw no data). ``self.failed`` carries the failing
    verdict rows (kind, col_name, metric, lo, hi)."""

    def __init__(self, failed: list[dict]):
        self.failed = failed
        msg = "; ".join(
            f"{r['kind']}({r['col_name']}) metric={r['metric']} "
            f"lo={r['lo']} hi={r['hi']}"
            for r in failed
        )
        super().__init__(f"{len(failed)} expectation(s) failed: {msg}")


def write_table_gated(
    df: DataFrame, path: str, checks: list[dict], **kw
) -> dict:
    """``write_table`` behind a declarative quality gate
    (``profile.expectations``): evaluate every check FIRST; if any
    thresholded check fails — including the fail-closed NULL metrics
    an empty input produces — raise :class:`ExpectationsError` and
    land NOTHING (no staging, no manifest, no snapshot). On pass, the
    snapshot's ``extra`` records the full gate verdict
    (``quality_gate``: per-check metrics), so downstream readers can
    audit WHAT was measured at landing time, not just that a gate ran.

    Cost: one extra aggregation pass over ``df`` before the write —
    but the gate scans ONLY the checked columns (column pruning
    reaches the parquet source), so at scale it reads a thin
    projection, not the payload. The driver collects |checks| verdict
    rows, never data."""
    from lbf_spark.operators.profile import expectations

    verdict = [r.asDict() for r in expectations(df, checks).collect()]
    failed = [
        {k: r[k] for k in ("kind", "col_name", "metric", "lo", "hi")}
        for r in verdict
        if not r["passed"]
    ]
    if failed:
        raise ExpectationsError(failed)
    extra = dict(kw.pop("extra", None) or {})
    extra["quality_gate"] = {
        "n_checks": len(verdict),
        "all_passed": True,
        "metrics": {
            f"{r['kind']}:{r['col_name']}": r["metric"] for r in verdict
        },
    }
    return write_table(df, path, extra=extra, **kw)


#: component timings (seconds) of the most recent write_table /
#: merge_upsert on this driver: {"land": …, "stats": …, "commit": …}.
#: Observability for the bench decomposition; not a public API.
LAST_WRITE_PROFILE: dict = {}

#: running totals of the same components since the last reset — the
#: staged-write A/B sums a whole multi-write workload with these.
WRITE_PROFILE_TOTALS: dict = {}


def reset_write_profile() -> None:
    LAST_WRITE_PROFILE.clear()
    WRITE_PROFILE_TOTALS.clear()


def _prof(key: str, dt: float) -> None:
    LAST_WRITE_PROFILE[key] = round(dt, 4)
    WRITE_PROFILE_TOTALS[key] = round(
        WRITE_PROFILE_TOTALS.get(key, 0.0) + dt, 4
    )


def _land_data_files(spark, pdf: DataFrame, path: str) -> list[str]:
    import time as _time

    t0 = _time.time()
    try:
        if LAND_MODE == "direct":
            return _land_data_files_direct(spark, pdf, path)
        return _land_data_files_staged(spark, pdf, path)
    finally:
        _prof("land", _time.time() - t0)
        LAST_WRITE_PROFILE["mode"] = LAND_MODE


def _land_data_files_direct(spark, pdf: DataFrame, path: str) -> list[str]:
    """Control arm of the staged-write A/B: append parquet directly
    into ``data/`` and compute the added list as a before/after dir
    diff (round-4 behavior). Measures the pure land cost without the
    adopt moves; NOT safe under concurrent writers or retried jobs —
    benchmark use only (see LAND_MODE)."""
    from lbf_spark import fsio

    data_dir = fsio.join(path, "data")
    before = {
        f["path"]
        for f in fsio.list_files_recursive(spark, data_dir, ".parquet")
    } if fsio.exists(spark, data_dir) else set()
    pdf.write.mode("append").partitionBy("entity_bucket", "ts_day").parquet(
        data_dir
    )
    after = [
        f["path"] for f in fsio.list_files_recursive(spark, data_dir, ".parquet")
    ]
    return sorted(p for p in after if p not in before)


def _land_data_files_staged(spark, pdf: DataFrame, path: str) -> list[str]:
    """Stage-then-adopt data write: land the partitioned parquet under a
    unique ``.staging/<token>`` dir, move exactly those part files into
    ``data/`` (same partition-relative path — Spark's per-job UUID in
    part names makes collisions impossible), and return their relative
    paths. The added-file list comes FROM THE WRITE ITSELF, never from
    diffing the data dir — so debris left by a crashed or race-losing
    writer is never silently adopted into a later snapshot, and a
    retried write cannot double-adopt its first attempt's rows (the
    round-4 concurrent-retry duplication hazard)."""
    import uuid as _uuid

    from lbf_spark import fsio

    staging = fsio.join(path, ".staging", _uuid.uuid4().hex[:16])
    pdf.write.mode("overwrite").partitionBy("entity_bucket", "ts_day").parquet(
        staging
    )
    parts = [
        f["path"] for f in fsio.list_files_recursive(spark, staging, ".parquet")
    ]
    data_dir = fsio.join(path, "data")
    # adopt moves are per-file metadata RPCs (same class Iceberg commits
    # pay per manifest entry) — issue them from a small thread pool so
    # NameNode round-trips overlap instead of serializing on the driver
    from concurrent.futures import ThreadPoolExecutor

    def _mv(rel: str) -> None:
        fsio.move_file(spark, fsio.join(staging, rel), fsio.join(data_dir, rel))

    if len(parts) > 4:
        with ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(_mv, parts))
    else:
        for rel in parts:
            _mv(rel)
    fsio.delete(spark, staging, recursive=True)
    return sorted(parts)


def _commit_or_cleanup(
    spark, manifest_path: str, snapshot: dict, path: str, added: list[str]
) -> None:
    import time as _time

    t0 = _time.time()
    try:
        _commit_or_cleanup_inner(spark, manifest_path, snapshot, path, added)
    finally:
        _prof("commit", _time.time() - t0)


def _commit_or_cleanup_inner(
    spark, manifest_path: str, snapshot: dict, path: str, added: list[str]
) -> None:
    """Exclusive manifest commit; on losing the snapshot-id race,
    best-effort delete the data files this attempt already moved into
    ``data/`` so a retry starts clean, then raise ConcurrentWriteError."""
    from lbf_spark import fsio

    try:  # optimistic concurrency: exactly one writer claims this id
        fsio.write_text_exclusive(
            spark, manifest_path, json.dumps(snapshot, indent=1)
        )
    except FileExistsError as e:
        data_dir = fsio.join(path, "data")
        for rel in added:
            try:
                fsio.delete(spark, fsio.join(data_dir, rel))
            except Exception:
                pass  # leftover becomes an orphan; remove_orphan_files reclaims
        raise ConcurrentWriteError(str(e)) from e


_HOT_STATS_K = 8  # per-file hot-entity entries kept in the manifest


def _file_ts_stats(spark, data_dir: str, files: list[str]) -> dict:
    import time as _time

    t0 = _time.time()
    try:
        return _file_ts_stats_inner(spark, data_dir, files)
    finally:
        _prof("stats", _time.time() - t0)


#: driver-side stats fast path: total added bytes at or under this run
#: the per-file stats scan in the driver with pyarrow (no Spark job —
#: ~10 ms vs ~0.2-0.3 s of pure job-scheduling overhead for a
#: metadata-scale read-back; measured r7 as 1-2 such jobs per write in
#: q101/q105). Local file:// paths only; bigger writes and DFS paths
#: keep the distributed read-back, so at warehouse scale this is inert.
STATS_DRIVER_BYTES = 32 * 1024 * 1024


def _file_ts_stats_local(data_dir: str, files: list[str]) -> dict | None:
    """Bit-identical driver-side implementation of the per-file stats
    for SMALL LOCAL writes, or None to use the Spark read-back.
    Matches ``_file_ts_stats_inner`` exactly: empty files are omitted,
    null entities count toward n_rows/ts bounds but never rank, the
    hot map holds the top-8 entities by (count desc, str(entity) asc),
    keys are the string cast. Equality with the Spark job is pinned by
    a pytest over nulls/ties/>8-entity fixtures."""
    import os as _os

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    if data_dir.startswith("file://"):
        base = data_dir[len("file://"):]
    elif "://" in data_dir:
        return None
    else:
        base = data_dir
    limit = int(_os.environ.get("LBF_STATS_DRIVER_BYTES", STATS_DRIVER_BYTES))
    paths = [_os.path.join(base, f) for f in files]
    try:
        if sum(_os.path.getsize(p) for p in paths) > limit:
            return None
    except OSError:
        return None
    out = {}
    for rel, p in zip(files, paths):
        try:
            schema = _pq.read_schema(p)
        except Exception:
            return None
        if "ts" not in schema.names or "entity" not in schema.names:
            return None
        import pyarrow as _pa

        if not _pa.types.is_integer(schema.field("ts").type):
            return None  # Spark path raises on non-numeric ts; keep it
        et = schema.field("entity").type
        if not (_pa.types.is_integer(et) or _pa.types.is_string(et)
                or _pa.types.is_large_string(et)):
            return None
        t = _pq.read_table(p, columns=["ts", "entity"])
        if t.num_rows == 0:
            continue  # the Spark groupBy emits no row for empty files
        mm = _pc.min_max(t.column("ts"))
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        vc = _pc.value_counts(t.column("entity").combine_chunks())
        entries = [
            (-c, str(v), c)
            for v, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            )
            if v is not None
        ]
        entries.sort()
        hot = {e[1]: e[2] for e in entries[:_HOT_STATS_K]}
        out[rel] = [
            int(mn) if mn is not None else None,
            int(mx) if mx is not None else None,
            int(t.num_rows),
            hot,
        ]
    return out


def _file_ts_stats_inner(spark, data_dir: str, files: list[str]) -> dict:
    """Per-added-file column stats — the Iceberg per-file stats that
    make FILE skipping (not just partition pruning) work, plus row
    counts and a top-K per-entity count sketch for skew planning. One
    metadata-scale Spark job over exactly the files this write created
    (Iceberg collects these in the write tasks themselves; a read-back
    is the parquet-shim equivalent). Returns
    ``{relative_path: [ts_min, ts_max, n_rows, {entity: count}]}``
    (older manifests hold 2-element ``[ts_min, ts_max]`` lists —
    readers index, never unpack). The hot map holds the file's top-8
    entities by row count: summed across a table's visible files these
    are LOWER BOUNDS on per-entity totals (exact for any entity that
    is top-8 in every file it touches — guaranteed for the dominant
    entities skew planning cares about, since the layout buckets by
    entity)."""
    if not files:
        return {}
    fast = _file_ts_stats_local(data_dir, files)
    if fast is not None:
        return fast
    base = spark.read.option("basePath", data_dir).parquet(
        *[f"{data_dir}/{f}" for f in files]
    )
    per = base.groupBy(F.input_file_name().alias("__f"), "entity").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    )
    # top-K per file in the SAME aggregation (array_sort + slice) — no
    # extra window stage. The collect_list buffer is bounded by
    # entities-per-file ≤ rows-per-file (layout buckets by entity, so
    # production files hold one bucket's entity subset); at ~1-5M rows
    # per well-sized file that is a few MB of (n, entity) structs.
    ranked = F.slice(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("entity").isNotNull(),
                    F.struct(
                        (-F.col("n")).alias("negn"),
                        F.col("entity").cast("string").alias("entity"),
                        F.col("n").alias("n"),
                    ),
                )
            )
        ),
        1,
        _HOT_STATS_K,
    )
    rows = (
        per.groupBy("__f")
        .agg(
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.sum("n").alias("n_rows"),
            F.map_from_entries(
                F.transform(ranked, lambda x: F.struct(x["entity"], x["n"]))
            ).alias("hot"),
        )
        .collect()
    )
    out = {}
    for r in rows:
        rel = r["__f"][r["__f"].rindex("/data/") + 6:]
        mn = int(r["mn"]) if r["mn"] is not None else None
        mx = int(r["mx"]) if r["mx"] is not None else None
        out[rel] = [mn, mx, int(r["n_rows"]), dict(r["hot"] or {})]
    return out


def _read_snaps(spark, meta_dir: str) -> list[dict]:
    """Load the snapshot chain. Refuses a MID-CHAIN gap in snapshot ids:
    a missing middle manifest (e.g. a reader racing write_text_atomic's
    delete+rename fallback while expire_snapshots rewrites its reset
    point) would silently drop that snapshot's added_files while later
    snapshots remain — a transiently WRONG (shrunken) table, not an
    empty one. A missing PREFIX is legitimate (snapshot expiration
    deletes the oldest manifests)."""
    from lbf_spark import fsio

    names = [f for f in fsio.list_names(spark, meta_dir) if f.startswith("snap-") and f.endswith(".json")]
    snaps = [
        json.loads(fsio.read_text(spark, fsio.join(meta_dir, n))) for n in names
    ]
    ids = [s["snapshot_id"] for s in snaps]
    if ids and ids != list(range(ids[0], ids[0] + len(ids))):
        raise ValueError(
            f"snapshot chain has a mid-chain gap (ids {ids}) — a manifest "
            "is missing or a concurrent manifest rewrite is in flight; "
            "retry the read"
        )
    return snaps


def _replay_files(
    snaps: list[dict], as_of: int | None = None
) -> dict:
    """Replay the snapshot chain up to ``as_of`` (default: latest) —
    Iceberg's manifest-list reachability, one JSON per snapshot here.

    Returns ``{"visible": [...], "known": [...]}``: *visible* is the
    live file set (added minus merge-removed, reset at each overwrite);
    *known* is every file written since the last overwrite — a merge
    keeps its replaced files ON DISK so older snapshots stay readable,
    and ``write_table`` needs *known* (not *visible*) to tell which
    on-disk files a fresh append actually created. Raises if ``as_of``
    predates the last overwrite — those files left the tracked chain
    (an overwrite is a logical reset; the physical files linger only
    until ``remove_orphan_files``), so travel across it is
    undefined."""
    if as_of is not None and any(
        s["mode"] == "overwrite" and s["snapshot_id"] > as_of for s in snaps
    ):
        raise ValueError(
            f"snapshot {as_of} predates an overwrite — its data files "
            "no longer exist (this shim does not retain overwritten files)"
        )
    visible: list[str] = []
    known: list[str] = []
    for s in snaps:
        if as_of is not None and s["snapshot_id"] > as_of:
            break
        if s["mode"] == "overwrite":
            visible = []
            known = []
        if "added_files" not in s:
            raise ValueError(
                f"snapshot {s['snapshot_id']} has no added_files list — "
                "manifest predates file tracking; time travel/incremental "
                "reads need manifests written by this table layer"
            )
        visible.extend(s["added_files"])
        known.extend(s["added_files"])
        removed = set(s.get("removed_files", []))
        if removed:
            visible = [f for f in visible if f not in removed]
    return {"visible": visible, "known": known}


def _cumulative_files(
    spark, path: str, snaps: list[dict], as_of: int | None = None
) -> list[str]:
    """The data files VISIBLE at snapshot ``as_of`` (default: latest)."""
    return _replay_files(snaps, as_of=as_of)["visible"]


def current_snapshot(path: str, spark: SparkSession | None = None) -> dict | None:
    from lbf_spark import fsio

    spark = spark or SparkSession.getActiveSession()
    meta_dir = fsio.join(path, "metadata")
    snaps = [f for f in fsio.list_names(spark, meta_dir) if f.startswith("snap-") and f.endswith(".json")]
    if not snaps:
        return None
    return json.loads(fsio.read_text(spark, fsio.join(meta_dir, snaps[-1])))


def incremental_files(
    spark: SparkSession, path: str, after: int, until: int | None = None
) -> list[str]:
    """Data files added by snapshots in (after, until] — the Iceberg
    incremental/changelog read: a consumer that processed snapshot
    ``after`` reads exactly the new files, never rescanning the table.
    Raises if an overwrite happened in the range (a changelog consumer
    must restart from the overwrite)."""
    from lbf_spark import fsio

    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    picked: list[str] = []
    for s in snaps:
        sid = s["snapshot_id"]
        if sid <= after or (until is not None and sid > until):
            continue
        if s["mode"] == "overwrite":
            raise ValueError(
                f"snapshot {sid} is an overwrite — incremental reads "
                "across it are undefined; re-read the table from scratch"
            )
        if s["mode"] == "merge":
            raise ValueError(
                f"snapshot {sid} is a merge — its added files mix "
                "carried-over rows with upserts, so an append-only "
                "changelog read across it would double-count; re-read "
                "the table (or consume the merge's change set upstream)"
            )
        if s["mode"] == "rollback":
            raise ValueError(
                f"snapshot {sid} is a rollback — its added files are "
                "RE-ADDED old files a changelog consumer already "
                "processed, and the files it removes were already "
                "delivered; re-read the table (or diff with "
                "snapshot_diff, which is exact across rollbacks)"
            )
        if "added_files" not in s:
            raise ValueError(
                f"snapshot {sid} has no added_files list — manifest "
                "predates file tracking; incremental reads need manifests "
                "written by this table layer"
            )
        picked.extend(s["added_files"])
    data_dir = fsio.join(path, "data")
    return [fsio.join(data_dir, f) for f in picked]


def snapshot_diff(
    spark: SparkSession, path: str, from_id: int, to_id: int | None = None
) -> DataFrame:
    """Row-level changelog between two snapshots — the Iceberg
    changelog-table read that works ACROSS merges (where
    :func:`incremental_files` must refuse): returns every row
    inserted or deleted between ``from_id`` and ``to_id`` (default:
    head) tagged ``change_type in ('insert','delete')``; a merge
    update surfaces as delete(old row) + insert(new row).

    Exactness without rescanning: data files are immutable, so rows in
    files visible at BOTH snapshots cannot have changed — the diff
    reads ONLY the symmetric difference of the two visible-file sets
    and takes multiset differences (``exceptAll``) of those rows.
    Carried-over rows inside a copy-on-write rewrite cancel out; the
    shuffle is bounded by the CHURNED files, never table size — at
    100 TB a 1 % merge diffs 1 % of the data. Hive partition columns
    are dropped (derived from the row); under add-only schema
    evolution both sides are NULL-padded to the ``to_id`` schema, so
    a column added in the window shows old rows as delete(without) +
    insert(with) only if their files were rewritten. A window crossing
    an OVERWRITE raises (via the snapshot replay): this shim deletes
    overwritten files, so the pre-overwrite state is gone — real
    Iceberg retains them until expiration and could diff across."""
    from lbf_spark import fsio

    from pyspark.sql.types import StructType

    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    ids = {s["snapshot_id"] for s in snaps}
    if to_id is None:
        to_id = max(ids)
    for sid in (from_id, to_id):
        if sid not in ids:
            raise ValueError(f"snapshot {sid} not found (have {sorted(ids)})")
    if from_id > to_id:
        raise ValueError(f"from_id {from_id} is newer than to_id {to_id}")
    files_a = set(_cumulative_files(spark, path, snaps, as_of=from_id))
    files_b = set(_cumulative_files(spark, path, snaps, as_of=to_id))
    newest = [s for s in snaps if s["snapshot_id"] <= to_id][-1]
    schema = StructType.fromJson(json.loads(newest["schema"]))
    cols = [f.name for f in schema.fields]
    data_dir = fsio.join(path, "data")

    def read_side(files: set) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        df = (
            spark.read.option("basePath", data_dir)
            .option("mergeSchema", "true")
            .parquet(*[fsio.join(data_dir, f) for f in sorted(files)])
        )
        return df.select(
            *[
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    a = read_side(files_a - files_b)
    b = read_side(files_b - files_a)
    ins = b.exceptAll(a).select(F.lit("insert").alias("change_type"), *cols)
    dele = a.exceptAll(b).select(F.lit("delete").alias("change_type"), *cols)
    return ins.unionByName(dele)


def rollback(
    spark: SparkSession, path: str, to_id: int, extra: dict | None = None
) -> dict:
    """Metadata-only rollback (Iceberg ``rollback_to_snapshot``): commit
    a NEW snapshot whose visible file set equals snapshot ``to_id``'s —
    bad appends/merges are undone by MOVING THE POINTER, never by
    touching data files, so the operation is O(metadata) at any table
    size and the bad snapshots stay readable for forensics (time travel
    still sees them; ``expire_snapshots`` reclaims them later).

    Works ACROSS merges: a copy-on-write merge keeps its replaced files
    on disk, so re-adding them is pure manifest bookkeeping. Raises if
    ``to_id`` predates an overwrite (those files are gone — this shim
    does not retain overwritten files) or is not an ancestor state.
    Schema and partition spec revert with the data (a rolled-back
    add-column evolution disappears). The new snapshot participates in
    the SAME optimistic exclusive-commit protocol as every writer, so
    a rollback racing a concurrent append loses (or wins) atomically —
    never a merged half-state.

    Changelog consumers: ``incremental_files`` refuses to cross a
    rollback (re-added files were already delivered);
    ``snapshot_diff`` is exact across it (symmetric file-set
    difference). A CDC sink's ``batch_hwm`` is deliberately NOT
    carried: rolled-back batches' effects are undone, so the sink must
    re-deliver them — the legacy full-scan path re-derives the true
    committed set."""
    from lbf_spark import fsio

    meta_dir = fsio.join(path, "metadata")
    snaps = _read_snaps(spark, meta_dir)
    if not snaps:
        raise ValueError(f"no snapshots at {path}")
    ids = [s["snapshot_id"] for s in snaps]
    head = ids[-1]
    if to_id not in ids:
        raise ValueError(f"snapshot {to_id} not found (have {ids})")
    if to_id >= head:
        raise ValueError(
            f"rollback target {to_id} is the current head {head} — nothing to undo"
        )
    target = _replay_files(snaps, as_of=to_id)["visible"]  # raises across overwrite
    current = _replay_files(snaps)["visible"]
    cur_set, tgt_set = set(current), set(target)
    re_added = [f for f in target if f not in cur_set]
    removed = [f for f in current if f not in tgt_set]
    tgt_snap = next(s for s in snaps if s["snapshot_id"] == to_id)
    data_dir = fsio.join(path, "data")
    snapshot = dict(extra or {})
    snapshot.update(
        {
            "snapshot_id": head + 1,
            "parent": f"snap-{head:05d}.json",
            "schema": tgt_snap["schema"],
            "partition_spec": tgt_snap["partition_spec"],
            "added_files": re_added,
            # stats for re-added files are recomputed, not copied: the
            # source manifests may already be expired
            "file_stats": _file_ts_stats(spark, data_dir, re_added),
            "removed_files": removed,
            "n_data_files": fsio.count_files_recursive(spark, data_dir, ".parquet"),
            "mode": "rollback",
            "rollback_of": to_id,
        }
    )
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    # nothing was landed by this commit — on a lost race there are no
    # data files to clean up
    _commit_or_cleanup(spark, fsio.join(meta_dir, name), snapshot, path, [])
    return snapshot


def evolve_partition_spec(
    spark: SparkSession,
    path: str,
    n_buckets: int | None = None,
    ts_unit_day: int | None = None,
) -> dict:
    """Partition-spec EVOLUTION (Iceberg spec evolution, the metadata
    answer to "our bucket count no longer fits the data"): commit a
    new snapshot that changes the table's ``partition_spec`` and
    nothing else. Existing data files keep their directory layout and
    keep pruning under the generation they were written with (``scan``
    unions the allowed-partition sets across every generation in the
    chain — conservative, never a wrong prune); data appended after
    this commit lands under the new spec, because ``write_table``
    inherits the CURRENT spec when the caller doesn't override.

    At 10^12 rows this is the whole point: re-bucketing the table
    physically is a full rewrite (a non-job at 100 TB); evolving the
    spec is ONE manifest write, and the layout converges file-by-file
    as compaction and merges rewrite old regions. Raises if the
    requested spec equals the current one (an empty evolution would
    burn a snapshot id for nothing).

    Reference: Iceberg spec §4 "Partition Evolution" (public spec);
    no LBF analog (the reference has no table layer)."""
    from lbf_spark import fsio

    meta_dir = fsio.join(path, "metadata")
    snaps = _read_snaps(spark, meta_dir)
    if not snaps:
        raise ValueError("evolve_partition_spec needs an existing table")
    cur_nb, cur_unit = _parse_spec(snaps[-1]["partition_spec"])
    nb = int(n_buckets) if n_buckets is not None else cur_nb
    unit = int(ts_unit_day) if ts_unit_day is not None else cur_unit
    if (nb, unit) == (cur_nb, cur_unit):
        raise ValueError(
            f"partition spec already (bucket={nb}, unit={unit}) — "
            "nothing to evolve"
        )
    snapshot = {
        "snapshot_id": snaps[-1]["snapshot_id"] + 1,
        "parent": f"snap-{snaps[-1]['snapshot_id']:05d}.json",
        "schema": snaps[-1]["schema"],
        "partition_spec": {
            "entity_bucket": f"bucket({nb}, entity)",
            "ts_day": f"floor(ts / {unit})",
        },
        "added_files": [],
        "file_stats": {},
        "n_data_files": snaps[-1].get("n_data_files"),
        "mode": "evolve",
    }
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    _commit_or_cleanup(spark, fsio.join(meta_dir, name), snapshot, path, [])
    return snapshot


def merge_upsert(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    extra: dict | None = None,
) -> dict:
    """Apply a changelog to the current snapshot — the write-side of
    q84's CDC latest-state semantics (Iceberg ``MERGE INTO`` with
    copy-on-write): rows in ``changes`` REPLACE same-key table rows,
    new keys are inserted, and rows flagged true in ``delete_col``
    (if given) are deleted. ``changes`` must carry exactly the table's
    columns (plus the flag) and at most one row per key — dedupe a raw
    CDC stream to latest-per-key first (``queries.q84``'s shape).

    Copy-on-write at FILE granularity, like Iceberg: only data files
    that actually contain a matching key are rewritten (matched via an
    ``input_file_name`` semi-join — one pass, no collect of data rows);
    untouched files carry over by reference. Replaced files stay on
    disk so pre-merge snapshots remain time-travelable; the new
    snapshot's manifest records them in ``removed_files`` and the
    rewritten+inserted files in ``added_files``.

    Shape at 100 TB: the semi-join shuffles on the merge keys (both
    sides partial-pruned — AQE broadcasts the changelog when it fits);
    the rewrite reads/writes only the affected files, which partition
    pruning bounds to the changelog's (bucket, day) footprint."""
    from pyspark.sql.types import StructType

    from lbf_spark import fsio

    meta_dir = fsio.join(path, "metadata")
    snaps = _read_snaps(spark, meta_dir)
    if not snaps:
        raise ValueError("merge_upsert needs an existing table snapshot")
    spec = snaps[-1]["partition_spec"]
    n_buckets, ts_unit_day = _parse_spec(spec)
    cur_schema = StructType.fromJson(json.loads(snaps[-1]["schema"]))
    data_cols = [f.name for f in cur_schema.fields]
    chg_cols = [c for c in changes.columns if c != delete_col]
    if sorted(chg_cols) != sorted(data_cols):
        raise ValueError(
            f"changes columns {sorted(chg_cols)} must equal the table's "
            f"{sorted(data_cols)} (plus the optional delete flag)"
        )
    missing = [k for k in keys if k not in data_cols]
    if missing:
        raise ValueError(f"merge keys {missing} not in table columns")

    data_dir = fsio.join(path, "data")
    visible = _replay_files(snaps)["visible"]
    keyed_changes = changes.select(*keys).distinct()
    if visible:
        cur = spark.read.option("basePath", data_dir).parquet(
            *[fsio.join(data_dir, f) for f in visible]
        )
        affected_abs = [
            r["__f"]
            for r in cur.withColumn("__f", F.input_file_name())
            .join(keyed_changes, keys, "left_semi")
            .select("__f")
            .distinct()
            .collect()
        ]
        affected = sorted({a[a.rindex("/data/") + 6:] for a in affected_abs})
    else:  # everything previously merged away: pure-insert merge
        affected = []
    upserts = changes
    if delete_col is not None:
        upserts = upserts.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    upserts = upserts.select(*data_cols)
    if affected:
        aff_df = spark.read.option("basePath", data_dir).parquet(
            *[fsio.join(data_dir, f) for f in affected]
        )
        new_rows = aff_df.select(*data_cols).join(
            keyed_changes, keys, "left_anti"
        ).unionByName(upserts)
    else:
        new_rows = upserts
    # hash-distribute by the partition cols before landing (Iceberg's
    # write.distribution-mode=hash): one file per touched partition dir
    # instead of one per (task × dir) — a merge that rewrites k files
    # lands ~k files, not k × shuffle-partitions
    pdf = _with_partition_cols(new_rows, n_buckets, ts_unit_day).repartition(
        "entity_bucket", "ts_day"
    )
    new_files = _land_data_files(spark, pdf, path)
    snapshot = dict(extra or {})
    snapshot["snapshot_id"] = snaps[-1]["snapshot_id"] + 1
    snapshot.update({
        "parent": f"snap-{snaps[-1]['snapshot_id']:05d}.json",
        "schema": snaps[-1]["schema"],
        "partition_spec": spec,
        "added_files": new_files,
        "file_stats": _file_ts_stats(spark, data_dir, new_files),
        "removed_files": affected,
        "n_data_files": fsio.count_files_recursive(spark, data_dir, ".parquet"),
        "mode": "merge",
    })
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    _commit_or_cleanup(spark, fsio.join(meta_dir, name), snapshot, path, new_files)
    return snapshot


def scan(
    spark: SparkSession,
    path: str,
    entities: list[str] | None = None,
    ts_min: int | None = None,
    ts_max: int | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = DAY,
    snapshot_id: int | None = None,
    tag: str | None = None,
) -> DataFrame:
    """Pruned scan: entity/time predicates are rewritten onto the
    partition columns (bucket list, day range) so the source skips whole
    directories — the engine-side half of Iceberg's partition-transform
    pruning. The exact row-level predicate is applied on top.

    ``snapshot_id`` time-travels: only the data files visible at that
    snapshot are read (basePath keeps the hive partition columns), back
    to the most recent overwrite.

    The read is manifest-driven (the snapshot's visible file list, not
    a directory listing) whenever manifests exist — after a merge the
    replaced files are still on disk for time travel, so a raw
    directory read would double-count their rows. Schema evolution is
    reconciled per-snapshot: if the visible files span several schemas,
    the parquet ``mergeSchema`` union applies and missing columns
    NULL-fill, with columns ordered per the newest schema.

    Time predicates prune at THREE levels: per-file min/max ``ts``
    stats from the manifests drop whole files before the reader is
    even built (Iceberg file skipping — finer than day directories
    when several files share a day); the ``ts_day`` partition filter
    prunes directories; the exact row predicate runs on what remains."""
    from lbf_spark import fsio

    if tag is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or tag, not both")
        snapshot_id = resolve_tag(spark, path, tag)
    data_dir = fsio.join(path, "data")
    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    if not snaps:
        df = spark.read.parquet(data_dir)
    else:
        files = _stats_pruned_files(
            _cumulative_files(spark, path, snaps, as_of=snapshot_id),
            snaps, snapshot_id, ts_min, ts_max,
        )
        if not files:  # everything merged away: empty frame, live schema
            from pyspark.sql.types import (
                IntegerType, LongType, StructField, StructType,
            )

            upto = [
                s for s in snaps
                if snapshot_id is None or s["snapshot_id"] <= snapshot_id
            ]
            schema = StructType.fromJson(json.loads(upto[-1]["schema"]))
            # every non-empty scan carries the hive partition columns —
            # the empty branch must match or downstream selects of
            # entity_bucket/ts_day fail only when the table is empty
            schema = StructType(
                schema.fields
                + [
                    StructField("entity_bucket", IntegerType(), True),
                    StructField("ts_day", LongType(), True),
                ]
            )
            return spark.createDataFrame([], schema)
        schemas = {s["schema"] for s in snaps}
        reader = spark.read.option("basePath", data_dir)
        if len(schemas) > 1:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[fsio.join(data_dir, f) for f in files])
        if len(schemas) > 1:
            # deterministic column order: newest snapshot's schema
            # (the union superset under add-only evolution) + the
            # hive partition columns
            upto = [
                s for s in snaps
                if snapshot_id is None or s["snapshot_id"] <= snapshot_id
            ]
            newest = json.loads(upto[-1]["schema"])
            ordered = [f["name"] for f in newest["fields"]]
            part_cols = [c for c in df.columns if c not in ordered]
            df = df.select(*[c for c in ordered if c in df.columns], *part_cols)
    # partition pruning is SPEC-GENERATION aware: with manifests, the
    # allowed bucket/day sets union over every spec the chain carried
    # (evolve_partition_spec) — a conservative superset, so files from
    # any generation prune correctly under the spec they were written
    # with; the caller's n_buckets/ts_unit_day are only the fallback
    # for manifest-less directories
    gens = (
        _spec_generations(snaps, snapshot_id)
        if snaps
        else {(int(n_buckets), int(ts_unit_day))}
    )
    if entities:
        hashes = (
            spark.createDataFrame([(e,) for e in entities], "entity string")
            .select(F.xxhash64("entity").alias("h"))
            .toPandas()["h"]
            .tolist()
        )
        bucket_vals = sorted(
            {int(h) % nb for h in hashes for (nb, _u) in gens}
        )
        df = df.filter(F.col("entity_bucket").isin(bucket_vals)).filter(
            F.col("entity").isin(entities)
        )
    if ts_min is not None:
        day_lo = min(ts_min // unit for (_nb, unit) in gens)
        df = df.filter(
            (F.col("ts_day") >= day_lo) & (F.col("ts") >= ts_min)
        )
    if ts_max is not None:
        day_hi = max(ts_max // unit for (_nb, unit) in gens)
        df = df.filter(
            (F.col("ts_day") <= day_hi) & (F.col("ts") <= ts_max)
        )
    # pin the hive partition-column types LAST (after the partition
    # filters, so pruning still binds to the raw attributes): directory
    # inference picks int vs bigint per value range, and the empty-table
    # branch declares (int, long) — one stable scan schema either way
    if "entity_bucket" in df.columns:
        df = df.withColumn(
            "entity_bucket", F.col("entity_bucket").cast("int")
        ).withColumn("ts_day", F.col("ts_day").cast("long"))
    return df


def _stats_pruned_files(
    files: list[str],
    snaps: list[dict],
    snapshot_id: int | None,
    ts_min: int | None,
    ts_max: int | None,
) -> list[str]:
    """Drop files whose manifest [ts_min, ts_max] stats are disjoint
    from the query range. Files with no recorded stats (older
    manifests) are conservatively kept."""
    if ts_min is None and ts_max is None:
        return files
    stats: dict = {}
    for s in snaps:
        if snapshot_id is not None and s["snapshot_id"] > snapshot_id:
            break
        stats.update(s.get("file_stats") or {})
    out = []
    for f in files:
        st = stats.get(f)
        if st is None or st[0] is None:
            out.append(f)
            continue
        mn, mx = st[0], st[1]  # stats may carry [mn, mx] or [mn, mx, n, hot]
        if (ts_max is not None and mn > ts_max) or (
            ts_min is not None and mx < ts_min
        ):
            continue
        out.append(f)
    return out


def scan_files(
    spark: SparkSession,
    path: str,
    ts_min: int | None = None,
    ts_max: int | None = None,
    snapshot_id: int | None = None,
) -> list[str]:
    """The exact (relative) data files a ``scan`` with these time
    bounds would read — the observable surface of manifest file
    skipping, for tests and job planning."""
    from lbf_spark import fsio

    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    return _stats_pruned_files(
        _cumulative_files(spark, path, snaps, as_of=snapshot_id),
        snaps, snapshot_id, ts_min, ts_max,
    )


def hot_entity_counts(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> dict[str, int] | None:
    """Per-entity LOWER-BOUND row counts from the manifests' per-file
    hot-entity sketches (``_file_ts_stats``), plus the table's total
    row count — zero data IO, pure metadata. Returns
    ``{"total": n, "entities": {entity: count}}``-shaped dict, or None
    when any visible file predates the extended stats (then the caller
    must fall back to a counts job; a partial answer would silently
    under-route hot entities).

    The bounds are exact for entities that are top-K in every file they
    touch — guaranteed for the dominant entities skew planning cares
    about, since the layout buckets rows by entity. Used by
    ``plans.pipeline`` to pick halo-sliced routing WITHOUT the extra
    per-job counts pass over the events scan."""
    from lbf_spark import fsio

    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    if not snaps:
        return None
    visible = _replay_files(snaps, as_of=snapshot_id)["visible"]
    stats: dict = {}
    for s in snaps:
        if snapshot_id is not None and s["snapshot_id"] > snapshot_id:
            break
        stats.update(s.get("file_stats") or {})
    total = 0
    per_entity: dict[str, int] = {}
    for f in visible:
        st = stats.get(f)
        if st is None or len(st) < 4:
            return None  # pre-extension manifest: no row counts recorded
        total += st[2]
        for e, n in (st[3] or {}).items():
            per_entity[e] = per_entity.get(e, 0) + int(n)
    return {"total": total, "entities": per_entity}


def expire_snapshots(
    spark: SparkSession, path: str, keep_last: int
) -> dict:
    """Snapshot retention (Iceberg ``expireSnapshots``): keep only the
    last ``keep_last`` snapshots, DELETE data files no retained
    snapshot can see (merge-replaced files whose history expired), and
    compact the oldest retained manifest into a reset point (recorded
    ``mode="overwrite"`` with its full visible file list + merged
    stats, so replay no longer needs the deleted manifests). Time
    travel to an expired snapshot then raises the standard
    predates-an-overwrite error; ``incremental_files`` across the
    boundary refuses likewise.

    Metadata-only except for the file deletes; returns
    {n_expired_snapshots, n_deleted_files}."""
    from lbf_spark import fsio

    meta_dir = fsio.join(path, "metadata")
    snaps = _read_snaps(spark, meta_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if len(snaps) <= keep_last:
        return {"n_expired_snapshots": 0, "n_deleted_files": 0}
    retained = snaps[-keep_last:]
    expired = snaps[:-keep_last]
    # retention respects refs (Iceberg): a tagged snapshot cannot
    # expire — time travel to it must keep working until the tag goes
    expired_ids = {s["snapshot_id"] for s in expired}
    pinned = {
        n: sid for n, sid in list_tags(spark, path).items()
        if sid in expired_ids
    }
    if pinned:
        raise ValueError(
            f"snapshots pinned by tags would expire: {pinned} — "
            "delete_tag first"
        )
    # files any retained snapshot can see (time travel within retention)
    keep_files: set[str] = set()
    for s in retained:
        keep_files.update(
            _replay_files(snaps, as_of=s["snapshot_id"])["visible"]
        )
    data_dir = fsio.join(path, "data")
    # delete only MANIFEST-KNOWN files no retained snapshot can see —
    # never "everything else on disk": an uncommitted concurrent
    # writer's just-moved parts are on disk but in no manifest, and
    # sweeping them here would corrupt that write (that sweep is
    # remove_orphan_files' job, which documents its no-write-in-flight
    # requirement). So expire+concurrent-write is safe; only
    # orphan-removal requires quiescence.
    known = set(_replay_files(snaps)["known"])
    doomed = sorted(known - keep_files)
    fs, _p, jvm = fsio._fs_path(spark, data_dir)
    for f in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{data_dir}/{f}"), False)
    # compact the oldest retained manifest into a reset point
    oldest = dict(retained[0])
    merged_stats: dict = {}
    for s in snaps:
        if s["snapshot_id"] > oldest["snapshot_id"]:
            break
        merged_stats.update(s.get("file_stats") or {})
    base_visible = _replay_files(snaps, as_of=oldest["snapshot_id"])["visible"]
    oldest["mode"] = "overwrite"
    oldest["added_files"] = sorted(base_visible)
    oldest["file_stats"] = {
        f: merged_stats[f] for f in base_visible if f in merged_stats
    }
    oldest.pop("removed_files", None)
    oldest["parent"] = None
    # the reset point inherits files written under EXPIRED manifests'
    # partition specs — preserve those generations or scans would prune
    # old-layout files with the wrong bucket arithmetic
    own = _parse_spec(oldest["partition_spec"])
    hist_gens = {
        g
        for s in snaps
        if s["snapshot_id"] <= oldest["snapshot_id"]
        for g in _spec_generations([s])
    } - {own}
    if hist_gens:
        oldest["spec_history"] = [
            {
                "entity_bucket": f"bucket({nb}, entity)",
                "ts_day": f"floor(ts / {unit})",
            }
            for nb, unit in sorted(hist_gens)
        ]
    fsio.write_text_atomic(
        spark,
        fsio.join(meta_dir, f"snap-{oldest['snapshot_id']:05d}.json"),
        json.dumps(oldest, indent=1),
    )
    for s in expired:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                fsio.join(meta_dir, f"snap-{s['snapshot_id']:05d}.json")
            ),
            False,
        )
    return {
        "n_expired_snapshots": len(expired),
        "n_deleted_files": len(doomed),
    }


def remove_orphan_files(spark: SparkSession, path: str) -> dict:
    """Delete data files no manifest has ever adopted — the debris a
    killed write job leaves between landing parquet parts and
    committing its snapshot (Iceberg ``removeOrphanFiles``). Orphans
    are exactly on-disk minus every file referenced since the last
    overwrite (including merge-replaced files, which older snapshots
    still need). ONLY call while no write is in flight — an
    uncommitted concurrent write's files look identical to debris.
    Returns {n_orphans_deleted}."""
    from lbf_spark import fsio

    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    if not snaps:
        raise ValueError("remove_orphan_files needs an existing table snapshot")
    known = set(_replay_files(snaps)["known"])
    data_dir = fsio.join(path, "data")
    on_disk = [
        f["path"] for f in fsio.list_files_recursive(spark, data_dir, ".parquet")
    ]
    orphans = sorted(set(on_disk) - known)
    fs, _p, jvm = fsio._fs_path(spark, data_dir)
    for f in orphans:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{data_dir}/{f}"), False)
    # crashed writers also leave .staging/<token> trees (parts that were
    # never moved into data/) — same debris class, same reclaim
    staging_root = fsio.join(path, ".staging")
    n_staging = len(fsio.list_names(spark, staging_root))
    fsio.delete(spark, staging_root, recursive=True)
    return {"n_orphans_deleted": len(orphans), "n_staging_dirs_deleted": n_staging}


def compact_table(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Execute small-file compaction (the rewrite `compaction_plan`
    only PLANS): partition-dir-local first-fit groups of visible files
    under ``target_bytes`` with ≥2 members are read back and rewritten
    as ~``ceil(total/target)`` files, committed as a ``merge``-mode
    snapshot (rewritten files in ``removed_files``, new ones in
    ``added_files``) — so time travel to pre-compaction snapshots
    still works and the visible row set is EXACTLY unchanged.

    Shape at 100 TB: grouping is a driver-side pass over the file
    manifest (metadata-scale); the rewrite reads/writes only the
    fragmented files, one distributed job for all groups (rows land
    back in their own partition dirs via partitionBy). Returns
    {n_rewritten_files, n_new_files} (zeros when nothing qualifies)."""
    import posixpath as _pp

    from lbf_spark import fsio

    meta_dir = fsio.join(path, "metadata")
    snaps = _read_snaps(spark, meta_dir)
    if not snaps:
        raise ValueError("compact_table needs an existing table snapshot")
    data_dir = fsio.join(path, "data")
    visible = set(_replay_files(snaps)["visible"])
    sizes = {
        f["path"]: f["bytes"]
        for f in fsio.list_files_recursive(spark, data_dir, ".parquet")
        if f["path"] in visible
    }
    by_dir: dict = {}
    for f in sorted(sizes):
        by_dir.setdefault(_pp.dirname(f), []).append(f)
    doomed: list[str] = []
    total_bytes = 0
    for _d, fs_list in by_dir.items():
        group: list[str] = []
        g_bytes = 0
        for f in fs_list:  # first-fit in path order, like compaction_plan
            if group and g_bytes + sizes[f] > target_bytes:
                if len(group) >= 2:
                    doomed += group
                    total_bytes += g_bytes
                group, g_bytes = [], 0
            group.append(f)
            g_bytes += sizes[f]
        if len(group) >= 2:
            doomed += group
            total_bytes += g_bytes
    if not doomed:
        return {"n_rewritten_files": 0, "n_new_files": 0}
    frag = spark.read.option("basePath", data_dir).parquet(
        *[fsio.join(data_dir, f) for f in doomed]
    )
    n_out = max(1, -(-total_bytes // target_bytes))
    data_cols = [c for c in frag.columns if c not in ("entity_bucket", "ts_day")]
    new_files = _land_data_files(
        spark,
        frag.repartition(n_out, "entity_bucket", "ts_day").select(
            *data_cols, "entity_bucket", "ts_day"
        ),
        path,
    )
    snapshot = {
        "snapshot_id": snaps[-1]["snapshot_id"] + 1,
        "parent": f"snap-{snaps[-1]['snapshot_id']:05d}.json",
        "schema": snaps[-1]["schema"],
        "partition_spec": snaps[-1]["partition_spec"],
        "added_files": new_files,
        "file_stats": _file_ts_stats(spark, data_dir, new_files),
        "removed_files": sorted(doomed),
        "n_data_files": fsio.count_files_recursive(spark, data_dir, ".parquet"),
        "mode": "merge",
    }
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    _commit_or_cleanup(spark, fsio.join(meta_dir, name), snapshot, path, new_files)
    return {"n_rewritten_files": len(doomed), "n_new_files": len(new_files)}


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    order_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction planner (the Iceberg ``BinPack`` rewrite
    analog for this table layout): files in deterministic ``order_col``
    order are packed left-to-right into rewrite groups of ≈
    ``target_bytes`` — ``group_id = floor(exclusive_prefix_sum(bytes) /
    target)``. Greedy in file order, so a group can overshoot by at
    most one file (the standard first-fit behavior); ordering by path
    keeps partition-adjacent files in the same rewrite group.

    The input is a file *manifest* (metadata), never data rows: the
    single-partition prefix-sum window is O(#files) — at 100 TB with
    128 MB files that is ~10^6 manifest rows on one task, fine; the
    actual rewrite jobs it plans are what touch data."""
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    return files.withColumn(
        "group_id", F.floor(cum / F.lit(float(target_bytes))).cast("long")
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out: str = "z_value",
) -> DataFrame:
    """Z-order (Morton) interleave key over m pre-bucketed non-negative
    integer columns — the multi-dimensional clustering key behind
    Iceberg/Delta ``ZORDER BY``: sorting by it co-locates rows close in
    EVERY dimension, so min/max file statistics prune scans on any of
    the m columns, not just the leading sort key.

    Bit i of column j lands at position ``i·m + j``; inputs clamp into
    ``[0, 2^bits)``. Pure JVM integer arithmetic (powers of two through
    ``pow`` are exact doubles up to 2^52, cast back to long) — no UDF,
    reproducible in ANSI SQL. Use with
    ``repartitionByRange(out).sortWithinPartitions(out)`` to lay files
    out; the key itself is what's verifiable."""
    m = len(cols)
    if m < 1 or bits * m > 62:
        raise ValueError("need 1+ columns and bits*len(cols) <= 62")
    lim = (1 << bits) - 1
    clamped = [
        F.greatest(F.lit(0), F.least(F.col(c).cast("long"), F.lit(lim)))
        for c in cols
    ]

    # Static shift/mask expression tree (≤ 62 terms), not an
    # F.aggregate over a sequence: higher-order functions evaluate
    # interpreted per element while this unrolled form stays inside
    # whole-stage codegen — measured r7: the fold form alone added
    # 1.3 s to the q105 write at sf1.0. Identical integers:
    # (c >> i) & 1 << (i·m+j) ≡ floor(c/2^i) % 2 · 2^(i·m+j) for the
    # clamped non-negative range.
    z = None
    for i in range(bits):
        for j, c in enumerate(clamped):
            term = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * m + j
            )
            z = term if z is None else z + term
    return df.withColumn(out, z.cast("long"))


def hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out: str = "h_value",
) -> DataFrame:
    """2-D HILBERT curve index over two pre-bucketed non-negative
    integer columns — the locality-tighter alternative to ``zorder_key``
    (Iceberg ships both): the Hilbert curve is CONTINUOUS, so
    consecutive key values are always spatially adjacent cells, where
    Morton's bit-interleave jumps across the whole space at power-of-
    two seams. Sorting files by it makes range reads touch ~perimeter
    many files; the locality advantage over Morton on a grid walk is
    law-tested (and the q187 certificate re-verifies the key itself
    against an independent per-row twin).

    Implementation: the classical xy2d state machine (reflect+swap per
    bit level, most-significant first) folded over the bit levels with
    ``F.aggregate`` carrying a (x, y, d) struct — pure JVM integer
    arithmetic, no UDF. More than 2 dims: use ``zorder_key`` (the
    standard trade — d-dimensional Hilbert state tables cost more than
    the locality buys at file granularity)."""
    if len(cols) != 2:
        raise ValueError("hilbert_key is 2-D; use zorder_key for other arities")
    if not 1 <= bits * 2 <= 62:
        raise ValueError("need 1 <= bits and 2*bits <= 62")
    lim = (1 << bits) - 1
    cx, cy = (
        F.greatest(F.lit(0), F.least(F.col(c).cast("long"), F.lit(lim)))
        for c in cols
    )
    acc0 = F.struct(
        cx.alias("x"), cy.alias("y"), F.lit(0).cast("long").alias("d")
    )
    svals = F.array(
        *[F.lit(1 << (bits - 1 - i)).cast("long") for i in range(bits)]
    )

    def step(acc, s):
        one = F.lit(1).cast("long")
        zero = F.lit(0).cast("long")
        rx = F.when(acc["x"].bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(acc["y"].bitwiseAND(s) > 0, one).otherwise(zero)
        d2 = acc["d"] + s * s * ((rx * 3).bitwiseXOR(ry))
        refl_x = F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        refl_y = F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        # ry == 0 → reflect (if rx) then swap axes; ry == 1 → unchanged
        nx = F.when(ry == 0, refl_y).otherwise(acc["x"])
        ny = F.when(ry == 0, refl_x).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    h = F.aggregate(svals, acc0, step, lambda a: a["d"])
    return df.withColumn(out, h)


def create_tag(
    spark: SparkSession,
    path: str,
    name: str,
    snapshot_id: int | None = None,
    replace: bool = False,
) -> dict:
    """Named REF (Iceberg v2 "refs", tag flavor): pin ``name`` to a
    snapshot id (default: the current head) as its own
    ``metadata/ref-<name>.json`` — one file per ref, so creation is
    the same exclusive-write primitive as a snapshot commit (no
    read-modify-write of a shared refs file to race on).
    ``scan(tag=…)`` reads the table as of the ref;
    ``expire_snapshots`` REFUSES to expire a tagged snapshot (delete
    the tag first) — retention respects refs, per the Iceberg spec.
    ``replace=True`` retargets an existing tag atomically."""
    import re as _re

    from lbf_spark import fsio

    if not _re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
        raise ValueError(f"invalid tag name {name!r}")
    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    if not snaps:
        raise ValueError("create_tag needs an existing table snapshot")
    sid = int(snapshot_id) if snapshot_id is not None else snaps[-1][
        "snapshot_id"
    ]
    if sid not in {s["snapshot_id"] for s in snaps}:
        raise ValueError(f"snapshot {sid} does not exist")
    ref = {"name": name, "snapshot_id": sid, "type": "tag"}
    target = fsio.join(path, "metadata", f"ref-{name}.json")
    if replace:
        fsio.write_text_atomic(spark, target, json.dumps(ref, indent=1))
    else:
        try:
            fsio.write_text_exclusive(
                spark, target, json.dumps(ref, indent=1)
            )
        except FileExistsError as e:
            raise ValueError(
                f"tag {name!r} already exists (replace=True retargets)"
            ) from e
    return ref


def list_tags(spark: SparkSession, path: str) -> dict[str, int]:
    """{tag name: snapshot_id} from the per-ref metadata files."""
    from lbf_spark import fsio

    meta_dir = fsio.join(path, "metadata")
    out = {}
    for f in fsio.list_names(spark, meta_dir):
        if f.startswith("ref-") and f.endswith(".json"):
            ref = json.loads(fsio.read_text(spark, fsio.join(meta_dir, f)))
            out[ref["name"]] = ref["snapshot_id"]
    return out


def delete_tag(spark: SparkSession, path: str, name: str) -> None:
    from lbf_spark import fsio

    target = fsio.join(path, "metadata", f"ref-{name}.json")
    if not fsio.exists(spark, target):
        raise ValueError(f"tag {name!r} does not exist")
    fsio.delete(spark, target)


def resolve_tag(spark: SparkSession, path: str, name: str) -> int:
    tags = list_tags(spark, path)
    if name not in tags:
        raise ValueError(f"tag {name!r} does not exist")
    return tags[name]
