"""Join strategies for scale: bucketed co-located joins and
deterministic salting for skewed keys.

Complements the as-of/interval joins in ``asof.py`` (which handle the
time axis): these are the generic equi-join tools the 100-TB story
needs — bucketing removes the shuffle from repeated big×big joins on a
stable key; salting splits one hot key's rows across ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a Spark bucketed table (``bucketBy`` + sortBy on the
    key). Two tables bucketed the same way equi-join with ZERO
    exchanges (plan-tested) — the pre-partitioning answer for joins
    that repeat every run (e.g. events ⋈ per-entity dimensions).
    Bucket count is a table property: pick it once per key domain
    (2-4× total executor cores is the usual start)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def row_salt(columns, salt: int):
    """Deterministic per-row salt in [0, salt): md5 over every column,
    each NULL-coalesced to a sentinel and field-separated, so NULL-heavy
    rows and concat-anagram rows (('a','bc') vs ('ab','c'), ('x',NULL)
    vs (NULL,'x')) cannot collide onto one reducer. Only rows identical
    in EVERY column share a salt — a key dominated by one exact row
    value needs a pre-aggregated dedupe-with-count instead."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x01",
                        *[
                            F.coalesce(
                                F.col(c).cast("string"), F.lit("\x00NULL")
                            )
                            for c in columns
                        ],
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(salt),
    ).cast("int")


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated ``salt``× so one hot
    key's rows spread over ``salt`` reducers instead of one straggler.

    The big side's salt must be deterministic across task retries
    (``rand()`` or ``monotonically_increasing_id`` are not), so it is
    md5-derived from the row's own columns — any row lands on the same
    reducer on every execution. Each column is NULL-coalesced to a
    sentinel and the hash input is field-separated, so NULL-heavy rows
    still spread across salts and (a,NULL)/(aNULL-less concat) rows
    cannot collide onto one reducer. Rows identical in every column
    share a salt; that only skews if a single VALUE dominates, in which
    case dedupe-with-count first. Results are identical to a plain join
    (each big row joins the one small replica carrying its salt).

    ``how`` ∈ {inner, left}: each big row has exactly one salt, so
    unmatched left rows surface exactly once; right/full would see the
    small side's ``salt``-fold replication and are refused. AQE's
    skew-join handles moderate skew on its own — reach for this when
    one key cannot fit a single reducer even after AQE splitting.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError(
            f"salt must be >= 1, got {salt} (pmod by zero yields NULL "
            "salts and a silently empty join)"
        )
    b = big.withColumn("_salt", row_salt(big.columns, salt))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    m_bits: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Semi join with a broadcast Bloom-filter pre-filter — the
    runtime-filter pattern (Spark's own DPP/runtime row-group
    filtering) made an explicit operator: probe rows that cannot match
    are dropped BEFORE the join's shuffle, so at 100 TB the exchange
    carries only candidate rows while the result stays EXACT (a Bloom
    filter has no false negatives; survivors still pass through a real
    ``left_semi`` join that removes the false positives).

    Build cost is one aggregation: each build key sets ``k`` bit
    positions (md5(i:key) mod m — deterministic, engine-portable) and
    the DISTINCT positions are collected — bounded by ``m_bits``
    (metadata-sized, here 2 KiB as a bitmask string), NEVER by build
    cardinality; map-side partial distinct keeps the shuffle tiny. The
    mask ships to every probe task as a plan literal (broadcast by
    value), and the probe filter is pure JVM substring arithmetic
    inside codegen — no Python, no UDF.

    Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; with the default
    m=16384, k=3 a 1 000-key build side gives ~0.4 % — raise ``m_bits``
    with build cardinality (the mask literal grows linearly). An empty
    build side yields an all-zero mask and an empty (still correct)
    result.
    """
    def positions(col):
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(":", F.lit(str(i)), col.cast("string"))
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.lit(int(m_bits))
            ).cast("int")
            for i in range(k)
        ]

    pos_rows = (
        build.select(
            F.explode(F.array(*positions(F.col(key)))).alias("pos")
        )
        .distinct()
        .collect()
    )
    set_bits = {r["pos"] for r in pos_rows}
    mask = "".join("1" if i in set_bits else "0" for i in range(int(m_bits)))
    hit = None
    for p in positions(F.col(key)):
        this = F.substring(F.lit(mask), p + F.lit(1), F.lit(1)) == F.lit("1")
        hit = this if hit is None else (hit & this)
    return probe.filter(hit).join(
        build.select(key).distinct(), [key], "left_semi"
    ).select(*probe.columns)
