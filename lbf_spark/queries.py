"""Query catalog: every operator exposed as (Spark DataFrame fn, DuckDB oracle SQL).

Each entry is the driver-contract pair for ``__spark_entry__.py``:
``QUERIES[name] = (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
The oracle SQL is ANSI SQL runnable by DuckDB over the same parquet
tables; names/aliases match column-for-column because the driver's
compare hashes values with columns sorted by name.

Determinism rules used throughout (both sides identically):
* money sums go through DECIMAL(18,4) — decimal addition is associative,
  so Spark's partial-aggregation order can't change a bit;
* every float output is round()ed (4-6 digits) — double math is
  bit-identical across engines for +,*,/,sqrt (IEEE), and within 1 ulp
  for ln, far inside the rounding margin;
* timestamps are returned as epoch microseconds (bigint);
* every ranking has a total order (score desc, id asc);
* every hash in a correctness path is md5 (identical in every engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from lbf_spark.operators import dedup, distributions as D, similarity as S, stats, text
from lbf_spark.operators import windows as W
from lbf_spark.operators.asof import asof_join, asof_join_sliced, interval_join
from lbf_spark.operators.normalize import flanking_normalize

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark, sf_dir) -> DataFrame:
    """events with ts as epoch micros (bigint) — the engine's time axis."""
    return (
        t(spark, sf_dir, "events")
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .drop("ts")
    )


_EVENTS_SQL = "(select event_id, user_id, event_type, value, props, epoch_us(ts) as ts_us from events)"


# =====================================================================
# relational core (scans, filters, joins, aggregation, top-n, pivot)
# =====================================================================


@q(
    "q01_filter_project",
    """
    select l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) as revenue,
           l_returnflag
    from lineitem
    where l_shipdate >= timestamp '1996-01-01'
      and l_shipdate <  timestamp '1998-01-01'
      and l_quantity < 25
    """,
)
def q01(spark, sf_dir):
    """Predicate pushdown + projection (P1/P2 analog: flag filters,
    `utils.py:197`). `.explain` shows PushedFilters + pruned ReadSchema."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            "l_returnflag",
        )
    )


@q(
    "q02_agg_pricing_summary",
    """
    select l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as sum_price,
           round(cast(sum(cast(l_discount as decimal(18,6))) as double) / count(*), 6) as avg_disc,
           count(*) as n
    from lineitem
    group by l_returnflag, l_linestatus
    """,
)
def q02(spark, sf_dir):
    """TPC-H-Q1-style group aggregate (A13 cross-interval summary analog).
    Decimal sums ⇒ associative ⇒ bit-stable under partial aggregation."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
        F.round(
            F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "q03_topn_orders",
    """
    select o_orderkey, o_custkey, round(o_totalprice, 2) as total
    from orders
    order by o_totalprice desc, o_orderkey asc
    limit 20
    """,
)
def q03(spark, sf_dir):
    """Global top-N (BED top-N-by-score analog, `utils.py:284`) —
    compiles to TakeOrderedAndProject, no full sort at scale."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


@q(
    "q04_join_enrich",
    """
    select n.n_name as nation, count(*) as n_cust,
           cast(sum(cast(c.c_acctbal as decimal(18,4))) as double) as sum_bal
    from customer c
    join nation n on c.c_nationkey = n.n_nationkey
    join region r on n.n_regionkey = r.r_regionkey
    where r.r_name <> 'EUROPE'
    group by n.n_name
    """,
)
def q04(spark, sf_dir):
    """Dim-table enrichment with explicit broadcast (J3 sample-sheet
    join analog): both dims broadcast, zero shuffle on the fact side."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") != "EUROPE")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("sum_bal"),
        )
    )


@q(
    "q05_union_tagged",
    """
    select tag, count(*) as n, round(cast(sum(cast(value as decimal(18,6))) as double), 4) as sum_value
    from (
      select 'click' as tag, value from events where event_type = 'click'
      union all
      select 'purchase' as tag, value from events where event_type = 'purchase'
    )
    group by tag
    """,
)
def q05(spark, sf_dir):
    """Tagged union (multi-BED concat analog, S5)."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("tag"), "value"
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("tag"), "value"
    )
    return (
        a.unionByName(b)
        .groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
    )


@q(
    "q06_pivot_event_types",
    """
    select user_id,
           count(*) filter (event_type = 'click')    as n_click,
           count(*) filter (event_type = 'error')    as n_error,
           count(*) filter (event_type = 'purchase') as n_purchase,
           count(*) filter (event_type = 'signup')   as n_signup,
           count(*) filter (event_type = 'view')     as n_view
    from events
    group by user_id
    """,
)
def q06(spark, sf_dir):
    """Manual pivot via conditional aggregation (A23 pivot analog) —
    map-side combinable, unlike a generic pivot."""
    ev = t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == et, 1)).alias(f"n_{et}")
        for et in ["click", "error", "purchase", "signup", "view"]
    ]
    return ev.groupBy("user_id").agg(*aggs)


# =====================================================================
# window / as-of family over the events stream (entity = user_id)
# =====================================================================


@q(
    "q07_rolling_mean",
    f"""
    select event_id,
           round(avg(value) over (partition by user_id order by ts_us, event_id
                                  rows between 9 preceding and current row), 6) as roll_mean
    from {_EVENTS_SQL}
    """,
)
def q07(spark, sf_dir):
    """Trailing rolling mean (A6, `signal_transformer.py:176`)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-9, 0)
    )
    return ev.select(
        "event_id", F.round(F.avg("value").over(w), 6).alias("roll_mean")
    )


@q(
    "q08_rolling_median",
    f"""
    select event_id,
           round(median(value) over (partition by user_id order by ts_us, event_id
                                     rows between 9 preceding and current row), 6) as roll_median
    from {_EVENTS_SQL}
    """,
)
def q08(spark, sf_dir):
    """Exact trailing rolling median (WPS smoothing analog,
    `signal_transformer.py:276`) — grouped Arrow pandas UDF, the one
    sanctioned Python path."""
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts_us", "value")
    med = W.rolling_median(
        ev, "value", "roll_median_raw", 10,
        by="user_id", order=["ts_us", "event_id"],
    )
    return med.select(
        "event_id", F.round("roll_median_raw", 6).alias("roll_median")
    )


@q(
    "q09_lag_lead",
    f"""
    select event_id,
           round(value - lag(value, 1) over w, 6)  as delta_prev,
           round(lead(value, 2) over w, 6)         as lead2
    from {_EVENTS_SQL}
    window w as (partition by user_id order by ts_us, event_id)
    """,
)
def q09(spark, sf_dir):
    """lag/lead offsets (A3/A4 fragment-endpoint analog)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("delta_prev"),
        F.round(F.lead("value", 2).over(w), 6).alias("lead2"),
    )


_GAP_US = 3_600_000_000  # 1 h session gap


@q(
    "q10_sessionize",
    f"""
    select event_id,
           sum(case when ts_us - prev_ts > {_GAP_US} then 1 else 0 end)
             over (partition by user_id order by ts_us, event_id
                   rows between unbounded preceding and current row) as session_id
    from (
      select event_id, user_id, ts_us,
             lag(ts_us, 1) over (partition by user_id order by ts_us, event_id) as prev_ts
      from {_EVENTS_SQL}
    )
    """,
)
def q10(spark, sf_dir):
    """Sessionize via gap-cumsum (A5 dyad segmentation analog) —
    pure JVM window ops."""
    ev = _events(spark, sf_dir)
    s = W.sessionize(
        ev, _GAP_US, out="session_id", by="user_id",
        order=["ts_us", "event_id"], ts_col="ts_us",
    )
    return s.select("event_id", F.col("session_id").cast("long").alias("session_id"))


@q(
    "q11_session_stats",
    f"""
    with s as (
      select user_id, ts_us,
             sum(case when ts_us - prev_ts > {_GAP_US} then 1 else 0 end)
               over (partition by user_id order by ts_us, event_id
                     rows between unbounded preceding and current row) as session_id
      from (
        select event_id, user_id, ts_us,
               lag(ts_us, 1) over (partition by user_id order by ts_us, event_id) as prev_ts
        from {_EVENTS_SQL}
      )
    )
    select user_id, session_id, count(*) as n_events,
           min(ts_us) as session_start, max(ts_us) - min(ts_us) as session_span
    from s group by user_id, session_id
    """,
)
def q11(spark, sf_dir):
    """Per-session aggregates (session window frame)."""
    ev = _events(spark, sf_dir)
    s = W.sessionize(
        ev, _GAP_US, out="session_id", by="user_id",
        order=["ts_us", "event_id"], ts_col="ts_us",
    )
    return s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start"),
        (F.max("ts_us") - F.min("ts_us")).alias("session_span"),
    )


@q(
    "q12_ffill",
    f"""
    select event_id,
           round(last_value(v_sparse ignore nulls)
             over (partition by user_id order by ts_us, event_id
                   rows between unbounded preceding and current row), 6) as v_filled
    from (
      select event_id, user_id, ts_us,
             case when event_id % 7 = 0 then null else value end as v_sparse
      from {_EVENTS_SQL}
    )
    """,
)
def q12(spark, sf_dir):
    """Forward-fill (backfill stage of the north_rule)."""
    ev = _events(spark, sf_dir).withColumn(
        "v_sparse",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    filled = W.ffill(
        ev, "v_sparse", out="v_filled", by="user_id", order=["ts_us", "event_id"]
    )
    return filled.select("event_id", F.round("v_filled", 6).alias("v_filled"))


_EVENTS_UNIQ_SQL = (
    "(select user_id, ts_us, max(event_id) as event_id, arg_max(value, event_id) as value "
    f"from {_EVENTS_SQL} ev group by user_id, ts_us)"
)


def _events_uniq(spark, sf_dir):
    """Events deduped to unique (user_id, ts) — as-of matches are then
    well-defined on both engines (ties otherwise unspecified)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id", "ts_us")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
    )


@q(
    "q13_asof_join",
    f"""
    with ev as (select * from {_EVENTS_UNIQ_SQL}),
    anchors as (select user_id, ts_us, event_id from ev where event_id % 20 = 0)
    select a.event_id as anchor_id, e.event_id as matched_id,
           round(e.value, 6) as matched_value
    from anchors a asof join ev e
      on a.user_id = e.user_id and e.ts_us <= a.ts_us
    """,
)
def q13(spark, sf_dir):
    """Backward as-of join (J1/J2 — the heart of the engine). The
    anchor at its own ts matches itself, exactly like DuckDB ASOF."""
    ev = _events_uniq(spark, sf_dir)
    anchors = ev.filter(F.col("event_id") % 20 == 0).select(
        F.col("user_id").alias("entity"),
        F.col("ts_us").alias("anchor_ts"),
        F.col("event_id").alias("anchor_id"),
    )
    evs = ev.select(
        F.col("user_id").alias("entity"),
        F.col("ts_us").alias("ts"),
        "event_id",
        "value",
    )
    out = asof_join(evs, anchors, select=["event_id", "value"])
    return out.select(
        "anchor_id",
        F.col("event_id").alias("matched_id"),
        F.round("value", 6).alias("matched_value"),
    )


_TOL_US = 2 * 3_600_000_000  # 2 h as-of tolerance


@q(
    "q14_asof_tolerance_sliced",
    f"""
    with ev as (select * from {_EVENTS_UNIQ_SQL}),
    anchors as (select user_id, ts_us, event_id from ev where event_id % 20 = 3)
    select a.event_id as anchor_id,
           (select arg_max(e.event_id, e.ts_us) from ev e
             where e.user_id = a.user_id
               and e.ts_us <= a.ts_us and e.ts_us >= a.ts_us - {_TOL_US}) as matched_id
    from anchors a
    """,
)
def q14(spark, sf_dir):
    """Bounded-lookback as-of via the skew-safe time-sliced variant
    (salting by time slice — north_rule skew handling)."""
    ev = _events_uniq(spark, sf_dir)
    anchors = ev.filter(F.col("event_id") % 20 == 3).select(
        F.col("user_id").alias("entity"),
        F.col("ts_us").alias("anchor_ts"),
        F.col("event_id").alias("anchor_id"),
    )
    evs = ev.select(
        F.col("user_id").alias("entity"), F.col("ts_us").alias("ts"), "event_id"
    )
    out = asof_join_sliced(
        evs, anchors, select=["event_id"], tolerance=_TOL_US, slice_width=_TOL_US
    )
    return out.select("anchor_id", F.col("event_id").alias("matched_id"))


_WIN_US = 3_600_000_000  # 1 h interval-join window


@q(
    "q15_interval_join",
    f"""
    with ev as (select * from {_EVENTS_SQL} ev),
    anchors as (select user_id, ts_us, event_id from ev where event_id % 25 = 0)
    select a.event_id as anchor_id, count(e.event_id) as n_in_window,
           round(cast(sum(cast(e.value as decimal(18,6))) as double), 4) as sum_value
    from anchors a
    left join ev e
      on e.user_id = a.user_id
     and e.ts_us >  a.ts_us - {_WIN_US}
     and e.ts_us <= a.ts_us
    group by a.event_id
    """,
)
def q15(spark, sf_dir):
    """Interval/range join: past-hour events per anchor (S2 indexed
    range fetch analog) — anchors broadcast, zero leakage by bounds."""
    ev = _events(spark, sf_dir)
    anchors = ev.filter(F.col("event_id") % 25 == 0).select(
        F.col("user_id").alias("entity"),
        F.col("ts_us").alias("anchor_ts"),
        F.col("event_id").alias("anchor_id"),
    )
    evs = ev.select(
        F.col("user_id").alias("entity"),
        F.col("ts_us").alias("ts"),
        F.col("event_id").alias("ev_id"),
        "value",
    )
    joined = interval_join(
        evs, anchors, lower=-(_WIN_US - 1), upper=0, how="left"
    )
    return joined.groupBy("anchor_id").agg(
        F.count("ev_id").alias("n_in_window"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
        ).alias("sum_value"),
    )
