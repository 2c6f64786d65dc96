"""Training-set assembly operators: deterministic splits, leakage-safe
categorical encoding, feature hashing, time-series CV folds.

The reference extracts feature matrices and hands them to a modelling
step (`fextract/lib.py` saves per-sample matrices; the differential
analysis consumes them). These operators close the remaining gap
between "feature table" and "training table": reproducible
train/val/test assignment, out-of-fold target encoding (the classic
leakage trap — same zero-leakage discipline as the as-of joins),
hashing-trick vectorization, and expanding-window CV folds.

Determinism (CLAUDE.md rules): every pseudo-random draw is an md5
prefix (bit-identical in any engine), every mean is a DECIMAL-stable
sum/count, every float output is round()ed, time arithmetic is exact
bigint epoch-micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: 2^52 — md5 13-hex-digit prefix range; uniform u = prefix / 2^52.
_U52 = float(1 << 52)


def _md5_u(col, seed: int):
    """Uniform [0,1) from md5(seed:value) — 52-bit prefix over 2^52.

    Bit-identical in every engine with md5 (DuckDB twin:
    ``('0x' || substr(md5(s), 1, 13))::bigint / 2^52``)."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), col.cast("string")))
    return F.conv(F.substring(key, 1, 13), 16, 10).cast("long") / F.lit(_U52)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row draws
    ``u = md5(seed:id)`` and lands in the first split whose cumulative
    weight exceeds ``u``. Reproducible across runs, engines and
    cluster sizes (no ``rand()``), and STABLE UNDER APPEND: a row's
    split depends only on its id, so growing the table never
    reassigns existing rows — the property random-split caching
    breaks.

    Shape at 100 TB: row-local (zero shuffle, zero collect); the
    split column is a narrow projection Catalyst folds into the scan.
    """
    total = float(sum(weights.values()))
    u = _md5_u(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


def oof_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str,
    smoothing: float = 20.0,
    out: str = "target_enc",
) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding: each row's category
    is encoded with the smoothed target mean computed over EVERY FOLD
    BUT ITS OWN — the standard guard against the target leaking into
    its own feature (same zero-leakage discipline as the backward
    as-of join, applied to the categorical axis).

      enc(cat, fold) = (sum_{f != fold} t + m * prior)
                     / (cnt_{f != fold}   + m)

    with ``prior`` the global target mean. All sums are
    DECIMAL(18,6)-stable (partial-agg order can't change a bit) and
    the output is round(6)ed, so the encoding is engine-exact.

    Physical shape: one groupBy(cat, fold) with map-side partials
    (the only full shuffle, keyed well below row cardinality), a
    window over the TINY aggregated frame (|cats| x |folds| rows) for
    the leave-own-fold-out totals, and one hash join back to the rows
    on (cat, fold). No window over raw rows, no self-join; at 100 TB
    the encode frame is millions of rows at worst while the data
    shuffle is avoided entirely for the join when AQE broadcasts it.
    Categories seen in a single fold with ``smoothing == 0`` have an
    empty out-of-fold sample: enc is NULL (never a div-by-zero).
    """
    t_dec = F.col(target_col).cast("decimal(18,6)")
    prior = (
        df.agg(
            F.sum(t_dec).alias("s"), F.count(target_col).alias("c")
        )
    )
    per = df.groupBy(cat_col, fold_col).agg(
        F.sum(t_dec).alias("f_sum"),
        F.count(target_col).alias("f_cnt"),
    )
    wc = Window.partitionBy(cat_col)
    enc = (
        per.withColumn("c_sum", F.sum("f_sum").over(wc))
        .withColumn("c_cnt", F.sum("f_cnt").over(wc))
        .crossJoin(F.broadcast(prior))
        .select(
            cat_col,
            fold_col,
            F.round(
                (
                    (F.col("c_sum") - F.col("f_sum")).cast("double")
                    + F.lit(smoothing)
                    * (F.col("s").cast("double") / F.col("c"))
                )
                / F.nullif(
                    (F.col("c_cnt") - F.col("f_cnt") + F.lit(smoothing)).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias(out),
        )
    )
    return df.join(enc, [cat_col, fold_col], "left")


def feature_hash(
    df: DataFrame,
    cols: list[str],
    n_buckets: int,
    id_col: str,
) -> DataFrame:
    """Hashing-trick vectorization: every (column, value) pair hashes
    to ``bucket = md5("col=value") mod n_buckets`` with a +-1 sign from
    the next hash digit (the signed construction that keeps collisions
    unbiased). Output is LONG FORM — one row per (id, bucket) with the
    summed signed count — the sparse-vector layout a trainer ingests
    directly and the layout that stays relational (no per-row arrays,
    so the result joins/aggregates like any other frame).

    Shape at 100 TB: the unpivot is a row-local generator (k output
    rows per input row for k hashed columns — no shuffle), and the
    (id, bucket) aggregation combines map-side. Hash math is pure md5
    column arithmetic; bit-identical in any engine.
    """
    pairs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(c).cast("string").alias("val"),
        )
        for c in cols
    ]
    kv = F.explode(F.array(*pairs)).alias("kv")
    key = F.md5(F.concat_ws("=", F.col("kv.col_name"), F.col("kv.val")))
    bucket = (
        F.conv(F.substring(key, 1, 13), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(key, 14, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        df.select(F.col(id_col), kv)
        .filter(F.col("kv.val").isNotNull())
        .select(
            id_col,
            bucket.alias("bucket"),
            sign.alias("sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("bigint").alias("val"))
    )


def tscv_folds(
    df: DataFrame,
    ts_col: str,
    n_folds: int,
    out_fold: str = "fold",
    out_role: str = "role",
) -> DataFrame:
    """Expanding-window time-series cross-validation folds: the time
    axis is cut into ``n_folds + 1`` EQUAL-WIDTH segments (exact
    bigint epoch-micros arithmetic — engine-exact, unlike float
    quantiles); fold ``f`` trains on segments ``1..f`` and tests on
    segment ``f+1``, so every test row is strictly later than every
    train row in its fold — temporal CV with zero leakage by
    construction.

    Output is long form: one row per (input row, fold) it
    participates in, tagged ``role in ('train','test')``; rows after
    a fold's test segment are absent from that fold.

    Shape at 100 TB: one tiny min/max aggregation broadcast back
    (never a global sort — equal-DEPTH folds would need a
    single-reducer ntile), then segment assignment and the
    fold-expansion generator are row-local. Output is at most
    ``n_folds`` x input rows, which is the deliverable, not overhead.
    """
    mm = df.agg(
        F.min(F.col(ts_col)).alias("mn"), F.max(F.col(ts_col)).alias("mx")
    )
    n_seg = int(n_folds) + 1
    # exact bigint arithmetic end-to-end (div, never float /+floor —
    # a rounded quotient can flip the floor at epoch-micros magnitudes)
    seg = F.expr(
        f"cast((({ts_col} - mn) div ((mx - mn) div {n_seg} + 1)) + 1 as int)"
    )
    folds = F.explode(
        F.sequence(F.lit(1), F.lit(int(n_folds)))
    ).alias(out_fold)
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__seg", seg)
        .drop("mn", "mx")
        .select("*", folds)
        .filter(F.col("__seg") <= F.col(out_fold) + 1)
        .withColumn(
            out_role,
            F.when(F.col("__seg") <= F.col(out_fold), F.lit("train")).otherwise(
                F.lit("test")
            ),
        )
        .drop("__seg")
    )


def cluster_atomic_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Leakage-free split under duplication: ``hash_split`` keyed on
    the NEAR-DUP CLUSTER id instead of the row id, so every member of
    a duplicate cluster lands in the SAME split atomically. Row-level
    splits leak — a near-dup pair straddling train/test is the
    contamination ``split_decontaminate`` has to repair by dropping
    training rows; splitting on the cluster key prevents the straddle
    instead (Lee et al. 2022's dedup-before-split discipline as an
    operator). Rows absent from ``clusters`` are singletons and key on
    their own id, so the marginal split fractions still track
    ``weights``.

    Scale shape: one id join against the cluster frame (bounded by
    corpus size, usually far smaller — only near-dup members need
    rows); the split itself stays row-local md5 arithmetic, stable
    under append exactly like ``hash_split``.

    Returns ``df`` + (cluster_id, split).
    """
    keyed = df.join(
        clusters.select(
            F.col(id_col), F.col("cluster_id").alias("__cl")
        ),
        id_col,
        "left",
    ).withColumn("cluster_id", F.coalesce(F.col("__cl"), F.col(id_col)))
    return hash_split(
        keyed.drop("__cl"), "cluster_id", weights, seed=seed, out=out
    )
