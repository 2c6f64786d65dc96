"""Group-contrast analysis layer (SURVEY.md §2.4 A17-A21).

The reference's downstream module
(``/root/reference/src/lbfextract/transcription_factor_analysis/
differential_signal_analysis.py:313-478``) runs per-interval
Mann-Whitney U / Kruskal-Wallis tests with multiple-testing correction.
scipy is not available in this container, so the test statistics and
p-values are implemented directly (normal approximation with tie
correction for MWU; χ² survival via regularized incomplete gamma for
KW; Benjamini-Hochberg for FDR) — standard published formulas.

Execution shape: per-group tests run inside grouped Arrow batches
(one key = one test, thousands in parallel); the global BH correction
needs every p-value and runs on the (tiny) collected result.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


# ------------------------------------------------------ numeric kernels


def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) — series/continued
    fraction (Numerical Recipes-style, public formulas)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:  # series for P, return 1-P
        ap, summ, delta = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            summ += delta
            if abs(delta) < abs(summ) * 1e-15:
                break
        return 1.0 - summ * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q
    tiny = 1e-300
    b, c, d = x + 1.0 - a, 1.0 / tiny, 1.0 / (x + 1.0 - a)
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(x: float, df: int) -> float:
    return _gammainc_upper_reg(df / 2.0, x / 2.0)


def mannwhitney_u(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Two-sided MWU with normal approximation + tie correction."""
    n1, n2 = len(x), len(y)
    if n1 == 0 or n2 == 0:
        return float("nan"), float("nan")
    allv = np.concatenate([x, y])
    ranks = pd.Series(allv).rank(method="average").to_numpy()
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u = min(u1, n1 * n2 - u1)
    n = n1 + n2
    _, counts = np.unique(allv, return_counts=True)
    tie_term = (counts**3 - counts).sum()
    var = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1))) if n > 1 else 0.0
    if var <= 0:
        return u1, 1.0
    z = (u - n1 * n2 / 2.0 + 0.5) / math.sqrt(var)  # continuity correction
    p = min(1.0, math.erfc(-z / math.sqrt(2.0)))  # 2*cdf(z) for z<0
    return u1, p


def kruskal_wallis(groups: list[np.ndarray]) -> tuple[float, float]:
    groups = [g for g in groups if len(g)]
    k = len(groups)
    if k < 2:
        return float("nan"), float("nan")
    allv = np.concatenate(groups)
    n = len(allv)
    ranks = pd.Series(allv).rank(method="average").to_numpy()
    h, start = 0.0, 0
    for g in groups:
        r = ranks[start : start + len(g)]
        h += r.sum() ** 2 / len(g)
        start += len(g)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(allv, return_counts=True)
    tie = 1.0 - (counts**3 - counts).sum() / (n**3 - n) if n > 1 else 1.0
    if tie > 0:
        h /= tie
    return h, chi2_sf(h, k - 1)


def dunn_posthoc(
    groups: dict[str, np.ndarray]
) -> list[tuple[str, str, float, float]]:
    """Dunn's post-hoc pairwise z-tests after Kruskal-Wallis — the
    ``posthoc_dunn`` analog the reference runs per interval when the
    omnibus p ≤ α (``transcription_factor_analysis/
    differential_signal_analysis.py:373-383``). Standard published
    formula (Dunn 1964, unadjusted p like the reference's call):

        z_ij = (r̄_i − r̄_j) / sqrt((N(N+1)/12 − Σ(t³−t)/(12(N−1)))
                                    · (1/n_i + 1/n_j))
        p_ij = 2·(1 − Φ(|z|))

    with joint average ranks over all groups. Returns one row per
    (a, b) pair with a < b (sorted group labels)."""
    names = sorted(groups)
    arrays = [np.asarray(groups[n], dtype=float) for n in names]
    ns = np.array([len(a) for a in arrays])
    allv = np.concatenate(arrays)
    n = len(allv)
    if n < 2 or len(names) < 2:
        return []
    ranks = pd.Series(allv).rank(method="average").to_numpy()
    mean_ranks, start = [], 0
    for a in arrays:
        mean_ranks.append(ranks[start : start + len(a)].mean())
        start += len(a)
    _, counts = np.unique(allv, return_counts=True)
    tie_term = (counts**3 - counts).sum() / (12.0 * (n - 1)) if n > 1 else 0.0
    base_var = n * (n + 1) / 12.0 - tie_term
    out = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            var = base_var * (1.0 / ns[i] + 1.0 / ns[j])
            if var <= 0:
                out.append((names[i], names[j], float("nan"), float("nan")))
                continue
            z = (mean_ranks[i] - mean_ranks[j]) / math.sqrt(var)
            p = min(1.0, math.erfc(abs(z) / math.sqrt(2.0)))
            out.append((names[i], names[j], z, p))
    return out


def benjamini_hochberg(p: np.ndarray) -> np.ndarray:
    """BH-adjusted p-values (statsmodels 'fdr_bh' analog,
    ``differential_signal_analysis.py:424-478``)."""
    p = np.asarray(p, dtype=float)
    n = len(p)
    order = np.argsort(p, kind="mergesort")
    ranked = p[order] * n / np.arange(1, n + 1)
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.minimum(ranked, 1.0)
    return out


# --------------------------------------------------------- Spark stages


def amplitude(
    df: DataFrame,
    value: str,
    position: str,
    n_positions: int,
    center_n: int,
    by: list[str] | str,
    out: str = "amplitude",
    decimal_stable: bool = False,
) -> DataFrame:
    """Accessibility amplitude: center-window mean − flanking mean,
    sign-flipped for dips (``accessibility_extraction.py:6-27``,
    ``plotting_functions.py:172-189``).

    ``decimal_stable`` computes each mean as an exact DECIMAL(18,6) sum
    divided by the count — partial-aggregation-order-proof, so repeated
    runs (and the DuckDB oracle) agree bit-for-bit even when the means
    land on round() boundaries. Use it whenever the amplitude feeds a
    ranking or a hashed output; values must fit 6 decimal digits."""
    by = [by] if isinstance(by, str) else list(by)
    mid = n_positions // 2
    in_center = (F.col(position) >= mid - center_n // 2) & (
        F.col(position) < mid + (center_n + 1) // 2
    )
    if decimal_stable:
        dv = F.col(value).cast("decimal(18,6)")
        center = F.sum(F.when(in_center, dv)).cast("double") / F.count(
            F.when(in_center, F.col(value))
        )
        flank = F.sum(F.when(~in_center, dv)).cast("double") / F.count(
            F.when(~in_center, F.col(value))
        )
    else:
        center = F.avg(F.when(in_center, F.col(value)))
        flank = F.avg(F.when(~in_center, F.col(value)))
    return df.groupBy(*by).agg((center - flank).alias(out))


def remove_outliers_np(x: np.ndarray, threshold: float = 1.5) -> np.ndarray:
    """Drop values outside [q1 − t·IQR, q3 + t·IQR] — the reference's
    per-group pre-test trim (``transcription_factor_analysis/
    utils.py:12-26``; linear-interpolated quantiles like pandas)."""
    if len(x) == 0:
        return x
    q1, q3 = np.quantile(x, [0.25, 0.75])
    iqr = q3 - q1
    return x[(x >= q1 - threshold * iqr) & (x <= q3 + threshold * iqr)]


def group_test_2(
    df: DataFrame,
    value: str,
    group_col: str,
    by: list[str] | str,
    rm_outliers: bool = False,
    outlier_threshold: float = 1.5,
) -> DataFrame:
    """Per-key two-group Mann-Whitney U (A18) in grouped Arrow batches.
    ``rm_outliers`` applies the reference's per-group IQR trim before
    testing (``differential_signal_analysis.py:319-321``)."""
    by = [by] if isinstance(by, str) else list(by)
    key_fields = [f for f in df.schema.fields if f.name in by]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("u_stat", T.DoubleType(), True),
            T.StructField("p_value", T.DoubleType(), True),
            T.StructField("mean_a", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
        ]
    )

    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gs = sorted(pdf[group_col].dropna().unique())
        if len(gs) != 2:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        x = pdf.loc[pdf[group_col] == gs[0], value].to_numpy(dtype=float)
        y = pdf.loc[pdf[group_col] == gs[1], value].to_numpy(dtype=float)
        if rm_outliers:
            x = remove_outliers_np(x, outlier_threshold)
            y = remove_outliers_np(y, outlier_threshold)
        u, p = mannwhitney_u(x, y)
        row = dict(zip(by, keys))
        row.update(u_stat=u, p_value=p, mean_a=float(x.mean()), mean_b=float(y.mean()))
        return pd.DataFrame([row])

    return df.groupBy(*by).applyInPandas(fn, schema)


def group_test_k(
    df: DataFrame,
    value: str,
    group_col: str,
    by: list[str] | str,
    rm_outliers: bool = False,
    outlier_threshold: float = 1.5,
) -> DataFrame:
    """Per-key k-group Kruskal-Wallis (A19). ``rm_outliers`` applies the
    reference's per-group IQR trim before testing
    (``differential_signal_analysis.py:365-367``)."""
    by = [by] if isinstance(by, str) else list(by)
    key_fields = [f for f in df.schema.fields if f.name in by]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("h_stat", T.DoubleType(), True),
            T.StructField("p_value", T.DoubleType(), True),
            T.StructField("n_groups", T.IntegerType(), True),
        ]
    )

    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        groups = [
            g[value].to_numpy(dtype=float)
            for _, g in pdf.dropna(subset=[group_col]).groupby(group_col)
        ]
        if rm_outliers:
            groups = [remove_outliers_np(g, outlier_threshold) for g in groups]
        h, p = kruskal_wallis(groups)
        row = dict(zip(by, keys))
        row.update(h_stat=h, p_value=p, n_groups=len(groups))
        return pd.DataFrame([row])

    return df.groupBy(*by).applyInPandas(fn, schema)


def group_test_k_dunn(
    df: DataFrame,
    value: str,
    group_col: str,
    by: list[str] | str,
    alpha: float = 0.05,
    rm_outliers: bool = False,
    outlier_threshold: float = 1.5,
) -> DataFrame:
    """Per-key Kruskal-Wallis omnibus + Dunn post-hoc pairwise rows —
    the full reference flow (``differential_signal_analysis.py:361-399``):
    one output row per group PAIR per key, carrying the omnibus (h_stat,
    kw_p), the pair's means, the Dunn z, and p_dunn (NaN when the
    omnibus kw_p > alpha, exactly like the reference's gate; pass
    ``alpha=1.0`` to always report). Same grouped-Arrow shape as
    ``group_test_k`` — thousands of keys in parallel."""
    by = [by] if isinstance(by, str) else list(by)
    key_fields = [f for f in df.schema.fields if f.name in by]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("group_a", T.StringType(), True),
            T.StructField("group_b", T.StringType(), True),
            T.StructField("mean_a", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
            T.StructField("h_stat", T.DoubleType(), True),
            T.StructField("kw_p", T.DoubleType(), True),
            T.StructField("z", T.DoubleType(), True),
            T.StructField("p_dunn", T.DoubleType(), True),
        ]
    )
    out_cols = [f.name for f in schema.fields]

    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=[group_col])
        groups = {
            str(g): grp[value].to_numpy(dtype=float)
            for g, grp in pdf.groupby(group_col)
        }
        if rm_outliers:
            groups = {
                g: remove_outliers_np(a, outlier_threshold)
                for g, a in groups.items()
            }
            groups = {g: a for g, a in groups.items() if len(a)}
        if len(groups) < 2:
            return pd.DataFrame(columns=out_cols)
        h, kw_p = kruskal_wallis(list(groups[g] for g in sorted(groups)))
        pairs = dunn_posthoc(groups)
        key = dict(zip(by, keys))
        rows = []
        for ga, gb, z, p in pairs:
            rows.append(
                {
                    **key,
                    "group_a": ga,
                    "group_b": gb,
                    "mean_a": float(groups[ga].mean()),
                    "mean_b": float(groups[gb].mean()),
                    "h_stat": h,
                    "kw_p": kw_p,
                    "z": z,
                    "p_dunn": p if kw_p <= alpha else float("nan"),
                }
            )
        return pd.DataFrame(rows, columns=out_cols)

    return df.groupBy(*by).applyInPandas(fn, schema)


def adjust_pvalues(
    df: DataFrame, p_col: str = "p_value", out: str = "p_adj"
) -> DataFrame:
    """Global BH correction (A20). Needs every p-value at once — the
    result set is per-key (small), so it runs in a single partition.

    ``repartition(1)`` (a shuffle boundary), NOT ``coalesce(1)``:
    coalesce propagates the 1-partition constraint upstream into the
    stage containing the per-key grouped tests, serializing thousands
    of MWU/KW kernels into one task; the shuffle keeps them parallel
    and only the tiny BH reduction runs single-task."""
    schema = T.StructType(df.schema.fields + [T.StructField(out, T.DoubleType(), True)])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        mask = pdf[p_col].notna()
        adj = np.full(len(pdf), np.nan)
        if mask.any():
            adj[mask.to_numpy()] = benjamini_hochberg(pdf.loc[mask, p_col].to_numpy())
        pdf[out] = adj
        return pdf

    def run(it):
        batches = list(it)
        if batches:  # empty input ⇒ zero output batches, not a crash
            yield fn(pd.concat(batches))

    return df.repartition(1).mapInPandas(run, schema)


def iqr_clamp(
    df: DataFrame, value: str, by: list[str] | str, factor: float = 1.5,
    out: str | None = None,
) -> DataFrame:
    """Clamp outliers to [q1 − f·IQR, q3 + f·IQR] per group (A21,
    ``transcription_factor_analysis/utils.py:12-26``). Exact
    percentiles via JVM percentile()."""
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by)
    q1 = F.expr(f"percentile({value}, 0.25)").over(w)
    q3 = F.expr(f"percentile({value}, 0.75)").over(w)
    lo = q1 - factor * (q3 - q1)
    hi = q3 + factor * (q3 - q1)
    return df.withColumn(out or value, F.greatest(lo, F.least(hi, F.col(value))))


def chi2_contingency_stat(
    df, row_col: str, col_col: str, out: str = "chi2"
):
    """Pearson χ² independence statistic over the (row_col × col_col)
    contingency table, computed relationally: cell/margin counts are
    exact bigints, each cell's contribution ``(o−e)²/e`` is rounded to
    6 digits and summed as DECIMAL so the statistic is independent of
    aggregation order (the BM25/decimal-sum house rule applied to a
    test statistic). Returns one row: (chi2, dof). The p-value lives in
    ``chi2_sf`` (driver-side, like the group-test family) — the
    statistic itself is the engine-exact part.

    Shape at 100 TB: three partial-aggregating groupBys over the event
    log (cells, row margins, column margins) + broadcast-joined tiny
    margin frames — the table is |r|×|c| cells, never data-sized."""
    from pyspark.sql import functions as F

    cells = df.groupBy(
        F.col(row_col).alias("__r"), F.col(col_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__o"))
    rt = cells.groupBy("__r").agg(F.sum("__o").alias("__nr"))
    ct = cells.groupBy("__c").agg(F.sum("__o").alias("__nc"))
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct("__r").alias("__kr"),
        F.count_distinct("__c").alias("__kc"),
    )
    # margins are long sums; a long*long product wraps past 2^63 at
    # ~3e9 rows per margin — DECIMAL(38,0) keeps the product exact
    # (and matches DuckDB's HUGEINT promotion bit-for-bit after the
    # double cast)
    e = (
        F.col("__nr").cast("decimal(38,0)") * F.col("__nc").cast("decimal(38,0)")
    ).cast("double") / F.col("__n")
    contrib = F.round(
        (F.col("__o") - e) * (F.col("__o") - e) / e, 6
    ).cast("decimal(18,6)")
    # densify: a χ² over only OBSERVED cells silently drops the
    # (o − e)²/e = e contribution of every EMPTY cell — the exact
    # cells that scream dependence. Full r × c grid, zero-filled.
    dense = (
        rt.crossJoin(ct)
        .join(cells, ["__r", "__c"], "left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    )
    return (
        dense
        .crossJoin(F.broadcast(tot))
        .withColumn("__x", contrib)
        .groupBy()
        .agg(
            F.sum("__x").cast("double").alias(out),
            ((F.first("__kr") - 1) * (F.first("__kc") - 1))
            .cast("long")
            .alias("dof"),
        )
    )


def cramers_v(df, row_col: str, col_col: str):
    """Cramér's V effect size — χ²'s scale-free companion (a χ² of
    10⁶ over 10¹² rows can be practically nothing; V ∈ [0, 1] says how
    MUCH association): V = sqrt(χ² / (n · (min(kr, kc) − 1))). Same
    relational contingency machinery as ``chi2_contingency_stat``
    (decimal-summed rounded contributions), with n and min(k)−1 carried
    through the single global aggregation; one IEEE sqrt, round(6).
    Returns one row: (chi2, dof, n_obs, v)."""
    from pyspark.sql import functions as F

    cells = df.groupBy(
        F.col(row_col).alias("__r"), F.col(col_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__o"))
    rt = cells.groupBy("__r").agg(F.sum("__o").alias("__nr"))
    ct = cells.groupBy("__c").agg(F.sum("__o").alias("__nc"))
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct("__r").alias("__kr"),
        F.count_distinct("__c").alias("__kc"),
    )
    e = (
        F.col("__nr").cast("decimal(38,0)")
        * F.col("__nc").cast("decimal(38,0)")
    ).cast("double") / F.col("__n")
    contrib = F.round(
        (F.col("__o") - e) * (F.col("__o") - e) / e, 6
    ).cast("decimal(18,6)")
    dense = (
        rt.crossJoin(ct)
        .join(cells, ["__r", "__c"], "left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    )
    agg = (
        dense
        .crossJoin(F.broadcast(tot))
        .withColumn("__x", contrib)
        .groupBy()
        .agg(
            F.sum("__x").cast("double").alias("chi2"),
            ((F.first("__kr") - 1) * (F.first("__kc") - 1))
            .cast("long")
            .alias("dof"),
            F.first("__n").cast("long").alias("n_obs"),
            (F.least(F.first("__kr"), F.first("__kc")) - 1)
            .cast("long")
            .alias("__kmin1"),
        )
    )
    return agg.select(
        "chi2",
        "dof",
        "n_obs",
        F.round(
            F.sqrt(
                F.col("chi2") / (F.col("n_obs") * F.col("__kmin1"))
            ),
            6,
        ).alias("v"),
    )


def subsample_ci(
    df,
    col: str,
    by: str = "entity",
    id_col: str = "event_id",
    n_replicas: int = 32,
    alpha: float = 0.1,
):
    """Per-group subsampling confidence interval for the mean — the
    error-bar a 100-TB profiler attaches to every group statistic
    without a second pass over raw data: ``n_replicas`` half-samples
    (row r joins replica b iff the first hex digit of md5(id:b) < 8 —
    seeded, engine-portable Bernoulli(½)), a decimal-exact mean per
    (group, replica), and the empirical alpha/2 and 1−alpha/2 order
    statistics of the replica means as the interval.

    Determinism: membership is md5 (portable by construction); each
    replica mean is decimal-sum/count (associative — the q115 rule);
    the order statistics rank on (mean, replica) — a total order over
    bit-identical doubles. Empty replicas simply don't contribute; the
    quantile indexes adapt to the count actually present.

    Shape at scale: one explode (×n_replicas) feeding one map-side
    partial groupBy on (group, replica), then a groupBy on group over
    ≤ n_replicas rows each. State per group: n_replicas means."""
    from pyspark.sql import Window

    b = F.explode(F.sequence(F.lit(0), F.lit(int(n_replicas) - 1))).alias("__b")
    member = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(":"), F.col("__b").cast("string")
            )
        ),
        1,
        1,
    ).isin(list("01234567"))
    reps = (
        df.select(by, id_col, col)
        .select(by, id_col, col, b)
        .filter(member)
        .groupBy(by, "__b")
        .agg(
            (
                F.sum(F.col(col).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("__m")
        )
    )
    w = Window.partitionBy(by).orderBy(F.asc("__m"), F.asc("__b"))
    wa = Window.partitionBy(by)
    ranked = (
        reps.withColumn("__r", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wa))
    )
    m_d = F.col("__n").cast("double")
    lo_r = F.greatest(F.lit(1), F.ceil(F.lit(alpha / 2.0) * m_d))
    hi_r = F.ceil(F.lit(1.0 - alpha / 2.0) * m_d)
    return (
        ranked.filter((F.col("__r") == lo_r) | (F.col("__r") == hi_r))
        .groupBy(by)
        .agg(
            F.max("__n").alias("n_replicas"),
            F.round(F.min("__m"), 6).alias("ci_lo"),
            F.round(F.max("__m"), 6).alias("ci_hi"),
        )
    )


def trimmed_winsorized_mean(
    df,
    col: str,
    by: str = "entity",
    trim: float = 0.05,
    tiebreak: str = "event_id",
):
    """Per-group robust location estimates in ONE pass: the trimmed
    mean (drop the ⌈trim·n⌉ smallest and largest values) and the
    winsorized mean (clamp them to the surviving boundary values) —
    the outlier-hardened siblings of the plain group mean that a
    feature profiler reports next to q36's IQR clamp.

    Engine-exactness: the cut ranks come from row_number over a TOTAL
    order (value, tiebreak); boundary values are conditional window
    min/max (exact selections, no interpolation); both means are
    decimal-sum/count (the q115 rule — never a raw-double avg into a
    hashed output).

    ONE hash exchange on ``by`` serves the rank window, the boundary
    windows and the final groupBy."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(F.asc(col), F.asc(tiebreak))
    wa = Window.partitionBy(by)
    c = F.ceil(F.lit(float(trim)) * F.count(F.lit(1)).over(wa).cast("double"))
    ranked = (
        df.withColumn("__r", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wa))
        .withColumn("__c", c)
    )
    in_core = (F.col("__r") > F.col("__c")) & (
        F.col("__r") <= F.col("__n") - F.col("__c")
    )
    lo = F.min(F.when(in_core, F.col(col))).over(wa)
    hi = F.max(F.when(in_core, F.col(col))).over(wa)
    xd = F.col(col).cast("decimal(18,6)")
    wins = F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")).cast(
        "decimal(18,6)"
    )
    out = (
        ranked.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (
                F.sum(F.when(in_core, xd)).cast("double")
                / F.sum(in_core.cast("long")).cast("double")
            ).alias("trimmed_mean"),
            (
                F.sum(wins).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("winsor_mean"),
        )
    )
    return out


def pmi_cells(
    df,
    a: str,
    b: str,
):
    """Pointwise mutual information per (a, b) cell — the
    feature-selection / co-occurrence signal over two categorical
    columns, emitted PER CELL rather than summed to a scalar MI: the
    per-cell ln((n_ab·n)/(n_a·n_b)) terms are each ONE IEEE ln over
    exact integer ratios (bit-reproducible), whereas the scalar MI
    would be a float SUM whose partial-aggregation order is not
    (q115's lesson, generalized). Downstream can sum the returned
    (weight · pmi) terms at whatever precision it wants.

    Shape: one groupBy on (a, b); marginals via two window sums over
    exact bigint counts — no second scan, no driver state."""
    from pyspark.sql import Window

    cells = df.groupBy(a, b).agg(F.count(F.lit(1)).alias("n_ab"))
    n_a = F.sum("n_ab").over(Window.partitionBy(a))
    n_b = F.sum("n_ab").over(Window.partitionBy(b))
    n = F.sum("n_ab").over(Window.partitionBy())
    return (
        cells.withColumn("n_a", n_a)
        .withColumn("n_b", n_b)
        .withColumn("n", n)
        .withColumn(
            "pmi",
            F.log(
                (F.col("n_ab").cast("double") * F.col("n").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ),
        )
    )


def panel_corr_pairs(
    df,
    col: str,
    by: str = "entity",
    ts_col: str = "ts",
    bucket_us: int = 86_400_000_000,
    min_common: int = 3,
):
    """Cross-entity correlation discovery: resample every entity to a
    common time grid (decimal-exact bucket means), inner-join entities
    pairwise on the grid (common support only), and compute Pearson r
    per pair from decimal sufficient statistics — "which series move
    together", the panel feature behind cohort construction and
    redundancy pruning.

    Scale honesty: pairs are O(E²) in the number of entities sharing
    buckets — right for panel workloads (≤ ~10⁴ series). At larger E,
    block first (sign-sketch LSH over the gridded vectors, the q25
    recipe) and feed the blocked candidates through the same stats;
    the grid join itself shuffles only (entity, bucket) aggregates,
    never raw rows.

    Engine-exactness: bucket ids are exact bigint floor-division;
    bucket means are decimal-sum/count; the five pair statistics are
    decimal sums over those (re-quantized to decimal(18,6)); the
    closed-form r is one IEEE tree. Pairs are oriented a < b (total
    order)."""
    # exact bigint floor-division — a double-divide + cast can flip a
    # row across the bucket boundary when the remainder is 0
    bucket = F.expr(f"`{ts_col}` div {int(bucket_us)}")
    # the gridded mean is round(6)ed so the decimal(18,6) re-cast in
    # the pair statistics is EXACT (a round-6 double is within half an
    # ulp of one decimal(18,6) value — no engine-dependent rounding)
    g = (
        df.withColumn("__bk", bucket)
        .groupBy(by, "__bk")
        .agg(
            F.round(
                F.sum(F.col(col).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("__v")
        )
    )
    l, r = g.alias("l"), g.alias("r")
    xd = F.col("l.__v").cast("decimal(18,6)")
    yd = F.col("r.__v").cast("decimal(18,6)")
    pairs = (
        l.join(
            r,
            (F.col("l.__bk") == F.col("r.__bk"))
            & (F.col(f"l.{by}") < F.col(f"r.{by}")),
        )
        .groupBy(
            F.col(f"l.{by}").alias("entity_a"),
            F.col(f"r.{by}").alias("entity_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(xd).cast("double").alias("__sx"),
            F.sum(yd).cast("double").alias("__sy"),
            F.sum(xd * xd).cast("double").alias("__sxx"),
            F.sum(yd * yd).cast("double").alias("__syy"),
            F.sum(xd * yd).cast("double").alias("__sxy"),
        )
    )
    n = F.col("n_common").cast("double")
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den2 = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")) * (
        n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    )
    return (
        pairs.filter((F.col("n_common") >= min_common) & (den2 > F.lit(0.0)))
        .withColumn("corr", num / F.sqrt(den2))
        .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
    )


def robust_scale(
    df,
    col: str,
    by: str = "entity",
    tiebreak: str = "event_id",
):
    """Per-group median and MAD (median absolute deviation) — the
    robust location/scale pair behind outlier-hardened z-scores
    (robust_z = (x − median)/MAD), completing q36 (IQR clamp) and q148
    (trimmed/winsorized means).

    Engine-exactness: "median" is the LOWER median — the value at rank
    ⌈n/2⌉ under the total order (value, tiebreak) — an exact SELECTION,
    no interpolation, so both engines pick the identical element (the
    rank-statistics rule: selections are bit-exact where averages of
    two middle elements would reopen float questions). The deviation
    pass re-ranks |x − median| with the same tiebreak. Two in-partition
    sorts, ONE hash exchange on ``by``."""
    from pyspark.sql import Window

    wa = Window.partitionBy(by)
    w1 = Window.partitionBy(by).orderBy(F.asc(col), F.asc(tiebreak))
    # materialize rank/count/mid as plain columns first — a window
    # expression may not nest inside another window function
    ranked = (
        df.withColumn("__r", F.row_number().over(w1))
        .withColumn("__n", F.count(F.lit(1)).over(wa))
        .withColumn("__mid", F.ceil(F.col("__n").cast("double") / F.lit(2.0)))
    )
    med = ranked.withColumn(
        "__med",
        F.max(F.when(F.col("__r") == F.col("__mid"), F.col(col))).over(wa),
    ).withColumn("__dev", F.abs(F.col(col) - F.col("__med")))
    w2 = Window.partitionBy(by).orderBy(F.asc("__dev"), F.asc(tiebreak))
    out = (
        med.withColumn("__d", F.row_number().over(w2))
        .withColumn(
            "__mad",
            F.max(
                F.when(F.col("__d") == F.col("__mid"), F.col("__dev"))
            ).over(wa),
        )
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max("__med").alias("median"),
            F.max("__mad").alias("mad"),
        )
    )
    return out


def mutual_information(
    df,
    features: list[str],
    label: str,
):
    """Scalar mutual information I(feature; label) per feature — the
    filter-method feature-RANKING step of training-set assembly (which
    raw columns carry signal about the label), complementing
    ``pmi_cells`` (per-cell diagnostics) with one comparable number
    per feature.

    Feature columns must already be discrete (bin continuous columns
    first — floor/width buckets keep it row-local). All features melt
    into one long frame so the contingency counts for EVERY feature
    come out of a single groupBy pass over the data; marginals are
    window sums over the (tiny) contingency rows.

    Determinism: each cell term (n_xy/N)·ln(n_xy·N/(n_x·n_y)) is one
    IEEE ln over exact bigint ratios (bit-reproducible), then
    round(12) → DECIMAL so the per-feature SUM is order-proof (the
    q75/BM25 rule; a raw double sum would flip last bits with
    partial-agg order). Output rounds to 6.

    Shape at 100 TB: ONE scan (explode ×|features| is row-local),
    one map-side-combinable groupBy on (feature, value, label);
    everything after runs on contingency rows (≤ cells, not rows).
    """
    from pyspark.sql import Window

    melted = df.select(
        F.col(label).cast("string").alias("label"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("string").alias("fval"),
                    )
                    for c in features
                ]
            )
        ).alias("fv"),
    ).select("fv.feature", "fv.fval", "label")
    cells = melted.groupBy("feature", "fval", "label").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    n_x = F.sum("n_xy").over(Window.partitionBy("feature", "fval"))
    n_y = F.sum("n_xy").over(Window.partitionBy("feature", "label"))
    n = F.sum("n_xy").over(Window.partitionBy("feature"))
    term = F.round(
        (F.col("n_xy").cast("double") / F.col("n").cast("double"))
        * F.log(
            (F.col("n_xy").cast("double") * F.col("n").cast("double"))
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        ),
        12,
    ).cast("decimal(20,12)")
    return (
        cells.withColumn("n_x", n_x)
        .withColumn("n_y", n_y)
        .withColumn("n", n)
        .withColumn("__term", term)
        .groupBy("feature")
        .agg(
            (F.round(F.sum("__term").cast("double"), 6) + F.lit(0.0)).alias("mi"),
            F.count(F.lit(1)).alias("n_cells"),
            F.max("n").alias("n_rows"),
        )
    )


def ks_2samp(
    df,
    value_col: str,
    side_col: str,
    by: str | list[str] | None = None,
) -> "DataFrame":
    """Two-sample Kolmogorov-Smirnov statistic per group — the classic
    distribution-drift test completing the rank-statistics family
    (MWU/KW/Dunn are location tests; KS sees ANY shape change; PSI
    (q126) is its binned cousin). ``side_col`` must hold exactly two
    labels per group; D = max over pooled values v of
    |F_a(v) − F_b(v)|.

    Exactness: the ECDFs are step functions evaluated AFTER all ties
    of a value (counts per distinct value, then a cumulative window
    ordered by value), and the max runs over the INTEGER cross terms
    |cum_a·n_b − cum_b·n_a| — no float enters until the single final
    division, so the argmax cannot be perturbed by rounding and both
    engines pick the identical numerator (the rank-statistics rule).
    Output: (by…, n_a, n_b, ks_d round(6)).

    Shape at 100 TB: one groupBy(by, value) with map-side partials,
    one window per group ordered by value (skew bound = largest
    group's distinct values), one final agg. Nothing leaves the JVM."""
    from pyspark.sql import Window

    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    sides = df.select(side_col).distinct().orderBy(side_col).collect()
    if len(sides) != 2:
        raise ValueError(
            f"ks_2samp needs exactly two {side_col!r} labels, "
            f"got {[r[0] for r in sides]}"
        )
    a_lab = sides[0][0]
    per_v = df.groupBy(*by, value_col).agg(
        F.sum(
            F.when(F.col(side_col) == a_lab, 1).otherwise(0)
        ).alias("__ca"),
        F.sum(
            F.when(F.col(side_col) != a_lab, 1).otherwise(0)
        ).alias("__cb"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy(*by)
    stepped = (
        per_v.withColumn("__cuma", F.sum("__ca").over(w))
        .withColumn("__cumb", F.sum("__cb").over(w))
        .withColumn("__na", F.sum("__ca").over(wg))
        .withColumn("__nb", F.sum("__cb").over(wg))
        .withColumn(
            "__num",
            F.abs(
                F.col("__cuma") * F.col("__nb")
                - F.col("__cumb") * F.col("__na")
            ),
        )
    )
    return stepped.groupBy(*by).agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.round(
            F.max("__num").cast("double")
            / (F.max("__na") * F.max("__nb")),
            6,
        ).alias("ks_d"),
    )
