"""Baseline normalization operators.

Flanking-mean normalization is the reference's signature post-step
(``/root/reference/src/lbfextract/fextract/lib.py:220-229``): every
per-position vector is divided by the mean of its flanking (edge)
positions; rows whose flanking mean is zero stay all-zero (the
reference initializes the output to zeros and only fills rows with a
nonzero baseline). Expressed here as pure JVM window arithmetic over
the long-form (group, position, value) frame — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def flanking_normalize(
    df: DataFrame,
    value: str,
    position: str,
    n_positions: int,
    flank_n: int,
    by: list[str] | str,
    out: str | None = None,
    sides: str = "right",
) -> DataFrame:
    """Divide `value` by the mean of the flanking positions per group.

    ``sides``: "right" = oldest `flank_n` positions only (point-in-time
    windows have no future flank), "both" = first and last `flank_n`
    (the reference's symmetric variant, ``fextract/lib.py:222-224``).
    Zero-baseline guard: if the flanking mean is 0 (or null), the whole
    group's output is 0 — the reference pre-fills ``normalized_array``
    with zeros and only assigns rows where ``means_flanking != 0``
    (``fextract/lib.py:226-229``,
    ``fextract_batch_coverage/plugin.py:104-106``).
    """
    by = [by] if isinstance(by, str) else list(by)
    if sides == "right":
        in_flank = F.col(position) >= F.lit(n_positions - flank_n)
    elif sides == "both":
        in_flank = (F.col(position) < F.lit(flank_n)) | (
            F.col(position) >= F.lit(n_positions - flank_n)
        )
    else:
        raise ValueError("sides must be 'right' or 'both'")
    w = Window.partitionBy(*by)
    fm = F.avg(F.when(in_flank, F.col(value))).over(w)
    normalized = F.when(
        fm.isNotNull() & (fm != 0), F.col(value) / fm
    ).otherwise(F.lit(0.0))
    return df.withColumn(out or value, normalized)


def zscore(
    df: DataFrame, value: str, by: list[str] | str, out: str | None = None
) -> DataFrame:
    """Per-group z-score (population std; 0-std guard passes through 0)."""
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by)
    mu = F.avg(value).over(w)
    sd = F.stddev_pop(value).over(w)
    return df.withColumn(
        out or value,
        F.when(sd > 0, (F.col(value) - mu) / sd).otherwise(F.lit(0.0)),
    )


def distribution_normalize(
    df: DataFrame, value: str, by: list[str] | str, out: str | None = None,
    epsilon: float = 0.0,
) -> DataFrame:
    """Normalize values to a probability distribution per group
    (column-normalize analog, ``fextract_fragment_length_distribution/
    plugin.py:172-177``; the entropy plugin adds +1e-10 first,
    ``fextract_entropy/plugin.py:31``)."""
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by)
    v = F.col(value) + F.lit(epsilon)
    total = F.sum(v).over(w)
    return df.withColumn(
        out or value,
        F.when(total != 0, v / total).otherwise(F.lit(0.0)),
    )


def quantile_normalize(
    df: DataFrame,
    col: str,
    by: str = "entity",
    tiebreak: str = "event_id",
    out: str = "qnorm",
) -> DataFrame:
    """Cross-entity quantile normalization (the microarray / fragmentomics
    normalizer the reference's per-sample signals assume upstream): every
    entity's k-th smallest value is replaced by the MEAN of the k-th
    smallest values across all entities, forcing every entity onto the
    identical marginal distribution while preserving each entity's
    ranks. Ragged series use the standard convention: rank k averages
    over the entities that HAVE a k-th value.

    Engine-exactness: ranks are row_number over a TOTAL order
    ((value, tiebreak) — determinism rules), and the per-rank mean is
    the decimal-sum/count pattern (CLAUDE.md q115 rule: never avg raw
    doubles into a hashed output).

    Shape at scale: one hash exchange on ``by`` for the rank window,
    one groupBy on rank (bounded by the longest series), one shuffle
    join back on rank. No driver state, no Python."""
    w = Window.partitionBy(by).orderBy(F.asc(col), F.asc(tiebreak))
    ranked = df.withColumn("__rank", F.row_number().over(w))
    means = ranked.groupBy("__rank").agg(
        (
            F.sum(F.col(col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias(out)
    )
    return ranked.join(means, "__rank").withColumnRenamed("__rank", "rank")
