"""Point-in-time (as-of) and interval joins — the heart of the engine.

The reference implements this as a per-interval B-tree index fetch
(``/root/reference/src/lbfextract/fextract/lib.py:71-77``): an index
nested-loop join that is fine single-node and catastrophic distributed.
Here it is re-expressed two ways (SURVEY.md §2.3 J1/J2):

* ``asof_join`` — cogrouped sort-merge: both sides are shuffled once on
  the entity key, each Arrow batch is merged with a vectorized
  ``pd.merge_asof`` (backward ⇒ only events with ``ts ≤ anchor_ts``
  match: **zero temporal leakage** by construction).
* ``asof_join_sliced`` — the skew-safe variant: hot entities are salted
  by time-slice (``floor(ts / slice_width)``); events are duplicated
  into every slice whose anchors they could serve (duplicate-then-trim,
  the distributed analog of the reference's ``extra_bases`` over-fetch,
  ``fextract/lib.py:68-77``), so one giant entity no longer lands on a
  single task.
* ``interval_join`` — relational range join (broadcast the small anchor
  side); the Spark answer to ``bamfile.fetch(chrom, start, end)``.

At 100 TB the plan is: one ``repartitionByRange`` shuffle of the event
table, anchors broadcast or co-shuffled, AQE skew split on top of the
explicit time-slice salting.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_ASOF_DIRECTIONS = ("backward", "forward", "nearest")


def _merged_schema(
    anchors: DataFrame,
    events: DataFrame,
    by: list[str],
    select: list[str] | None,
    extra: list[T.StructField] = (),
) -> tuple[T.StructType, list[str]]:
    ev_fields = {f.name: f for f in events.schema.fields}
    ev_cols = select if select is not None else [
        c for c in events.columns if c not in by
    ]
    fields = list(anchors.schema.fields)
    anchor_names = set(anchors.columns)
    for c in ev_cols:
        if c in anchor_names:
            raise ValueError(
                f"event column {c!r} collides with an anchor column; "
                "rename or pass `select`"
            )
        # matched event columns become nullable (no-match ⇒ null)
        fields.append(T.StructField(c, ev_fields[c].dataType, True))
    fields.extend(extra)
    return T.StructType(fields), ev_cols


def _asof_merge_fn(
    anchor_cols: list[str],
    ev_cols: list[str],
    on: str,
    anchor_on: str,
    tolerance: int | None,
    direction: str,
    out_cols: list[str],
):
    """Build the cogrouped pandas merge function (anchors left, events right)."""

    def merge(anchors_pdf: pd.DataFrame, events_pdf: pd.DataFrame) -> pd.DataFrame:
        if anchors_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        left = anchors_pdf.sort_values(anchor_on, kind="mergesort", ignore_index=True)
        right = (
            events_pdf[[on] + [c for c in ev_cols if c != on]]
            .sort_values(on, kind="mergesort", ignore_index=True)
        )
        if right.empty:
            out = left.copy()
            for c in ev_cols:
                out[c] = None
        else:
            out = pd.merge_asof(
                left,
                right,
                left_on=anchor_on,
                right_on=on,
                direction=direction,
                tolerance=tolerance,
                suffixes=("", "__ev"),
            )
            if on in left.columns:  # pandas suffixes the right `on` col
                out = out.rename(columns={f"{on}__ev": on})
        # integer event columns picked up NaNs on no-match → nullable Int64
        for c in ev_cols:
            if c in out.columns and out[c].dtype.kind == "f" and events_pdf[c].dtype.kind in "iu":
                out[c] = out[c].astype("Int64")
        return out[out_cols]

    return merge


def asof_join(
    events: DataFrame,
    anchors: DataFrame,
    *,
    on: str = "ts",
    anchor_on: str = "anchor_ts",
    by: list[str] | str = "entity",
    tolerance: int | None = None,
    direction: str = "backward",
    select: list[str] | None = None,
) -> DataFrame:
    """As-of join: each anchor row gets the matching event row.

    backward ⇒ latest event with ``ts ≤ anchor_ts`` (within ``tolerance``
    if given) — point-in-time correct, no future leakage (north_rule;
    reference semantics at ``fextract/lib.py:72-77`` + proper-pair
    guard, SURVEY.md J2).
    """
    if direction not in _ASOF_DIRECTIONS:
        raise ValueError(f"direction must be one of {_ASOF_DIRECTIONS}")
    by = [by] if isinstance(by, str) else list(by)
    schema, ev_cols = _merged_schema(anchors, events, by, select)
    out_cols = [f.name for f in schema.fields]
    fn = _asof_merge_fn(anchors.columns, ev_cols, on, anchor_on, tolerance, direction, out_cols)
    return (
        anchors.groupBy(*by)
        .cogroup(events.groupBy(*by))
        .applyInPandas(lambda left, right: fn(left, right), schema)
    )


def asof_join_sliced(
    events: DataFrame,
    anchors: DataFrame,
    *,
    on: str = "ts",
    anchor_on: str = "anchor_ts",
    by: list[str] | str = "entity",
    tolerance: int = 10_000,
    slice_width: int | None = None,
    select: list[str] | None = None,
) -> DataFrame:
    """Skew-safe backward as-of join with a bounded lookback window.

    Salts the group key with ``_slice = floor(ts / slice_width)``; each
    event is exploded into every slice whose anchors it could serve
    (``floor(ts/W) … floor((ts+tolerance)/W)``), each anchor stays in
    exactly one slice ⇒ results are exactly those of ``asof_join`` with
    the same tolerance, but a hot entity's work is spread over
    ``span/W`` tasks instead of one.
    """
    if tolerance is None or tolerance <= 0:
        raise ValueError("sliced as-of join requires a positive tolerance")
    by = [by] if isinstance(by, str) else list(by)
    w = slice_width or max(1, tolerance)  # 1 duplicate per event by default
    n_dup = math.ceil(tolerance / w)

    ev = events.withColumn(
        "_slice",
        F.explode(
            F.sequence(
                F.floor(F.col(on) / F.lit(w)),
                F.floor((F.col(on) + F.lit(tolerance)) / F.lit(w)),
            )
        ),
    )
    an = anchors.withColumn("_slice", F.floor(F.col(anchor_on) / F.lit(w)))

    schema, ev_cols = _merged_schema(anchors, events, by, select)
    out_cols = [f.name for f in schema.fields]
    fn = _asof_merge_fn(anchors.columns, ev_cols, on, anchor_on, tolerance, "backward", out_cols)
    keys = by + ["_slice"]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return fn(left.drop(columns=["_slice"]), right.drop(columns=["_slice"]))

    _ = n_dup  # documented above; explode bound derives from tolerance/w
    return (
        an.groupBy(*keys)
        .cogroup(ev.groupBy(*keys))
        .applyInPandas(lambda left, right: merge(left, right), schema)
    )


def interval_join(
    events: DataFrame,
    anchors: DataFrame,
    *,
    on: str = "ts",
    anchor_on: str = "anchor_ts",
    by: list[str] | str = "entity",
    lower: int = 0,
    upper: int = 0,
    broadcast_anchors: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Events with ``anchor_ts + lower ≤ ts ≤ anchor_ts + upper`` per anchor.

    The distributed restatement of the per-interval indexed fetch
    (``fextract/lib.py:72-76``): a single range join, anchor side
    broadcast when small (it almost always is — BED files are thousands
    of rows). For past-only windows use ``lower=-span, upper=0`` —
    zero temporal leakage.
    """
    by = [by] if isinstance(by, str) else list(by)
    a = F.broadcast(anchors) if broadcast_anchors else anchors
    cond = None
    for k in by:
        c = events[k] == a[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (events[on] >= a[anchor_on] + F.lit(lower))
        & (events[on] <= a[anchor_on] + F.lit(upper))
    )
    joined = a.join(events, cond, how=how)
    # drop the duplicated key columns from the event side
    for k in by:
        joined = joined.drop(events[k])
    return joined
