"""Dependency-free plotting layer — the reference ``plotting_lib`` analog.

The reference renders per-interval signal curves and amplitude-ranked
top/bottom-k panels with matplotlib/seaborn
(``plotting_lib/plotting_functions.py:150-235``: amplitude column,
row masking to the top/bottom intervals, one polyline per interval with
per-interval center markers). Neither matplotlib nor seaborn ships in
this container — and a 1000-executor engine shouldn't drag a GUI stack
into its workers anyway — so the split here is:

* **selection + aggregation stay distributed** —
  ``select_amplitude_panel`` ranks series by the amplitude operator
  (``operators/stats.py:amplitude``, the ``accessibility_extraction``
  math) and keeps top-k/bottom-k with a total order;
* **rendering is driver-side over a METADATA-SIZED frame** — k curves
  × n_buckets points collected, then emitted as a self-contained SVG
  string (pure string building, deterministic byte-for-byte: sorted
  series, fixed palette, fixed float formatting);
* output goes through ``fsio`` so plots land on DFS next to the run's
  checkpoint manifests.

Swapping in matplotlib later = feeding the same
``select_amplitude_panel`` output to ``ax.plot`` — the distributed part
is unchanged.
"""

from __future__ import annotations

from xml.sax.saxutils import escape as _xesc

from pyspark.sql import DataFrame, functions as F

from lbf_spark.operators.stats import amplitude

# fixed categorical palette (no seaborn): 10 distinguishable hexes,
# cycled in sorted-series order so output is deterministic
PALETTE = [
    "#4c72b0", "#dd8452", "#55a868", "#c44e52", "#8172b3",
    "#937860", "#da8bc3", "#8c8c8c", "#ccb974", "#64b5cd",
]


def select_amplitude_panel(
    summary: DataFrame,
    n_positions: int,
    center_n: int,
    top: int = 5,
    bottom: int = 5,
    by: list[str] | str = "entity",
    value: str = "signal",
    position: str = "bucket",
    decimal_stable: bool = True,
) -> DataFrame:
    """Rank each series by amplitude (center-window mean − flanking
    mean, the reference's panel-selection statistic) and keep the top-k
    and bottom-k with a deterministic total order (amplitude, then the
    series key — the reference's unstable ``sort_values`` made ties
    render nondeterministically). Returns
    ``(by..., amplitude, panel ∈ {'top','bottom'})`` — series-level
    metadata, k+k rows. Requesting more rows than series exist simply
    returns every series once (top wins ties, like the reference's
    row-mask clamp). ``decimal_stable`` (default on) makes the ranking
    statistic partial-aggregation-order-proof — double avg() over a
    handful of short-decimal signals otherwise flips round() boundaries
    between runs."""
    by = [by] if isinstance(by, str) else list(by)
    amp = amplitude(
        summary, value, position, n_positions, center_n, by=by,
        decimal_stable=decimal_stable,
    ).filter(
        # a series with no center or no flanking rows has NULL amplitude
        # — unrankable, and Spark's asc() sorts nulls FIRST (they would
        # hijack the bottom panel) while SQL engines default nulls last
        F.col("amplitude").isNotNull()
    )
    top_df = (
        amp.orderBy(F.desc_nulls_last("amplitude"), *[F.asc(c) for c in by])
        .limit(top)
        .withColumn("panel", F.lit("top"))
    )
    bot_df = (
        amp.orderBy(F.asc_nulls_last("amplitude"), *[F.asc(c) for c in by])
        .limit(bottom)
        .withColumn("panel", F.lit("bottom"))
    )
    # a series in both halves (fewer series than top+bottom) keeps its
    # 'top' row only — one curve per series in the rendered panel
    return top_df.unionByName(
        bot_df.join(top_df.select(*by), by, "left_anti")
    )


def _fmt(x: float) -> str:
    return f"{x:.2f}"


def signal_plot_svg(
    series: dict[str, list[float]],
    title: str = "signal per interval",
    ylabel: str = "signal",
    width: int = 960,
    height: int = 480,
) -> str:
    """Render named series as an SVG line chart (one polyline per
    series, sorted by name; y auto-scaled over all series; dotted
    series-boundary grid and a center marker per the reference's
    per-interval axvlines). Pure string building — deterministic
    bytes for identical input."""
    m_l, m_r, m_t, m_b = 64, 24, 42, 46
    pw, ph = width - m_l - m_r, height - m_t - m_b
    names = sorted(series)
    all_vals = [v for n in names for v in series[n] if v is not None]
    lo = min(all_vals) if all_vals else 0.0
    hi = max(all_vals) if all_vals else 1.0
    if hi == lo:
        hi = lo + 1.0
    n_pts = max((len(series[n]) for n in names), default=2)

    def sx(i: int) -> float:
        return m_l + (i / max(1, n_pts - 1)) * pw

    def sy(v: float) -> float:
        return m_t + (1.0 - (v - lo) / (hi - lo)) * ph

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="24" text-anchor="middle" '
        f'font-size="16" font-family="sans-serif">{_xesc(title)}</text>',
        # y axis + 5 ticks
        f'<line x1="{m_l}" y1="{m_t}" x2="{m_l}" y2="{m_t + ph}" '
        'stroke="black"/>',
        f'<line x1="{m_l}" y1="{m_t + ph}" x2="{m_l + pw}" '
        f'y2="{m_t + ph}" stroke="black"/>',
    ]
    for k in range(5):
        v = lo + (hi - lo) * k / 4
        y = sy(v)
        parts.append(
            f'<line x1="{m_l - 4}" y1="{_fmt(y)}" x2="{m_l}" '
            f'y2="{_fmt(y)}" stroke="black"/>'
            f'<text x="{m_l - 8}" y="{_fmt(y + 4)}" text-anchor="end" '
            f'font-size="10" font-family="sans-serif">{v:.4g}</text>'
        )
    parts.append(
        f'<text x="16" y="{m_t + ph / 2:.0f}" font-size="12" '
        f'font-family="sans-serif" transform="rotate(-90 16 '
        f'{m_t + ph / 2:.0f})" text-anchor="middle">{_xesc(ylabel)}</text>'
    )
    # center marker (reference: dash-dot axvline at each interval center)
    cx = sx((n_pts - 1) // 2)
    parts.append(
        f'<line x1="{_fmt(cx)}" y1="{m_t}" x2="{_fmt(cx)}" '
        f'y2="{m_t + ph}" stroke="gray" stroke-dasharray="6,3" '
        'opacity="0.6"/>'
    )
    for idx, name in enumerate(names):
        color = PALETTE[idx % len(PALETTE)]
        pts = " ".join(
            f"{_fmt(sx(i))},{_fmt(sy(v))}"
            for i, v in enumerate(series[name])
            if v is not None
        )
        parts.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"><title>{_xesc(name)}</title></polyline>'
        )
        ly = m_t + 14 * idx
        parts.append(
            f'<line x1="{m_l + pw - 110}" y1="{ly + 4}" '
            f'x2="{m_l + pw - 90}" y2="{ly + 4}" stroke="{color}" '
            'stroke-width="2"/>'
            f'<text x="{m_l + pw - 84}" y="{ly + 8}" font-size="10" '
            f'font-family="sans-serif">{_xesc(name)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def heatmap_svg(
    rows: dict[str, list[float]],
    title: str = "signal heatmap",
    width: int = 960,
    cell_h: int = 18,
) -> str:
    """Series × position heatmap — the ``plot_heatmap_signal_batch``
    analog: one row per series (sorted), cells shaded on a white→blue
    ramp over the global min/max. Deterministic bytes; pure strings."""
    m_l, m_t = 110, 42
    names = sorted(rows)
    n_pos = max((len(rows[n]) for n in names), default=1)
    all_vals = [v for n in names for v in rows[n] if v is not None]
    lo = min(all_vals) if all_vals else 0.0
    hi = max(all_vals) if all_vals else 1.0
    if hi == lo:
        hi = lo + 1.0
    cw = (width - m_l - 16) / max(1, n_pos)
    height = m_t + cell_h * len(names) + 16
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="24" text-anchor="middle" '
        f'font-size="16" font-family="sans-serif">{_xesc(title)}</text>',
    ]
    for r_i, name in enumerate(names):
        y = m_t + r_i * cell_h
        parts.append(
            f'<text x="{m_l - 6}" y="{y + cell_h - 5}" text-anchor="end" '
            f'font-size="10" font-family="sans-serif">{_xesc(name)}</text>'
        )
        for c_i, v in enumerate(rows[name]):
            if v is None:
                continue
            t = (v - lo) / (hi - lo)
            # white (255,255,255) → deep blue (23,62,120)
            r = round(255 - t * (255 - 23))
            g = round(255 - t * (255 - 62))
            b = round(255 - t * (255 - 120))
            parts.append(
                f'<rect x="{_fmt(m_l + c_i * cw)}" y="{y}" '
                f'width="{_fmt(cw)}" height="{cell_h}" '
                f'fill="rgb({r},{g},{b})"/>'
            )
    parts.append("</svg>")
    return "\n".join(parts)


def _collect_curves(
    summary: DataFrame,
    by: list[str],
    position: str,
    value: str,
    extra: list[str] | None = None,
) -> list:
    """Collect one (pts: position→value map) row per series. Duplicate
    (series, position) rows are averaged FIRST — ``map_from_entries``
    over a raw ``collect_list`` raises DUPLICATED_MAP_KEY at collect
    time under the default ``spark.sql.mapKeyDedupPolicy`` the moment
    an upstream summary carries a repeated position (avg, not first:
    order-independent). Positions outside [0, n_positions) are dropped
    by the renderer's range indexing — by contract they are overflow
    bins, never silently shifted."""
    extra = extra or []
    grouped = (
        summary.groupBy(*by, *extra, F.col(position).alias("__pos"))
        .agg(F.avg(F.col(value)).alias("__val"))
        .groupBy(*by, *extra)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__pos"), F.col("__val")))
            ).alias("pts")
        )
    )
    return grouped.collect()


def _smooth_series(
    series: dict[str, list[float]], window: int, polyorder: int = 3
) -> dict[str, list[float]]:
    """Driver-side Savitzky-Golay smoothing of collected curves — the
    reference's ``plot_signal(..., savgol=)`` option
    (``plotting_lib/plotting_functions.py:203``), applied where the
    reference applies it: to the k metadata-sized curves right before
    rendering, never distributed. None gaps are preserved: the filter
    runs over the compacted non-None values and results are placed
    back at their original positions (deterministic: numpy float64,
    fixed coefficients)."""
    import numpy as np

    from lbf_spark.functions.peaks import savgol_smooth

    out: dict[str, list[float]] = {}
    for name, vals in series.items():
        idx = [i for i, v in enumerate(vals) if v is not None]
        if len(idx) < 2:
            out[name] = list(vals)
            continue
        dense = np.array([vals[i] for i in idx], dtype=np.float64)
        sm = savgol_smooth(dense, window=window, polyorder=polyorder)
        smoothed: list[float | None] = list(vals)
        for j, i in enumerate(idx):
            smoothed[i] = float(sm[j])
        out[name] = smoothed
    return out


def plot_heatmap(
    summary: DataFrame,
    out_path: str,
    n_positions: int,
    center_n: int,
    top: int = 32,
    bottom: int = 32,
    by: list[str] | str = "entity",
    value: str = "signal",
    position: str = "bucket",
    title: str = "signal heatmap",
) -> str:
    """Heatmap of the amplitude-ranked top-k/bottom-k series — the SAME
    distributed selection as ``plot_signal`` (``select_amplitude_panel``),
    so the two renderings of one summary always show the same series
    (the pre-r6 heatmap took first-k by key order, an
    arbitrary-but-deterministic choice inconsistent with the signal
    panel). Collect is metadata-sized: (top+bottom) × n_positions
    cells. Row labels carry the panel tag; rows sort by name in the
    rendered SVG (deterministic bytes)."""
    from lbf_spark import fsio

    by = [by] if isinstance(by, str) else list(by)
    panel = select_amplitude_panel(
        summary, n_positions, center_n, top, bottom, by, value, position
    )
    curves = _collect_curves(
        summary.join(panel.select(*by, "panel"), by),
        by, position, value, extra=["panel"],
    )
    rows: dict[str, list[float]] = {}
    for r in curves:
        key = "/".join(str(r[c]) for c in by) + f" [{r['panel']}]"
        pts = r["pts"] or {}
        rows[key] = [pts.get(i) for i in range(n_positions)]
    svg = heatmap_svg(rows, title=title)
    fsio.write_text_atomic(summary.sparkSession, out_path, svg)
    return svg


def plot_signal(
    summary: DataFrame,
    out_path: str,
    n_positions: int,
    center_n: int,
    top: int = 5,
    bottom: int = 5,
    by: list[str] | str = "entity",
    value: str = "signal",
    position: str = "bucket",
    title: str = "signal per interval",
    smooth_window: int | None = None,
) -> str:
    """The reference's ``plot_signal`` hook end-to-end: amplitude-rank
    the series distributed, collect ONLY the selected k+k curves
    (metadata-sized: (top+bottom) × n_positions points), optionally
    Savitzky-Golay-smooth them (``smooth_window`` — the reference's
    savgol option, driver-side over the tiny panel), render SVG, write
    atomically via fsio (DFS-safe). Returns the SVG string."""
    from lbf_spark import fsio

    by = [by] if isinstance(by, str) else list(by)
    panel = select_amplitude_panel(
        summary, n_positions, center_n, top, bottom, by, value, position
    )
    curves = _collect_curves(
        summary.join(panel.select(*by, "panel"), by),
        by, position, value, extra=["panel"],
    )
    series: dict[str, list[float]] = {}
    for r in curves:
        key = "/".join(str(r[c]) for c in by) + f" [{r['panel']}]"
        pts = r["pts"] or {}
        series[key] = [pts.get(i) for i in range(n_positions)]
    if smooth_window is not None:
        series = _smooth_series(series, smooth_window)
    svg = signal_plot_svg(series, title=title)
    fsio.write_text_atomic(summary.sparkSession, out_path, svg)
    return svg
