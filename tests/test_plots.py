"""Plotting layer (functions/plots.py — the reference plotting_lib
analog): distributed amplitude-panel selection vs a pandas twin, and
deterministic SVG rendering."""

from __future__ import annotations

import pandas as pd
import pytest

from lbf_spark.functions import plots as PL


@pytest.fixture(scope="module")
def summary_df(spark):
    # 8 series × 16 positions; series s{k} has a center bump of height k
    rows = []
    for k in range(8):
        for pos in range(16):
            base = 1.0 + 0.01 * pos
            bump = float(k) if 6 <= pos < 10 else 0.0
            rows.append((f"s{k}", pos, base + bump))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "bucket", "signal"])
    )


def test_select_amplitude_panel_matches_pandas_twin(spark, summary_df):
    got = (
        PL.select_amplitude_panel(
            summary_df, n_positions=16, center_n=4, top=2, bottom=2
        )
        .toPandas()
        .sort_values(["panel", "entity"], ignore_index=True)
    )
    # twin: amplitude = mean(signal, pos in [6,10)) − mean(others)
    pdf = summary_df.toPandas()
    center = pdf[(pdf.bucket >= 6) & (pdf.bucket < 10)].groupby("entity").signal.mean()
    flank = pdf[(pdf.bucket < 6) | (pdf.bucket >= 10)].groupby("entity").signal.mean()
    amp = (center - flank).sort_values()
    exp_top = set(amp.index[-2:])
    exp_bot = set(amp.index[:2])
    assert set(got[got.panel == "top"].entity) == exp_top == {"s6", "s7"}
    assert set(got[got.panel == "bottom"].entity) == exp_bot == {"s0", "s1"}
    for _i, r in got.iterrows():
        assert r["amplitude"] == pytest.approx(amp[r["entity"]], rel=1e-9)


def test_panel_clamps_to_one_row_per_series(spark, summary_df):
    """top+bottom exceeding the series count returns every series ONCE
    (top wins the overlap), like the reference's row-mask clamp."""
    got = PL.select_amplitude_panel(
        summary_df, n_positions=16, center_n=4, top=6, bottom=6
    ).toPandas()
    assert len(got) == 8
    assert got.entity.is_unique


def test_signal_plot_svg_deterministic_and_structured():
    series = {
        "a [top]": [1.0, 2.0, 3.0, 2.0, 1.0],
        "b [bottom]": [3.0, 2.0, 1.0, 2.0, 3.0],
    }
    svg1 = PL.signal_plot_svg(series, title="demo")
    svg2 = PL.signal_plot_svg(dict(reversed(series.items())), title="demo")
    assert svg1 == svg2  # dict order must not matter (sorted render)
    assert svg1.startswith("<svg") and svg1.rstrip().endswith("</svg>")
    assert svg1.count("<polyline") == 2
    assert "demo" in svg1
    # missing points are skipped, not rendered as zeros
    svg3 = PL.signal_plot_svg({"c": [1.0, None, 3.0]})
    assert svg3.count(",") >= 2 and "<polyline" in svg3


def test_plot_signal_end_to_end(spark, summary_df, tmp_path):
    out = str(tmp_path / "panel.svg")
    svg = PL.plot_signal(
        summary_df, out, n_positions=16, center_n=4, top=2, bottom=2,
        title="e2e panel",
    )
    on_disk = open(out).read()
    assert on_disk == svg
    assert svg.count("<polyline") == 4  # 2 top + 2 bottom curves
    assert "s7/top" in svg.replace(" [", "/").replace("]", "") or "s7 [top]" in svg


def test_heatmap_svg_deterministic_and_shaded():
    rows = {"a": [0.0, 0.5, 1.0], "b": [1.0, 0.5, 0.0]}
    svg1 = PL.heatmap_svg(rows)
    svg2 = PL.heatmap_svg(dict(reversed(rows.items())))
    assert svg1 == svg2
    assert svg1.count("<rect") == 1 + 6  # background + 6 cells
    # extremes hit the ramp endpoints
    assert "rgb(255,255,255)" in svg1 and "rgb(23,62,120)" in svg1
    # None cells are skipped
    assert PL.heatmap_svg({"c": [0.2, None, 0.8]}).count("<rect") == 1 + 2


def test_plot_heatmap_end_to_end_amplitude_ranked(spark, summary_df, tmp_path):
    """plot_heatmap selects the SAME series as the signal panel
    (amplitude-ranked via select_amplitude_panel), not first-k by key
    order: with top=2/bottom=1 the rows are s7/s6 (biggest center
    bumps) and s0 (smallest) — first-k would have shown s0/s1/s2."""
    out = str(tmp_path / "heat.svg")
    svg = PL.plot_heatmap(
        summary_df, out, n_positions=16, center_n=4, top=2, bottom=1,
        title="heat e2e",
    )
    assert open(out).read() == svg
    # 3 series × 16 positions + background
    assert svg.count("<rect") == 1 + 48
    assert "heat e2e" in svg
    assert "s7 [top]" in svg and "s6 [top]" in svg and "s0 [bottom]" in svg
    assert "s1" not in svg and "s2" not in svg


def test_plot_signal_savgol_smoothing_deterministic(spark, summary_df, tmp_path):
    """The reference's savgol render option: smoothing changes the
    curves (the sharp bump edge flattens), is byte-deterministic across
    runs, and leaves the unsmoothed render untouched."""
    out1 = str(tmp_path / "sm1.svg")
    out2 = str(tmp_path / "sm2.svg")
    raw = PL.plot_signal(
        summary_df, str(tmp_path / "raw.svg"), n_positions=16, center_n=4,
        top=2, bottom=2,
    )
    sm1 = PL.plot_signal(
        summary_df, out1, n_positions=16, center_n=4, top=2, bottom=2,
        smooth_window=5,
    )
    sm2 = PL.plot_signal(
        summary_df, out2, n_positions=16, center_n=4, top=2, bottom=2,
        smooth_window=5,
    )
    assert sm1 == sm2  # deterministic bytes
    assert sm1 != raw  # smoothing actually applied
    assert sm1.count("<polyline") == raw.count("<polyline") == 4

    # driver kernel sanity: smoothing a line reproduces the line
    # (polynomial of degree ≤ polyorder is a savgol fixed point)
    line = {"a": [float(i) for i in range(12)]}
    sm = PL._smooth_series(line, window=5)
    assert sm["a"] == pytest.approx(line["a"], abs=1e-9)
    # None gaps survive in place
    gap = {"b": [1.0, None, 3.0, 4.0, None, 6.0]}
    smg = PL._smooth_series(gap, window=3)
    assert smg["b"][1] is None and smg["b"][4] is None


def test_plot_curves_tolerate_duplicate_positions(spark, tmp_path):
    """A summary with repeated (series, position) rows renders instead
    of raising DUPLICATED_MAP_KEY — duplicates are averaged first."""
    rows = []
    for k in range(3):
        for pos in range(8):
            bump = float(k) if 3 <= pos < 5 else 0.0
            rows.append((f"e{k}", pos, 1.0 + bump))
    rows.append(("e2", 3, 9.0))  # duplicate position for one series
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "bucket", "signal"])
    )
    svg = PL.plot_signal(
        df, str(tmp_path / "dup.svg"), n_positions=8, center_n=2,
        top=1, bottom=1,
    )
    assert svg.count("<polyline") == 2
    svg_h = PL.plot_heatmap(
        df, str(tmp_path / "duph.svg"), n_positions=8, center_n=2,
        top=1, bottom=1,
    )
    assert svg_h.count("<rect") == 1 + 16
