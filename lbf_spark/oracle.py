"""Single-process numpy/pandas oracle for the feature pipeline.

Reimplements the pipeline math directly from the reference's formulas
(SURVEY.md §2: A1 scatter-add coverage, A6 rolling mean min_count=1,
A12 flanking normalization with zero guard, A13 cross-interval summary,
strand flip ``fextract/lib.py:194-197``) with plain loops — independent
of every Spark code path — so `np.allclose` between engine and oracle
is a real correctness gate, not a tautology.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lbf_spark.functions.codec import decode_image
from lbf_spark.plans.pipeline import FeatureConfig


def decode_stats_oracle(events: pd.DataFrame) -> pd.DataFrame:
    out = events.copy()
    means, stds, r, g, b = [], [], [], [], []
    for data, fmt in zip(out["bytes"], out["fmt"]):
        img = decode_image(bytes(data), fmt).astype(np.float64)
        means.append(img.mean())
        stds.append(img.std())
        cm = img.mean(axis=(0, 1))
        r.append(cm[0]); g.append(cm[1]); b.append(cm[2])
    out["pixel_mean"], out["pixel_std"] = means, stds
    out["r_mean"], out["g_mean"], out["b_mean"] = r, g, b
    return out.drop(columns=["bytes"])


def event_features_oracle(events: pd.DataFrame, cfg: FeatureConfig) -> pd.DataFrame:
    df = decode_stats_oracle(events) if "bytes" in events.columns else events.copy()
    sort_cols = ["entity", "ts"] + (["image_id"] if "image_id" in df.columns else [])
    df = df.sort_values(sort_cols, kind="mergesort", ignore_index=True)
    rolls, counts, drifts, sessions = [], [], [], []
    for _, grp in df.groupby("entity", sort=True):
        v = grp[cfg.value_col].to_numpy(dtype=np.float64)
        ts = grp["ts"].to_numpy(dtype=np.int64)
        # rolling mean over last rolling_w rows, min_count=1 (A6)
        rolls.append(pd.Series(v).rolling(cfg.rolling_w, min_periods=1).mean().to_numpy())
        # events in trailing time range [ts - span, ts], SET semantics:
        # ties at the current ts all count (matches rangeBetween)
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - cfg.span, side="left")
        counts.append(hi - lo)
        # phash hamming drift vs previous row
        ph = grp["phash"].to_numpy(dtype=np.uint64)
        x = ph[1:] ^ ph[:-1]
        d = np.array([bin(int(t)).count("1") for t in x], dtype=float)
        drifts.append(np.concatenate([[np.nan], d]))
        # sessionize: gap > session_gap starts a new session
        gaps = np.diff(ts, prepend=ts[0])
        sessions.append(np.cumsum(gaps > cfg.session_gap))
    df["roll_mean"] = np.concatenate(rolls)
    df["roll_count"] = np.concatenate(counts)
    df["phash_drift"] = np.concatenate(drifts)
    df["session_id"] = np.concatenate(sessions)
    return df


def point_in_time_oracle(
    feats: pd.DataFrame, anchors: pd.DataFrame, cfg: FeatureConfig
) -> pd.DataFrame:
    """Latest feature row with ts ≤ anchor_ts, per anchor — via explicit
    searchsorted per entity (not merge_asof, to stay independent)."""
    cols = [cfg.value_col, "roll_mean", "roll_count", "phash_drift", "session_id", "ts"]
    rows = []
    grouped = {e: g.sort_values("ts", ignore_index=True) for e, g in feats.groupby("entity")}
    for a in anchors.itertuples(index=False):
        g = grouped.get(a.entity)
        rec = dict(zip(anchors.columns, a))
        if g is None:
            rows.append({**rec, **{c: None for c in cols}})
            continue
        i = np.searchsorted(g["ts"].to_numpy(), a.anchor_ts, side="right") - 1
        if i < 0:
            rows.append({**rec, **{c: None for c in cols}})
        else:
            rows.append({**rec, **{c: g.iloc[i][c] for c in cols}})
    return pd.DataFrame(rows)


def anchor_window_matrix_oracle(
    feats: pd.DataFrame, anchors: pd.DataFrame, cfg: FeatureConfig
) -> pd.DataFrame:
    """Dense (anchor × bucket) matrix: bucketed coverage + value mean,
    strand-flipped, flanking-normalized — reference formulas A1/A12."""
    nb = cfg.n_buckets
    grouped = {e: g.sort_values("ts", ignore_index=True) for e, g in feats.groupby("entity")}
    records = []
    for a in anchors.itertuples(index=False):
        cov = np.zeros(nb)
        n_in = np.zeros(nb)
        val_sum = np.zeros(nb)
        g = grouped.get(a.entity)
        if g is not None:
            ts = g["ts"].to_numpy()
            vals = g[cfg.value_col].to_numpy(dtype=np.float64)
            if cfg.weight_col:  # GC-coef analog; missing tag ⇒ 1
                wts = (
                    g[cfg.weight_col].astype("float64").fillna(1.0).to_numpy()
                )
            else:
                wts = np.ones(len(g))
            in_win = (ts > a.anchor_ts - cfg.span) & (ts <= a.anchor_ts)
            for t, v, wt in zip(ts[in_win], vals[in_win], wts[in_win]):
                b = (a.anchor_ts - t) // cfg.bucket_w
                cov[b] += wt           # scatter-add (signal_transformer.py:41-46)
                n_in[b] += 1.0
                val_sum[b] += v
        with np.errstate(invalid="ignore"):
            # val_mean divides by the event COUNT, not the weight sum
            val_mean = np.where(n_in > 0, val_sum / np.maximum(n_in, 1), 0.0)
        if a.strand == "-":
            cov = cov[::-1].copy()     # np.fliplr analog
            val_mean = val_mean[::-1].copy()
        fm = cov[nb - cfg.flank_n :].mean()
        # zero-flank rows stay all-zero: the reference pre-fills the
        # normalized array with zeros and only assigns rows with a
        # nonzero baseline (lib.py:226-229, batch_coverage plugin:104-106)
        cov_norm = cov / fm if fm != 0 else np.zeros(nb)
        for b in range(nb):
            records.append(
                (a.entity, a.anchor_ts, a.name, a.strand, b, cov[b], val_mean[b], cov_norm[b])
            )
    return pd.DataFrame(
        records,
        columns=["entity", "anchor_ts", "name", "strand", "bucket", "cov", "val_mean", "cov_norm"],
    )


_SUMMARY_NP = {
    "mean": np.mean,
    "median": np.median,
    "max": np.max,
    "min": np.min,
}


def summarize_oracle(matrix: pd.DataFrame, cfg: FeatureConfig) -> pd.DataFrame:
    fn = _SUMMARY_NP[cfg.summary]
    out = (
        matrix.groupby(["entity", "name", "bucket"])["cov_norm"]
        .apply(lambda s: float(fn(s.to_numpy())))
        .reset_index(name="signal")
    )
    return out


def summary_vectors_oracle(summary: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for (entity, name), grp in summary.groupby(["entity", "name"]):
        vec = grp.sort_values("bucket")["signal"].to_numpy(dtype=np.float64)
        rows.append((entity, name, vec))
    return pd.DataFrame(rows, columns=["entity", "name", "vector"])


def skip_vectors_oracle(matrix: pd.DataFrame) -> pd.DataFrame:
    """'skip' summarizer = identity: one cov_norm vector per anchor row
    (``fextract/lib.py:218``)."""
    rows = []
    for (entity, anchor_ts, name, strand), grp in matrix.groupby(
        ["entity", "anchor_ts", "name", "strand"]
    ):
        vec = grp.sort_values("bucket")["cov_norm"].to_numpy(dtype=np.float64)
        rows.append((entity, anchor_ts, name, strand, vec))
    return pd.DataFrame(
        rows, columns=["entity", "anchor_ts", "name", "strand", "vector"]
    )


def extract_features_oracle(
    events: pd.DataFrame, anchors: pd.DataFrame, cfg: FeatureConfig | None = None
) -> dict[str, pd.DataFrame]:
    cfg = cfg or FeatureConfig()
    feats = event_features_oracle(events, cfg)
    matrix = anchor_window_matrix_oracle(feats, anchors, cfg)
    if cfg.summary == "skip":
        summ = matrix
        vectors = skip_vectors_oracle(matrix)
    else:
        summ = summarize_oracle(matrix, cfg)
        vectors = summary_vectors_oracle(summ)
    return {
        "event_features": feats,
        "point_in_time": point_in_time_oracle(feats, anchors, cfg),
        "matrix": matrix,
        "summary": summ,
        "vectors": vectors,
    }
