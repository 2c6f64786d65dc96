"""Stage registry + config validation (the pluggy hookspec /
voluptuous schema analog, hookspecs.py:26-135, fextract/schemas.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lbf_spark import fixtures, oracle
from lbf_spark.plans import pipeline as P
from lbf_spark.plans.registry import (
    STAGES,
    InvalidStageConfigError,
    get_stage,
    register_stage,
    resolve_stages,
    validate_config,
)


def test_default_stages_registered():
    for name in ["event_features", "point_in_time", "matrix", "summary"]:
        spec = get_stage(name)
        assert callable(spec.fn) and spec.config_cls is P.FeatureConfig


def test_validate_config_coerces_and_defaults():
    cfg = validate_config(
        "feature_pipeline", P.FeatureConfig,
        {"span": "4000", "bucket_w": 200.0, "summary": "median"},
    )
    assert cfg.span == 4000 and isinstance(cfg.span, int)
    assert cfg.bucket_w == 200 and isinstance(cfg.bucket_w, int)
    assert cfg.summary == "median"
    assert cfg.flank_n == 5  # default preserved


def test_validate_config_named_errors():
    with pytest.raises(InvalidStageConfigError, match="unknown keys.*spam"):
        validate_config("s", P.FeatureConfig, {"spam": 1})
    with pytest.raises(InvalidStageConfigError, match="s.span.*expected int"):
        validate_config("s", P.FeatureConfig, {"span": "not-a-number"})
    with pytest.raises(InvalidStageConfigError, match="non-integral"):
        validate_config("s", P.FeatureConfig, {"span": 1.5})
    with pytest.raises(InvalidStageConfigError, match="may not be null"):
        validate_config("s", P.FeatureConfig, {"span": None})
    # Optional field accepts null
    assert validate_config("s", P.FeatureConfig, {"weight_col": None}).weight_col is None


def test_register_duplicate_guard():
    with pytest.raises(ValueError, match="already registered"):
        register_stage("matrix", lambda *a: None)
    with pytest.raises(KeyError, match="unknown stage"):
        resolve_stages({"nope": lambda *a: None})


def test_custom_stage_runs_in_pipeline(spark, tmp_path):
    """Register a custom summary stage (hookimpl analog) and run it via
    run_pipeline: signal = max - min per bucket instead of mean."""
    def summary_range(matrix, cfg):
        return matrix.groupBy("entity", "name", "bucket").agg(
            (F.max("cov_norm") - F.min("cov_norm")).alias("signal")
        )

    register_stage(
        "summary_range", summary_range, P.FeatureConfig,
        "cross-anchor range summary", replace=True,
    )
    ev_pd = fixtures.generate_events(n_rows=600, n_entities=3)
    an_pd = fixtures.generate_anchors(ev_pd, n_per_entity=4)
    ev = fixtures.events_to_spark(spark, ev_pd)
    an = fixtures.anchors_to_spark(spark, an_pd)
    cfg = P.FeatureConfig()
    metrics = P.run_pipeline(
        ev, an, cfg, str(tmp_path / "ckpt"), spark,
        stages={"summary": "summary_range"},  # resolve by registered name
    )
    assert metrics["n_vectors"] > 0
    # the override must actually change the numbers vs the default path
    golden = oracle.extract_features_oracle(ev_pd, an_pd, cfg)
    m = golden["matrix"]
    exp = (
        m.groupby(["entity", "name", "bucket"])["cov_norm"]
        .agg(lambda s: s.max() - s.min())
        .reset_index(name="signal")
    )
    got = (
        P.extract_features(ev, an, cfg, stages={"summary": summary_range})
        ["summary"].toPandas()
        .sort_values(["entity", "name", "bucket"], ignore_index=True)
    )
    exp = exp.sort_values(["entity", "name", "bucket"], ignore_index=True)
    assert len(got) == len(exp)
    assert np.allclose(got["signal"], exp["signal"], rtol=1e-9, atol=1e-12)
    STAGES.pop("summary_range", None)


def test_validate_config_rejects_bool_for_numeric():
    with pytest.raises(InvalidStageConfigError, match="expected int, got bool"):
        validate_config("s", P.FeatureConfig, {"span": True})
