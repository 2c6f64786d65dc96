"""Training-set assembly operators (operators/encoding.py) and the
Bloom-filter semi join (operators/joins.py:bloom_semi_join)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lbf_spark.operators import encoding as E
from lbf_spark.operators.joins import bloom_semi_join


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 400).select(F.col("id"))


def test_hash_split_stable_under_append(spark, ids):
    """A row's split depends only on its id: growing the table never
    reassigns existing rows."""
    w = {"train": 0.75, "val": 0.125, "test": 0.125}
    small = {
        r["id"]: r["split"]
        for r in E.hash_split(ids.filter(F.col("id") < 100), "id", w).collect()
    }
    big = {
        r["id"]: r["split"] for r in E.hash_split(ids, "id", w).collect()
    }
    assert all(big[i] == s for i, s in small.items())
    # all splits populated, proportions sane on 400 draws
    from collections import Counter

    c = Counter(big.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_hash_split_matches_hashlib_twin(spark, ids):
    got = {r["id"]: r["split"] for r in E.hash_split(ids, "id", {"a": 0.5, "b": 0.5}).collect()}
    for i in [0, 7, 131, 399]:
        u = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:13], 16) / float(1 << 52)
        assert got[i] == ("a" if u < 0.5 else "b")


def test_oof_excludes_own_fold(spark):
    """Hand-check: cat 'x' fold 0 is encoded from fold-1 rows only."""
    rows = [("x", 0, 10.0), ("x", 0, 20.0), ("x", 1, 100.0), ("y", 0, 50.0)]
    df = spark.createDataFrame(rows, ["cat", "fold", "t"])
    out = {
        (r["cat"], r["fold"]): r["target_enc"]
        for r in E.oof_target_encode(df, "cat", "t", "fold", smoothing=0.0)
        .select("cat", "fold", "target_enc")
        .distinct()
        .collect()
    }
    assert out[("x", 0)] == 100.0  # only the fold-1 row
    assert out[("x", 1)] == 15.0  # mean of fold-0 rows
    # cat 'y' exists only in fold 0: out-of-fold sample empty, m=0 -> NULL
    assert out[("y", 0)] is None


def test_oof_smoothing_pulls_to_prior(spark):
    rows = [("x", 0, 0.0), ("x", 1, 100.0), ("y", 0, 100.0), ("y", 1, 0.0)]
    df = spark.createDataFrame(rows, ["cat", "fold", "t"])
    out = {
        (r["cat"], r["fold"]): r["target_enc"]
        for r in E.oof_target_encode(df, "cat", "t", "fold", smoothing=1e6)
        .select("cat", "fold", "target_enc")
        .distinct()
        .collect()
    }
    for v in out.values():
        assert abs(v - 50.0) < 0.01  # prior = 50


def test_feature_hash_matches_hashlib_twin(spark):
    df = spark.createDataFrame(
        [(1, "en", "srcA"), (2, "de", None)], ["id", "lang", "source"]
    )
    got = {
        (r["id"], r["bucket"]): r["val"]
        for r in E.feature_hash(df, ["lang", "source"], 64, "id").collect()
    }

    def hb(s):
        h = hashlib.md5(s.encode()).hexdigest()
        return int(h[:13], 16) % 64, 1 if int(h[13], 16) % 2 == 0 else -1

    want = {}
    for i, pairs in [(1, ["lang=en", "source=srcA"]), (2, ["lang=de"])]:
        for p in pairs:
            b, s = hb(p)
            want[(i, b)] = want.get((i, b), 0) + s
    assert got == want  # NULL value contributes nothing


def test_tscv_zero_leakage_and_coverage(spark, tiny_events):
    from lbf_spark import fixtures

    ev = fixtures.events_to_spark(spark, tiny_events).select(
        "image_id", F.col("ts").alias("ts_us")
    )
    out = E.tscv_folds(ev, "ts_us", n_folds=3)
    # leakage: for every fold, min(test ts) > max(train ts)
    t = out.groupBy("fold", "role").agg(
        F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx")
    )
    rows = {(r["fold"], r["role"]): (r["mn"], r["mx"]) for r in t.collect()}
    for f in [1, 2, 3]:
        assert rows[(f, "test")][0] > rows[(f, "train")][1]
    # expanding: fold f+1's train superset of fold f's train
    tr = {
        f: {
            r["image_id"]
            for r in out.filter(
                (F.col("fold") == f) & (F.col("role") == "train")
            ).collect()
        }
        for f in [1, 2, 3]
    }
    assert tr[1] < tr[2] < tr[3]


def test_bloom_semi_join_equals_plain_semi(spark):
    probe = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("payload")
    )
    build = spark.range(0, 5000, 17).select(F.col("id").alias("k"))
    got = bloom_semi_join(probe, build, "k", m_bits=2048, k=3)
    want = probe.join(build, "k", "left_semi").select(*probe.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.columns == probe.columns


def test_bloom_semi_join_empty_build(spark):
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    build = probe.filter(F.lit(False))
    assert bloom_semi_join(probe, build, "k", m_bits=256).count() == 0


def test_bloom_prefilter_actually_prunes(spark):
    """The mask filter drops non-matching probe rows BEFORE the join:
    with a tiny build side, surviving candidates are far fewer than the
    probe (false positives bounded), and the filter is a plan-side
    substring predicate (no Python)."""
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    build = spark.createDataFrame([(3,), (7,)], ["k"])
    # reproduce only the pre-filter: mask-pass rows
    from lbf_spark.operators import joins as J

    out = bloom_semi_join(probe, build, "k", m_bits=16384, k=3)
    assert sorted(r["k"] for r in out.collect()) == [3, 7]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan.lower()
