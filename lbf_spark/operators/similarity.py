"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, fully JVM-side via
``F.zip_with``/``F.aggregate`` dot products (no Python in the hot
path). Scale path: seeded random-hyperplane LSH bucketing — candidates
come from an equi-join on bucket signature, so the n² blowup never
materializes; recall is tunable with (n_planes, n_tables).

At 10^12 rows the baseline is only used query-side (small probe set ×
big corpus, probe set broadcast); the LSH variant is the corpus-scale
path. An IVF variant would swap the hash for a learned centroid
assignment — same join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity_col(a, b):
    """cosine(a, b) as a JVM column expression (double)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return dot / (_norm_col(a) * _norm_col(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe over the corpus.

    Probe side is broadcast (queries are few; corpus is huge). Ranking
    key is (rounded sim desc, neighbor id asc) — fully deterministic
    across engines/float orders. Self-matches excluded.
    """
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec")
    )
    sim = cosine_similarity_col(
        F.col("probe_vec").cast("array<double>"), F.col("cand_vec").cast("array<double>")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(p, F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("sim", sim)
        .select("probe_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "neighbor_id", "sim", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int, table: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 7919 * table)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_ids(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: (table, bucket) signature per vector.
    Vectorized numpy matmul per Arrow batch — one Python pass, tiny
    output (two ints per table per row)."""
    planes = [_hyperplanes(dim, n_planes, seed, t) for t in range(n_tables)]
    schema = T.StructType(
        [
            T.StructField("vid", T.LongType(), False),
            T.StructField("table_id", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )
    pows = (2 ** np.arange(n_planes)).astype(np.int64)

    def batches(it):
        for pdf in it:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            out = []
            for t, P in enumerate(planes):
                bits = (vecs @ P.T) > 0
                buckets = (bits @ pows).astype(np.int64)
                out.append(
                    pd.DataFrame(
                        {"vid": ids, "table_id": np.int32(t), "bucket": buckets}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(batches, schema)


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket candidates (any table)
    → exact cosine verify ≥ threshold. Output (id_a, id_b, sim)."""
    buckets = lsh_bucket_ids(df, dim, n_planes, n_tables, seed, id_col, vec_col)
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    sim = cosine_similarity_col(F.col("va"), F.col("vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        cands.join(vecs.withColumnsRenamed({id_col: "id_a", "v": "va"}), "id_a")
        .join(vecs.withColumnsRenamed({id_col: "id_b", "v": "vb"}), "id_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def exact_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """O(n²) exact cosine pairs ≥ threshold — correctness oracle / small
    tables only (the DuckDB-checkable ground truth for the LSH path)."""
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a, b = vecs.alias("a"), vecs.alias("b")
    sim = cosine_similarity_col(F.col("a.v"), F.col("b.v"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
