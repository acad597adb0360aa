"""Similarity search over embedding columns (brief: brute-force cosine
top-k baseline + LSH-bucketed scale path).

Cosine math stays JVM-side via higher-order array functions: float32
elements are cast to double (exact), products of float32-valued doubles
are exact in double, and the left-to-right ``aggregate`` sum matches
DuckDB's ``list_cosine_similarity`` bit-for-bit — which is what lets the
DuckDB oracle value-hash the scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: str, b: str) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id.

    Plan shape: the query side is a handful of rows → ``broadcast`` —
    the scan side streams once, no shuffle until the tiny top-k window.
    Ties broken by neighbor id for determinism.
    """
    from pyspark.sql.window import Window

    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
        .join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets, search within
    the query's bucket only (the IVF/LSH scale path; recall < 1 by design).

    Hyperplanes are deterministic: plane p weights dimension d with
    cos(p·D + d) — a fixed pseudo-random-ish but reproducible projection
    computed entirely with built-in expressions, so bucketing is
    JVM-side. At 10^12 rows the bucket join replaces the full scan per
    query with ~n/2^planes candidates.
    """
    from pyspark.sql.window import Window

    def bucket_col(vec: str) -> Column:
        bits = []
        for p in range(n_planes):
            proj = F.aggregate(
                F.transform(
                    F.col(vec),
                    lambda x, i: x.cast("double")
                    * F.cos(F.lit(float(p)) * F.size(F.col(vec)).cast("double") + i.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    with_bucket = emb.withColumn("bucket", bucket_col(vec_col))
    q = with_bucket.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    scored = (
        with_bucket.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
        )
        .join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
