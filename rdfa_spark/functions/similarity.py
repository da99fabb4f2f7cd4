"""Embedding similarity search over array<float> columns.

* brute-force cosine top-k — the exact baseline (broadcast the query
  set, JVM-side zip_with/aggregate arithmetic, window top-k);
* LSH-bucketed approximate variant — the scale path: deterministic
  random-hyperplane signatures (signs derived from md5, no data
  dependence), candidates only within matching buckets.

Dot products fold left-to-right in both Spark and DuckDB, so scores
are bit-identical across engines (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0),
                       lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbours per query: broadcast the (small) query
    set against the item table; rank by (score desc, id asc) for a
    fully deterministic result."""
    q = F.broadcast(
        queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec")))
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("_ivec"))
    scored = (it.crossJoin(q)
              .filter(F.col("neighbor_id") != F.col(query_id_col))
              .select(query_id_col, "neighbor_id",
                      cosine(F.col("_ivec"), F.col("_qvec"))
                      .alias("score")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", "neighbor_id", "score"))


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — deterministic, data-independent planes
# ---------------------------------------------------------------------------

def _plane_sign(plane: int, dim: Column) -> Column:
    """±1 from md5(plane, dim): deterministic pseudo-random
    hyperplane components, identical on every executor and engine."""
    h = F.md5(F.concat(F.lit(f"{plane}:"), dim.cast("string")))
    bit = F.conv(F.substring(h, 1, 1), 16, 10).cast("int") % 2
    return F.when(bit == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_signature(vec: Column, n_planes: int = 12) -> Column:
    """n-bit bucket signature: sign of <v, r_p> per plane, as a bit
    string."""
    dims = F.transform(vec, lambda v, i: F.struct(
        v.alias("v"), i.alias("i")))
    bits = [
        F.when(
            F.aggregate(dims, F.lit(0.0),
                        lambda acc, s: acc + s["v"]
                        * _plane_sign(p, s["i"])) >= 0,
            F.lit("1")).otherwise(F.lit("0"))
        for p in range(n_planes)
    ]
    return F.concat(*bits)


def lsh_cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    n_planes: int = 12) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket.  At scale the bucket join replaces the O(N·Q) crossJoin
    with an equi-join on the signature; recall rises with fewer
    planes / multi-probe."""
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("_ivec")) \
              .withColumn("sig", lsh_signature(F.col("_ivec"), n_planes))
    q = queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec")) \
               .withColumn("sig", lsh_signature(F.col("_qvec"), n_planes))
    scored = (it.join(F.broadcast(q), "sig")
              .filter(F.col("neighbor_id") != F.col(query_id_col))
              .select(query_id_col, "neighbor_id",
                      cosine(F.col("_ivec"), F.col("_qvec"))
                      .alias("score")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", "neighbor_id", "score"))


def ivf_cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    n_centroids: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF-style approximate top-k: deterministic centroids (the
    first n_centroids item vectors by id — no RNG, no Lloyd float
    nondeterminism), inverted cells via broadcast argmax assignment,
    queries probe their nprobe nearest cells, exact cosine rerank on
    the candidates.

    At scale the items×centroids assignment is a broadcast
    nested-loop over a tiny centroid table, the cell table is
    materialized once, and each query touches ~nprobe/n_centroids of
    the corpus instead of all of it.
    """
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("_ivec"))
    w_seed = Window.orderBy(F.col("neighbor_id").asc())
    centroids = F.broadcast(
        it.withColumn("_rn", F.row_number().over(w_seed))
          .filter(F.col("_rn") <= n_centroids)
          .select(F.col("_rn").alias("cell"),
                  F.col("_ivec").alias("_cvec")))

    def assign(df, vec, keep, n_best):
        scored = df.crossJoin(centroids).select(
            *keep, "cell", cosine(F.col(vec), F.col("_cvec"))
            .alias("_cs"))
        w = (Window.partitionBy(*keep)
             .orderBy(F.col("_cs").desc(), F.col("cell").asc()))
        return (scored.withColumn("_cr", F.row_number().over(w))
                .filter(F.col("_cr") <= n_best)
                .drop("_cs", "_cr"))

    cells = assign(it, "_ivec", ["neighbor_id", "_ivec"], 1)
    q = queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec"))
    probes = assign(q, "_qvec", [query_id_col, "_qvec"], nprobe)

    cand = (cells.join(probes, "cell")
            .filter(F.col("neighbor_id") != F.col(query_id_col))
            .select(query_id_col, "neighbor_id",
                    cosine(F.col("_ivec"), F.col("_qvec"))
                    .alias("score"))
            .dropDuplicates([query_id_col, "neighbor_id"]))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col("neighbor_id").asc()))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", "neighbor_id", "score"))


def embedding_near_dup_pairs(items: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed self-join
    (never all-pairs at scale)."""
    it = items.select(F.col(id_col), _as_double(vec_col).alias("_v")) \
              .withColumn("sig", lsh_signature(F.col("_v"), n_planes))
    a, b = it.alias("a"), it.alias("b")
    return (a.join(b, "sig")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    cosine(F.col("a._v"), F.col("b._v")).alias("score"))
            .filter(F.col("score") >= threshold))
