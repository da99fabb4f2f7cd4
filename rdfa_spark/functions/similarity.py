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


def _plane_signs_py(plane: int, dim: int) -> list[float]:
    """Driver-side mirror of ``_plane_sign`` — same md5 formula, so
    the literal-array fast path below is bit-identical to the
    expression path."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{plane}:{i}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
    return out


def lsh_signature(vec: Column, n_planes: int = 12,
                  plane_offset: int = 0,
                  dim: int | None = None) -> Column:
    """n-bit bucket signature: sign of <v, r_p> per plane, as a bit
    string.  ``plane_offset`` selects an independent plane family so
    multi-band constructions can derive per-band signatures.

    When ``dim`` is known, the (data-independent) plane signs are
    precomputed driver-side and embedded as literal arrays — the
    per-row work drops from n_planes·dim md5 calls to a zip_with
    product fold, with bit-identical output (the signs come from the
    same md5 formula)."""
    if dim is not None:
        bits = []
        for p in range(n_planes):
            signs = _plane_signs_py(plane_offset + p, dim)
            sign_arr = F.array(*[F.lit(s) for s in signs])
            dot = F.aggregate(
                F.zip_with(vec, sign_arr, lambda v, s: v * s),
                F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(dot >= 0, F.lit("1"))
                        .otherwise(F.lit("0")))
        return F.concat(*bits)
    dims = F.transform(vec, lambda v, i: F.struct(
        v.alias("v"), i.alias("i")))
    bits = [
        F.when(
            F.aggregate(dims, F.lit(0.0),
                        lambda acc, s: acc + s["v"]
                        * _plane_sign(plane_offset + p, s["i"])) >= 0,
            F.lit("1")).otherwise(F.lit("0"))
        for p in range(n_planes)
    ]
    return F.concat(*bits)


def lsh_cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    n_planes: int = 12,
                    dim: int | None = None) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket.  At scale the bucket join replaces the O(N·Q) crossJoin
    with an equi-join on the signature; recall rises with fewer
    planes / multi-probe."""
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("_ivec")) \
              .withColumn("sig", lsh_signature(F.col("_ivec"), n_planes,
                                               dim=dim))
    q = queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec")) \
               .withColumn("sig", lsh_signature(F.col("_qvec"), n_planes,
                                                dim=dim))
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
                             bands: int = 4,
                             planes_per_band: int = 8,
                             max_bucket: int | None = 10_000,
                             dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-band
    hyperplane-LSH (never all-pairs at scale).

    OR-construction over ``bands`` independent plane families, AND
    within a band (all ``planes_per_band`` signs must match): a pair
    is a candidate if it collides in ANY band.  Bucket count is
    bands × 2^planes_per_band and expected bucket size N /
    2^planes_per_band — raise ``planes_per_band`` as the corpus grows
    (each +1 halves bucket size at a small recall cost that the extra
    bands win back), instead of the single fixed-signature variant
    whose buckets grow linearly with N.

    ``max_bucket`` (ON by default) drops buckets with more members
    than the cap (mass-duplicated boilerplate clusters; exact dedup
    handles those far cheaper than pairwise scoring, which would emit
    ~size²/2 pairs per bucket).  Dropped buckets are reported via
    ``result.dropped_buckets`` (band_id, sig, n_members) — never a
    silent truncation.
    """
    it = items.select(F.col(id_col), _as_double(vec_col).alias("_v"))
    band_arr = F.array(*[
        F.struct(F.lit(bnd).alias("band_id"),
                 lsh_signature(F.col("_v"), planes_per_band,
                               plane_offset=bnd * planes_per_band,
                               dim=dim)
                 .alias("sig"))
        for bnd in range(bands)])
    banded = (it.select(id_col, "_v", F.explode(band_arr).alias("b"))
              .select(id_col, "_v", "b.band_id", "b.sig"))
    dropped = None
    if max_bucket is not None:
        sizes = banded.groupBy("band_id", "sig").agg(
            F.count("*").alias("_bn"))
        dropped = (sizes.filter(F.col("_bn") > max_bucket)
                   .select("band_id", "sig",
                           F.col("_bn").alias("n_members")))
        banded = banded.join(
            sizes.filter(F.col("_bn") <= max_bucket)
                 .select("band_id", "sig"),
            ["band_id", "sig"])
    # materialize signatures once; the self-join would recompute the
    # plane arithmetic on both sides otherwise
    banded = banded.localCheckpoint(eager=False)
    a, b = banded.alias("a"), banded.alias("b")
    # score inside the bucket join and threshold BEFORE the pair
    # dedup: the dedup shuffle then carries only surviving near-dup
    # pairs (3 narrow columns), not every candidate with two vectors
    cand = (a.join(b, ["band_id", "sig"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    cosine(F.col("a._v"), F.col("b._v"))
                    .alias("score"))
            .filter(F.col("score") >= threshold))
    out = cand.dropDuplicates(["id_a", "id_b"])
    out.dropped_buckets = dropped
    return out
