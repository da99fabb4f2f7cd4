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


def cosine_prenorm(a: Column, b: Column, na: Column,
                   nb: Column) -> Column:
    """``cosine`` with the norms precomputed per ROW instead of per
    candidate PAIR: identical expression tree (dot / (na * nb), same
    left-to-right folds), so scores are bit-identical — but a
    candidate generated K times pays one interpreted dot fold, not
    three (guide §4: hoist loop-invariant work out of the per-pair
    path).  The norm columns must be built with ``_norm`` on the
    same vector."""
    return _dot(a, b) / (na * nb)


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def embedding_dim(path: str, vec_col: str = "embedding") -> int:
    """Vector dimensionality of a parquet embedding column, read
    driver-side from the file itself (one value from the first row
    group via pyarrow) — NO Spark job.  Parquet list schemas don't
    carry a fixed length, so a 1-value read is the cheapest
    authoritative source; on a cluster this is a footer+page read of
    a few KB, vs `.head()` which schedules a full Spark stage."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        part = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet"))
        if not part:
            raise ValueError(
                f"embedding_dim: no .parquet files under {path!r}")
        path = os.path.join(path, part[0])
    # scan forward for the first non-null vector (a NULL or empty
    # first row would otherwise yield TypeError / a wrong dim)
    for batch in pq.ParquetFile(path).iter_batches(
            batch_size=64, columns=[vec_col]):
        for v in batch.column(0):
            if v.is_valid and len(v) > 0:
                return len(v)
    raise ValueError(
        f"embedding_dim: column {vec_col!r} in {path!r} has no "
        f"non-null, non-empty vectors to sample")


def cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbours per query: broadcast the (small) query
    set against the item table; rank by (score desc, id asc) for a
    fully deterministic result."""
    q = F.broadcast(
        queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec"))
        .withColumn("_qn", _norm(F.col("_qvec"))))
    it = (items.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(vec_col).alias("_ivec"))
          .withColumn("_in", _norm(F.col("_ivec"))))
    scored = (it.crossJoin(q)
              .filter(F.col("neighbor_id") != F.col(query_id_col))
              .select(query_id_col, "neighbor_id",
                      cosine_prenorm(F.col("_ivec"), F.col("_qvec"),
                                     F.col("_in"), F.col("_qn"))
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


def multiprobe_flips(n_planes: int, multiprobe: int) -> list[tuple]:
    """Deterministic probe order: the exact signature first, then all
    bit-flip combinations of size 1..multiprobe in positional order.
    Shared by the Spark path and the DuckDB oracle generator."""
    from itertools import combinations

    flips: list[tuple] = [()]
    for d in range(1, multiprobe + 1):
        flips.extend(combinations(range(n_planes), d))
    return flips


def _probe_exprs(sig_col: Column, n_planes: int,
                 multiprobe: int) -> list[Column]:
    """One expression per probe signature: the original plus each
    bit-flip combination (all positions are literals, so these fold
    into plain substring/concat Catalyst expressions)."""
    probes = []
    for combo in multiprobe_flips(n_planes, multiprobe):
        if not combo:
            probes.append(sig_col)
            continue
        chars = []
        for i in range(n_planes):
            c = F.substring(sig_col, i + 1, 1)
            if i in combo:
                c = F.when(c == "1", F.lit("0")).otherwise(F.lit("1"))
            chars.append(c)
        probes.append(F.concat(*chars))
    return probes


def lsh_cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    n_planes: int = 12,
                    dim: int | None = None,
                    multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s).  At scale the bucket join replaces the O(N·Q)
    crossJoin with an equi-join on the signature.

    ``multiprobe`` probes the query's signature plus every bit-flip
    combination up to that Hamming distance (1 + Σ C(n_planes, d)
    buckets per query; default 1 → n_planes+1 probes), so queries in
    sparse buckets can still reach k candidates instead of silently
    returning fewer — the standard multi-probe LSH recall fix, and
    deterministic (fixed probe order), so the DuckDB oracle mirrors
    it bit-for-bit.  ``multiprobe=0`` restores single-bucket probing.
    Probe signatures are all distinct, so no candidate dedup is
    needed (an item lives in exactly one bucket)."""
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("_ivec")) \
              .withColumn("_in", _norm(F.col("_ivec"))) \
              .withColumn("sig", lsh_signature(F.col("_ivec"), n_planes,
                                               dim=dim))
    q = queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec")) \
               .withColumn("_qn", _norm(F.col("_qvec"))) \
               .withColumn("sig", lsh_signature(F.col("_qvec"), n_planes,
                                                dim=dim))
    if multiprobe > 0:
        probe_arr = F.array(*_probe_exprs(F.col("sig"), n_planes,
                                          multiprobe))
        q = q.select(query_id_col, "_qvec", "_qn",
                     F.explode(probe_arr).alias("sig"))
    scored = (it.join(F.broadcast(q), "sig")
              .filter(F.col("neighbor_id") != F.col(query_id_col))
              .select(query_id_col, "neighbor_id",
                      cosine_prenorm(F.col("_ivec"), F.col("_qvec"),
                                     F.col("_in"), F.col("_qn"))
                      .alias("score")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", "neighbor_id", "score"))


def _fold_cosine(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the exact left-to-right float fold
    Spark's aggregate() and DuckDB's list_reduce use — bit-identical
    across all three, so centroid selection ties break identically."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    for x in a:
        na = na + x * x
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def farthest_first_centroids(sample: list[tuple], n_centroids: int
                             ) -> list[tuple[int, list[float]]]:
    """Deterministic farthest-first traversal over an md5-ordered
    sample: start at the sample's md5-smallest point, then repeatedly
    take the point whose max-cosine to the chosen set is smallest
    (i.e. the farthest), tie-broken by sample order.  Pure driver-side
    arithmetic with the cross-engine float fold (``_fold_cosine``) so
    the DuckDB oracle reproduces the identical centroid set.

    ``sample``: [(id, vec)] already in md5(id) order."""
    if not sample:
        return []
    chosen = [0]
    chosen_set = {0}  # membership test: the list keeps output order
    # max cosine to the chosen set, per sample point
    best = [_fold_cosine(v, sample[0][1]) for _, v in sample]
    while len(chosen) < min(n_centroids, len(sample)):
        far_i, far_v = None, None
        for i, (_, v) in enumerate(sample):
            if i in chosen_set:
                continue
            if far_i is None or best[i] < far_v:
                far_i, far_v = i, best[i]
        chosen.append(far_i)
        chosen_set.add(far_i)
        cv = sample[far_i][1]
        for i, (_, v) in enumerate(sample):
            c = _fold_cosine(v, cv)
            if c > best[i]:
                best[i] = c
    return [(rank + 1, sample[i][1]) for rank, i in enumerate(chosen)]


def ivf_cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    n_centroids: int = 16, nprobe: int = 4,
                    sample_size: int = 256) -> DataFrame:
    """IVF-style approximate top-k: deterministic farthest-first
    centroids over an md5-ordered sample (spread across the space —
    no RNG, no Lloyd float nondeterminism), inverted cells via
    broadcast argmax assignment, queries probe their nprobe nearest
    cells, exact cosine rerank on the candidates.

    Seeding: take the ``sample_size`` items with smallest
    md5(id) — a deterministic uniform sample, a top-K not a global
    sort — collect that tiny set to the driver and run
    farthest-first there (O(sample·n_centroids) float ops).  The
    selected centroids are broadcast back as literals; at 100 TB the
    corpus is touched once for the top-K sample and once for
    assignment.

    At scale the items×centroids assignment is a broadcast
    nested-loop over a tiny centroid table, the cell table is
    materialized once, and each query touches ~nprobe/n_centroids of
    the corpus instead of all of it.
    """
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("_ivec"))
    sample_rows = (it
                   .orderBy(F.md5(F.col("neighbor_id").cast("string"))
                            .asc(),
                            F.col("neighbor_id").asc())
                   .limit(sample_size)
                   .collect())
    seeds = farthest_first_centroids(
        [(r.neighbor_id, list(r._ivec)) for r in sample_rows],
        n_centroids)
    centroids = F.broadcast(
        items.sparkSession.createDataFrame(
            [(cell, vec) for cell, vec in seeds],
            "cell int, _cvec array<double>")
        .withColumn("_cn", _norm(F.col("_cvec"))))

    def assign(df, vec, norm_col, keep, n_best):
        scored = df.crossJoin(centroids).select(
            *keep, "cell",
            cosine_prenorm(F.col(vec), F.col("_cvec"),
                           F.col(norm_col), F.col("_cn"))
            .alias("_cs"))
        w = (Window.partitionBy(*keep)
             .orderBy(F.col("_cs").desc(), F.col("cell").asc()))
        return (scored.withColumn("_cr", F.row_number().over(w))
                .filter(F.col("_cr") <= n_best)
                .drop("_cs", "_cr"))

    it = it.withColumn("_in", _norm(F.col("_ivec")))
    cells = assign(it, "_ivec", "_in",
                   ["neighbor_id", "_ivec", "_in"], 1)
    q = queries.select(F.col(query_id_col),
                       _as_double(vec_col).alias("_qvec")) \
               .withColumn("_qn", _norm(F.col("_qvec")))
    probes = assign(q, "_qvec", "_qn",
                    [query_id_col, "_qvec", "_qn"], nprobe)

    cand = (cells.join(probes, "cell")
            .filter(F.col("neighbor_id") != F.col(query_id_col))
            .select(query_id_col, "neighbor_id",
                    cosine_prenorm(F.col("_ivec"), F.col("_qvec"),
                                   F.col("_in"), F.col("_qn"))
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

    The DuckDB oracle (EMBEDDING_NEAR_DUP_SQL) models NO cap: parity
    is exact only while every bucket is at or under ``max_bucket``
    (assert ``dropped_buckets`` empty to prove it for a new corpus).
    The attribute lives on THIS DataFrame object only; further
    transformations return a new DataFrame without it.  Default
    changed None -> 10_000 in round 3.
    """
    it = (items.select(F.col(id_col), _as_double(vec_col).alias("_v"))
          .withColumn("_n", _norm(F.col("_v"))))
    band_arr = F.array(*[
        F.struct(F.lit(bnd).alias("band_id"),
                 lsh_signature(F.col("_v"), planes_per_band,
                               plane_offset=bnd * planes_per_band,
                               dim=dim)
                 .alias("sig"))
        for bnd in range(bands)])
    banded = (it.select(id_col, "_v", "_n",
                        F.explode(band_arr).alias("b"))
              .select(id_col, "_v", "_n", "b.band_id", "b.sig"))
    dropped = None
    if max_bucket is not None:
        # window count on the join key (single shuffle, reusable by
        # the self-join's exchange) instead of groupBy+semi-join
        w = Window.partitionBy("band_id", "sig")
        banded = banded.withColumn("_bn", F.count("*").over(w))
        dropped = (banded.filter(F.col("_bn") > max_bucket)
                   .select("band_id", "sig",
                           F.col("_bn").alias("n_members"))
                   .distinct())
        banded = banded.filter(F.col("_bn") <= max_bucket) \
                       .drop("_bn")
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
                    cosine_prenorm(F.col("a._v"), F.col("b._v"),
                                   F.col("a._n"), F.col("b._n"))
                    .alias("score"))
            .filter(F.col("score") >= threshold))
    out = cand.dropDuplicates(["id_a", "id_b"])
    out.dropped_buckets = dropped
    return out
