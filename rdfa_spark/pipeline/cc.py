"""Connected components via iterative DataFrame self-joins.

north_rule stage: canonicalization of linked entities.  Implements
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature), which converges in O(log n) rounds and bounds the
per-round shuffle, plus a simpler min-label propagation for
small-diameter graphs.

Scale notes:
* node ids are strings (urls / mention IRIs) — no lossy 64-bit
  hashing of node ids, so no collision risk at 10^12 nodes;
* each round is one shuffle on the node key; AQE skew-join handles
  hot components, and `salt_hot_keys` pre-splits the giant-component
  star pattern that AQE can't fix inside an iterative loop
  (SURVEY.md §4);
* checkpointing every round cuts the lineage chain so round N's
  plan doesn't replay rounds 1..N-1.  ``reliable=False`` (default,
  sandbox/local) uses ``localCheckpoint`` — executor-memory-resident,
  lost on executor failure; on a real cluster with dynamic allocation
  pass ``reliable=True`` (requires ``sc.setCheckpointDir``) so rounds
  persist to reliable storage and survive executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .filter(F.col("a") != F.col("b")))
    return e.select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b")).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) both directions; connect strictly-larger neighbours of u
    to min(N(u) ∪ {u})."""
    nbrs = e.union(e.select(F.col("b").alias("a"),
                            F.col("a").alias("b")))
    mins = (nbrs.groupBy("a")
            .agg(F.least(F.min("b"), F.first("a")).alias("m")))
    return (nbrs.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """For edges (u,v) with v <= u: connect all small neighbours and u
    itself to the minimum."""
    nbrs = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    # now b <= a for every row
    mins = nbrs.groupBy("a").agg(F.min("b").alias("m"))
    moved = (nbrs.join(mins, "a")
             .select(F.col("b").alias("x"), F.col("m")))
    self_edges = mins.select(F.col("a").alias("x"), F.col("m"))
    return (moved.union(self_edges)
            .filter(F.col("x") != F.col("m"))
            .select(F.least("x", "m").alias("a"),
                    F.greatest("x", "m").alias("b"))
            .distinct())


def _checkpoint(df: DataFrame, reliable: bool) -> DataFrame:
    """Cut lineage: reliable (HDFS/object-store via
    ``sc.setCheckpointDir``) or executor-local."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(a, b))"),
                   F.lit(0)).alias("h"),
    ).first()
    return (row.n, row.h)


def _local_finish(e: DataFrame) -> DataFrame:
    """Finish a small (already size-checked) edge set driver-side:
    union-find, component = min node id — identical output contract
    to the distributed loop.  This is phase 2 of the standard
    two-phase design (Kiveris et al. §6 run their final rounds on a
    single machine once the contracted graph fits): distributed star
    rounds shrink the graph toward one edge per (node, component);
    long before that point the edge set is tiny relative to the
    cluster, and each additional round costs a full scheduling +
    checkpoint cycle to move ever less data.  The collect here is
    bounded by ``local_finish_edges`` rows (two short strings each),
    NOT by the input size."""
    spark = e.sparkSession
    rows = e.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:        # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r.a, r.b
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        m = comp_min.get(root)
        if m is None or node < m:
            comp_min[root] = node
    out = [(node, comp_min[find(node)]) for node in parent]
    # the labeling is bounded (<= 2 nodes per collected edge, i.e.
    # <= 2 x local_finish_edges short strings) but parallelize-backed
    # frames carry no size statistics, so without the hint a caller
    # joining mentions/nodes against it gets a sort-merge join with a
    # full shuffle of the big side (observed: 0.8 s vs 0.2 s for the
    # canonicalize label join at sf0.1).  Broadcast is safe by the
    # same bound that made the collect safe.
    return F.broadcast(
        spark.createDataFrame(out, "node string, component string"))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 30,
                         reliable: bool = False,
                         star_steps_per_round: int = 1,
                         local_finish_edges: int = 100_000
                         ) -> DataFrame:
    """-> (node, component) where component = min node id (string
    order) in the node's connected component.

    Isolated nodes (no edges) are not returned; union them in from
    the node table with component = node if needed.

    ``star_steps_per_round`` large/small-star alternations run
    between consecutive checkpoint + convergence probes.  Measured
    (sf0.1 chain graph): 1 -> 10.4 s, 2 -> 10.6 s, 3 -> 65 s — each
    star consumes its input TWICE (the union of both edge
    directions), so an un-checkpointed alternation roughly
    quadruples the logical plan and Catalyst/AQE planning time
    explodes; the per-round checkpoint is what keeps every round's
    plan constant-size.  Default stays 1; the knob exists because on
    a real cluster with expensive reliable checkpoints the tradeoff
    can differ (2 halves the checkpoint I/O for ~the same wall).
    A converged edge set is a fixpoint of the alternation, so extra
    steps past convergence can never change the result.

    ``local_finish_edges`` enables the two-phase design: whenever the
    current (canonicalized, deduped) edge count is at or under the
    threshold, the remaining contraction runs driver-side
    (``_local_finish`` — bounded collect + union-find, identical
    output).  The fingerprint probe each round already computes the
    count, so the check is free.  0 disables (pure distributed
    loop, e.g. for the A/B property tests).
    """
    e = _checkpoint(_canon_edges(edges, src, dst), reliable)
    prev = _fingerprint(e)
    if 0 < prev[0] <= local_finish_edges:
        return _local_finish(e)
    if prev[0] == 0:
        return edges.sparkSession.createDataFrame(
            [], "node string, component string")
    for _ in range(max_iter):
        for _s in range(max(star_steps_per_round, 1)):
            e = _small_star(_large_star(e))
        e = _checkpoint(e, reliable)
        cur = _fingerprint(e)
        if cur == prev:
            break
        if 0 < cur[0] <= local_finish_edges:
            return _local_finish(e)
        prev = cur
    # converged: every edge is (node -> component representative)
    members = e.select(F.col("b").alias("node"),
                       F.col("a").alias("component"))
    reps = e.select(F.col("a").alias("node"),
                    F.col("a").alias("component")).distinct()
    return members.union(reps).distinct()


SALT_MARKER = "￿#salt#"


def salt_hot_nodes(edges: DataFrame, max_degree: int = 100_000,
                   n_salts: int = 16, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Explicit skew salting for the iterative CC loop (north_rule;
    AQE can't re-plan inside an iteration — SURVEY.md §4).

    Nodes whose degree exceeds ``max_degree`` are split into
    ``n_salts`` replicas: each incident edge is rewired to the
    replica chosen by the *other* endpoint's hash, and replicas are
    chained back to the original node so connectivity is preserved.
    Replica names sort ABOVE every real node (marker = U+FFFF), so a
    replica can never become a component representative; drop them
    from the final labeling with ``strip_salt``.
    """
    return _salt_canonical(_canon_edges(edges, src, dst),
                           max_degree, n_salts)


def _salt_canonical(e: DataFrame, max_degree: int,
                    n_salts: int) -> DataFrame:
    """``salt_hot_nodes`` body over an already-canonicalized edge set
    (``_canon_edges`` output).  Split out so callers can checkpoint
    the canonical edges ONCE and have the degree aggregation, the two
    hot-node broadcast builds and the rewire pass all read the
    materialized set — un-checkpointed, each of those independent
    jobs re-executes the full upstream DAG (for
    ``connected_components_salted`` that meant ~3 extra passes over
    the raw-edge lineage: one per broadcast build plus the main
    pass)."""
    degrees = (e.select(F.col("a").alias("node"))
               .union(e.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count("*").alias("deg")))
    hot = degrees.filter(F.col("deg") > max_degree) \
                 .select(F.col("node").alias("hot_node"))

    def rewire(df, node_col, other_col):
        salt = F.pmod(F.xxhash64(F.col(other_col)), F.lit(n_salts))
        return F.when(
            F.col("hot_node").isNotNull(),
            F.concat(F.col(node_col), F.lit(SALT_MARKER),
                     salt.cast("string"))
        ).otherwise(F.col(node_col))

    e2 = (e.join(F.broadcast(hot), e["a"] == hot["hot_node"], "left")
          .select(rewire(e, "a", "b").alias("a"), "b")
          .join(F.broadcast(hot.withColumnRenamed("hot_node", "hb")),
                F.col("b") == F.col("hb"), "left")
          .select("a", F.when(
              F.col("hb").isNotNull(),
              F.concat(F.col("b"), F.lit(SALT_MARKER),
                       F.pmod(F.xxhash64(F.col("a")),
                              F.lit(n_salts)).cast("string")))
              .otherwise(F.col("b")).alias("b")))
    # chain each replica back to its original node
    chains = (hot.select(
        F.col("hot_node").alias("a"),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(n_salts - 1)),
            lambda i: F.concat(F.col("hot_node"), F.lit(SALT_MARKER),
                               i.cast("string")))).alias("b")))
    return e2.union(chains)


def strip_salt(labels: DataFrame) -> DataFrame:
    """Drop salt-replica rows from a (node, component) labeling."""
    return labels.filter(~F.col("node").contains(SALT_MARKER))


def connected_components_salted(edges: DataFrame, src: str = "src",
                                dst: str = "dst",
                                max_degree: int = 100_000,
                                n_salts: int = 16,
                                max_iter: int = 30,
                                reliable: bool = False) -> DataFrame:
    """CC with explicit hot-key salting applied up front.

    The canonical edge set is checkpointed before salting: the
    salting stage launches several independent jobs over it (degree
    aggregation feeding two broadcast builds, then the rewire pass),
    and without the checkpoint every one of those re-executes the
    caller's full edge lineage (guide §2.4/§5 — cut the lineage once,
    then fan out)."""
    e = _checkpoint(_canon_edges(edges, src, dst), reliable)
    salted = _salt_canonical(e, max_degree, n_salts)
    return strip_salt(
        connected_components(salted, "a", "b", max_iter, reliable))


def label_propagation_components(edges: DataFrame, src: str = "src",
                                 dst: str = "dst",
                                 max_iter: int = 30,
                                 reliable: bool = False) -> DataFrame:
    """Min-label propagation — O(diameter) rounds; simpler per-round
    plan, used as cross-check and for known small-diameter graphs."""
    e = _canon_edges(edges, src, dst)
    nbrs = (e.union(e.select(F.col("b").alias("a"),
                             F.col("a").alias("b")))
            )
    nbrs = _checkpoint(nbrs, reliable)
    labels = (nbrs.select(F.col("a").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("component")))
    for _ in range(max_iter):
        cand = (nbrs.join(labels,
                          nbrs["b"] == labels["node"])
                .select(nbrs["a"].alias("node"),
                        F.col("component")))
        new_labels = (labels.union(cand)
                      .groupBy("node")
                      .agg(F.min("component").alias("component")))
        new_labels = _checkpoint(new_labels, reliable)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    return labels
