"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash-LSH near-dup, n-gram Jaccard
verification, SimHash — all built-ins (md5/portable hashing, no
Python in the hot path).  The LSH path reuses
rdfa_spark.pipeline.linking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .linking import lsh_candidate_pairs, with_shingles


def exact_duplicate_groups(df: DataFrame, id_col: str,
                           text_col: str) -> DataFrame:
    """Exact dedup: md5 fingerprint groups with >1 member.
    Map-side partial agg keeps the shuffle to (hash, count) pairs."""
    return (df.select(F.md5(F.col(text_col)).alias("fingerprint"),
                      F.col(id_col))
            .groupBy("fingerprint")
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keeper"))
            .filter(F.col("n_dups") > 1))


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the smallest id per exact-content group (deterministic)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        candidates: DataFrame | None = None,
                        shingles: DataFrame | None = None
                        ) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (verification step
    after LSH blocking; all-pairs only if candidates is None and the
    input is small).

    ``shingles`` optionally supplies a precomputed (id, shingles)
    table — e.g. the shared kernel output of ``minhash_dedup_pairs``
    — skipping the interpreted higher-order-function re-tokenization
    here entirely.  Jaccard is a pure SET computation
    (array_intersect / array_union sizes), so any table with the same
    distinct-shingle sets yields identical scores regardless of
    element order."""
    if shingles is not None:
        sh = shingles.select(F.col(id_col), F.col("shingles"))
    else:
        sh = with_shingles(df, text_col, n).select(
            F.col(id_col), F.col("shingles"))
        if candidates is not None:
            # the shingle table feeds BOTH sides of the verification
            # join; materialize it once instead of re-tokenizing the
            # corpus per side (at cluster scale this is the persisted
            # shingle/signature table the LSH stage already built)
            sh = sh.localCheckpoint(eager=False)
    if candidates is None:
        a = sh.alias("a")
        b = sh.alias("b")
        pairs = (a.crossJoin(b)
                 .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    else:
        pairs = (candidates
                 .join(sh.withColumnRenamed(id_col, "id_a")
                         .withColumnRenamed("shingles", "sh_a"), "id_a")
                 .join(sh.withColumnRenamed(id_col, "id_b")
                         .withColumnRenamed("shingles", "sh_b"), "id_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        return (pairs.select(
                    "id_a", "id_b",
                    (inter / union).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))
    inter = F.size(F.array_intersect(F.col("a.shingles"),
                                     F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"),
                                 F.col("b.shingles")))
    return (pairs.select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"),
                         (inter / union).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, num_hashes: int = 32,
                        bands: int = 8,
                        jaccard_threshold: float = 0.5) -> DataFrame:
    """Scale path: LSH blocking then exact-Jaccard verification on the
    candidates only (never all-pairs).

    One Arrow kernel pass produces BOTH the minhash signatures (for
    the banded LSH join) and the distinct shingle sets (for the
    Jaccard verification); the combined table is materialized once
    (localCheckpoint — at cluster scale, the persisted signature
    table).  Previously the corpus was tokenized twice more through
    interpreted Catalyst higher-order functions for the verify join.
    """
    from .linking import minhash_signatures

    sig_sh = minhash_signatures(df, id_col, text_col, n, num_hashes,
                                with_shingle_col=True) \
        .localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(df, id_col, text_col, n,
                                num_hashes, bands,
                                sig=sig_sh.select(id_col, "minhash"))
    return ngram_jaccard_pairs(df, id_col, text_col, n,
                               jaccard_threshold, candidates=cands,
                               shingles=sig_sh.select(id_col,
                                                      "shingles"))


def simhash64(df: DataFrame, id_col: str, text_col: str,
              out: str = "simhash") -> DataFrame:
    """64-bit SimHash as a 64-char bit string: per-token md5-derived
    bit vectors, majority vote per bit.  Pure built-ins (no Python in
    the hot path); the bit-string representation is engine-portable
    (the DuckDB oracle can reproduce it with the same md5 math)."""
    toks = F.array_distinct(
        F.split(F.lower(F.col(text_col)), r"\s+"))

    def tok_bits(t):
        # 64 bits from md5: two 8-hex-digit halves -> bin(), lpad
        h = F.md5(t)
        hi = F.lpad(F.bin(F.conv(F.substring(h, 1, 8), 16, 10)
                          .cast("long")), 32, "0")
        lo = F.lpad(F.bin(F.conv(F.substring(h, 9, 8), 16, 10)
                          .cast("long")), 32, "0")
        # split with a lookahead keeps a trailing "" (limit -1);
        # slice to exactly the 64 bit characters
        chars = F.slice(F.split(F.concat(hi, lo), "(?!^)"), 1, 64)
        return F.transform(chars, lambda c: F.when(c == "1", 1)
                           .otherwise(-1))

    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(acc, tok_bits(t),
                                  lambda a, b: a + b))
    bits = F.array_join(
        F.transform(votes, lambda v: F.when(v > 0, "1").otherwise("0")),
        "")
    return df.withColumn(out, bits)


def simhash_near_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                           max_hamming: int = 3,
                           block_bits: int = 16,
                           max_block: int | None = 10_000) -> DataFrame:
    """SimHash near-dup: block on each 16-bit word of the signature (a
    pair within Hamming distance 3 must agree on at least one of 4
    words — pigeonhole), then verify Hamming distance on candidates
    only.  Join is an equi-join on (word_id, word) — shuffled hash
    join with AQE skew handling.

    ``max_block`` (ON by default) drops word-blocks above the cap
    (identical-content clusters share every block; exact dedup handles
    those in one groupBy instead of ~K²/2 pairwise checks per block).
    Dropped blocks are reported, never silent:
    ``result.dropped_blocks`` is a DataFrame
    (word_id, word, n_members) of every block the cap excluded.

    The DuckDB oracle (_dedup_simhash_sql) models NO cap: parity is
    exact only while every block is at or under ``max_block`` (assert
    ``dropped_blocks`` empty to prove it for a new corpus).  The
    attribute lives on THIS DataFrame object only; transformations
    return a new DataFrame without it.  Default changed None ->
    10_000 in round 3."""
    sh = simhash64(df, id_col, text_col).select(id_col, "simhash")
    n_words = 64 // block_bits
    words = F.expr(
        f"transform(sequence(0, {n_words - 1}), w -> struct("
        f"w as word_id, substring(simhash, w * {block_bits} + 1, "
        f"{block_bits}) as word))")
    blocked = sh.select(id_col, "simhash",
                        F.explode(words).alias("b")) \
                .select(id_col, "simhash", "b.word_id", "b.word")
    dropped = None
    if max_block is not None:
        # window count on the join key (single shuffle, reusable by
        # the self-join's exchange) instead of groupBy+semi-join
        w = Window.partitionBy("word_id", "word")
        blocked = blocked.withColumn("_bn", F.count("*").over(w))
        dropped = (blocked.filter(F.col("_bn") > max_block)
                   .select("word_id", "word",
                           F.col("_bn").alias("n_members"))
                   .distinct())
        blocked = blocked.filter(F.col("_bn") <= max_block) \
                         .drop("_bn")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (a.join(b, ["word_id", "word"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct())
    hamming = F.expr("size(filter(zip_with(split(sh_a, '(?!^)'), "
                     "split(sh_b, '(?!^)'), (x, y) -> x <> y), "
                     "d -> d))")
    out = (cand.select("id_a", "id_b", hamming.alias("hamming"))
           .filter(F.col("hamming") <= max_hamming))
    out.dropped_blocks = dropped
    return out


def filter_corpus(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_score_pm: int = 500,
                  languages: tuple[str, ...] | None = None,
                  dedup: bool = True) -> DataFrame:
    """Composed training-corpus filter: quality gate -> language
    allowlist -> exact dedup, as one DataFrame pipeline.

    The three stages compose into a single plan: the quality columns
    are pure projections (whole-stage codegen), the language filter
    runs the Arrow lang-ID kernel only on quality survivors (filter
    pushdown ahead of the expensive stage), and exact dedup is the
    one shuffle, keyed on the md5 fingerprint of the survivors only.
    Returns the surviving rows of ``df`` with the quality and
    ``lang_pred`` columns attached.
    """
    from ..functions.text import (language_id_kernel,
                                  with_quality_score)

    scored = with_quality_score(df, text_col)
    kept = scored.filter(F.col("q_score_pm") >= min_score_pm)
    if languages is not None:
        langs = language_id_kernel(kept.select(id_col, text_col),
                                   id_col, text_col)
        kept = (kept.join(langs, id_col)
                .filter(F.col("lang_pred").isin(*languages)))
    if dedup:
        kept = dedup_exact(kept, id_col, text_col)
    return kept
