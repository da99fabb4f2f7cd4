"""Entity linking: mention blocking -> candidate pairs -> canonical ids.

north_rule stages J5/J6 (SURVEY.md §2.3): min-hash LSH candidate
blocking over mention labels, then connected components over the
candidate-pair graph for canonicalization.

All hashing is md5-based (portable: identical in Spark and the DuckDB
oracle) and every stage is pure DataFrame ops — the LSH band join is
an equi-join on (band_id, band_hash), which Catalyst executes as a
shuffled hash join with AQE skew splitting on hot bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEMA_NS = "http://schema.org/"


def entity_mentions(triples: DataFrame,
                    name_pred: str = SCHEMA_NS + "name") -> DataFrame:
    """Mention table from the extracted KG: (mention IRI, surface
    label, normalized blocking key)."""
    return (triples.filter(F.col("pred") == name_pred)
            .select(F.col("subj").alias("mention"),
                    F.col("obj").alias("label"),
                    F.regexp_replace(F.lower("obj"), "[^a-z0-9]", "")
                     .alias("entity_key")))


def exact_candidate_pairs(mentions: DataFrame) -> DataFrame:
    """Blocking on the normalized key: distinct label pairs that share
    a key (self-join; the small side of each block stays in-block so
    the join never fans out beyond block sizes)."""
    labels = mentions.select("entity_key", "label").distinct()
    a, b = labels.alias("a"), labels.alias("b")
    return (a.join(b, "entity_key")
            .filter(F.col("a.label") < F.col("b.label"))
            .select("entity_key",
                    F.col("a.label").alias("label_a"),
                    F.col("b.label").alias("label_b")))


# ---------------------------------------------------------------------------
# MinHash LSH over character/word shingles (portable md5 hashing)
# ---------------------------------------------------------------------------

def with_shingles(df: DataFrame, text_col: str, n: int = 3,
                  out: str = "shingles") -> DataFrame:
    """Word n-gram shingles as an array column (built-ins only)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(
        F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(toks, i + 1, n)))
    return df.withColumn(out, F.array_distinct(sh))


def with_minhash(df: DataFrame, shingle_col: str = "shingles",
                 num_hashes: int = 32,
                 out: str = "minhash") -> DataFrame:
    """num_hashes md5-minima over the shingle set.

    h_i(s) = md5(i || ':' || s); the per-row cost is
    num_hashes × |shingles| md5 calls, all inside whole-stage codegen
    (no Python).  Minima of hex strings are taken lexicographically —
    identical semantics in any engine with md5().
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    mh = F.transform(
        seeds,
        lambda i: F.array_min(F.transform(
            F.col(shingle_col),
            lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))))
    return df.withColumn(out, mh)


def lsh_candidate_pairs(df: DataFrame, id_col: str,
                        text_col: str, n: int = 3,
                        num_hashes: int = 32, bands: int = 8,
                        keep_cols: tuple = ()) -> DataFrame:
    """MinHash-LSH near-duplicate candidates: shingle -> minhash ->
    band -> bucket equi-join.  rows/bands = num_hashes // bands
    signatures per band; a pair collides if any band matches."""
    rows_per_band = num_hashes // bands
    sig = with_minhash(with_shingles(df, text_col, n), "shingles",
                       num_hashes)
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.md5(F.concat_ws(
                "|", F.slice(F.col("minhash"),
                             b * rows_per_band + 1, rows_per_band)))
             .alias("band_hash")))
    banded = (sig.select(id_col, *keep_cols,
                         F.explode(band_arr).alias("band"))
              .select(id_col, *keep_cols,
                      "band.band_id", "band.band_hash"))
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, ["band_id", "band_hash"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def canonicalize(mentions: DataFrame,
                 pairs: DataFrame | None = None) -> DataFrame:
    """Canonical entity ids: connected components over the
    candidate-pair graph on labels; mentions inherit their label's
    component.  Returns (mention, label, canonical_id)."""
    from .cc import connected_components

    if pairs is None:
        pairs = exact_candidate_pairs(mentions)
    comp = connected_components(pairs, "label_a", "label_b")
    out = (mentions.join(comp, mentions["label"] == comp["node"],
                         "left")
           .select("mention", "label",
                   F.coalesce("component", "label")
                    .alias("canonical_id")))
    return out
