"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries pair the Spark-first implementation (rdfa_spark package) with
an ANSI-SQL oracle; extraction queries are checkable in SQL because
pages are rendered deterministically from the documents table
(rdfa_spark/pages.py + rdfa_spark/oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rdfa_spark import oracle  # noqa: E402
from rdfa_spark.extract import (extract_text_df,  # noqa: E402
                                extract_triples, opengraph)
from rdfa_spark.pages import load_pages  # noqa: E402

SCHEMA_NS = "http://schema.org/"


def _triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_triples(load_pages(spark, sf_dir))


def q_rdfa_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full KG extraction: the headline operator (SURVEY.md §2.2)."""
    return _triples(spark, sf_dir).select(
        "url", "subj", "pred", "obj", "obj_is_literal",
        "obj_datatype", "obj_lang")


def q_rdfa_og_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 opengraph query (Parser.pm:259-328)."""
    return opengraph(_triples(spark, sf_dir), "title")


def q_rdfa_pred_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 aggregation over the triple table."""
    return (_triples(spark, sf_dir)
            .groupBy("pred").agg(F.count("*").alias("n_triples")))


def q_rdfa_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 byte-identical text extraction per url."""
    return extract_text_df(load_pages(spark, sf_dir)).select(
        "url", "text")


def q_entity_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-linking stage 1: mention table with normalized keys."""
    t = _triples(spark, sf_dir)
    return (t.filter(F.col("pred") == SCHEMA_NS + "name")
             .select(F.col("subj").alias("mention"),
                     F.col("obj").alias("label"),
                     F.regexp_replace(F.lower("obj"), "[^a-z0-9]", "")
                      .alias("entity_key")))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: extract the KG from
    synthesized pages and run the opengraph query over it."""
    return q_rdfa_og_title(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rdfa_triples": q_rdfa_triples,
        "rdfa_og_title": q_rdfa_og_title,
        "rdfa_pred_counts": q_rdfa_pred_counts,
        "rdfa_text": q_rdfa_text,
        "entity_mentions": q_entity_mentions,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rdfa_triples": oracle.RDFA_TRIPLES_SQL,
        "rdfa_og_title": oracle.RDFA_OG_TITLE_SQL,
        "rdfa_pred_counts": oracle.RDFA_PRED_COUNTS_SQL,
        "rdfa_text": oracle.RDFA_TEXT_SQL,
        "entity_mentions": oracle.ENTITY_MENTIONS_SQL,
    }
