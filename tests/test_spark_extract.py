"""Spark-side extraction tests: page synthesis, triple extraction,
the byte-identical text invariant, and the opengraph query."""

import pytest
from pyspark.sql import functions as F

from rdfa_spark.extract import (extract_errors, extract_triples,
                                extract_text_df, graph_counts, opengraph)
from rdfa_spark.pages import load_pages

SCHEMA = "http://schema.org/"
DC = "http://purl.org/dc/terms/"


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return load_pages(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def triples(pages):
    return extract_triples(pages).cache()


def test_pages_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    assert pages.schema["html"].dataType.typeName() == "binary"
    assert pages.schema["warc_ts"].dataType.typeName() == "timestamp"


def test_triple_counts(pages, triples, sf_dir):
    n_pages = pages.count()
    # every page emits 8 or 9 triples (template 2 has no Article type)
    per_url = triples.groupBy("url").count()
    mn, mx = per_url.agg(F.min("count"), F.max("count")).first()
    assert mn in (8, 9) and mx == 9
    assert per_url.count() == n_pages


def test_text_invariant_byte_identical(spark, pages):
    """input_hint per-row invariant: extracted text == pages.text."""
    tx = extract_text_df(pages)
    j = tx.alias("a").join(
        pages.select("url", F.col("text").alias("expected")), "url")
    assert j.filter(F.col("text") != F.col("expected")).count() == 0
    assert j.count() == pages.count()


def test_opengraph_title(pages, triples):
    og = opengraph(triples, "title")
    rows = og.orderBy("url").limit(3).collect()
    assert rows[0].property == "title"
    assert rows[0].value == "Doc 0"
    assert og.count() == pages.count()


def test_opengraph_all_props(triples, pages):
    og = opengraph(triples)
    props = {r.property for r in og.select("property").distinct()
             .collect()}
    assert props == {"title", "type"}


def test_entity_mentions(triples):
    names = triples.filter(F.col("pred") == SCHEMA + "name")
    labels = {r.obj for r in names.select("obj").distinct().collect()}
    assert any(l.startswith("Entity ") for l in labels)
    assert any(l.startswith("entity ") for l in labels)
    assert any(l.startswith("Entity-") for l in labels)


def test_graph_counts_default_graph(triples):
    gc = graph_counts(triples).collect()
    assert len(gc) == 1 and gc[0].graph == "(default)"


def test_errors_empty_on_clean_pages(pages):
    errs = extract_errors(pages)
    assert errs.count() == 0


def test_extraction_plan_no_shuffle(spark, sf_dir):
    """Extraction itself must stay shuffle-free (SURVEY.md §4): a
    scan -> project -> mapInArrow chain, no Exchange.  (load_pages'
    default input repartition is opt-out-able and is the only
    Exchange in the pipeline.)"""
    flat_pages = load_pages(spark, sf_dir, partitions=0)
    plan = extract_triples(flat_pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
