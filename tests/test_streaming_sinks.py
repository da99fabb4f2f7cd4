"""Structured Streaming extraction + N-Triples sink tests."""

import pytest
from pyspark.sql import functions as F

from rdfa_spark.extract import extract_triples
from rdfa_spark.pages import load_pages
from rdfa_spark.sinks import ntriples_lines, write_ntriples
from rdfa_spark.streaming.incremental import start_extraction


def test_ntriples_lines(spark, sf_dir):
    triples = extract_triples(load_pages(spark, sf_dir, partitions=4))
    lines = ntriples_lines(triples)
    sample = [r.value for r in lines.limit(200).collect()]
    assert all(l.endswith(" .") for l in sample)
    assert any('"Doc ' in l and "@" in l for l in sample)  # lang literal
    assert any(l.startswith("<http://example.org/doc/") for l in sample)
    assert lines.count() == triples.count()


def test_ntriples_escaping(spark):
    rows = [("u", "http://s", "http://p", 'va"l\nue\t\\x', True,
             None, "en", None, 0)]
    df = spark.createDataFrame(rows, schema=(
        "url string, subj string, pred string, obj string, "
        "obj_is_literal boolean, obj_datatype string, "
        "obj_lang string, graph string, emit_seq long"))
    [line] = [r.value for r in ntriples_lines(df).collect()]
    assert line == ('<http://s> <http://p> '
                    '"va\\"l\\nue\\t\\\\x"@en .')


def test_write_ntriples_roundtrip_count(spark, sf_dir, tmp_path):
    triples = extract_triples(load_pages(spark, sf_dir, partitions=4))
    out = str(tmp_path / "nt")
    write_ntriples(triples, out)
    assert spark.read.text(out).count() == triples.count()


@pytest.mark.slow
def test_streaming_extraction(spark, sf_dir, tmp_path):
    """File-source streaming run (availableNow) produces the same
    triples as batch extraction and resumes as a no-op."""
    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "triples_out")
    ckpt_dir = str(tmp_path / "ckpt")
    pages = load_pages(spark, sf_dir, partitions=4)
    pages.write.mode("overwrite").parquet(pages_dir)

    q = start_extraction(spark, pages_dir, out_dir, ckpt_dir,
                         trigger_once=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    want = extract_triples(pages)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # resume with no new files -> no duplicates
    q2 = start_extraction(spark, pages_dir, out_dir, ckpt_dir,
                          trigger_once=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == want.count()


def test_crawl_rate_metrics_plan(spark, sf_dir, tmp_path):
    """Watermarked windowed agg compiles into a streaming plan."""
    from rdfa_spark.streaming.incremental import (crawl_rate_metrics,
                                                  read_page_stream)
    pages_dir = str(tmp_path / "pages_in2")
    load_pages(spark, sf_dir, partitions=2).write.mode("overwrite") \
        .parquet(pages_dir)
    stream = read_page_stream(spark, pages_dir)
    agg = crawl_rate_metrics(stream)
    assert agg.isStreaming
    q = (agg.writeStream.format("memory").queryName("crawl_metrics")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    # watermark semantics: final windows emitted after stream end
    n = spark.sql("select count(*) from crawl_metrics").first()[0]
    assert n >= 0


def test_turtle_lines_prefix_compression(spark):
    from rdfa_spark.sinks import turtle_lines
    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        ("u", "http://ex.com/s", "http://purl.org/dc/terms/title",
         "A \"q\"\nB", True, None, "en", None, 0),
        ("u", "http://ex.com/s", "http://schema.org/age",
         "42", True, XSD + "integer", None, None, 1),
        ("u", "_:b0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://schema.org/Person", False, None, None, None, 2),
        # local part with a slash -> NOT compressible, stays <wrapped>
        ("u", "http://ex.com/s", "http://schema.org/a/b",
         "http://ex.com/o", False, None, None, None, 3),
    ]
    df = spark.createDataFrame(rows, schema=(
        "url string, subj string, pred string, obj string, "
        "obj_is_literal boolean, obj_datatype string, "
        "obj_lang string, graph string, emit_seq long"))
    got = [r.value for r in
           turtle_lines(df.orderBy("emit_seq")).collect()]
    assert got[0] == ('<http://ex.com/s> dcterms:title '
                      '"A \\"q\\"\\nB"@en .')
    assert got[1] == '<http://ex.com/s> schema:age "42"^^xsd:integer .'
    assert got[2] == "_:b0 rdf:type schema:Person ."
    assert got[3] == ('<http://ex.com/s> <http://schema.org/a/b> '
                      '<http://ex.com/o> .')


def test_write_turtle_roundtrip(spark, sf_dir, tmp_path):
    """Directory concatenation in name order is one valid Turtle doc;
    expanding pnames with the declared prefixes recovers exactly the
    N-Triples serialization (round-trippable)."""
    import glob
    import re
    from rdfa_spark.sinks import (DEFAULT_PREFIXES, ntriples_lines,
                                  write_turtle)
    triples = extract_triples(load_pages(spark, sf_dir)).limit(200) \
        .cache()
    out = str(tmp_path / "ttl")
    write_turtle(triples, out)
    files = sorted(glob.glob(f"{out}/*"))
    assert files[0].endswith("00_prefixes.ttl")
    text = "".join(open(f).read() for f in files
                   if not f.endswith((".crc", "_SUCCESS")))
    # declared prefixes parse
    decls = dict(re.findall(r"@prefix (\w+): <([^>]+)> \.", text))
    assert decls == {k: v for k, v in DEFAULT_PREFIXES.items()}
    # expand pnames back to IRIs -> must equal the N-Triples lines
    data_lines = [l for l in text.splitlines()
                  if l and not l.startswith("@prefix")]

    def expand(line):
        def sub(m):
            return f"<{decls[m.group(1)]}{m.group(2)}>"
        return re.sub(r"(?<![<\"\w])(\w+):([A-Za-z_][A-Za-z0-9_-]*)",
                      sub, line)

    expanded = sorted(expand(l) for l in data_lines)
    nt = sorted(r.value for r in ntriples_lines(triples).collect())
    assert expanded == nt


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a bounded stream
    reproduces the batch window-function sessions exactly (final
    sessions close via event-time timeout as the watermark passes)."""
    import time
    from rdfa_spark.streaming.stateful import sessionize_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = 1_700_000_000
    rows = []
    # user 1: two sessions (gap > 30 min), user 2: one session
    for i, off in enumerate([0, 60, 120, 5000, 5060]):
        rows.append((1, i, base + off))
    for i, off in enumerate([0, 1700]):
        rows.append((2, 100 + i, base + off))
    src = tmp_path / "events_stream"
    src.mkdir()

    def write_file(name, data):
        (spark.createDataFrame(data, "user_id long, event_id long, "
                               "sec long")
         .select("user_id", "event_id",
                 F.col("sec").cast("timestamp").alias("ts"))
         .coalesce(1).write.mode("overwrite")
         .parquet(str(src / name)))
        time.sleep(1.1)  # distinct mtimes -> stable trigger order

    write_file("f1", rows)
    # two sentinel files push the watermark past every timeout
    write_file("f2", [(999, 0, base + 10 * 86400)])
    write_file("f3", [(999, 1, base + 20 * 86400)])

    stream = (spark.readStream
              .schema("user_id long, event_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    q = (sessionize_stream(stream)
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_id, r.n_events, r.start_sec,
            r.end_sec)
           for r in spark.sql("SELECT * FROM sess_out").collect()
           if r.user_id != 999}
    want = {(1, 1, 3, base, base + 120),
            (1, 2, 2, base + 5000, base + 5060),
            (2, 1, 2, base, base + 1700)}
    assert got == want


def test_streaming_dedup_pages(spark, tmp_path):
    """Streaming exact dedup drops same-fingerprint pages within the
    watermark horizon; first occurrence survives (batch parity with
    pipeline.dedup.dedup_exact on the same input)."""
    import datetime as dt

    from rdfa_spark.streaming.incremental import (PAGES_DDL,
                                                  dedup_pages_stream)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t0, bytearray(b"<p>a</p>"), "same text", "en"),
        ("u2", t0 + dt.timedelta(seconds=30), bytearray(b"<p>b</p>"),
         "same text", "en"),                       # dup of u1
        ("u3", t0 + dt.timedelta(seconds=60), bytearray(b"<p>c</p>"),
         "other text", "en"),
    ]
    src = str(tmp_path / "pages_src")
    spark.createDataFrame(rows, PAGES_DDL).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(PAGES_DDL).parquet(src))
    deduped = dedup_pages_stream(stream, watermark="10 minutes")
    q = (deduped.writeStream.format("memory")
         .queryName("dedup_mem").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.url for r in spark.sql(
        "SELECT url FROM dedup_mem").collect()}
    assert "u3" in got
    assert len(got & {"u1", "u2"}) == 1      # exactly one survivor
