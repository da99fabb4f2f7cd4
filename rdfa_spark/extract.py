"""Spark extraction stage: pages -> triples / errors DataFrames.

The reference's per-document recursive parse
(lib/RDF/RDFa/Parser.pm:489-544) becomes one Arrow-batched
``mapInPandas`` over the pages table: JVM->Python crossings happen
once per batch, and the whole relational surface around the UDF
(column pruning, filters, dedup, writes) stays in Catalyst.

Scale notes (100 TB design):
* extraction is embarrassingly parallel per url — no shuffle at all
  in this stage; parallelism == input splits
  (`spark.sql.files.maxPartitionBytes` governs task count);
* the UDF reads only (url, html, lang): column pruning reaches the
  parquet scan because mapInPandas consumes an explicit 3-column
  projection;
* bnode labels are deterministic per url, so re-running a failed
  partition yields identical output — required for resumable,
  idempotent writes (BASELINE north_rule).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

from .core.config import Config, make_config
from .core.walk import parse_rdfa

TRIPLE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("obj_is_literal", BooleanType(), True),
    StructField("obj_datatype", StringType(), True),
    StructField("obj_lang", StringType(), True),
    StructField("graph", StringType(), True),
    StructField("emit_seq", LongType(), True),
])

ERROR_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("level", StringType(), True),
    StructField("code", StringType(), True),
    StructField("message", StringType(), True),
    StructField("node_path", StringType(), True),
])

TEXT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("text", StringType(), True),
    StructField("n_triples", IntegerType(), True),
])

# Single-pass multi-output layout: one parse per page emits triple
# rows (kind='t'), processor-graph error rows (kind='e') and one text/
# lineage row (kind='x') into a sparse union schema.  Null-heavy
# columns are nearly free in Arrow/parquet (validity bitmaps), and one
# parse replaces the three independent passes a pipeline wanting
# triples+errors+text would otherwise pay (the parse dominates).
EXTRACT_ALL_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("obj_is_literal", BooleanType(), True),
    StructField("obj_datatype", StringType(), True),
    StructField("obj_lang", StringType(), True),
    StructField("graph", StringType(), True),
    StructField("emit_seq", LongType(), True),
    StructField("level", StringType(), True),
    StructField("code", StringType(), True),
    StructField("message", StringType(), True),
    StructField("node_path", StringType(), True),
    StructField("text", StringType(), True),
    StructField("n_triples", IntegerType(), True),
])


def detect_config(html: bytes) -> Config:
    """Host-language dispatch for pre-crawled pages.

    The reference dispatches on HTTP media type
    (Config.pm:306-331); for a crawl corpus we sniff the bytes:
    XML declaration or an XHTML namespace on the root -> xhtml host,
    anything else -> html5 tag-soup.  Root @version still upgrades/
    downgrades the RDFa version (guess mode, Config.pm:342-367).
    """
    if html[:4] == b"PK\x03\x04":      # ZIP magic -> ODF package
        return make_config("opendocument-zip", "1.1")
    head = html[:2048].lstrip()
    is_xhtml = (head.startswith(b"<?xml")
                or b'xmlns="http://www.w3.org/1999/xhtml"' in head)
    host = "xhtml" if is_xhtml else "html5"
    return make_config(host, "guess")


_CFG_CACHE: dict[tuple, Config] = {}


def _config_for(html: bytes, config: Config | None) -> Config:
    if config is not None:
        return config
    if html[:4] == b"PK\x03\x04":      # ZIP magic: ODF package (S3)
        key = ("opendocument-zip",)
        cfg = _CFG_CACHE.get(key)
        if cfg is None:
            cfg = make_config(key[0], "1.1")
            _CFG_CACHE[key] = cfg
        return cfg
    head = html[:2048].lstrip()
    is_xhtml = (head.startswith(b"<?xml")
                or b'xmlns="http://www.w3.org/1999/xhtml"' in head)
    key = ("xhtml" if is_xhtml else "html5",)
    cfg = _CFG_CACHE.get(key)
    if cfg is None:
        cfg = make_config(key[0], "guess")
        _CFG_CACHE[key] = cfg
    return cfg


_TRIPLE_ARROW_NAMES = ["url", "subj", "pred", "obj", "obj_is_literal",
                       "obj_datatype", "obj_lang", "graph", "emit_seq"]

# Per-chunk cap on html bytes materialized as Python objects: an
# incoming Arrow batch of max-size pages would otherwise be held
# TWICE (Arrow buffer + to_pylist copies) alongside the full batch's
# accumulated output lists.  Chunking bounds the Python-side peak to
# ~cap regardless of page sizes; the Arrow buffer itself is sliced
# zero-copy.
_ARROW_CHUNK_BYTES = int(os.environ.get(
    "RDFA_SPARK_ARROW_CHUNK_BYTES", str(32 << 20)))
_ARROW_CHUNK_ROWS = 2048


def _chunk_bounds(lengths, max_bytes: int, max_rows: int):
    """Greedy (start, stop) row ranges whose summed byte lengths stay
    under max_bytes (always >= 1 row per chunk, so a single page
    larger than the cap still processes)."""
    bounds = []
    start, acc = 0, 0
    for i, ln in enumerate(lengths):
        ln = ln or 0
        if i > start and (acc + ln > max_bytes
                          or i - start >= max_rows):
            bounds.append((start, i))
            start, acc = i, 0
        acc += ln
    if start < len(lengths):
        bounds.append((start, len(lengths)))
    return bounds


def _walk_arrow_batches(batches, config: Config | None, fail_acc=None):
    """Arrow-native extraction: iterate RecordBatches, emit
    RecordBatches — no pandas materialization on either side of the
    JVM<->Python channel (mapInArrow).

    Each incoming batch is processed in zero-copy row slices capped
    at _ARROW_CHUNK_BYTES of html, so Python-object copies of the
    pages and the in-flight output lists are bounded by the cap, not
    by the batch size.

    Parse failures emit no triple rows but are counted in
    ``fail_acc`` (a Spark accumulator) — the no-silent-drops rule
    holds on the fast path too.  Callers that need the failing urls
    (not just a count) use ``extract_all`` + ``split_extracts``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for rb in batches:
        url_idx = rb.schema.get_field_index("url")
        html_idx = rb.schema.get_field_index("html")
        if rb.num_rows == 0:
            yield pa.RecordBatch.from_arrays(
                [pa.array([], pa.string())] * 4
                + [pa.array([], pa.bool_())]
                + [pa.array([], pa.string())] * 3
                + [pa.array([], pa.int64())],
                names=_TRIPLE_ARROW_NAMES)
            continue
        # per-row byte lengths straight from the Arrow offsets (no
        # data copy) drive the chunking
        lens = pc.binary_length(rb.column(html_idx)).to_pylist()
        for lo, hi in _chunk_bounds(lens, _ARROW_CHUNK_BYTES,
                                    _ARROW_CHUNK_ROWS):
            sub = rb.slice(lo, hi - lo)          # zero-copy
            # bulk-convert the slice once (C loop) instead of
            # per-row scalar .as_py() calls
            urls = sub.column(url_idx).to_pylist()
            htmls = sub.column(html_idx).to_pylist()
            c_url, c_subj, c_pred, c_obj = [], [], [], []
            c_lit, c_dt, c_lang, c_graph, c_seq = [], [], [], [], []
            for i in range(sub.num_rows):
                html = htmls[i]
                if html is None:
                    continue
                url = urls[i]
                try:
                    w = parse_rdfa(html, url,
                                   _config_for(html, config))
                except Exception:
                    if fail_acc is not None:
                        fail_acc.add(1)
                    continue
                for seq, t in enumerate(w.triples):
                    c_url.append(url)
                    c_subj.append(t.subj)
                    c_pred.append(t.pred)
                    c_obj.append(t.obj)
                    c_lit.append(t.is_literal)
                    c_dt.append(t.datatype)
                    c_lang.append(t.lang)
                    c_graph.append(t.graph)
                    c_seq.append(seq)
            yield pa.RecordBatch.from_arrays(
                [pa.array(c_url, pa.string()),
                 pa.array(c_subj, pa.string()),
                 pa.array(c_pred, pa.string()),
                 pa.array(c_obj, pa.string()),
                 pa.array(c_lit, pa.bool_()),
                 pa.array(c_dt, pa.string()),
                 pa.array(c_lang, pa.string()),
                 pa.array(c_graph, pa.string()),
                 pa.array(c_seq, pa.int64())],
                names=_TRIPLE_ARROW_NAMES)


def _walk_batches(batches: Iterator[pd.DataFrame], config: Config | None,
                  want: str):
    for pdf in batches:
        urls, rows = pdf["url"].values, []
        htmls = pdf["html"].values
        for i in range(len(pdf)):
            url = urls[i]
            html = htmls[i]
            if html is None:
                continue
            html = bytes(html)
            try:
                w = parse_rdfa(html, url, _config_for(html, config))
            except Exception as exc:   # never fail the job on one page
                if want == "errors":
                    rows.append((url, "error", "parse-failed",
                                 str(exc)[:500], None))
                continue
            if want == "triples":
                for seq, t in enumerate(w.triples):
                    rows.append((url, t.subj, t.pred, t.obj,
                                 t.is_literal, t.datatype, t.lang,
                                 t.graph, seq))
            elif want == "errors":
                for e in w.errors:
                    rows.append((url, e.level, e.code, e.message,
                                 e.node_path))
            else:  # text
                rows.append((url, w.doc.root.text_content()
                             if w.doc.root is not None else "",
                             len(w.triples)))
        if want == "triples":
            cols = [f.name for f in TRIPLE_SCHEMA.fields]
        elif want == "errors":
            cols = [f.name for f in ERROR_SCHEMA.fields]
        else:
            cols = [f.name for f in TEXT_SCHEMA.fields]
        yield pd.DataFrame(rows, columns=cols)


_ALL_ARROW_NAMES = [f.name for f in EXTRACT_ALL_SCHEMA.fields]


def _walk_arrow_all(batches, config: Config | None):
    """One parse per page, three row kinds out (triples 't', errors
    'e', text/lineage 'x').  Parse failures always land as an error
    row — pages can never vanish without a trace."""
    import pyarrow as pa

    for rb in batches:
        urls = rb.column(rb.schema.get_field_index("url")).to_pylist()
        htmls = rb.column(rb.schema.get_field_index("html")).to_pylist()
        cols: list[list] = [[] for _ in _ALL_ARROW_NAMES]
        (c_url, c_kind, c_subj, c_pred, c_obj, c_lit, c_dt, c_lang,
         c_graph, c_seq, c_level, c_code, c_msg, c_path, c_text,
         c_ntrip) = cols

        def pad(n):
            # fill every non-appended column with nulls to length n
            for c in cols:
                c.extend([None] * (n - len(c)))

        for i in range(rb.num_rows):
            html = htmls[i]
            if html is None:
                continue
            url = urls[i]
            try:
                w = parse_rdfa(html, url, _config_for(html, config))
            except Exception as exc:
                c_url.append(url)
                c_kind.append("e")
                c_level.append("error")
                c_code.append("parse-failed")
                c_msg.append(str(exc)[:500])
                pad(len(c_url))
                continue
            for seq, t in enumerate(w.triples):
                c_url.append(url)
                c_kind.append("t")
                c_subj.append(t.subj)
                c_pred.append(t.pred)
                c_obj.append(t.obj)
                c_lit.append(t.is_literal)
                c_dt.append(t.datatype)
                c_lang.append(t.lang)
                c_graph.append(t.graph)
                c_seq.append(seq)
                pad(len(c_url))
            for e in w.errors:
                c_url.append(url)
                c_kind.append("e")
                c_level.append(e.level)
                c_code.append(e.code)
                c_msg.append(e.message)
                c_path.append(e.node_path)
                pad(len(c_url))
            c_url.append(url)
            c_kind.append("x")
            c_text.append(w.doc.root.text_content()
                          if w.doc.root is not None else "")
            c_ntrip.append(len(w.triples))
            pad(len(c_url))
        yield pa.RecordBatch.from_arrays(
            [pa.array(c_url, pa.string()),
             pa.array(c_kind, pa.string()),
             pa.array(c_subj, pa.string()),
             pa.array(c_pred, pa.string()),
             pa.array(c_obj, pa.string()),
             pa.array(c_lit, pa.bool_()),
             pa.array(c_dt, pa.string()),
             pa.array(c_lang, pa.string()),
             pa.array(c_graph, pa.string()),
             pa.array(c_seq, pa.int64()),
             pa.array(c_level, pa.string()),
             pa.array(c_code, pa.string()),
             pa.array(c_msg, pa.string()),
             pa.array(c_path, pa.string()),
             pa.array(c_text, pa.string()),
             pa.array(c_ntrip, pa.int32())],
            names=_ALL_ARROW_NAMES)


def extract_all(pages: DataFrame,
                config: Config | None = None) -> DataFrame:
    """Single-pass extraction: triples + processor-graph errors +
    text/lineage from ONE parse per page (the parse dominates the
    stage cost; three dedicated passes would pay it three times).

    Materialize (persist or write) the result once, then split with
    ``split_extracts``.  Parse failures appear as
    (kind='e', code='parse-failed') rows — never silently dropped.
    """
    proj = pages.select("url", "html")
    return proj.mapInArrow(
        lambda it: _walk_arrow_all(it, config), EXTRACT_ALL_SCHEMA)


def split_extracts(all_df: DataFrame) -> tuple[DataFrame, DataFrame,
                                               DataFrame]:
    """(triples, errors, texts) views over an ``extract_all`` result,
    each with the exact schema of the dedicated extractor.  On a
    parquet-materialized extract the kind filter is pushed to the
    scan; on a persisted DataFrame it's a cheap in-memory filter."""
    triples = (all_df.filter(F.col("kind") == "t")
               .select(*[f.name for f in TRIPLE_SCHEMA.fields]))
    errors = (all_df.filter(F.col("kind") == "e")
              .select(*[f.name for f in ERROR_SCHEMA.fields]))
    texts = (all_df.filter(F.col("kind") == "x")
             .select(*[f.name for f in TEXT_SCHEMA.fields]))
    return triples, errors, texts


def extract_triples(pages: DataFrame, config: Config | None = None,
                    dedup: bool = False) -> DataFrame:
    """pages(url, html, ...) -> triples DataFrame.

    ``dedup=True`` additionally enforces cross-document set semantics
    (the walker already dedups within a document, mirroring the
    reference's set-store A4) — a shuffle, so off by default.

    Pages that fail to parse emit no triples but are never silently
    lost: a Spark accumulator counts them, exposed as
    ``result.parse_failures`` (read ``.value`` after an action).
    Accumulators updated inside transformations are at-least-once
    under task retries/speculation (standard Spark semantics), so
    treat the count as a monitoring signal: nonzero means pages
    failed.  For an exact, retry-safe audit — or the failing urls
    themselves — use ``extract_all``, which materializes failures as
    (kind='e', code='parse-failed') rows in the output itself.

    ``parse_failures`` is an attribute of THIS DataFrame object only:
    any further transformation (select/filter/cache) returns a new
    DataFrame without it — capture the handle before transforming, or
    use ``extract_all`` for in-band accounting.
    """
    proj = pages.select("url", "html")
    fail_acc = pages.sparkSession.sparkContext.accumulator(0)
    out = proj.mapInArrow(
        lambda it: _walk_arrow_batches(it, config, fail_acc),
        TRIPLE_SCHEMA)
    if dedup:
        out = out.dropDuplicates(
            ["url", "subj", "pred", "obj", "obj_is_literal",
             "obj_datatype", "obj_lang", "graph"])
    out.parse_failures = fail_acc
    return out


def extract_errors(pages: DataFrame,
                   config: Config | None = None) -> DataFrame:
    """Processor-graph analogue (Parser.pm:469-487) as a DataFrame."""
    proj = pages.select("url", "html")
    return proj.mapInPandas(
        lambda it: _walk_batches(it, config, "errors"), ERROR_SCHEMA)


def extract_text_df(pages: DataFrame,
                    config: Config | None = None) -> DataFrame:
    """F1 text-concatenation rule per url (byte-identical invariant,
    Parser.pm:2541-2559), plus triple counts for metrics."""
    proj = pages.select("url", "html")
    return proj.mapInPandas(
        lambda it: _walk_batches(it, config, "text"), TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# Queries over the triples table (the reference's model accessors)
# ---------------------------------------------------------------------------

OG_NS = "http://ogp.me/ns#"
OG_ALT_NS = "http://opengraphprotocol.org/schema/"


def opengraph(triples: DataFrame, prop: str | None = None) -> DataFrame:
    """P11 — the reference's built-in query (Parser.pm:259-328):
    triples whose subject is the page URI and whose predicate is an
    OpenGraph expansion; prefix stripped from the property key."""
    df = triples.filter(F.col("subj") == F.col("url"))
    if prop is not None:
        preds = ([prop] if ":" in prop.split("/")[0] and "://" in prop
                 else [OG_NS + prop, OG_ALT_NS + prop])
        df = df.filter(F.col("pred").isin(preds))
    else:
        df = df.filter(F.col("pred").startswith(OG_NS)
                       | F.col("pred").startswith(OG_ALT_NS))
    return df.select(
        "url",
        F.regexp_replace("pred", f"^({OG_NS}|{OG_ALT_NS})", "")
         .alias("property"),
        F.col("obj").alias("value"),
    )


def with_context_graph(triples: DataFrame, context: str) -> DataFrame:
    """Wrap statements into a caller-supplied context quad — the
    TrineX ``parse_url_into_model`` context option
    (TrineX/Parser/RDFa.pm:127-151, t/10trine.t)."""
    return triples.withColumn("graph", F.lit(context))


def opengraph_collect(triples: DataFrame) -> DataFrame:
    """A3 — group OpenGraph values per (page, property) into an
    ordered list (Parser.pm:282-319), surfaced as a sorted
    comma-joined string for engine-portable comparison."""
    og = opengraph(triples)
    return (og.groupBy("url", "property")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list("value")))
                 .alias("values")))


RDFA_NS = "http://www.w3.org/ns/rdfa#"


def processor_graph(errors: DataFrame) -> DataFrame:
    """Reify the errors table into RDF (the reference's
    processor_graph, Parser.pm:374-458): one bnode per error with
    rdf:type rdfa:Error/rdfa:Warning, dc:description = message,
    rdfa:context = the page url.  Returns a triples-shaped DataFrame
    so it unions with the output graph (U1,
    processor_and_output_graph, Parser.pm:460-467)."""
    bnode = F.concat(F.lit("_:err"),
                     F.md5(F.concat_ws("|", "url", "code", "message",
                                       F.coalesce("node_path",
                                                  F.lit("")))))
    base = errors.select(
        "url", bnode.alias("subj"),
        F.when(F.col("level") == "error", F.lit(RDFA_NS + "Error"))
         .otherwise(F.lit(RDFA_NS + "Warning")).alias("type_obj"),
        F.col("message"), F.col("code"))
    mk = lambda pred, obj, lit: base.select(  # noqa: E731
        "url", "subj", F.lit(pred).alias("pred"), obj.alias("obj"),
        F.lit(lit).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("graph"),
        F.lit(0).cast("long").alias("emit_seq"))
    return (mk("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
               F.col("type_obj"), False)
            .unionByName(mk("http://purl.org/dc/terms/description",
                            F.col("message"), True))
            .unionByName(mk(RDFA_NS + "context", F.col("url"), False)))


def processor_and_output_graph(triples: DataFrame,
                               errors: DataFrame) -> DataFrame:
    """U1 — union of the output graph and the reified processor
    graph (Parser.pm:460-467)."""
    return triples.unionByName(processor_graph(errors))


def canonicalize_literals(triples: DataFrame) -> DataFrame:
    """F8 — optional xsd literal canonicalization
    (TrineX/Parser/RDFa.pm:163-172; off by default, as in the
    reference): canonical lexical forms for xsd integer/decimal/
    boolean typed literals, pure column expressions."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    obj, dt = F.col("obj"), F.col("obj_datatype")
    is_lit = F.col("obj_is_literal")
    canon = (
        F.when(is_lit & (dt == XSD + "integer")
               & obj.rlike(r"^[+-]?\d+$"),
               F.col("obj").cast("decimal(38,0)").cast("string"))
         .when(is_lit & (dt == XSD + "boolean")
               & obj.isin("0", "false", "FALSE", "False"),
               F.lit("false"))
         .when(is_lit & (dt == XSD + "boolean")
               & obj.isin("1", "true", "TRUE", "True"),
               F.lit("true"))
         .when(is_lit & (dt == XSD + "decimal")
               & obj.rlike(r"^[+-]?\d+(\.\d+)?$"),
               F.col("obj").cast("decimal(38,10)").cast("string"))
         .otherwise(obj))
    return triples.withColumn("obj", canon)


def graph_counts(triples: DataFrame) -> DataFrame:
    """A1 — named-graph partition counts (Parser.pm:245-257)."""
    return (triples
            .groupBy(F.coalesce("graph", F.lit("(default)"))
                     .alias("graph"))
            .agg(F.count("*").alias("n_triples")))


def count_statements(triples: DataFrame, subj=None, pred=None, obj=None,
                     graph=None) -> int:
    """A2 — count_statements pattern matching."""
    df = triples
    for col, val in (("subj", subj), ("pred", pred), ("obj", obj),
                     ("graph", graph)):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df.count()
