"""Serialization sinks: N-Triples / N-Quads lines (S7).

The reference's example serializers emit Turtle/N-Triples with
``\\ \\n \\r \\t \\"`` escaping (examples/rdfa11-to-ntriples.pl:1-13,
Parser.pm:2215-2287).  Here the formatting is a pure column
expression — whole-stage codegen, written with ``df.write.text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    """N-Triples string escaping (Parser.pm:2259-2263)."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return F.regexp_replace(c, '"', r'\\"')


def _term(col: Column) -> Column:
    """IRI or bnode term."""
    return F.when(col.startswith("_:"), col) \
            .otherwise(F.concat(F.lit("<"), col, F.lit(">")))


def ntriples_lines(triples: DataFrame, quads: bool = False) -> DataFrame:
    """-> single-column DataFrame of N-Triples/N-Quads lines."""
    obj = F.when(
        F.col("obj_is_literal"),
        F.concat(
            F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'),
            F.when(F.col("obj_datatype").isNotNull(),
                   F.concat(F.lit("^^<"), F.col("obj_datatype"),
                            F.lit(">")))
             .when(F.col("obj_lang").isNotNull(),
                   F.concat(F.lit("@"), F.col("obj_lang")))
             .otherwise(F.lit("")))
    ).otherwise(_term(F.col("obj")))
    parts = [_term(F.col("subj")), _term(F.col("pred")), obj]
    if quads:
        # concat_ws skips NULLs, so a default-graph quad emits no term
        parts.append(F.when(F.col("graph").isNotNull(),
                            _term(F.col("graph"))))
    line = F.concat(F.concat_ws(" ", *parts), F.lit(" ."))
    return triples.select(line.alias("value"))


def write_ntriples(triples: DataFrame, path: str,
                   quads: bool = False) -> None:
    ntriples_lines(triples, quads).write.mode("overwrite").text(path)
