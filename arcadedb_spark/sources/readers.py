"""Custom format readers (GloVe / Word2Vec / RDF N-Triples) + JSONL export.

Parity targets (integration/…/importer/format/):
- GloVeImporterFormat.java      — "token v1 v2 …" per line
- Word2VecImporterFormat.java   — same with a "count dim" header line
- RDFImporterFormat.java        — N-Triples: <s> <p> <o_or_literal> .
- exporter/format/JsonlExporterFormat.java — one JSON object per line
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_glove(spark: SparkSession, path: str) -> DataFrame:
    """GloVe text vectors → (token: string, vector: array<float>)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\s+")
    return lines.filter(F.length("value") > 0).select(
        F.element_at(parts, 1).alias("token"),
        F.transform(
            F.slice(parts, 2, F.size(parts) - 1), lambda v: v.cast("float")
        ).alias("vector"),
    )


def read_word2vec(spark: SparkSession, path: str) -> DataFrame:
    """Word2Vec text format: first line is "<count> <dim>", then GloVe
    layout.  The header is dropped by shape (2 fields, both numeric)."""
    df = read_glove(spark, path)
    return df.filter(
        ~(
            F.col("token").rlike(r"^\d+$")
            & (F.size("vector") == 1)
        )
    )


_NT_PATTERN = (
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"[^.]*)\s*\.\s*$'
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """RDF N-Triples → (subject, predicate, object, is_literal).

    IRIs land in ``object`` with is_literal=false; plain/typed string
    literals with is_literal=true.  Malformed lines and comments are
    dropped (the reference's importer skips them too).
    """
    lines = spark.read.text(path)
    s = F.regexp_extract("value", _NT_PATTERN, 1)
    p = F.regexp_extract("value", _NT_PATTERN, 2)
    o_iri = F.regexp_extract("value", _NT_PATTERN, 3)
    o_lit = F.regexp_extract("value", _NT_PATTERN, 4)
    return (
        lines.filter(~F.col("value").startswith("#"))
        .select(
            s.alias("subject"),
            p.alias("predicate"),
            F.when(o_iri != "", o_iri).otherwise(o_lit).alias("object"),
            (o_iri == "").alias("is_literal"),
        )
        .filter(F.col("subject") != "")
    )


def export_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line (JsonlExporterFormat.java analog)."""
    df.write.mode(mode).json(path)
