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


def read_xml(
    spark: SparkSession, path: str, object_nest_level: int = 1
) -> DataFrame:
    """XML import (XMLImporterFormat.java parity): every element at
    ``object_nest_level`` below the root becomes one record; attributes
    and simple-text children merge into a JSON ``_props`` string (the
    schema-flexible convention shared with the Neo4j reader).

    Distribution model: one task per FILE (`wholetext` read + Arrow
    mapInPandas) — the importer use-case is many files; a single huge
    XML file is inherently sequential to tokenize, same as the
    reference's StAX stream.  For huge single files with a KNOWN row
    tag, prefer Spark 4's native reader instead —
    ``spark.read.format("xml").option("rowTag", tag)`` splits inside a
    file and types columns; this function exists for the reference's
    nest-LEVEL (tag-agnostic) semantics.  stdlib ElementTree ignores
    DTDs and external entities, matching the reference's hardened
    XMLInputFactory (XXE / entity-expansion protection)."""
    import json
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("tag", T.StringType()),
            T.StructField("_props", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import xml.etree.ElementTree as ET

        for pdf in it:
            tags, props = [], []
            for doc in pdf["value"]:
                depth = 0
                for ev, el in ET.iterparse(
                    _io.StringIO(doc), events=("start", "end")
                ):
                    if ev == "start":
                        depth += 1
                        continue
                    depth -= 1
                    if depth != object_nest_level:
                        continue
                    rec = dict(el.attrib)
                    for child in el:
                        if len(child) == 0 and child.text is not None:
                            rec[child.tag] = child.text.strip()
                    tags.append(el.tag)
                    props.append(json.dumps(rec, sort_keys=True))
                    el.clear()  # stream: free the subtree
            yield pd.DataFrame({"tag": tags, "_props": props})

    raw = spark.read.text(path, wholetext=True)
    return raw.mapInPandas(batches, schema)


def read_orientdb_export(spark: SparkSession, path: str) -> DataFrame:
    """OrientDB database-export JSON (OrientDBImporter.java:349-394:
    top-level ``info``/``clusters``/``schema``/``records`` sections;
    each record carries ``@class``, ``@rid``, ``@type``).

    Returns (rid, class, rtype, _props) with the record body as a JSON
    string.  ``.gz`` exports are decompressed inline.  One task per
    file, like the reference's streaming importer."""
    import gzip
    import json
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("rid", T.StringType()),
            T.StructField("class", T.StringType()),
            T.StructField("rtype", T.StringType()),
            T.StructField("_props", T.StringType()),
        ]
    )

    binary = path.endswith(".gz")
    reader = (
        spark.read.format("binaryFile").load(path)
        if binary
        else spark.read.text(path, wholetext=True)
    )
    col = "content" if binary else "value"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rids, classes, rtypes, props = [], [], [], []
            for blob in pdf[col]:
                text = (
                    gzip.decompress(bytes(blob)).decode()
                    if binary
                    else blob
                )
                doc = json.loads(text)
                for rec in doc.get("records", []):
                    rids.append(rec.get("@rid"))
                    classes.append(rec.get("@class"))
                    rtypes.append(rec.get("@type"))
                    props.append(
                        json.dumps(
                            {
                                k: v
                                for k, v in rec.items()
                                if not k.startswith("@")
                            },
                            sort_keys=True,
                        )
                    )
            yield pd.DataFrame(
                {
                    "rid": rids,
                    "class": classes,
                    "rtype": rtypes,
                    "_props": props,
                }
            )

    out = reader.select(col) if binary else reader
    return out.mapInPandas(batches, schema)


def read_neo4j_export(spark: SparkSession, path: str):
    """Neo4j/APOC JSONL export → (nodes_df, relationships_df).

    Format (integration/…/format/Neo4jImporterFormat.java; sample at
    integration/src/test/resources/neo4j-export-mini.jsonl): one JSON
    object per line, ``type`` ∈ {node, relationship}; nodes carry
    (id, labels[], properties{}), relationships carry
    (id, label, start.id, end.id, properties{}).

    Properties are heterogeneous per row, so they stay as a raw JSON
    string column (the schema-flexible ``_props`` convention) — extract
    typed values with get_json_object/from_json downstream.  The parse
    is pure Column work (from_json + get_json_object) over text splits,
    so it distributes like any text source.
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    env = raw.select(
        F.get_json_object("value", "$.type").alias("rec_type"),
        F.get_json_object("value", "$.id").alias("id"),
        F.from_json(
            F.get_json_object("value", "$.labels"), "array<string>"
        ).alias("labels"),
        F.get_json_object("value", "$.label").alias("label"),
        F.get_json_object("value", "$.start.id").alias("start_id"),
        F.get_json_object("value", "$.end.id").alias("end_id"),
        F.get_json_object("value", "$.properties").alias("properties"),
    )
    nodes = env.filter(F.col("rec_type") == "node").select(
        "id", "labels", "properties"
    )
    rels = env.filter(F.col("rec_type") == "relationship").select(
        "id", "label", "start_id", "end_id", "properties"
    )
    return nodes, rels


def import_neo4j_graph(db, path: str) -> dict[str, int]:
    """Load a Neo4j export into the property graph: one vertex type per
    primary label, one edge type per relationship label
    (Neo4jImporter.java run loop :313-395).  Returns per-type counts."""
    from pyspark.sql import functions as F

    nodes, rels = read_neo4j_export(db.spark, path)
    g = db.graph()
    counts: dict[str, int] = {}
    # vid = xxhash64 of the export id, bit 61 set (disjoint from catalog
    # and CREATE-vid spaces)
    vid = (F.xxhash64("id").bitwiseAND(F.lit((1 << 60) - 1)) + F.lit(1 << 61))
    nodes = nodes.withColumn("vid", vid).cache()
    for (label,) in nodes.select(
        F.element_at("labels", 1).alias("l")
    ).distinct().collect():
        part = nodes.filter(F.element_at("labels", 1) == label).select(
            "vid", "id", F.col("properties").alias("_props"),
            F.lit(label).alias("@type"),
        )
        db.schema.register(f"{label}", part)
        g.vertex_dfs[label.lower()] = part
        counts[label] = part.count()
    svid = (F.xxhash64("start_id").bitwiseAND(F.lit((1 << 60) - 1)) + F.lit(1 << 61))
    dvid = (F.xxhash64("end_id").bitwiseAND(F.lit((1 << 60) - 1)) + F.lit(1 << 61))
    for (elabel,) in rels.select("label").distinct().collect():
        part = rels.filter(F.col("label") == elabel).select(
            svid.alias("__s"), dvid.alias("__d"),
            F.col("properties").alias("_props"),
        )
        g.add_edges(elabel, part, "__s", "__d", props=["_props"])
        counts[elabel] = part.count()
    return counts
