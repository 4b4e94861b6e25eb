"""Import/export formats beyond Spark's native readers.

Reference: integration/src/main/java/com/arcadedb/integration/importer/
format/*.java — CSV/JSON/JSONL/XML map directly to ``spark.read``
(Spark 4 has native XML); the formats below need small custom readers.
All are DataFrame programs over ``spark.read.text`` — line parsing happens
in codegen (split/regexp), not Python, so ingest scales with the cluster.
"""

from arcadedb_spark.sources.readers import (
    export_jsonl,
    read_glove,
    read_ntriples,
    read_orientdb_export,
    read_word2vec,
    read_xml,
)

__all__ = [
    "read_glove",
    "read_word2vec",
    "read_ntriples",
    "read_xml",
    "read_orientdb_export",
    "export_jsonl",
]
