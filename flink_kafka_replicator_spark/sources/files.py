"""File-based KafkaMessage-envelope streams.

Used two ways:
  - tests: an unbounded micro-batch stream over parquet files shaped
    like the canonical envelope (SURVEY.md §1.4) — the broker-free
    harness for replication semantics;
  - production: generic file source for batch backfills of the same
    pipeline (identical plan either way — the unified batch/stream
    model is the point of Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import KAFKA_MESSAGE


def envelope_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(KAFKA_MESSAGE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(KAFKA_MESSAGE).parquet(path)


# ------------------------------------------------- generic format support

# The reference reads/writes only Kafka (SURVEY.md §2.4); the analytics
# engine fronts Spark's columnar/row file formats behind one pair of
# helpers. Parquet/ORC carry their own schema; CSV/JSON require an
# explicit one on read — schema inference is a full extra pass at 100 TB
# and silently wrong on empty partitions, so it is not offered.
SUPPORTED_FORMATS = ("parquet", "orc", "csv", "json")


def write_table_fmt(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def read_table_fmt(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} requires an explicit schema (no inference pass)")
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


# -------------------------------------------- corpus / media ingestion

def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id bigint, text string",
) -> DataFrame:
    """Read a JSON-Lines document corpus — THE interchange format for
    training-data corpora (one JSON object per line; Spark's json
    source is line-delimited by default, so this is a plain schema'd
    read: splittable, parallel, no inference pass). Corrupt lines land
    in ``_corrupt_record`` via PERMISSIVE mode instead of failing the
    job — count them, don't die on a 100 TB crawl."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_binary_blobs(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read raw media files as opaque binary blobs via Spark's built-in
    ``binaryFile`` source — the ingestion front of the multimodal
    column pipeline (`functions/multimodal.py`): one row per file with
    (path, modificationTime, length, content). The content column goes
    straight into decode_image_meta / decode_audio_meta as the ``blob``.
    ``glob`` filters by pathGlobFilter at listing time (e.g.
    ``*.png``) — pruning before any byte is read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text_lines(
    spark: SparkSession, path: str, whole_text: bool = False
) -> DataFrame:
    """Read raw text: one row per LINE (splittable, the raw-crawl
    shape) or one row per FILE (``whole_text=True`` — document-per-file
    corpora; not splittable, so shard such corpora into many files)."""
    return spark.read.text(path, wholetext=whole_text)
