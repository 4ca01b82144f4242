"""Avro payload decode/encode — schema-on-read for Kafka envelopes.

The reference carries a payload-decode dependency it never wires up
(reference: pom.xml:62-66 pulls flink-json next to the Kafka connector;
no deserializer beyond the byte envelope is ever constructed —
KafkaMessageDeserializationSchema.java:14-22 passes bytes through).
The engine's schema-on-read surface covers json/csv/xml
(operators/scalar_fns.py: fn_json_struct / fn_csv_parse /
fn_xml_parse); this module closes the contemplated-but-unbuilt Avro
leg the same way the confluent-kafka admin adapter is closed
(streaming/admin.py:189): a real implementation behind a loud
import/classpath gate, never a silent stub.

Spark ships ``from_avro`` / ``to_avro`` as thin wrappers over the
``spark-avro`` connector jar, which is NOT bundled with a plain
pyspark install (this container included). Where the jar is present
(``--packages org.apache.spark:spark-avro_2.13:<ver>`` or a bundled
distro) everything here works unchanged; where it is absent,
``require_avro`` raises NotImplementedError with the exact fix, and
the round-trip pytest self-unskips (tests/test_avro_codec.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

# jar coordinates to surface in the error message — keep in one place
_AVRO_ARTIFACT = "org.apache.spark:spark-avro_2.13:<spark-version>"


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro connector classes are on the JVM
    classpath (the pyspark wrappers exist regardless — availability is
    a classpath question, not an import question)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def require_avro(spark: SparkSession) -> None:
    """Loud gate: NotImplementedError with the exact remedy when the
    connector jar is missing — mirrors confluent_admin_client's
    pattern (a deployment with the jar runs everything unchanged)."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro connector jar is not on this cluster's "
            "classpath; submit with --packages "
            f"{_AVRO_ARTIFACT} (or add the jar to spark.jars) to "
            "enable Avro payload decode"
        )


def decode_avro(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    json_schema: str,
    out: str = "decoded",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Schema-on-read over a binary Avro column: adds ``out`` as the
    parsed struct, keeping every other column (the fn_json_struct
    shape for Avro). ``options={"mode": "PERMISSIVE"}`` yields NULL on
    corrupt records instead of failing the task — the right default
    for a replicator sitting on a topic it does not own."""
    require_avro(spark)
    from pyspark.sql.avro.functions import from_avro

    opts = {"mode": "PERMISSIVE", **(options or {})}
    return df.withColumn(out, from_avro(df[col], json_schema, opts))


def encode_avro(spark: SparkSession, column: Column) -> Column:
    """Inverse leg (``to_avro``) — lets the replicator re-serialize a
    projected/filtered payload before the Kafka sink."""
    require_avro(spark)
    from pyspark.sql.avro.functions import to_avro

    return to_avro(column)
