"""Avro payload decode: loud gate without the jar, full round-trip with it.

Self-unskipping (the confluent-kafka pattern): on a cluster whose
classpath carries spark-avro, the round-trip case runs for real; in
this container (plain pyspark wheel, no connector jar) it skips and
the gate tests prove the failure is LOUD, never a silent no-op.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.avro_codec import (
    avro_available,
    decode_avro,
    encode_avro,
    require_avro,
)

SCHEMA = (
    '{"type":"record","name":"msg","fields":['
    '{"name":"k","type":"long"},{"name":"v","type":"string"}]}'
)


def test_gate_raises_loudly_without_jar(spark):
    if avro_available(spark):
        pytest.skip("spark-avro present: gate untestable, round-trip runs")
    with pytest.raises(NotImplementedError, match="spark-avro"):
        require_avro(spark)
    df = spark.range(1).select(
        F.col("id").cast("string").cast("binary").alias("payload")
    )
    with pytest.raises(NotImplementedError, match="--packages"):
        decode_avro(spark, df, "payload", SCHEMA)
    with pytest.raises(NotImplementedError, match="--packages"):
        encode_avro(spark, F.struct(F.lit(1).alias("k")))


def test_avro_round_trip_where_available(spark):
    if not avro_available(spark):
        pytest.skip("spark-avro jar not on classpath in this container")
    src = spark.range(5).select(
        F.struct(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ).alias("payload")
    )
    enc = src.select(encode_avro(spark, F.col("payload")).alias("bin"))
    dec = decode_avro(spark, enc, "bin", SCHEMA, out="payload")
    got = sorted(
        (r.payload.k, r.payload.v) for r in dec.select("payload").collect()
    )
    assert got == [(i, f"v{i}") for i in range(5)]
