"""Event-time physical-layout robustness (VERDICT r3 tasks 1 & 6).

The driver's testdata writer has already shipped ``events.ts`` in two
physical parquet layouts (TIMESTAMP(NANOS) → nanos long under
legacy.parquet.nanosAsLong; naive micros → TIMESTAMP_NTZ) and will
change again. ``io.load_table`` is the single normalization point: every
layout must surface as plain ``TimestampType`` with identical values, so
no operator — and no ``withWatermark`` — ever sees the physical flavor.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from flink_kafka_replicator_spark.io import TABLES, load_table, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_load_table_pins_ts_to_timestamp_type(spark):
    """The engine's declared schema (SURVEY §1.4): event time is a proper
    TimestampType regardless of what the parquet footer says."""
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"ts must normalize to TimestampType, got {ev.schema['ts'].dataType}"
    )
    assert not isinstance(ev.schema["ts"].dataType, TimestampNTZType)


def _write_layouts(spark, tmp_path):
    """Materialize events.parquet in both physical layouts, with the other
    tables symlinked so each tmp dir is a complete sf_dir."""
    ev = load_table(spark, SF_DIR, "events")
    dirs = {}
    for layout in ("ltz", "ntz"):
        d = tmp_path / layout
        d.mkdir()
        for t in TABLES:
            if t != "events":
                os.symlink(table_path(SF_DIR, t), str(d / f"{t}.parquet"))
        out = ev
        if layout == "ntz":
            out = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        out.write.parquet(str(d / "events.parquet"))
        dirs[layout] = str(d)
    return dirs


# the ts-consuming surface: analytic windows over event time, the
# event-time cast paths that broke on the r3 regeneration, streaming
# batch twins, and time-series rollups
_TS_QUERY_IDS = (
    "window_lag_delta",
    "window_range_frame",
    "window_running_sum",
    "stream_tumbling",
    "stream_session",
    "stream_watermark",
    "resample_ohlc",
    "time_rollup_hierarchy",
)


@pytest.fixture(scope="module")
def layout_dirs(spark, tmp_path_factory):
    return _write_layouts(spark, tmp_path_factory.mktemp("ts_layouts"))


@pytest.mark.parametrize("qid", _TS_QUERY_IDS)
def test_ts_queries_identical_across_layouts(spark, layout_dirs, qid):
    """Every ts-touching query returns IDENTICAL rows whether events.ts
    was written as UTC-adjusted micros (LTZ) or naive micros (NTZ)."""
    from flink_kafka_replicator_spark.registry import all_queries

    fn = all_queries()[qid]
    ltz = fn(spark, layout_dirs["ltz"])
    ntz = fn(spark, layout_dirs["ntz"])
    assert ltz.schema == ntz.schema, f"{qid}: schema drift between layouts"
    # symmetric difference empty ⇔ same multiset of rows
    assert ltz.exceptAll(ntz).count() == 0 and ntz.exceptAll(ltz).count() == 0, (
        f"{qid}: values differ between LTZ and NTZ physical layouts"
    )


def test_watermark_works_on_both_layouts(spark, layout_dirs, tmp_path):
    """withWatermark must accept the normalized ts from either layout
    (TIMESTAMP_NTZ raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE if it
    leaks through load_table)."""
    for layout, d in layout_dirs.items():
        ev = load_table(spark, d, "events")
        stream = (
            spark.readStream.schema(ev.schema)
            .parquet(os.path.join(d, "events.parquet"))
            .withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 hour"))
            .count()
        )
        assert stream.isStreaming  # analysis succeeded → watermark accepted
