"""Sharded corpus sink: stability, file layout, and partition pruning."""

from __future__ import annotations

import glob
import os

from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.plans import formatted_plan
from flink_kafka_replicator_spark.sinks import (
    read_corpus_shard,
    with_shard,
    write_sharded_corpus,
)


def test_sharded_write_roundtrip_and_stability(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_sharded_corpus(d, out)

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    # shard assignment is content-derived → identical across runs
    a = {r.doc_id: r.shard for r in with_shard(d).select("doc_id", "shard").collect()}
    b = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert a == b

    # repartition-before-write: one file per populated shard dir, not
    # (tasks × shards) small files
    for shard_dir in glob.glob(os.path.join(out, "shard=*")):
        files = [f for f in os.listdir(shard_dir) if f.endswith(".parquet")]
        assert len(files) == 1, f"{shard_dir} has {len(files)} files"


def test_shard_read_is_partition_pruned(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_sharded_corpus(d, out)

    one = read_corpus_shard(spark, out, 3)
    plan = formatted_plan(one)
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], f"no partition pruning:\n{plan}"
    got = {r.shard for r in one.select("shard").distinct().collect()}
    assert got <= {3}


def test_format_roundtrips(spark, sf_dir, tmp_path):
    from flink_kafka_replicator_spark.sources.files import (
        read_table_fmt,
        write_table_fmt,
    )

    o = load_table(spark, sf_dir, "orders")
    want = sorted(map(tuple, o.collect()))
    for fmt in ("parquet", "orc", "csv", "json"):
        path = str(tmp_path / fmt)
        write_table_fmt(o, path, fmt)
        back = read_table_fmt(spark, path, fmt, schema=o.schema)
        assert sorted(map(tuple, back.collect())) == want, f"{fmt} roundtrip"


def test_csv_json_require_schema(spark, tmp_path):
    import pytest
    from flink_kafka_replicator_spark.sources.files import read_table_fmt

    with pytest.raises(ValueError, match="explicit schema"):
        read_table_fmt(spark, str(tmp_path), "csv")


def test_parquet_schema_evolution_merge_schema(spark, tmp_path):
    """Storage-level schema evolution: two parquet batches with
    different schemas read back as one table with mergeSchema — old
    files null-pad the new column, and a filter on the new column still
    prunes correctly."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id").alias("doc_id")).write.parquet(f"{out}/b1")
    spark.range(5, 10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.parquet(f"{out}/b2")
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )
    assert set(merged.columns) == {"doc_id", "lang"}
    assert merged.count() == 10
    assert merged.filter(F.col("lang").isNull()).count() == 5
    assert merged.filter(F.col("lang") == "en").count() == 5


def test_format_helpers_round_trip_all_formats(spark, tmp_path, sf_dir):
    """write_table_fmt/read_table_fmt round-trip the orders table through
    every supported format; csv/json require the explicit schema (no
    silent inference pass over 100 TB)."""
    import pytest as _pytest

    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sources.files import (
        SUPPORTED_FORMATS,
        read_table_fmt,
        write_table_fmt,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    want = {(r[0], r[1], round(r[2], 4)) for r in o.collect()}
    for fmt in SUPPORTED_FORMATS:
        path = str(tmp_path / fmt)
        write_table_fmt(o, path, fmt)
        back = read_table_fmt(
            spark,
            path,
            fmt,
            schema=None if fmt in ("parquet", "orc") else o.schema,
        )
        got = {(r[0], r[1], round(r[2], 4)) for r in back.collect()}
        assert got == want, f"{fmt} round trip lost rows"
    with _pytest.raises(ValueError):
        read_table_fmt(spark, str(tmp_path / "csv"), "csv")  # schema required
    with _pytest.raises(ValueError):
        write_table_fmt(o, str(tmp_path / "x"), "avro")  # unsupported


def test_minhash_index_delta_append_equals_rebuild(spark, tmp_path, sf_dir):
    """Index MAINTENANCE: appending a document batch via
    append_minhash_delta must leave the index equivalent to a
    from-scratch rebuild over base+batch — same band rows, same merged
    stats — and a later batch's dedup against the delta-extended index
    must equal its dedup against the rebuilt index, INCLUDING pairs
    whose old side was admitted by the delta (batch-2 near-dups of
    batch-1 docs). Replayed deltas are no-ops."""
    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.sinks import (
        append_minhash_delta,
        read_minhash_index,
        write_minhash_index,
    )
    from flink_kafka_replicator_spark.streaming.dedup_ingest import (
        dedup_batch_against_index,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 3 == 0)
    batch1 = d.filter(F.col("doc_id") % 3 == 1)
    batch2 = d.filter(F.col("doc_id") % 3 == 2)

    inc_dir = str(tmp_path / "inc")
    write_minhash_index(base, inc_dir)
    assert append_minhash_delta(batch1, inc_dir, delta_id=1) is True

    rebuild_dir = str(tmp_path / "rebuild")
    write_minhash_index(base.unionByName(batch1), rebuild_dir)

    def snapshot(ix):
        bands, stats = read_minhash_index(spark, ix)
        return (
            {(r.doc_id, r.band_key) for r in bands.collect()},
            {(r.band_key, r.n) for r in stats.collect()},
        )

    b_inc, s_inc = snapshot(inc_dir)
    b_re, s_re = snapshot(rebuild_dir)
    assert b_inc == b_re, "delta-extended band rows != rebuild"
    assert s_inc == s_re, "merged stats != rebuild stats"

    # replay of an applied delta is a no-op
    assert append_minhash_delta(batch1, inc_dir, delta_id=1) is False
    assert snapshot(inc_dir) == (b_inc, s_inc)

    # batch 2 detects near-dups of batch-1 docs through the delta path
    lookup = d
    pairs_inc = {
        (r.new_id, r.old_id, r.jaccard)
        for r in dedup_batch_against_index(
            spark, batch2, inc_dir, lookup
        ).collect()
    }
    pairs_re = {
        (r.new_id, r.old_id, r.jaccard)
        for r in dedup_batch_against_index(
            spark, batch2, rebuild_dir, lookup
        ).collect()
    }
    assert pairs_inc == pairs_re
    cross = {p for p in pairs_inc if p[1] % 3 == 1}
    assert cross, "fixture must hold a batch2-vs-batch1 near-dup pair"
