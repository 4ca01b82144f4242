"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (count + columns + values); rows-only
queries must at least produce a stable schema and non-negative rows."""

from __future__ import annotations

import pytest

from flink_kafka_replicator_spark.registry import all_oracles, all_queries

from .oracle import compare, duckdb_connection

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, con, qid):
    df = QUERIES[qid](spark, sf_dir)
    sql = ORACLES.get(qid)
    if sql is None:
        n = df.count()
        assert n >= 0
        assert len(df.schema.fields) > 0
        rerun = QUERIES[qid](spark, sf_dir)
        assert rerun.schema == df.schema, "rows-only query schema is unstable"
    else:
        compare(df, con, sql)
