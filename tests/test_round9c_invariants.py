"""Round-9 (third session) invariants: the smoothing / robust-stats /
budget / tokenizer-induction batch. Each test pins the structural or
mathematical property the oracle-parity hash can't express.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    TOKEN_BUDGET_PER_SOURCE,
    bpe_pair_counts,
    corpus_token_budget,
    quality_perplexity_buckets,
    text_entropy,
)
from flink_kafka_replicator_spark.operators.data_quality import (
    dq_benford,
    dq_winsorize,
)
from flink_kafka_replicator_spark.operators.windows import window_ewma

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------- window_ewma


def test_ewma_first_row_equals_value_and_bounded(spark):
    """With no history the smoother must return the sample itself; with
    history it stays inside the [min, max] hull of the CONTRIBUTING
    8-sample trailing window (convexity of the weights). The window's
    (ts, event_id) ordering isn't in the query output, so re-derive it
    from the events table and key the comparison by event_id."""
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.operators.windows import EWMA_LAGS

    ewma_by_event = {
        r.event_id: r.ewma for r in window_ewma(spark, SF_DIR).collect()
    }
    ordering = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ordering:
        by_user.setdefault(r.user_id, []).append(r)
    checked_first = checked_hull = 0
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.ts, r.event_id))
        first = user_rows[0]
        assert (
            abs(ewma_by_event[first.event_id] - round(first.value, 4))
            <= 1e-4 + 1e-9
        ), "first row per user must smooth to the sample itself"
        checked_first += 1
        for i, r in enumerate(user_rows):
            window = user_rows[max(0, i - EWMA_LAGS + 1): i + 1]
            lo = min(x.value for x in window)
            hi = max(x.value for x in window)
            # query output rounds to 4 decimals — allow that quantum
            assert lo - 1e-4 - 1e-9 <= ewma_by_event[r.event_id] <= (
                hi + 1e-4 + 1e-9
            ), f"ewma left the trailing-{EWMA_LAGS} hull"
            checked_hull += 1
    assert checked_first > 1 and checked_hull > checked_first


def test_ewma_single_window_exchange(spark):
    """All 8 lags share one window frame: the plan carries exactly one
    Window node and one shuffle exchange."""
    plan = _plan(window_ewma(spark, SF_DIR))
    assert plan.count("Window") >= 1
    # one exchange for the user_id partitioning, nothing else
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, f"expected 1 shuffle, saw {n_ex}:\n{plan}"


def test_ewma_constant_series_is_identity(spark):
    """EWMA of a constant series is that constant, exactly — the
    integer-weight normalization must not leak mass."""
    df = spark.createDataFrame(
        [(i, float(i), 1, 7.25) for i in range(12)],
        "event_id long, _o double, user_id long, value double",
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("_o")).alias("ts"),
        "user_id",
        F.lit("x").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = window_ewma(spark, td).collect()
    assert all(abs(r.ewma - 7.25) < 1e-9 for r in out)


# ----------------------------------------------------------- dq_benford


def test_benford_shares_partition_unity(spark):
    rows = dq_benford(spark, SF_DIR).collect()
    digits = sorted(r.digit for r in rows)
    assert set(digits) <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    # expected shares are the Benford weights, quantized
    for r in rows:
        want = math.floor(math.log10(1 + 1 / r.digit) * 1e6) / 1e6
        assert abs(r.exp_share - round(want, 6)) < 1e-9


# --------------------------------------------------------- dq_winsorize


def test_winsorize_bounds_and_clip_fractions(spark):
    rows = dq_winsorize(spark, SF_DIR).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.p05 <= r.p95
        assert r.p05 - 1e-9 <= r.mean_winsor <= r.p95 + 1e-9
        # each tail clips at most ~5% of the group (ties can only
        # reduce the clip count, never grow it)
        assert r.n_clip_lo <= int(r.n_rows * 0.05) + 1
        assert r.n_clip_hi <= int(r.n_rows * 0.05) + 1
        # clamping pulls the mean toward the hull, never outside it
        assert min(r.mean_raw, r.p05) - 1e-9 <= r.mean_winsor


def test_winsorize_bounds_join_is_broadcast(spark):
    plan = _plan(dq_winsorize(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --------------------------------------------------- corpus_token_budget


def test_token_budget_respected_per_source(spark):
    rows = corpus_token_budget(spark, SF_DIR).collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    assert per_source, "budget selected nothing"
    for source, rs in per_source.items():
        assert sum(r.n_tokens for r in rs) <= TOKEN_BUDGET_PER_SOURCE, source
        assert max(r.cum_tokens for r in rs) <= TOKEN_BUDGET_PER_SOURCE
        # the kept set is a quality-ordered prefix: every kept doc's
        # quality >= the quality of any kept doc with larger cum
        ordered = sorted(rs, key=lambda r: r.cum_tokens)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.quality, -a.doc_id) >= (b.quality, -b.doc_id)


def test_token_budget_single_window_exchange(spark):
    plan = _plan(corpus_token_budget(spark, SF_DIR))
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, f"expected 1 shuffle, saw {n_ex}"


# ------------------------------------------- quality_perplexity_buckets


def test_perplexity_buckets_partition_each_lang(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    lang_counts = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rows = quality_perplexity_buckets(spark, SF_DIR).collect()
    got: dict = {}
    means: dict = {}
    for r in rows:
        got[r.lang] = got.get(r.lang, 0) + r.n_docs
        means.setdefault(r.lang, {})[r.bucket] = r.mean_neg_logp
    assert got == lang_counts
    # head = most fluent tertile: its mean neg-logp can't exceed tail's
    for lang, m in means.items():
        if "head" in m and "tail" in m:
            assert m["head"] <= m["tail"] + 1e-9, lang


# --------------------------------------------------------- text_entropy


def test_entropy_bounds(spark):
    rows = text_entropy(spark, SF_DIR).collect()
    for r in rows:
        assert -1e-4 <= r.token_entropy
        # H <= ln(distinct) (uniform maximizes entropy); quantization
        # slack of 1e-4 on each side
        assert r.token_entropy <= math.log(max(r.n_distinct, 1)) + 1e-3
        assert r.n_distinct <= r.n_tokens


def test_entropy_is_map_side_only(spark):
    plan = _plan(text_entropy(spark, SF_DIR))
    assert "Exchange" not in plan, f"entropy must not shuffle:\n{plan}"


def test_entropy_degenerate_doc_is_zero(spark):
    """A one-token-repeated document has zero entropy exactly."""
    import tempfile

    df = spark.createDataFrame(
        [(1, "spam spam spam spam", "en", "src0", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = text_entropy(spark, td).collect()
    assert out[0].token_entropy == 0.0
    assert out[0].n_distinct == 1


# ------------------------------------------------------ bpe_pair_counts


def test_bpe_pairs_ordered_and_takeordered(spark):
    df = bpe_pair_counts(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    counts = [r.weighted_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # every pair is two single characters separated by a space
    for r in rows:
        parts = r.pair.split(" ")
        assert len(parts) == 2 and all(len(p) == 1 for p in parts), r.pair
    assert "TakeOrderedAndProject" in _plan(df)
