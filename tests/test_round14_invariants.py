"""Round-14 optimization invariants.

Every round-14 restructure must be row-identical to the shape it
replaced; these pins make the equivalences regression-proof:

- the recall family's shared eval-prediction artifact reproduces each
  standalone read path's rows exactly (the one-window single/multi
  lists, the shared ADC shortlist prefix);
- the per-rung prediction keys are UNIQUE (ADVICE r13: the family's
  left-join counting silently inflates if a path ever emits duplicate
  keys — pin it loudly instead);
- the scalar-subquery share denominators left no SinglePartition
  exchange (non-agg consumer) or nested-loop join behind.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions import pipeline_queries as pq


def test_eval_neighbor_lists_match_standalone_paths(spark, sf_dir):
    single, multi = pq._knn_eval_neighbor_lists(spark, sf_dir)
    s_ref = {
        tuple(r)
        for r in pq.knn_ivf_join(spark, sf_dir)
        .filter(F.col("vec_id") < pq.KNN_EVAL_SAMPLE)
        .select("vec_id", "neighbor_id")
        .collect()
    }
    m_ref = {
        tuple(r)
        for r in pq.knn_ivf_multiprobe(spark, sf_dir)
        .filter(F.col("vec_id") < pq.KNN_EVAL_SAMPLE)
        .select("vec_id", "neighbor_id")
        .collect()
    }
    assert {tuple(r) for r in single.collect()} == s_ref
    assert {tuple(r) for r in multi.collect()} == m_ref


def test_shared_shortlist_prefix_is_ivf_pq(spark, sf_dir):
    sl = pq._adc_topk(
        spark,
        sf_dir,
        pq._ivf_pruned_codes(spark, sf_dir),
        k=pq.PQ_REFINE_SHORTLIST,
    )
    got = sorted(r.vec_id for r in sl.limit(10).select("vec_id").collect())
    ref = sorted(
        r.vec_id for r in pq.knn_ivf_pq(spark, sf_dir).select("vec_id").collect()
    )
    assert got == ref


def test_eval_prediction_artifact_matches_rungs_and_is_unique(spark, sf_dir):
    preds = pq._knn_eval_predictions(spark, sf_dir)
    # ADVICE r13: the family's left-join counting rests on per-rung key
    # uniqueness — pin count == countDistinct on the artifact itself
    n = preds.count()
    nd = preds.select("path", "vec_id", "nid").distinct().count()
    assert n == nd, "eval-prediction artifact has duplicate keys"
    # rung-by-rung row equality with the standalone queries
    by_path = {
        p: {(r.vec_id, r.nid) for r in preds.filter(F.col("path") == p).collect()}
        for p in ("pq_adc", "ivf_pq", "ivf_pq_refined")
    }
    for qid_fn, path in (
        (pq.knn_pq_adc, "pq_adc"),
        (pq.knn_ivf_pq, "ivf_pq"),
        (pq.knn_ivf_pq_refined, "ivf_pq_refined"),
    ):
        ref = {
            (r.vec_id, -1)
            for r in qid_fn(spark, sf_dir).select("vec_id").collect()
        }
        assert by_path[path] == ref, path


def test_family_report_matches_recomputed_stats(spark, sf_dir):
    rows = {r.path: r for r in pq.knn_recall_family(spark, sf_dir).collect()}
    assert set(rows) == {
        "ivf_single",
        "ivf_multiprobe",
        "pq_adc",
        "ivf_pq",
        "ivf_pq_refined",
    }
    # recompute ivf_single's stats from first principles
    truth = {
        tuple(r)
        for r in pq._knn_exact_truth(spark, sf_dir)
        .select("vec_id", "neighbor_id")
        .collect()
    }
    single, _ = pq._knn_eval_neighbor_lists(spark, sf_dir)
    pred = {tuple(r) for r in single.collect()}
    r = rows["ivf_single"]
    assert r.n_truth == len(truth)
    assert r.n_hits == len(truth & pred)


@pytest.mark.parametrize(
    "qid",
    [
        "agg_weekday_seasonality",
        "agg_order_lines_hist",
        "session_length_stats",
        "events_hourly_heatmap",
        "dq_freshness_report",
        "dedup_cross_source_pairs",
        "dedup_cluster_size_hist",
        "corpus_mix_divergence",
        "corpus_source_lang_matrix",
    ],
)
def test_scalar_subquery_conversions_lint_clean(spark, sf_dir, qid):
    from flink_kafka_replicator_spark.plans import lint_plan
    from flink_kafka_replicator_spark.registry import all_queries

    hits = lint_plan(all_queries()[qid](spark, sf_dir))
    assert not hits, f"{qid} expected CLEAN after round 14, got {hits}"


def test_interval_overlap_sweep_equals_binned_join(spark, sf_dir):
    """Round 14 rewrote join_interval_overlap from the hour-bucket
    fan-out equi-join to a day-partitioned sweep (prefix integrals).
    Pin row-identity against an inline replay of the binned form."""
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.operators.joins import (
        _HOUR_US,
        _INCIDENT_HALF_US,
        join_interval_overlap,
    )

    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.min(F.unix_micros("ts")).alias("a_start"),
        F.max(F.unix_micros("ts")).alias("a_end"),
    )
    incidents = e.filter(F.col("event_type") == "error").select(
        (F.unix_micros("ts") - F.lit(_INCIDENT_HALF_US)).alias("w_start"),
        (F.unix_micros("ts") + F.lit(_INCIDENT_HALF_US)).alias("w_end"),
    )
    a = spans.select(
        "user_id", "day", "a_start", "a_end",
        F.explode(F.sequence(
            F.expr(f"a_start div {_HOUR_US}"),
            F.expr(f"a_end div {_HOUR_US}"),
        )).alias("bucket"),
    )
    b = incidents.select(
        "w_start", "w_end",
        F.explode(F.sequence(
            F.expr(f"w_start div {_HOUR_US}"),
            F.expr(f"w_end div {_HOUR_US}"),
        )).alias("bucket"),
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("a_start") <= F.col("w_end"))
        & (F.col("w_start") <= F.col("a_end"))
        & (F.col("bucket") == F.expr(f"greatest(a_start, w_start) div {_HOUR_US}"))
    )
    ref = {
        (r.user_id, r.day): (r.n_incidents, r.overlap_sec)
        for r in pairs.groupBy("user_id", "day").agg(
            F.count("*").alias("n_incidents"),
            F.round(
                F.sum(
                    F.least("a_end", "w_end")
                    - F.greatest("a_start", "w_start")
                ) / F.lit(1_000_000.0),
                4,
            ).alias("overlap_sec"),
        ).collect()
    }
    got = {
        (r.user_id, r.day): (r.n_incidents, r.overlap_sec)
        for r in join_interval_overlap(spark, sf_dir).collect()
    }
    assert got == ref
