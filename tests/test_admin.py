"""Control-plane decision-matrix tests (reference semantics:
FlinkKafkaReplicator.java:198-277) against the in-memory fake client."""

from __future__ import annotations

import pytest

from flink_kafka_replicator_spark.model import Topic
from flink_kafka_replicator_spark.streaming.admin import (
    CheckReport,
    FakeAdminClient,
    check_topics,
    config_diff,
    get_topics,
)


def _src():
    return FakeAdminClient(
        {
            "app.events": Topic("app.events", 4, {"retention.ms": "1000", "cleanup.policy": "delete"}),
            "app.logs": Topic("app.logs", 2, {"retention.ms": "2000"}),
            "other": Topic("other", 1, {}),
        }
    )


def test_topic_discovery_regex_filter():
    names = [t.name for t in get_topics(_src(), r"app\..*")]
    assert names == ["app.events", "app.logs"]
    assert [t.name for t in get_topics(_src(), "other")] == ["other"]


def test_missing_topic_fails_without_create():
    with pytest.raises(RuntimeError, match="does not exist"):
        check_topics(_src(), FakeAdminClient(), r"app\..*")


def test_missing_topic_created_with_flag():
    dst = FakeAdminClient()
    report = check_topics(_src(), dst, r"app\..*", create_topics=True)
    assert sorted(report.created) == ["app.events", "app.logs"]
    assert dst.topics["app.events"].partitions == 4
    assert dst.topics["app.events"].config["retention.ms"] == "1000"


def test_fewer_partitions_fail_grow_or_warn():
    def dst():
        return FakeAdminClient(
            {
                "app.events": Topic("app.events", 2, {"retention.ms": "1000", "cleanup.policy": "delete"}),
                "app.logs": Topic("app.logs", 2, {"retention.ms": "2000"}),
            }
        )

    with pytest.raises(RuntimeError, match="fewer partitions"):
        check_topics(_src(), dst(), r"app\..*")

    d = dst()
    report = check_topics(_src(), d, r"app\..*", create_partitions=True)
    assert report.grown == ["app.events"]
    assert d.topics["app.events"].partitions == 4

    report = check_topics(_src(), dst(), r"app\..*", preserve_partitioning=False)
    assert any("redistributed" in w for w in report.warnings)


def test_more_partitions_warns():
    dst = FakeAdminClient(
        {
            "app.events": Topic("app.events", 8, {"retention.ms": "1000", "cleanup.policy": "delete"}),
            "app.logs": Topic("app.logs", 2, {"retention.ms": "2000"}),
        }
    )
    report = check_topics(_src(), dst, r"app\..*")
    assert any("more partitions" in w for w in report.warnings)


def test_config_diff_null_aware():
    diff = config_diff(
        {"a": "1", "b": "2", "c": None}, {"a": "1", "b": "3", "d": "4"}
    )
    # value drift and one-sided keys are reported; explicit-null equals
    # absent (null-aware equality, the <=> semantics)
    assert diff == {"b": ("2", "3"), "d": (None, "4")}


def test_config_sync_with_flag():
    dst = FakeAdminClient(
        {
            "app.events": Topic("app.events", 4, {"retention.ms": "9999", "cleanup.policy": "delete"}),
            "app.logs": Topic("app.logs", 2, {"retention.ms": "2000"}),
        }
    )
    report = check_topics(_src(), dst, r"app\..*", sync_properties=True)
    assert report.synced == ["app.events"]
    assert dst.topics["app.events"].config["retention.ms"] == "1000"


def test_config_drift_warns_without_flag():
    dst = FakeAdminClient(
        {
            "app.events": Topic("app.events", 4, {"retention.ms": "9999", "cleanup.policy": "delete"}),
            "app.logs": Topic("app.logs", 2, {"retention.ms": "2000"}),
        }
    )
    report = check_topics(_src(), dst, r"app\..*")
    assert any("retention.ms" in w for w in report.warnings)


def test_failures_accumulate_across_topics():
    dst = FakeAdminClient(
        {"app.events": Topic("app.events", 2, {})}  # fewer parts AND app.logs missing
    )
    with pytest.raises(RuntimeError) as exc:
        check_topics(_src(), dst, r"app\..*")
    msg = str(exc.value)
    assert "app.events" in msg and "app.logs" in msg, "must scan all topics before raising"
