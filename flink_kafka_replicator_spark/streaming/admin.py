"""Control-plane admin pre-flight: topic discovery / create / grow / sync.

Python port of the reference's AdminClient pre-flight
(reference: FlinkKafkaReplicator.java:179-277). Runs once on the
driver before the streaming job starts — plain admin-client calls, no
Spark involvement (same placement as the reference, which runs it on
the client JVM before graph construction, :108).

The client is duck-typed so tests drive the full decision matrix with
an in-memory fake; a confluent-kafka-backed client is provided behind
an import guard for real clusters.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from typing import Protocol

from ..model import Topic

log = logging.getLogger(__name__)

# reference: FlinkKafkaReplicator.java:41 — created topics use RF 1
DEFAULT_REPLICATION_FACTOR = 1


class AdminClient(Protocol):
    def list_topics(self) -> list[str]: ...

    def describe_topic(self, name: str) -> Topic: ...

    def create_topic(self, topic: Topic, replication_factor: int) -> None: ...

    def create_partitions(self, name: str, total_count: int) -> None: ...

    def alter_configs(self, name: str, config: dict[str, str | None]) -> None: ...


class FakeAdminClient:
    """In-memory admin client for tests."""

    def __init__(self, topics: dict[str, Topic] | None = None):
        self.topics: dict[str, Topic] = dict(topics or {})
        self.created: list[str] = []
        self.grown: list[tuple[str, int]] = []
        self.altered: list[str] = []

    def list_topics(self) -> list[str]:
        return sorted(self.topics)

    def describe_topic(self, name: str) -> Topic:
        return self.topics[name]

    def create_topic(self, topic: Topic, replication_factor: int) -> None:
        self.topics[topic.name] = topic
        self.created.append(topic.name)

    def create_partitions(self, name: str, total_count: int) -> None:
        t = self.topics[name]
        self.topics[name] = Topic(t.name, total_count, dict(t.config))
        self.grown.append((name, total_count))

    def alter_configs(self, name: str, config: dict[str, str | None]) -> None:
        t = self.topics[name]
        self.topics[name] = Topic(t.name, t.partitions, dict(config))
        self.altered.append(name)


def get_topics(client: AdminClient, pattern: str) -> list[Topic]:
    """Topic discovery: list → client-side regex filter → describe
    (reference: FlinkKafkaReplicator.java:179-196 — same pipeline with
    listTopics / String.matches / describeTopics+describeConfigs)."""
    rx = re.compile(pattern)
    return [
        client.describe_topic(name)
        for name in client.list_topics()
        if rx.fullmatch(name)
    ]


def config_diff(
    src: dict[str, str | None], dst: dict[str, str | None]
) -> dict[str, tuple[str | None, str | None]]:
    """Null-aware config diff: key → (src_value, dst_value) for every key
    whose values differ, including keys present on only one side
    (reference: FlinkKafkaReplicator.java:247-262 compares with explicit
    null handling — the relational analog is FULL OUTER JOIN + IS
    DISTINCT FROM, see operators/replication.topic_config_diff)."""
    out: dict[str, tuple[str | None, str | None]] = {}
    for key in sorted(set(src) | set(dst)):
        sv, dv = src.get(key), dst.get(key)
        if sv != dv:
            out[key] = (sv, dv)
    return out


@dataclass
class CheckReport:
    created: list[str] = field(default_factory=list)
    grown: list[str] = field(default_factory=list)
    synced: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    failures: list[str] = field(default_factory=list)


def check_topics(
    source: AdminClient,
    target: AdminClient,
    pattern: str,
    create_topics: bool = False,
    create_partitions: bool = False,
    sync_properties: bool = False,
    preserve_partitioning: bool = True,
    replication_factor: int = DEFAULT_REPLICATION_FACTOR,
) -> CheckReport:
    """The pre-flight decision matrix (reference:
    FlinkKafkaReplicator.java:198-277), per matched source topic:

      - missing on target      → create (--create-topics) or fail
      - target has fewer parts → grow (--create-partitions), or warn if
        repartitioning anyway (--no-preserve-partitioning), or fail
      - target has more parts  → warn
      - config drift           → sync (--sync-properties) or warn

    Failures accumulate across all topics and raise once at the end,
    exactly like the reference (:207, :274-275).
    """
    report = CheckReport()
    target_names = set(target.list_topics())
    for st in get_topics(source, pattern):
        if st.name not in target_names:
            if create_topics:
                target.create_topic(
                    Topic(st.name, st.partitions, dict(st.config)),
                    replication_factor,
                )
                report.created.append(st.name)
            else:
                report.failures.append(
                    f"topic {st.name} does not exist on the target cluster"
                )
            continue
        tt = target.describe_topic(st.name)
        if tt.partitions < st.partitions:
            if create_partitions:
                target.create_partitions(st.name, st.partitions)
                report.grown.append(st.name)
            elif not preserve_partitioning:
                report.warnings.append(
                    f"topic {st.name}: target has fewer partitions "
                    f"({tt.partitions} < {st.partitions}); records will be "
                    "redistributed"
                )
            else:
                report.failures.append(
                    f"topic {st.name}: target has fewer partitions "
                    f"({tt.partitions} < {st.partitions})"
                )
        elif tt.partitions > st.partitions:
            report.warnings.append(
                f"topic {st.name}: target has more partitions "
                f"({tt.partitions} > {st.partitions})"
            )
        diff = config_diff(st.config, tt.config)
        if diff:
            if sync_properties:
                target.alter_configs(st.name, dict(st.config))
                report.synced.append(st.name)
            else:
                for key, (sv, dv) in diff.items():
                    report.warnings.append(
                        f"topic {st.name}: config {key} differs "
                        f"(source={sv!r}, target={dv!r})"
                    )
    for w in report.warnings:
        log.warning(w)
    if report.failures:
        raise RuntimeError(
            "topic pre-flight failed:\n" + "\n".join(report.failures)
        )
    return report


ADMIN_TIMEOUT_S = 30.0  # reference: FlinkKafkaReplicator.java:40 (30 s RPCs)


def confluent_admin_client(bootstrap_servers: str, props: dict[str, str] | None = None):
    """Real-cluster AdminClient adapter (confluent_kafka) — import-guarded:
    the library is not installed in this container, so the adapter body
    is exercised against live clusters only; the decision logic in
    check_topics is client-agnostic and tested with FakeAdminClient."""
    try:
        from confluent_kafka.admin import (  # type: ignore[import-not-found]
            AdminClient as _CKAdmin,
            ConfigResource,
            NewPartitions,
            NewTopic,
        )
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "confluent_kafka is not available in this environment; "
            "use FakeAdminClient or install confluent-kafka"
        ) from e

    class _ConfluentAdmin:  # pragma: no cover — needs live brokers
        def __init__(self) -> None:
            self._c = _CKAdmin(
                {"bootstrap.servers": bootstrap_servers, **(props or {})}
            )

        def list_topics(self) -> list[str]:
            return sorted(self._c.list_topics(timeout=ADMIN_TIMEOUT_S).topics)

        def describe_topic(self, name: str) -> Topic:
            md = self._c.list_topics(topic=name, timeout=ADMIN_TIMEOUT_S).topics[name]
            res = ConfigResource(ConfigResource.Type.TOPIC, name)
            entries = self._c.describe_configs([res])[res].result(ADMIN_TIMEOUT_S)
            config = {
                k: e.value for k, e in entries.items() if e.value is not None
            }
            return Topic(name, len(md.partitions), config)

        def create_topic(self, topic: Topic, replication_factor: int) -> None:
            new = NewTopic(
                topic.name,
                num_partitions=topic.partitions,
                replication_factor=replication_factor,
                config=dict(topic.config),
            )
            self._c.create_topics([new])[topic.name].result(ADMIN_TIMEOUT_S)

        def create_partitions(self, name: str, total_count: int) -> None:
            self._c.create_partitions([NewPartitions(name, total_count)])[
                name
            ].result(ADMIN_TIMEOUT_S)

        def alter_configs(self, name: str, config: dict[str, str | None]) -> None:
            res = ConfigResource(
                ConfigResource.Type.TOPIC,
                name,
                set_config={k: v for k, v in config.items() if v is not None},
            )
            self._c.alter_configs([res])[res].result(ADMIN_TIMEOUT_S)

    return _ConfluentAdmin()
