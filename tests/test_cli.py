"""CLI surface tests (reference: FlinkKafkaReplicator.java:63-106,139-177)."""

from __future__ import annotations

import pytest

from flink_kafka_replicator_spark.cli import parse_args, rewrite_quotes

BASE = [
    "--topics", "app\\..*",
    "--consumer.bootstrap.servers", "src:9092",
    "--consumer.group.id", "repl",
    "--producer.bootstrap.servers", "dst:9092",
]


def test_quote_rewrite():
    assert rewrite_quotes(["--x", "a<<b>>c"]) == ["--x", 'a"b"c']


def test_happy_path_and_prefix_split():
    cfg, extra = parse_args(BASE + ["--consumer.sasl.mechanism", "PLAIN"])
    assert cfg.topics == "app\\..*"
    assert cfg.consumer_props == {
        "bootstrap.servers": "src:9092",
        "group.id": "repl",
        "sasl.mechanism": "PLAIN",
    }
    assert cfg.producer_props == {"bootstrap.servers": "dst:9092"}
    assert cfg.preserve_partitioning and not cfg.exactly_once


def test_flags_and_defaults():
    cfg, _ = parse_args(
        BASE + ["--exactly-once", "--no-preserve-partitioning", "--from-latest"]
    )
    assert cfg.exactly_once and cfg.from_latest and not cfg.preserve_partitioning
    assert cfg.checkpoint_interval_ms == 1_000
    assert cfg.transaction_timeout_ms == 870_000


def test_missing_required_params_rejected(capsys):
    with pytest.raises(SystemExit):
        parse_args(["--topics", "x"])
    assert "missing required parameters" in capsys.readouterr().err


def test_unknown_option_rejected(capsys):
    with pytest.raises(SystemExit):
        parse_args(BASE + ["--bogus-flag", "1"])
    assert "unknown option" in capsys.readouterr().err


def test_transaction_timeout_cross_validation(capsys):
    with pytest.raises(SystemExit):
        parse_args(
            BASE
            + [
                "--exactly-once",
                "--checkpoint-interval-ms", "10000",
                "--transaction-timeout-ms", "500",
            ]
        )
    assert "transaction-timeout-ms" in capsys.readouterr().err


def test_equals_style_properties():
    cfg, _ = parse_args(
        [
            "--topics", "t",
            "--consumer.bootstrap.servers=src:9092",
            "--consumer.group.id=g",
            "--producer.bootstrap.servers=dst:9092",
        ]
    )
    assert cfg.consumer_props["group.id"] == "g"
