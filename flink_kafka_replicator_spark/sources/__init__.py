"""Source/sink builders for the replication pipeline.

kafka.py  — Structured Streaming Kafka source/sink option plumbing
            (needs a Kafka cluster + the spark-sql-kafka package at run
            time; builders are pure and unit-testable without either).
files.py  — file-based KafkaMessage-envelope streams used by tests and
            as a generic batch/stream source.
"""
