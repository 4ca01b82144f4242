"""flink_kafka_replicator_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the capabilities of the reference
``asdaraujo/flink-kafka-replicator`` (a Flink DataStream Kafka→Kafka
replicator; see SURVEY.md) and extends them with the relational /
streaming / LLM-data-pipeline operator inventory declared in
SURVEY.md §2.5.

Layout:
  session     SparkSession factory (AQE, shuffle sizing, UTC)
  io          parquet table loading for the driver's test data
  model       the KafkaMessage envelope schema + Topic metadata object
  operators/  batch relational + replication-semantics queries
  functions/  text / similarity / multimodal column functions
  sources/    batch+streaming source builders (files, kafka)
  streaming/  replication pipeline, exactly-once sink, admin control plane
  plans/      plan-inspection helpers (pushdown / broadcast assertions)
  registry    the query-id → (callable, oracle SQL) registry
"""

__version__ = "0.1.0"
