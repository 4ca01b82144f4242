"""Column-function library: text analysis, similarity/dedup, multimodal.

Everything here is engine-native (built-in pyspark.sql.functions,
higher-order array functions, or Arrow-batched mapInPandas) — no
row-at-a-time Python UDFs in any hot path.
"""
