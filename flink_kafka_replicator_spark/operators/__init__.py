"""Batch operator inventory (SURVEY.md §2.5).

Each module exposes:
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[str, str]   # DuckDB SQL; omit key → rows-only check
"""
