"""Streaming layer: the replication pipeline (the reference's entire
product surface), the admin control plane, and the exactly-once sink."""

from .replicate import ReplicateConfig, build_replication  # noqa: F401
