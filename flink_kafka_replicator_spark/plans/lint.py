"""Plan linting: detect the physical-plan shapes that do not survive
a 100 TB scale-up.

``lint_plan(df)`` inspects a DataFrame's formatted physical plan and
returns the anti-pattern occurrences a reviewer would flag:

- ``cartesian`` — CartesianProduct nodes: all-pairs work, quadratic in
  the inputs; there is essentially no legitimate use over open-
  cardinality data.
- ``bnl`` — BroadcastNestedLoopJoin nodes: a non-equi join evaluated
  row-by-row against a broadcast side. Sound only when the broadcast
  side is bounded by a constant (a 1-row bound aggregate, a <=bins-row
  edge table); fatal when both sides scale with the data.
- ``single_part`` — Exchange SinglePartition occurrences whose
  CONSUMER is not a keyless aggregate. The keyless-aggregate case is
  the CORRECT distributed plan for a global aggregate — partial
  aggregation runs map-side and the exchange carries one agg buffer
  per upstream partition, so its cardinality is the cluster's
  partition count. Every other consumer (Window, Sort, ...) parks its
  entire input on one task: sound only over a constant-bounded frame
  (a histogram, a calendar, a top-k list), fatal over a stream that
  grows with the corpus.

The registry-wide audit harness (tests/plan_audit.py) runs this over
every query id against a pinned allowlist; users can call it directly
on their own pipelines before submitting them:

    from flink_kafka_replicator_spark.plans import lint_plan
    hits = lint_plan(df)
    assert not hits, f"plan anti-patterns: {hits}"
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .explain import formatted_plan

AGG_CONSUMERS = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}


def single_partition_consumers(plan: str) -> list[str]:
    """Names of the nodes consuming each SinglePartition exchange,
    parsed from the formatted plan's tree section (the consumer is the
    nearest preceding tree line with a smaller indent)."""
    sp_ids = set()
    for m in re.finditer(
        r"\((\d+)\) Exchange\n(?:.*\n)*?Arguments: ([^\n]*)", plan
    ):
        if "SinglePartition" in m.group(2):
            sp_ids.add(m.group(1))
    tree = plan.split("\n\n")[0]
    nodes: list[tuple[int, str, str]] = []
    for line in tree.split("\n"):
        m = re.search(r"([A-Za-z][A-Za-z0-9 ]*?) \((\d+)\)\s*$", line)
        if m:
            prefix = line[: line.index(m.group(1))]
            nodes.append(
                (len(prefix), m.group(1).strip().lstrip("* ").strip(), m.group(2))
            )
    out: list[str] = []
    for i, (ind, _name, nid) in enumerate(nodes):
        if nid in sp_ids:
            for j in range(i - 1, -1, -1):
                if nodes[j][0] < ind:
                    out.append(nodes[j][1])
                    break
            else:
                out.append("ROOT")
    return out


def lint_plan_text(plan: str) -> dict[str, int]:
    """Anti-pattern occurrence counts in a formatted plan string.
    Only occurrences that NEED justification are counted — keyless-
    aggregate SinglePartition consumers are excluded by design."""
    hits: dict[str, int] = {}
    n = len(re.findall(r"\(\d+\) CartesianProduct", plan))
    if n:
        hits["cartesian"] = n
    n = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    if n:
        hits["bnl"] = n
    nonagg = [
        c for c in single_partition_consumers(plan) if c not in AGG_CONSUMERS
    ]
    if nonagg:
        hits["single_part"] = len(nonagg)
    return hits


def lint_plan(df: DataFrame) -> dict[str, int]:
    """Lint a DataFrame's physical plan; {} means no anti-patterns."""
    return lint_plan_text(formatted_plan(df))
