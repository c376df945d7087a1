"""Bounded graph reachability — the ``reachableBy`` query-engine analog.

The reference's dataflow query engine explores the DDG backwards from sinks
with a work-stealing task pool, per-task memoization, global dedup and a
bounded call depth (default 4) (``dataflowengineoss/.../queryengine/
Engine.scala:42-127`` scheduler, ``:255-331`` recursive expansion,
``:217-239`` dedup, ``EngineConfig.maxCallDepth:243-244``).

Spark translation (SURVEY.md §2.D): a bounded iterative **frontier join**
over the edge table — k hops = k broadcast-or-shuffle joins, dedup =
``dropDuplicates``, memoization = reusing the accumulated result as the
next frontier's filter. The loop is driver-controlled but each step is a
declarative join Catalyst optimizes; AQE rebalances skewed frontiers (hub
entities fan out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable_within(
    edges: DataFrame, max_hops: int = 4, keyed_by: str = "conv_id"
) -> DataFrame:
    """Transitive closure bounded at ``max_hops`` over a directed edge set
    ``(keyed_by, s, o)``. Returns DISTINCT (keyed_by, src, dst) pairs with a
    path of length 1..max_hops. Each iteration extends the frontier one hop
    and drops already-reached pairs (the ResultTable dedup analog)."""
    e = edges.select(keyed_by, "s", "o").dropDuplicates([keyed_by, "s", "o"])
    reached = e
    frontier = e
    for _ in range(max_hops - 1):
        step = (
            frontier.alias("f")
            .join(
                e.alias("e"),
                (F.col(f"f.{keyed_by}") == F.col(f"e.{keyed_by}"))
                & (F.col("f.o") == F.col("e.s")),
            )
            .select(F.col(f"f.{keyed_by}").alias(keyed_by), F.col("f.s").alias("s"), F.col("e.o").alias("o"))
            .dropDuplicates([keyed_by, "s", "o"])
        )
        new = step.exceptAll(reached).localCheckpoint(eager=True)
        if new.isEmpty():
            break
        reached = reached.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return reached.select(
        F.col(keyed_by), F.col("s").alias("src"), F.col("o").alias("dst")
    ).dropDuplicates([keyed_by, "src", "dst"])
