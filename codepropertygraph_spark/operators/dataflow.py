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
    e = e.persist()
    e.count()  # materialize once; reused every hop
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
        # drop already-reached pairs (ResultTable dedup): anti-join beats
        # exceptAll — no full-row sort, streams through one shuffle.
        new = step.join(reached, [keyed_by, "s", "o"], "left_anti").persist()
        if new.count() == 0:
            new.unpersist()
            break
        reached = reached.unionByName(new).persist()
        reached.count()
        frontier = new
    return reached.select(
        F.col(keyed_by), F.col("s").alias("src"), F.col("o").alias("dst")
    ).dropDuplicates([keyed_by, "src", "dst"])


def reachable_within_grouped(
    edges: DataFrame, max_hops: int = 4, keyed_by: str = "conv_id"
) -> DataFrame:
    """Same contract as :func:`reachable_within`, exploiting that the edge
    set is partitioned by ``keyed_by`` (conversation-local graphs): one
    shuffle groups each conversation's edges, then a vectorized pandas BFS
    computes the bounded closure group-locally — zero iterative shuffles.

    This is the reference's per-task recursive expansion with memoization
    (``Engine.scala:255-331``) run inside ``applyInPandas``; the global
    join-loop variant above remains the fallback for graphs that do NOT
    partition by a key. Mega-conversation skew: one group = one task, AQE
    cannot split it — acceptable because BFS is O(V·E_local) and even the
    20× mega conversation is small; beyond that, salt + two-level closure.
    """
    import pandas as pd

    def closure(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[keyed_by].iloc[0]
        adj: dict[str, set[str]] = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            adj.setdefault(s, set()).add(o)
        out_src, out_dst = [], []
        for start in adj:
            reached: set[str] = set()
            frontier = {start}
            for _ in range(max_hops):
                nxt = set()
                for n in frontier:
                    for m in adj.get(n, ()):
                        if m not in reached:
                            nxt.add(m)
                reached |= nxt
                frontier = nxt
                if not frontier:
                    break
            out_src += [start] * len(reached)
            out_dst += list(reached)
        return pd.DataFrame({keyed_by: key, "src": out_src, "dst": out_dst})

    e = edges.select(keyed_by, "s", "o").dropDuplicates([keyed_by, "s", "o"])
    return e.groupBy(keyed_by).applyInPandas(
        closure, schema=f"{keyed_by} string, src string, dst string"
    )
