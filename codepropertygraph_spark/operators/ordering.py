"""Stable turn ordering + NEXT-edge synthesis (the CFG analog).

The reference folds each method's AST into an intra-procedural CFG with a
fringe algorithm (``semanticcpg/.../cfgcreation/CfgCreator.scala:49-467``)
inside a per-method parallel pass (``CfgCreationPass.scala:28-35``). For a
transcript conversation the control-flow structure is linear turn order, so
the whole pass collapses to one window: rank turns by ``(turn_idx, ts)``
within ``conv_id`` (the input_hint's stable-ordering contract, duplicate
``turn_idx`` disambiguated by ``ts``), and NEXT edges come from ``lead()``.

Scale notes: a window partitioned by ``conv_id`` shuffles once on the
conversation key and sorts within partitions — the same shuffle the
extraction stage needs, so Catalyst reuses the exchange. Mega-conversations
skew a *sort*, not a join, and AQE handles the partition imbalance; there is
no per-row Python anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def turn_window():
    """The stable-ordering window: rank within conv_id by (turn_idx, ts).
    One definition used by every turn-level operator, so Catalyst reuses a
    single exchange+sort across ordering, NEXT edges and first-mention.
    Built lazily — PySpark 4 Window specs need an active session."""
    return Window.partitionBy("conv_id").orderBy("turn_idx", "ts")


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Adds ``turn_order`` — the dense stable rank of a turn within its
    conversation. This is THE ordering invariant: per-turn text equality vs
    the reference holds under this ordering (BASELINE.md row 3)."""
    return transcripts.withColumn("turn_order", F.row_number().over(turn_window()))


def next_edges(transcripts: DataFrame) -> DataFrame:
    """(conv_id, src_order, dst_order) pairs of consecutive turns — the NEXT
    edge relation (CFG AlwaysEdge analog)."""
    t = ordered_turns(transcripts)
    return (
        t.withColumn("dst_order", F.lead("turn_order").over(turn_window()))
        .where(F.col("dst_order").isNotNull())
        .select(
            "conv_id",
            F.col("turn_order").alias("src_order"),
            F.col("dst_order").alias("dst_order"),
        )
    )
