"""Explicit skew handling — salting + two-phase aggregation (north_rule).

Where skew lives in this engine and what handles it (SURVEY.md §4.2):

1. **Mega-conversations** (one conversation ≫ median turns — the analog of
   one giant method in the reference's per-method parallelism,
   ``CfgCreationPass.scala:31``):
   - the JVM extraction path is *map-only* (array-side neighbors), so a
     mega-conversation never concentrates on one task at all;
   - per-conversation ``applyInPandas`` stages (grouped UDF extraction,
     dominators, grouped BFS) do one-group-one-task: for *turn-local*
     computations :func:`salted_grouped` splits the group key with a salt
     derived from ``turn_idx`` — exact, because no cross-turn state;
   - windows partitioned by conv_id sort within partition; AQE
     (``skewJoin`` + ``coalescePartitions``, on in session.py) rebalances.

2. **Hub entities** (one entity in ≥30% of conversations): the dictionary
   side of every linking join is **broadcast**, so hot keys never shuffle;
   count-like aggregations are hash aggregates with map-side partial
   combine (two-phase) natively. Holistic aggregations (collect_list/set)
   get :func:`salted_collect_set` — partial per (key, salt), merge per key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_grouped(
    df: DataFrame,
    fn: Callable,
    schema: str,
    key: str = "conv_id",
    salt_col: str = "turn_idx",
    n_salts: int = 16,
) -> DataFrame:
    """applyInPandas over (key, salt) instead of (key): splits a mega-group
    into ``n_salts`` tasks. Correct only for row-local / turn-local
    ``fn`` (no cross-row state within the group) — which is exactly the
    extraction case. The output schema must start with the key column."""
    salted = df.withColumn("__salt", F.pmod(F.col(salt_col), F.lit(n_salts)))
    return (
        salted.groupBy(key, "__salt")
        .applyInPandas(lambda pdf: fn(pdf.drop(columns="__salt")), schema=schema)
    )


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salts: int = 32
) -> DataFrame:
    """Two-phase holistic aggregation: collect_set per (key, salt) — many
    small tasks even for a hub key — then flatten+dedup per key. The second
    phase moves one pre-deduped array per (key, salt), not one row per
    occurrence, so a hub entity's fan-in shrinks by its duplication factor."""
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(value), F.lit(n_salts)))
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__vals"))
    )
    return (
        partial.groupBy(key)
        .agg(
            F.array_distinct(F.flatten(F.collect_list("__vals"))).alias(f"{value}_set")
        )
    )


def hub_entity_conversation_counts(
    linked_mentions: DataFrame,
) -> DataFrame:
    """(canonical, n_conversations) — the hub-entity detector itself, as a
    skew-safe two-phase job: distinct (canonical, conv) per partition first
    (map-side combine via dropDuplicates' partial agg), then count."""
    return (
        linked_mentions.select("canonical", "conv_id")
        .dropDuplicates(["canonical", "conv_id"])
        .groupBy("canonical")
        .agg(F.count("*").alias("n_conversations"))
    )
