"""Mergeable distinct-count sketches — the "novel sketch" slot of the
training-data operator set.

KMV (k minimum values): hash every element uniformly, keep the k smallest
DISTINCT hashes per group. The k-th minimum estimates density: with hashes
uniform on [0, M), distinct-count ~ (k-1) * M / h_k once a group saturates
its k slots. Two properties make it the right sketch here:

- MERGEABLE: union two sketches, keep the k smallest — exactly how
  per-partition or per-day sketches roll up without re-scanning
  (tested: merge of split-corpus sketches == whole-corpus sketch).
- ORACLE-CHECKABLE: the hash is the repo's md5-derived 60-bit value, so a
  DuckDB oracle reproduces the sketch CONTENT bit-for-bit — unlike HLL
  (whose register layout is engine-private), the approximate structure
  itself passes the value-hash gate; the numeric estimate is derived from
  the content and validated separately (relative-error test).

Scale shape: one distinct-aggregation shuffle on (keys, hash), then a
per-group top-k window over at most the distinct values — the same cost
envelope as countDistinct, but the OUTPUT is a constant-size mergeable
state instead of a transient count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ids import hash60

#: hash domain: md5-derived 60-bit values, uniform on [0, 2^60)
HASH_DOMAIN = 1 << 60


def kmv_sketch(df: DataFrame, keys: list[str], col: str, k: int = 32) -> DataFrame:
    """Per-group KMV sketch: (keys..., sketch array<long> of the k smallest
    distinct hashes ascending, n_le_k = saturation count, kth = the k-th
    minimum or NULL while unsaturated)."""
    h = (
        df.select(*keys, hash60(F.col(col).cast("string")).alias("__h"))
        .dropDuplicates(keys + ["__h"])
    )
    w = Window.partitionBy(*keys).orderBy("__h")
    topk = h.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") <= k)
    return topk.groupBy(*keys).agg(
        F.array_sort(F.collect_list("__h")).alias("sketch"),
        F.count("*").alias("n_le_k"),
        F.max(F.when(F.col("__rk") == k, F.col("__h"))).alias("kth"),
    )


def kmv_merge(a: DataFrame, b: DataFrame, keys: list[str], k: int = 32) -> DataFrame:
    """Merge two sketch tables (full outer on keys): union the hash sets,
    keep the k smallest — the rollup operation. Output schema matches
    :func:`kmv_sketch`."""
    aa = a.select(*keys, F.col("sketch").alias("__sa"))
    bb = b.select(*keys, F.col("sketch").alias("__sb"))
    empty = F.array().cast("array<long>")
    merged = (
        aa.join(bb, keys, "full_outer")
        .select(
            *keys,
            F.slice(
                F.array_sort(
                    F.array_union(
                        F.coalesce(F.col("__sa"), empty),
                        F.coalesce(F.col("__sb"), empty),
                    )
                ),
                1,
                k,
            ).alias("sketch"),
        )
    )
    return merged.select(
        *keys,
        "sketch",
        F.size("sketch").cast("long").alias("n_le_k"),
        F.when(F.size("sketch") == k, F.element_at("sketch", k)).alias("kth"),
    )


def kmv_estimate(n_le_k: int, kth: int | None, k: int = 32) -> float:
    """Distinct-count estimate from sketch state (driver-side helper):
    exact below saturation, (k-1) * M / h_k at saturation."""
    if kth is None or n_le_k < k:
        return float(n_le_k)
    return (k - 1) * HASH_DOMAIN / kth
