"""Deterministic node-id allocation — the KeyPool analog.

The reference pre-partitions the id space with ``IntervalKeyPool`` so parallel
passes never collide and reruns yield identical ids
(``codepropertygraph/src/main/scala/io/shiftleft/passes/KeyPool.scala:23-98``;
per-file split in ``fuzzyc2cpg/.../passes/AstCreationPass.scala:15``; the
10-run stability contract is ``fuzzyc2cpg/src/test/scala/.../
StableOutputTests.scala:8-29``).

Two strategies, both run-to-run stable:

1. ``hash_id_col`` — content-addressed 60-bit id from the node's natural key
   (md5-derived, computed JVM-side). Zero coordination, embarrassingly
   parallel, stable under any partitioning — the idiomatic choice for a
   distributed build. 60 bits is collision-safe to ~10^8 nodes; production at
   10^12 turns keeps the full 128-bit hex digest as the join key (string) and
   uses these longs only where a compact surrogate is needed per-label.

2. ``interval_ids`` — dense per-partition intervals: each partition ``p`` owns
   ``[base + p*interval, ...)`` and ranks rows by an explicit stable sort key
   inside the partition. No global sort, no driver round-trip, deterministic
   for a fixed partitioning function — the literal KeyPool translation.
   (``monotonically_increasing_id`` alone is NOT stable across runs; never
   used here.)

Label id-space bases mirror the reference's planned intervals
(``FuzzyC2Cpg.scala:1649-1651``: metadata [1,100), types [100, 1000100),
functions from 1000101).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^60 id space per label, disjoint by construction.
LABEL_BASE: dict[str, int] = {
    "META_DATA": 0,
    "CONVERSATION": 1 << 60,
    "TURN": 2 << 60,
    "MENTION": 3 << 60,
    "ENTITY": 4 << 60,
    "TOOLCALL": 5 << 60,
}


def hash60(col: Column) -> Column:
    """Deterministic 60-bit non-negative long from a string column.

    Uses md5 (not xxhash64) so the identical value is computable in DuckDB
    (``cast(concat('0x', substr(md5(x),1,15)) as bigint)``) for oracle checks.
    All JVM-side expressions — no Python.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_id_col(label: str, natural_key: Column) -> Column:
    """Content-addressed node id: label base | hash60(natural_key)."""
    return F.lit(LABEL_BASE[label]).cast("long") + hash60(natural_key)


def natural_key(label: str, *parts: Column) -> Column:
    """Canonical natural-key encoding: 'LABEL|part1|part2|...'."""
    return F.concat_ws("|", F.lit(label), *parts)


def ordered_index(df, col: str, out_col: str = "idx", partitions: int | None = None):
    """EXACT 0-based rank of each row in ascending ``col`` order, without a
    global single-partition sort window: range-partition on the key, rank
    within each partition, and add the cumulative count of the preceding
    partitions. The result equals ``row_number() over (order by col) - 1``
    for any partitioning the range exchange happens to pick (partitions are
    key-ordered, ranks are within-partition ordered), but no task ever
    sorts more than its own partition, and the only unpartitioned window
    runs over the per-partition count frame — bounded by the partition
    count, not the data. ``col`` values must be distinct (they are a
    vocabulary key wherever this is used).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    part = df.repartitionByRange(partitions, F.col(col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # per-partition offsets: cumulative row count of lower-keyed partitions
    offs = (
        part.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    w = Window.partitionBy("__pid").orderBy(col)
    return (
        part.withColumn("__rk", F.row_number().over(w).cast("long") - 1)
        .join(F.broadcast(offs), "__pid")
        .withColumn(out_col, (F.col("__rk") + F.col("__off")).cast("long"))
        .drop("__pid", "__rk", "__off")
    )


def interval_ids(df, order_cols: list[str], base: int, interval: int = 1 << 33):
    """Dense deterministic ids without a global sort (KeyPool.split analog,
    ``KeyPool.scala:47-59``).

    Partitions by a hash bucket of the first order column (stable function of
    the data, not of cluster layout), ranks within each bucket by the full
    stable key, and allocates ``base + bucket*interval + rank``. Adds column
    ``id``. Requires ``interval`` > max rows per bucket.
    """
    from pyspark.sql import Window

    n_buckets = 1 << 12
    bucket = F.pmod(F.xxhash64(F.col(order_cols[0])), F.lit(n_buckets))
    w = Window.partitionBy(bucket).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(
        "id",
        F.lit(base).cast("long")
        + bucket.cast("long") * F.lit(interval)
        + F.row_number().over(w).cast("long"),
    )
