"""Mergeable sketches — the "novel sketch" slot of the training-data
operator set: KMV distinct-count, bottom-s rank/quantile, and Count-Min
heavy-hitters. All three share one contract: deterministic md5-derived
hashing (SQL-reproducible content → value-hash-checkable through the oracle
gate), exact mergeability (rollup == rescan, tested bit-identical), and a
separately-validated error bound.

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


def kmv_sketch(
    df: DataFrame, keys: list[str], col: str, k: int = 32, n_salts: int = 32
) -> DataFrame:
    """Per-group KMV sketch: (keys..., sketch array<long> of the k smallest
    distinct hashes ascending, n_le_k = saturation count, kth = the k-th
    minimum or NULL while unsaturated).

    Two-phase plan (VERDICT r4 #2 — no per-group global sort): phase 1
    groups by (keys, hash mod n_salts) and keeps each salted slice's
    bottom-k distinct hashes (collect_set both dedups and rides Spark's
    map-side partial aggregation); phase 2 merge-folds the n_salts partial
    arrays per group — the same union-and-keep-k operation kmv_merge
    performs, proven exact by the merge tests. A group's work is spread
    over n_salts reducers instead of one sort partition holding its entire
    distinct set; the phase-2 shuffle is sketch-sized (≤ n_salts * k rows
    per group). Salting by the hash VALUE keeps cross-salt duplicates
    impossible, so the result is bit-identical to the one-phase form."""
    h = df.select(*keys, hash60(F.col(col).cast("string")).alias("__h"))
    partial = h.groupBy(
        *keys, F.pmod("__h", F.lit(n_salts)).alias("__salt")
    ).agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__p"))
    sk = partial.groupBy(*keys).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__p"))), 1, k).alias("sketch")
    )
    return sk.select(
        *keys,
        "sketch",
        F.size("sketch").cast("long").alias("n_le_k"),
        F.when(F.size("sketch") == k, F.element_at("sketch", k)).alias("kth"),
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


# ---------------------------------------------------------------------------
# Rank/quantile sketch — the KMV discipline applied to ROW sampling
# ---------------------------------------------------------------------------


def quantile_sketch(
    df: DataFrame, keys: list[str], col: str, row_key: list[str], s: int = 256
) -> DataFrame:
    """Per-group mergeable rank/quantile sketch: a bottom-s-by-row-hash
    sample — every row hashes its unique ``row_key`` through the repo's
    md5-derived 60-bit hash, and the sketch keeps the s rows with the
    smallest hashes together with their ``col`` values (a uniform,
    deterministic sample of the row multiset).

    Design choice vs a KLL compactor hierarchy: KLL's merge output depends
    on compaction order, so two partitionings of the same data give
    different (both valid) sketches — that breaks both this repo's
    value-hash oracle gate and the rollup-equals-rescan test. Bottom-s by a
    GLOBAL row hash is order-free: merge = union + keep s smallest, and the
    merged sketch is bit-identical to the sketch of the concatenated data
    (tested exact). The price is the plain sampling error bound — rank
    error O(n/sqrt(s)) w.h.p. — instead of KLL's optimal bound; at the s
    values used here that tradeoff buys exact mergeability and full DuckDB
    reproducibility (same md5 hash, same content).

    Output: (keys..., qsketch: array<struct<h: long, v: long>> ascending by
    h, n_rows: long). ``col`` must be integral (exact cross-engine compare;
    scale floats to fixed-point first).

    Two-phase plan (VERDICT r4 #2, same shape as :func:`kmv_sketch`):
    per-(keys, hash mod n_salts) bottom-s partials, then a per-group
    merge-fold of the n_salts sketch-sized arrays — exactly the
    union-and-keep-s operation quantile_merge performs (merge == rescan,
    tested bit-identical). No reducer ever sorts a whole group; ties on h
    resolve by (h, v) struct order, deterministic either way."""
    n_salts = 32
    h = df.select(
        *keys,
        hash60(F.concat_ws("|", *[F.col(c).cast("string") for c in row_key])).alias(
            "__h"
        ),
        F.col(col).cast("long").alias("__v"),
    )
    partial = h.groupBy(
        *keys, F.pmod("__h", F.lit(n_salts)).alias("__salt")
    ).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__h").alias("h"), F.col("__v").alias("v"))
                )
            ),
            1,
            s,
        ).alias("__p")
    )
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    sk = partial.groupBy(*keys).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__p"))), 1, s).alias("qsketch")
    )
    return sk.join(counts, keys)


def quantile_merge(
    a: DataFrame, b: DataFrame, keys: list[str], s: int = 256
) -> DataFrame:
    """Merge two quantile-sketch tables (full outer on keys): union the
    (h, v) samples, keep the s smallest hashes, add the row counts — the
    rollup operation; output schema matches :func:`quantile_sketch` and is
    bit-identical to sketching the concatenated inputs."""
    empty = F.array().cast("array<struct<h: bigint, v: bigint>>")
    aa = a.select(*keys, F.col("qsketch").alias("__qa"), F.col("n_rows").alias("__na"))
    bb = b.select(*keys, F.col("qsketch").alias("__qb"), F.col("n_rows").alias("__nb"))
    return (
        aa.join(bb, keys, "full_outer")
        .select(
            *keys,
            F.slice(
                F.array_sort(
                    F.concat(
                        F.coalesce(F.col("__qa"), empty),
                        F.coalesce(F.col("__qb"), empty),
                    )
                ),
                1,
                s,
            ).alias("qsketch"),
            (
                F.coalesce(F.col("__na"), F.lit(0))
                + F.coalesce(F.col("__nb"), F.lit(0))
            ).cast("long").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min heavy-hitters sketch — frequency estimation, same contract
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame, keys: list[str], col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Per-group Count-Min sketch: a d×w counter matrix where row j counts
    occurrences hashed by the j-th md5-derived hash into w buckets.

    Unlike space-saving/Misra-Gries (whose state depends on arrival order —
    unusable under this repo's value-hash oracle gate), Count-Min is purely
    a sum of per-row indicator matrices: DETERMINISTIC for any partitioning,
    MERGEABLE by element-wise addition (merge == rescan, bit-identical,
    tested), and SQL-REPRODUCIBLE (same md5 buckets in DuckDB). Estimates
    carry the classic one-sided guarantee: est >= true always, and
    P[est - true > e*N/w] <= exp(-d) per query.

    Output: (keys..., cms: array<long> of length d*w laid out depth-major,
    n_rows). Scale shape: explode ×d then ONE two-phase aggregation — the
    map-side partial combine reduces each partition to at most d*w rows per
    group before the shuffle, so the shuffle volume is sketch-sized, not
    data-sized.

    NULL handling: rows where ``col`` IS NULL are excluded entirely — from
    the counters AND from n_rows — matching SQL aggregate semantics (NULL is
    the absence of a value, not a countable value). Without the filter,
    F.concat propagates the NULL into a NULL bucket index, which becomes a
    NULL map key in the d×w layout and fails the job."""
    df = df.where(F.col(col).isNotNull())
    cells = df.select(
        *keys,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("__j"),
        F.col(col).cast("string").alias("__k"),
    ).select(
        *keys,
        "__j",
        F.pmod(
            hash60(F.concat(F.lit("cms"), F.col("__j").cast("string"), F.lit("|"), F.col("__k"))),
            F.lit(w),
        ).alias("__b"),
    )
    counters = cells.groupBy(*keys, "__j", "__b").agg(F.count("*").alias("__c"))
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    mat = counters.groupBy(*keys).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct((F.col("__j") * w + F.col("__b")).alias("k"), F.col("__c").alias("v"))
            )
        ).alias("__m")
    )
    dense = mat.select(
        *keys,
        F.transform(
            F.sequence(F.lit(0), F.lit(d * w - 1)),
            lambda i: F.coalesce(F.element_at("__m", i.cast("bigint")), F.lit(0)).cast("long"),
        ).alias("cms"),
    )
    return dense.join(counts, keys)


def cms_merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two CMS tables (full outer on keys): element-wise counter sum +
    row-count sum — bit-identical to sketching the concatenated inputs."""
    aa = a.select(*keys, F.col("cms").alias("__ca"), F.col("n_rows").alias("__na"))
    bb = b.select(*keys, F.col("cms").alias("__cb"), F.col("n_rows").alias("__nb"))
    joined = aa.join(bb, keys, "full_outer")
    width = F.greatest(F.size(F.coalesce("__ca", F.array())), F.size(F.coalesce("__cb", F.array())))
    zeros = lambda c: F.coalesce(
        F.col(c),
        F.transform(F.sequence(F.lit(1), width), lambda _: F.lit(0).cast("long")),
    )
    return joined.select(
        *keys,
        F.zip_with(zeros("__ca"), zeros("__cb"), lambda x, y: x + y).alias("cms"),
        (
            F.coalesce(F.col("__na"), F.lit(0)) + F.coalesce(F.col("__nb"), F.lit(0))
        ).cast("long").alias("n_rows"),
    )


def cms_estimate(cms_col, key_col, d: int = 4, w: int = 64):
    """Column expression: the Count-Min frequency estimate of ``key_col`` —
    min over the d rows of the counter each hash selects (deterministic,
    reproducible in SQL)."""
    ks = F.col(key_col).cast("string") if isinstance(key_col, str) else key_col.cast("string")
    return F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda j: F.element_at(
                cms_col,
                (
                    j * w
                    + F.pmod(
                        hash60(F.concat(F.lit("cms"), j.cast("string"), F.lit("|"), ks)),
                        F.lit(w),
                    )
                ).cast("int")
                + 1,
            ),
        )
    )


def quantile_value(sketch_col, q: float):
    """Column expression: the q-quantile estimate from a sketch column —
    the element at floor(q * (size - 1)) of the sample's values sorted
    ascending (deterministic nearest-rank rule, reproducible in SQL)."""
    vs = F.array_sort(F.transform(sketch_col, lambda x: x.getField("v")))
    idx = F.floor(F.lit(q) * (F.size(vs) - 1)).cast("int") + 1
    return F.element_at(vs, idx)
