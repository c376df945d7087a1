"""Deterministic sampling & dataset splitting — training-data operators.

A training pipeline needs reproducible corpus slices: train/val/test splits
that never migrate rows between runs or cluster sizes, stratified samples
whose membership is stable under repartitioning, and bottom-k "reservoirs"
that two jobs can compute independently and agree on. Spark's built-in
``df.sample``/``randomSplit`` are seed-dependent on PARTITIONING (each task
draws from its own stream), so the same data at a different parallelism
samples differently — unusable for dataset lineage at 100 TB, and
unverifiable through this repo's value-hash oracle gate.

Everything here keys off the repo's md5-derived 60-bit row hash
(``ids.hash60`` — reproducible in DuckDB, uniform on [0, 2^60)), making
membership a PURE FUNCTION of the row key:

- map-only (no shuffle) for ``hash_split`` / ``stratified_sample``;
- independent of partitioning, cluster size, and row order;
- cross-engine checkable (the oracle recomputes the same assignment).

The split-boundary convention: fractions accumulate left to right over the
hash domain, ``[0, f1) -> s1, [f1, f1+f2) -> s2, ...``; rows hashing past
the last cumulative fraction get the LAST split (so fractions that sum to
1.0 within float error never drop a row). Salt the hash input with a
``salt`` string to draw independent splits from the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ids import hash60

#: hash domain of ids.hash60 (md5-derived 60-bit values)
HASH_DOMAIN = 1 << 60


def _row_hash(key_cols: list[str], salt: str):
    cols = [F.col(c).cast("string") for c in key_cols]
    return hash60(F.concat_ws("|", F.lit(salt), *cols))


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named slice by its key
    hash — deterministic train/val/test splitting. Map-only; rows with the
    same key always land in the same split (so e.g. splitting documents by
    ``doc_id`` keeps all shards of a document together).

    ``fractions``: ordered {name: fraction}; must be positive and sum to
    <= 1.0 + 1e-9 (the remainder, if any, goes to the last split)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError(f"fractions must be positive: {fractions}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    names = list(fractions)
    h = _row_hash(key_cols, salt)
    acc = 0.0
    bounds: list[tuple[str, int]] = []
    for name in names[:-1]:
        acc += fractions[name]
        bounds.append((name, int(acc * HASH_DOMAIN)))
    # WHEN-chain in declared order (first matching cumulative bound wins);
    # rows past the last bound take the final split name
    expr = None
    for name, bound in bounds:
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    key_cols: list[str],
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its key
    hash falls below ``fraction`` of the domain, with the stratum folded
    into the hash salt so each stratum draws independently. Map-only, exact
    membership stability; the realized rate concentrates at ``fraction``
    with the usual binomial spread (error-bounded in pytest)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1]: {fraction}")
    strata = [F.col(c).cast("string") for c in strata_cols]
    h = hash60(
        F.concat_ws(
            "|", F.lit(salt), *strata, *[F.col(c).cast("string") for c in key_cols]
        )
    )
    return df.where(h < F.lit(int(fraction * HASH_DOMAIN)))


def bottom_k(
    df: DataFrame, keys: list[str], k: int, key_cols: list[str], salt: str = "resv"
) -> DataFrame:
    """Deterministic "reservoir": the k rows with the smallest salted key
    hashes per group — a uniform fixed-size sample with the KMV/quantile
    sketch's merge property (union two groups' reservoirs, keep the k
    smallest == reservoir of the concatenation). One shuffle (per-group
    top-k window), the same envelope as sketches.quantile_sketch."""
    h = _row_hash(key_cols, salt)
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        df.withColumn("__h", h)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
        .withColumnRenamed("__h", "sample_hash")
    )
