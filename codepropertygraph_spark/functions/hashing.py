"""Cross-engine deterministic hashing primitives.

Everything here is built from ``md5`` over strings so that the *identical*
value is computable in DuckDB SQL (``cast(concat('0x', substr(md5(x),1,15))
as bigint)``) — that makes MinHash signatures, LSH bucket keys, simhash
signatures and fingerprints oracle-checkable, and keeps every hash JVM-side
(whole-stage codegen; no Python).

The reference uses MD5 the same way for content-addressed edge identity
(``DiffGraph.scala:187-190`` ``propertiesHash``) and string interning as
dictionary compression (``ProtoToCpg.scala:42``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit positive hash space (15 hex chars) — fits signed int64 in both engines.
HASH_BITS = 60


def md5_long(col: Column, salt: int = 0) -> Column:
    """60-bit long from md5(salt || value). JVM-side only."""
    salted = F.concat(F.lit(f"s{salt}|"), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: int = 0) -> str:
    """The DuckDB-SQL rendering of :func:`md5_long` for oracle queries."""
    inner = f"concat('s{salt}|', {expr})" if salt else expr
    return f"cast(concat('0x', substr(md5({inner}), 1, 15)) as bigint)"


def minhash_signature(tokens_col_name: str, k: int) -> Column:
    """k-permutation MinHash over an array<string> column, as array<long>.

    ``transform(sequence(0,k-1), i -> array_min(transform(tokens,
    t -> md5_long(i||t))))`` — fully JVM-side; one pass per hash function is
    fused by codegen, no shuffle. At 100 TB this runs as a map-only stage.
    Takes the column *name* so the same fragment renders in SQL oracles.
    """
    return F.expr(minhash_signature_sql(tokens_col_name, k, spark=True))


def minhash_signature_sql(tokens_expr: str, k: int, spark: bool = False) -> str:
    """Shared SQL fragment for the MinHash signature.

    Spark: ``conv(substr(md5(..),1,15),16,10)`` cast to bigint.
    DuckDB: ``cast(concat('0x', substr(md5(..),1,15)) as bigint)`` and
    ``list_transform``/``list_min`` instead of ``transform``/``array_min``.
    Both hash the string ``'s<i>|<token>'`` — values agree bit-for-bit.
    """
    if spark:
        h = "cast(conv(substr(md5(concat('s', cast(i as string), '|', t)), 1, 15), 16, 10) as bigint)"
        return (
            f"transform(sequence(0, {k - 1}), i -> "
            f"array_min(transform({tokens_expr}, t -> {h})))"
        )
    h = "cast(concat('0x', substr(md5(concat('s', cast(i as varchar), '|', t)), 1, 15)) as bigint)"
    return (
        f"list_transform(range(0, {k}), i -> "
        f"list_min(list_transform({tokens_expr}, t -> {h})))"
    )
