"""Batched pandas-UDF entity-linking scorer — the north-star's "entity
linking scored in batched UDFs against a broadcast alias dictionary".

The JVM path (:mod:`linking`) resolves ambiguity with a window over
``prior``; this variant is the escape hatch for scorers SQL can't express
(feature crosses, character-level similarity, learned models): the alias
dictionary is shipped once per executor as a **Spark broadcast variable**
(not a closure capture — a captured driver global would re-pickle per task)
and probed inside Arrow-batched ``mapInPandas``. This mirrors the
reference's ``CallLinker`` dynamic dispatch (``CallLinker.scala:52-81``):
exact key first, then candidate scoring.

The default score is identical to the JVM path (max prior, tie-break min
canonical name) so the test suite can assert exact parity; a custom
``score_fn(surface, candidates, context) -> canonical`` plugs in richer
logic without touching the plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S


def _default_score(surface: str, candidates: list[tuple[str, float]]) -> str:
    """max prior, tie-break lexicographically smallest canonical — exactly
    ``linking.best_alias`` semantics."""
    return min(candidates, key=lambda c: (-c[1], c[0]))[0]


MAX_BROADCAST_DICT_ROWS = 50_000_000  # ~a few GB of tuples: the driver-side
# collect below is only valid while the dictionary is executor-RAM scale
# (the same assumption the reference's Linker.initMaps makes). Beyond this,
# switch to the JVM broadcast-join path (linking.link_surfaces) or a
# bucketed join — fail loudly rather than OOM the driver.


def scored_link_pandas(
    df: DataFrame,
    alias_dict: DataFrame,
    surface_col: str,
    out_col: str,
    score_fn: Callable[[str, list[tuple[str, float]]], str] | None = None,
) -> DataFrame:
    """Resolve ``surface_col`` → canonical in ``out_col`` with a batched
    Python scorer; unresolved surfaces become external stubs."""
    spark = df.sparkSession
    sc = spark.sparkContext
    n_dict = alias_dict.count()
    if n_dict > MAX_BROADCAST_DICT_ROWS:
        raise ValueError(
            f"alias dictionary has {n_dict} rows — too large to collect and "
            f"broadcast (cap {MAX_BROADCAST_DICT_ROWS}); use "
            "linking.link_surfaces (broadcast hash join) or a bucketed join"
        )
    # dictionary → {surface: [(canonical, prior), ...]} shipped ONCE per
    # executor (torrent broadcast), not per task.
    rows = alias_dict.select("alias", "canonical_name", "prior").collect()
    dict_py: dict[str, list[tuple[str, float]]] = {}
    for r in rows:
        dict_py.setdefault(r.alias, []).append((r.canonical_name, float(r.prior)))
    bc = sc.broadcast(dict_py)
    scorer = score_fn or _default_score

    in_cols = df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` string"

    def link(batches: Iterator) -> Iterator:
        d = bc.value
        for pdf in batches:
            surfaces = pdf[surface_col]
            resolved = [
                scorer(s, d[s]) if s in d else S.EXTERNAL_PREFIX + s
                for s in surfaces
            ]
            pdf = pdf.copy()
            pdf[out_col] = resolved
            yield pdf

    return df.select(*in_cols).mapInPandas(link, schema=out_schema)
