"""Mention detection + raw triple extraction — the frontend AST pass analog.

The reference's frontend walks each source file's AST emitting node/edge rows
in a per-file parallel pass (``fuzzyc2cpg/.../passes/AstCreationPass.scala:
14-38``, visitor ``astcreation/AstCreator.scala``). Our "grammar" (documented
in :mod:`codepropertygraph_spark.testdata`) is regular, so the whole parse is
expressible with JVM-side primitives — ``split`` + ``posexplode`` + one
window over token position — and never leaves whole-stage codegen:

  * token stream:   posexplode(split(text, ' '))
  * clause detect:  token ∈ TEXT_PREDICATES → (lag(token), token, lead(token))
  * mentions:       dict-matched tokens anywhere, plus pred-adjacent unknowns
                    (the external-stub candidates, MethodStubCreator analog)

A pandas-UDF variant of the same extractor lives in
:mod:`codepropertygraph_spark.operators.extraction_udf` for grammars that
need a real recursive parser; this built-in path is the hot path (no Python,
no Arrow transfer), and the test suite asserts both produce identical rows.

Scale notes: everything here is a map-side transform except the token window,
which partitions by the (already-shuffled) conversation key; position `pos`
is 1-based to match DuckDB's ``generate_subscripts`` in oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schema as S

def token_window():
    """Per-turn token-position window. A turn is uniquely identified by
    (conv_id, turn_idx, ts). Built lazily — PySpark 4 requires an active
    session to construct Window specs."""
    return Window.partitionBy("conv_id", "turn_idx", "ts").orderBy("pos")


def turn_tokens(transcripts: DataFrame) -> DataFrame:
    """One row per token: (conv_id, turn_idx, ts, pos, tok). pos is 1-based.

    A turn is uniquely identified by (conv_id, turn_idx, ts) — duplicate
    turn_idx rows differ in ts by the generator/ordering contract.
    """
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        (F.col("pos0") + F.lit(1)).alias("pos"),
        "tok",
    )


def raw_triples(transcripts: DataFrame) -> DataFrame:
    """Clause occurrences: (conv_id, turn_idx, ts, pos, subj_surface, pred,
    obj_surface) for every predicate-vocabulary token with both neighbors."""
    toks = turn_tokens(transcripts)
    w = token_window()
    return (
        toks.withColumn("prev_tok", F.lag("tok").over(w))
        .withColumn("next_tok", F.lead("tok").over(w))
        .where(
            F.col("tok").isin(list(S.TEXT_PREDICATES))
            & F.col("prev_tok").isNotNull()
            & F.col("next_tok").isNotNull()
        )
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            "pos",
            F.col("prev_tok").alias("subj_surface"),
            F.col("tok").alias("pred"),
            F.col("next_tok").alias("obj_surface"),
        )
    )


def mention_surfaces(transcripts: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """All mention occurrences: (conv_id, turn_idx, ts, pos, surface,
    in_dict). A mention is a token found in the alias dictionary (any
    position) or a predicate-adjacent token not in the dictionary (external
    stub candidate). The dictionary probe is a broadcast semi-join — the
    Linker's RAM hash map (``Linker.scala:122-130``) become a broadcast hash
    join; the build side is tiny relative to the token stream at any scale.
    """
    toks = turn_tokens(transcripts)
    w = token_window()
    surfaces = F.broadcast(alias_dict.select(F.col("alias").alias("surface")).distinct())

    flagged = (
        toks.withColumn("prev_tok", F.lag("tok").over(w))
        .withColumn("next_tok", F.lead("tok").over(w))
        .withColumn(
            "pred_adjacent",
            F.coalesce(F.col("prev_tok").isin(list(S.TEXT_PREDICATES)), F.lit(False))
            | F.coalesce(F.col("next_tok").isin(list(S.TEXT_PREDICATES)), F.lit(False)),
        )
        .where(~F.col("tok").isin(list(S.TEXT_PREDICATES)))
    )
    matched = flagged.join(surfaces, flagged.tok == surfaces.surface, "left")
    return (
        matched.where(F.col("surface").isNotNull() | F.col("pred_adjacent"))
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            "pos",
            F.col("tok").alias("surface"),
            F.col("surface").isNotNull().alias("in_dict"),
        )
    )
