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


def flagged_tokens(transcripts: DataFrame) -> DataFrame:
    """The single token-scan both extractors share: every token with its
    neighbors (distance 1 AND 2), **computed array-side before the explode**
    — ``transform`` over the split array emits (pos, tok, prev, next, prev2,
    next2) structs, so the whole stage is a zero-shuffle map (wholly inside
    whole-stage codegen). The distance-2 neighbors exist so mention
    detection can require an adjacent predicate to form a COMPLETE clause
    (both the subject at i-1 and the object at i+1 must exist), matching the
    frozen extractor's ``0 < i < len-1`` clause guard exactly.

    This replaces a naive lag/lead window partitioned by turn, which would
    shuffle the *token* stream (10× the turn stream) — the difference between
    a map-only stage and the biggest shuffle in the pipeline at 100 TB.
    """
    t = transcripts.withColumn("toks", F.split("text", " "))
    exploded = t.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.explode(
            F.expr(
                "transform(toks, (t, i) -> named_struct("
                "'pos', i + 1, 'tok', t, "
                "'prev_tok', if(i > 0, toks[i - 1], cast(null as string)), "
                "'next_tok', if(i < size(toks) - 1, toks[i + 1], cast(null as string)), "
                "'prev2_tok', if(i > 1, toks[i - 2], cast(null as string)), "
                "'next2_tok', if(i < size(toks) - 2, toks[i + 2], cast(null as string))))"
            )
        ).alias("x"),
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("x.pos").alias("pos"),
        F.col("x.tok").alias("tok"),
        F.col("x.prev_tok").alias("prev_tok"),
        F.col("x.next_tok").alias("next_tok"),
        F.col("x.prev2_tok").alias("prev2_tok"),
        F.col("x.next2_tok").alias("next2_tok"),
    )


def _pred_adjacent_col():
    """A token is predicate-adjacent only through a COMPLETE clause: it is
    the subject of a predicate that also has an object (next is a predicate
    with a next2), or the object of a predicate that also has a subject
    (prev is a predicate with a prev2). A predicate dangling at a turn
    boundary promotes nothing — the frozen extractor's ``0 < i < len-1``
    guard (testdata.reference_extract)."""
    preds = list(S.TEXT_PREDICATES)
    obj_side = F.col("prev_tok").isin(preds) & F.col("prev2_tok").isNotNull()
    subj_side = F.col("next_tok").isin(preds) & F.col("next2_tok").isNotNull()
    return F.coalesce(obj_side, F.lit(False)) | F.coalesce(subj_side, F.lit(False))


def raw_triples_from(flagged: DataFrame) -> DataFrame:
    return flagged.where(
        F.col("tok").isin(list(S.TEXT_PREDICATES))
        & F.col("prev_tok").isNotNull()
        & F.col("next_tok").isNotNull()
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        "pos",
        F.col("prev_tok").alias("subj_surface"),
        F.col("tok").alias("pred"),
        F.col("next_tok").alias("obj_surface"),
    )


def raw_triples(transcripts: DataFrame) -> DataFrame:
    """Clause occurrences: (conv_id, turn_idx, ts, pos, subj_surface, pred,
    obj_surface) for every predicate-vocabulary token with both neighbors."""
    return raw_triples_from(flagged_tokens(transcripts))


def mention_surfaces_from(flagged: DataFrame, alias_dict: DataFrame) -> DataFrame:
    surfaces = F.broadcast(alias_dict.select(F.col("alias").alias("surface")).distinct())
    candidates = flagged.withColumn(
        "pred_adjacent", _pred_adjacent_col()
    ).where(~F.col("tok").isin(list(S.TEXT_PREDICATES)))
    matched = candidates.join(surfaces, candidates.tok == surfaces.surface, "left")
    return matched.where(
        F.col("surface").isNotNull() | F.col("pred_adjacent")
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        "pos",
        F.col("tok").alias("surface"),
        F.col("surface").isNotNull().alias("in_dict"),
    )


def mention_candidates_from(flagged: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """ALL tokens with linking applied and an ``is_mention`` flag — keeps
    non-mention rows (so per-turn aggregates retain every turn) while the
    broadcast dictionary probe resolves ``canonical`` for mention rows
    (external-stub fallback for unknowns). Columns: conv_id, turn_idx, ts,
    pos, tok, is_mention, canonical."""
    from .linking import best_alias

    best = F.broadcast(
        best_alias(alias_dict).select(
            F.col("alias").alias("__alias"), F.col("canonical_name").alias("__canon")
        )
    )
    is_pred = F.col("tok").isin(list(S.TEXT_PREDICATES))
    pred_adjacent = _pred_adjacent_col()
    joined = flagged.join(best, flagged.tok == F.col("__alias"), "left")
    return joined.select(
        "conv_id",
        "turn_idx",
        "ts",
        "pos",
        "tok",
        (
            ~is_pred & (F.col("__canon").isNotNull() | pred_adjacent)
        ).alias("is_mention"),
        F.coalesce(
            F.col("__canon"), F.concat(F.lit(S.EXTERNAL_PREFIX), F.col("tok"))
        ).alias("canonical"),
    )


def mention_surfaces(transcripts: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """All mention occurrences: (conv_id, turn_idx, ts, pos, surface,
    in_dict). A mention is a token found in the alias dictionary (any
    position) or a predicate-adjacent token not in the dictionary (external
    stub candidate). The dictionary probe is a broadcast semi-join — the
    Linker's RAM hash map (``Linker.scala:122-130``) becomes a broadcast hash
    join; the build side is tiny relative to the token stream at any scale.
    """
    return mention_surfaces_from(flagged_tokens(transcripts), alias_dict)
