"""End-to-end KG composition: transcripts → final (subj, pred, obj) triples.

This is the flagship query — the analog of running the reference's full
frontend + enhancement pipeline and projecting resolved CALL/REACHING_DEF
edges (``FuzzyC2Cpg.runAndOutput`` → ``Scpg.run`` → ``cpg.call`` after
``CallLinker``; SURVEY.md §1.3: the triple set is the projection of REL edges
joined to canonical entity names).

Semantics contract (must equal the frozen reference extractor in
:mod:`codepropertygraph_spark.testdata`, P/R ≥ 0.95 — in fact exact):

1. clause triples: every pred-vocabulary token with both neighbors,
   subject/object linked via scored dictionary → canonical, unresolved →
   ``external:<surface>``, then rewritten through the canonicalization merge
   map;
2. ``follows`` triples: first mention (min token position; dict tokens and
   pred-adjacent unknowns count) per turn, consecutive turns in stable
   (turn_idx, ts) order → (first(later), follows, first(earlier));
3. DISTINCT (conv_id, subj, pred, obj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schema as S
from . import canonicalize, extraction, linking, ordering


def first_mentions(transcripts: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, ts, first_canonical) — the min-position mention of
    each turn, linked (pre-merge canonical or external stub). Turns with no
    mention are absent."""
    m = extraction.mention_surfaces(transcripts, alias_dict)
    linked = linking.link_surfaces(m, alias_dict, "surface", "canonical")
    w = Window.partitionBy("conv_id", "turn_idx", "ts").orderBy("pos")
    return (
        linked.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("conv_id", "turn_idx", "ts", F.col("canonical").alias("first_canonical"))
    )


def follows_triples(
    transcripts: DataFrame, alias_dict: DataFrame, merge: DataFrame
) -> DataFrame:
    """(conv_id, subj, pred='follows', obj) from consecutive turns' first
    mentions under the stable ordering window."""
    fm = first_mentions(transcripts, alias_dict)
    fm = linking.apply_merge(fm, merge, "first_canonical")
    # left-join back onto all turns so ordering ranks ALL turns, then walk
    # consecutive mention-bearing turns: a turn pair (i, i+1) contributes
    # only if BOTH have mentions (reference extractor zips adjacent turns).
    turns = ordering.ordered_turns(transcripts).select(
        "conv_id", "turn_idx", "ts", "turn_order"
    )
    t = turns.join(fm, ["conv_id", "turn_idx", "ts"], "left")
    w = Window.partitionBy("conv_id").orderBy("turn_order")
    return (
        t.withColumn("prev_canonical", F.lag("first_canonical").over(w))
        .where(F.col("first_canonical").isNotNull() & F.col("prev_canonical").isNotNull())
        .select(
            "conv_id",
            F.col("first_canonical").alias("subj"),
            F.lit(S.PRED_FOLLOWS).alias("pred"),
            F.col("prev_canonical").alias("obj"),
        )
    )


def clause_triples(
    transcripts: DataFrame, alias_dict: DataFrame, merge: DataFrame
) -> DataFrame:
    """Linked + merged clause triples (per occurrence, not yet distinct)."""
    rt = extraction.raw_triples(transcripts)
    lt = linking.linked_triples_premerge(rt, alias_dict)
    lt = linking.apply_merge(lt, merge, "subj_canonical", "subj")
    lt = linking.apply_merge(lt, merge, "obj_canonical", "obj")
    return lt.select("conv_id", "subj", "pred", "obj")


def final_triples(
    transcripts: DataFrame, alias_dict: DataFrame, use_lsh: bool = False
) -> DataFrame:
    """The flagship output: DISTINCT (conv_id, subj, pred, obj)."""
    merge = canonicalize.merge_map(alias_dict, use_lsh=use_lsh)
    # merge map is entity-scale (tiny vs the token stream): broadcast joins
    # in apply_merge; computed once, reused by both branches.
    merge = merge.localCheckpoint(eager=True)
    clauses = clause_triples(transcripts, alias_dict, merge)
    follows = follows_triples(transcripts, alias_dict, merge)
    return clauses.unionByName(follows).dropDuplicates(
        ["conv_id", "subj", "pred", "obj"]
    )
