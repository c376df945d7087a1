"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query (full extract →
link → canonicalize → triples) at sf0.001. ``queries()`` exposes one entry
per implemented operator (SURVEY.md §2); ``oracle_sql()`` gives the DuckDB
equivalent. KG queries run over the deterministic generated transcript
corpus (``codepropertygraph_spark.testdata``, seed=42 — synthesized, no
external data, per the input_hint shape); data-pipeline queries run over the
driver-provided tables (documents/embeddings/events/lineitem...).

Column names and numeric widths are aligned between both engines (computed
ints cast to bigint everywhere) because the driver hashes values under
sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codepropertygraph_spark import schema as S
from codepropertygraph_spark import testdata as td
from codepropertygraph_spark.operators import (
    canonicalize,
    dataflow,
    extraction,
    kg,
    linking,
    ordering,
)
from codepropertygraph_spark.operators import graph as G

# Generated-corpus paths. The oracle runs at sf0.01 only, so oracle SQL can
# hardcode that tier's files; generation is idempotent and happens at import
# so the files exist regardless of which side the driver runs first.
for _tier in ("sf0.001", "sf0.01"):
    try:
        td.ensure_generated(_tier)
    except Exception:  # pragma: no cover - generation is deterministic
        pass

_G01 = td.tier_dir("sf0.01")
_T01 = f"{_G01}/transcripts.parquet"
_A01 = f"{_G01}/alias_dict.parquet"
_ET01 = f"{_G01}/expected_triples.parquet"
_EC01 = f"{_G01}/expected_components.parquet"

_PREDS_SQL = "('uses_tool', 'mentions', 'asks_about', 'refers_to')"

# Shared DuckDB CTE fragments ------------------------------------------------

_TOK_CTE = f"""
tr AS (SELECT * FROM read_parquet('{_T01}')),
tok AS (
  SELECT conv_id, turn_idx, ts,
         CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
         unnest(l) AS tok
  FROM (SELECT conv_id, turn_idx, ts, string_split(text, ' ') AS l FROM tr)
)
"""

_MENTION_CTE = f"""
fl AS (
  SELECT conv_id, turn_idx, ts, pos, tok,
         (tok IN (SELECT alias FROM read_parquet('{_A01}'))) AS in_dict,
         coalesce(lag(tok)  OVER w IN {_PREDS_SQL}, false)
         OR coalesce(lead(tok) OVER w IN {_PREDS_SQL}, false) AS pred_adjacent
  FROM tok
  WINDOW w AS (PARTITION BY conv_id, turn_idx, ts ORDER BY pos)
),
mention AS (
  SELECT conv_id, turn_idx, ts, pos, tok AS surface, in_dict
  FROM fl
  WHERE tok NOT IN {_PREDS_SQL} AND (in_dict OR pred_adjacent)
)
"""

_BEST_CTE = f"""
best AS (
  SELECT alias, canonical_name, entity_type FROM (
    SELECT *, row_number() OVER (
        PARTITION BY alias ORDER BY prior DESC, canonical_name ASC) AS rk
    FROM read_parquet('{_A01}')
  ) WHERE rk = 1
)
"""


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = td.ensure_generated(td.tier_of_sf_dir(sf_dir))
    return spark.read.parquet(f"{d}/transcripts.parquet")


def _alias_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = td.ensure_generated(td.tier_of_sf_dir(sf_dir))
    return spark.read.parquet(f"{d}/alias_dict.parquet")


# ---------------------------------------------------------------------------
# entry: flagship query
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (extract → link → canonicalize) on the
    sf0.001 corpus; returns the final (conv_id, subj, pred, obj) triples."""
    tr = _transcripts(spark, "/root/testdata/sf0.001")
    ad = _alias_dict(spark, "/root/testdata/sf0.001")
    return kg.final_triples(tr, ad)


# ---------------------------------------------------------------------------
# queries — KG construction operators
# ---------------------------------------------------------------------------


def _q_kg_ordered_turns(spark, sf_dir):
    t = ordering.ordered_turns(_transcripts(spark, sf_dir))
    return t.select(
        "conv_id",
        F.col("turn_order").cast("long").alias("turn_order"),
        "turn_idx",
        "role",
        "tool",
        "text",
    )


def _q_kg_next_edges(spark, sf_dir):
    n = ordering.next_edges(_transcripts(spark, sf_dir))
    return n.select(
        "conv_id",
        F.col("src_order").cast("long").alias("src_order"),
        F.col("dst_order").cast("long").alias("dst_order"),
    )


def _q_kg_raw_triples(spark, sf_dir):
    rt = extraction.raw_triples(_transcripts(spark, sf_dir))
    return rt.select(
        "conv_id",
        "turn_idx",
        F.col("pos").cast("long").alias("pos"),
        "subj_surface",
        "pred",
        "obj_surface",
    )


def _q_kg_mentions(spark, sf_dir):
    m = extraction.mention_surfaces(
        _transcripts(spark, sf_dir), _alias_dict(spark, sf_dir)
    )
    return m.select(
        "conv_id", "turn_idx", F.col("pos").cast("long").alias("pos"), "surface", "in_dict"
    )


def _q_kg_best_alias(spark, sf_dir):
    return linking.best_alias(_alias_dict(spark, sf_dir))


def _q_kg_linked_mentions(spark, sf_dir):
    m = extraction.mention_surfaces(
        _transcripts(spark, sf_dir), _alias_dict(spark, sf_dir)
    )
    linked = linking.link_surfaces(m, _alias_dict(spark, sf_dir), "surface", "canonical")
    return linked.select(
        "conv_id", "turn_idx", F.col("pos").cast("long").alias("pos"), "surface", "canonical"
    )


def _q_kg_entity_stubs(spark, sf_dir):
    m = extraction.mention_surfaces(
        _transcripts(spark, sf_dir), _alias_dict(spark, sf_dir)
    )
    return (
        m.where(~F.col("in_dict"))
        .select(F.concat(F.lit(S.EXTERNAL_PREFIX), F.col("surface")).alias("full_name"))
        .distinct()
    )


def _q_kg_merge_map(spark, sf_dir):
    return canonicalize.merge_map(_alias_dict(spark, sf_dir)).select(
        "canonical_name", "merged_name"
    )


def _q_kg_triples(spark, sf_dir):
    return kg.final_triples(
        _transcripts(spark, sf_dir), _alias_dict(spark, sf_dir)
    ).select("conv_id", "subj", "pred", "obj")


def _q_kg_conv_stats(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_turns"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
    )


def _q_kg_toolcalls(spark, sf_dir):
    t = _transcripts(spark, sf_dir)
    return t.where(F.col("tool").isNotNull()).select("conv_id", "turn_idx", "tool")


def _q_kg_graph_nodes(spark, sf_dir):
    tr, ad = _transcripts(spark, sf_dir), _alias_dict(spark, sf_dir)
    merge = canonicalize.merge_map(ad).localCheckpoint(eager=True)
    nodes = (
        G.conversation_nodes(tr)
        .unionByName(G.turn_nodes(tr))
        .unionByName(G.mention_nodes(tr, ad))
        .unionByName(G.toolcall_nodes(tr))
        .unionByName(G.entity_nodes(tr, ad, merge))
    )
    return nodes.groupBy("label").agg(F.count("*").alias("n")).orderBy("label")


def _q_kg_graph_edges(spark, sf_dir):
    tr, ad = _transcripts(spark, sf_dir), _alias_dict(spark, sf_dir)
    merge = canonicalize.merge_map(ad).localCheckpoint(eager=True)
    edges = (
        G.ast_edges(tr, ad)
        .unionByName(G.next_edges(tr))
        .unionByName(G.contains_edges(tr, ad))
        .unionByName(G.ref_edges(tr, ad, merge))
        .unionByName(G.call_edges(tr, ad, merge))
        .unionByName(G.rel_edges(tr, ad, merge))
    )
    return edges.groupBy("label").agg(F.count("*").alias("n")).orderBy("label")


def _q_kg_reachable_4hop(spark, sf_dir):
    triples = kg.final_triples(_transcripts(spark, sf_dir), _alias_dict(spark, sf_dir))
    follows = triples.where(F.col("pred") == S.PRED_FOLLOWS).select(
        "conv_id", F.col("subj").alias("s"), F.col("obj").alias("o")
    )
    return dataflow.reachable_within(follows, max_hops=4)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kg_ordered_turns": _q_kg_ordered_turns,
    "kg_next_edges": _q_kg_next_edges,
    "kg_raw_triples": _q_kg_raw_triples,
    "kg_mentions": _q_kg_mentions,
    "kg_best_alias": _q_kg_best_alias,
    "kg_linked_mentions": _q_kg_linked_mentions,
    "kg_entity_stubs": _q_kg_entity_stubs,
    "kg_merge_map": _q_kg_merge_map,
    "kg_triples": _q_kg_triples,
    "kg_conv_stats": _q_kg_conv_stats,
    "kg_toolcalls": _q_kg_toolcalls,
    "kg_graph_nodes": _q_kg_graph_nodes,
    "kg_graph_edges": _q_kg_graph_edges,
    "kg_reachable_4hop": _q_kg_reachable_4hop,
}


ORACLES: dict[str, str] = {
    "kg_ordered_turns": f"""
        SELECT conv_id,
               CAST(row_number() OVER (
                   PARTITION BY conv_id ORDER BY turn_idx, ts) AS BIGINT) AS turn_order,
               turn_idx, role, tool, text
        FROM read_parquet('{_T01}')
    """,
    "kg_next_edges": f"""
        WITH o AS (
          SELECT conv_id,
                 CAST(row_number() OVER (
                     PARTITION BY conv_id ORDER BY turn_idx, ts) AS BIGINT) AS turn_order
          FROM read_parquet('{_T01}')
        )
        SELECT conv_id, turn_order AS src_order, dst_order FROM (
          SELECT conv_id, turn_order,
                 lead(turn_order) OVER (PARTITION BY conv_id ORDER BY turn_order) AS dst_order
          FROM o
        ) WHERE dst_order IS NOT NULL
    """,
    "kg_raw_triples": f"""
        WITH {_TOK_CTE},
        tri AS (
          SELECT conv_id, turn_idx, pos,
                 lag(tok)  OVER w AS subj_surface,
                 tok AS pred,
                 lead(tok) OVER w AS obj_surface
          FROM tok
          WINDOW w AS (PARTITION BY conv_id, turn_idx, ts ORDER BY pos)
        )
        SELECT * FROM tri
        WHERE pred IN {_PREDS_SQL}
          AND subj_surface IS NOT NULL AND obj_surface IS NOT NULL
    """,
    "kg_mentions": f"""
        WITH {_TOK_CTE}, {_MENTION_CTE}
        SELECT conv_id, turn_idx, pos, surface, in_dict FROM mention
    """,
    "kg_best_alias": f"""
        WITH {_BEST_CTE} SELECT alias, canonical_name, entity_type FROM best
    """,
    "kg_linked_mentions": f"""
        WITH {_TOK_CTE}, {_MENTION_CTE}, {_BEST_CTE}
        SELECT m.conv_id, m.turn_idx, m.pos, m.surface,
               coalesce(b.canonical_name, 'external:' || m.surface) AS canonical
        FROM mention m LEFT JOIN best b ON m.surface = b.alias
    """,
    "kg_entity_stubs": f"""
        WITH {_TOK_CTE}, {_MENTION_CTE}
        SELECT DISTINCT 'external:' || surface AS full_name
        FROM mention WHERE NOT in_dict
    """,
    "kg_merge_map": f"""
        SELECT canonical_name, merged_name FROM read_parquet('{_EC01}')
    """,
    "kg_triples": f"""
        SELECT conv_id, subj, pred, obj FROM read_parquet('{_ET01}')
    """,
    "kg_conv_stats": f"""
        SELECT conv_id,
               count(*) AS n_turns,
               count(tool) AS n_tool_turns,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM read_parquet('{_T01}')
        GROUP BY conv_id
    """,
    "kg_toolcalls": f"""
        SELECT conv_id, turn_idx, tool FROM read_parquet('{_T01}')
        WHERE tool IS NOT NULL
    """,
    "kg_graph_nodes": f"""
        WITH {_TOK_CTE}, {_MENTION_CTE}, {_BEST_CTE},
        merged AS (
          SELECT DISTINCT coalesce(
                   mm.merged_name,
                   coalesce(b.canonical_name, 'external:' || m.surface)) AS full_name
          FROM mention m
          LEFT JOIN best b ON m.surface = b.alias
          LEFT JOIN read_parquet('{_EC01}') mm
                 ON coalesce(b.canonical_name, 'external:' || m.surface) = mm.canonical_name
        )
        SELECT 'CONVERSATION' AS label, count(DISTINCT conv_id) AS n FROM tr
        UNION ALL SELECT 'TURN', count(*) FROM tr
        UNION ALL SELECT 'MENTION', count(*) FROM mention
        UNION ALL SELECT 'TOOLCALL', count(*) FROM tr WHERE tool IS NOT NULL
        UNION ALL SELECT 'ENTITY', count(*) FROM merged
        ORDER BY label
    """,
    "kg_graph_edges": f"""
        WITH {_TOK_CTE}, {_MENTION_CTE}
        SELECT 'AST' AS label,
               (SELECT count(*) FROM tr) + (SELECT count(*) FROM mention)
               + (SELECT count(*) FROM tr WHERE tool IS NOT NULL) AS n
        UNION ALL SELECT 'CALL', (SELECT count(*) FROM tr WHERE tool IS NOT NULL)
        UNION ALL SELECT 'CONTAINS',
               (SELECT count(*) FROM tr) + (SELECT count(*) FROM mention)
               + (SELECT count(*) FROM tr WHERE tool IS NOT NULL)
        UNION ALL SELECT 'NEXT',
               (SELECT count(*) FROM tr) - (SELECT count(DISTINCT conv_id) FROM tr)
        UNION ALL SELECT 'REF', (SELECT count(*) FROM mention)
        UNION ALL SELECT 'REL', (SELECT count(*) FROM read_parquet('{_ET01}'))
        ORDER BY label
    """,
    "kg_reachable_4hop": f"""
        WITH e AS (
          SELECT DISTINCT conv_id, subj AS s, obj AS o
          FROM read_parquet('{_ET01}') WHERE pred = 'follows'
        ),
        h2 AS (SELECT a.conv_id, a.s, b.o FROM e a JOIN e b
                ON a.conv_id = b.conv_id AND a.o = b.s),
        h3 AS (SELECT a.conv_id, a.s, b.o FROM h2 a JOIN e b
                ON a.conv_id = b.conv_id AND a.o = b.s),
        h4 AS (SELECT a.conv_id, a.s, b.o FROM h3 a JOIN e b
                ON a.conv_id = b.conv_id AND a.o = b.s)
        SELECT DISTINCT conv_id, s AS src, o AS dst
        FROM (SELECT * FROM e UNION ALL SELECT * FROM h2
              UNION ALL SELECT * FROM h3 UNION ALL SELECT * FROM h4)
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
