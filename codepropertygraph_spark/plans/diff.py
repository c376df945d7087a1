"""DiffGraph mutation primitives — the write-side row operators (SURVEY.md
§2.B; reference ``codepropertygraph/src/main/scala/io/shiftleft/passes/
DiffGraph.scala``).

Every mutation is expressed as a pure DataFrame → DataFrame transform that
the overlay applier commits atomically; in production these are Iceberg
``MERGE INTO`` / ``DELETE`` statements, locally they rewrite the union view.

| reference primitive                          | here                        |
|----------------------------------------------|-----------------------------|
| ``CreateNode`` (``DiffGraph.scala:126``)     | union of new node rows (builders in operators/graph.py) |
| ``CreateEdge`` (``:129-146``)                | union of new edge rows      |
| ``SetNodeProperty`` (``:127``)               | :func:`set_node_props` — join + coalesce overwrite |
| ``RemoveNode`` (``:122``)                    | :func:`remove_nodes` — anti-join (+ edge cascade) |
| ``RemoveEdge`` by propertiesHash (``:187-190``)| :func:`remove_edges` — deterministic sha2 edge identity |
| ``StubRemovalPass`` (A5, ``fuzzyc2cpg/.../StubRemovalPass.scala:13-27``) | :func:`remove_shadowed_stubs` — left-anti on the real-definition key |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S


def edge_identity(edges: DataFrame) -> DataFrame:
    """Deterministic content-addressed edge id — the MD5 ``propertiesHash``
    disambiguation (``DiffGraph.scala:187-190``) as a sha2 column."""
    return edges.withColumn(
        "edge_id",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
                F.col("label"),
                F.coalesce(F.to_json(F.col("props")), F.lit("")),
            ),
            256,
        ),
    )


def set_node_props(nodes: DataFrame, updates: DataFrame) -> DataFrame:
    """SetNodeProperty: ``updates(id, key, value)`` merged into the props map
    (MERGE INTO ... UPDATE SET semantics). Later updates win per (id, key)."""
    per_node = (
        updates.groupBy("id")
        .agg(F.map_from_entries(F.collect_list(F.struct("key", "value"))).alias("__upd"))
    )
    joined = nodes.join(per_node, "id", "left")
    merged = F.when(
        F.col("__upd").isNotNull(),
        F.map_concat(
            F.map_filter(
                F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
                lambda k, _: ~F.array_contains(F.map_keys(F.col("__upd")), k),
            ),
            F.col("__upd"),
        ),
    ).otherwise(F.col("props"))
    return joined.withColumn("props", merged).drop("__upd")


def set_edge_props(edges: DataFrame, updates: DataFrame) -> DataFrame:
    """SetEdgeProperty (``DiffGraph.scala:128``): ``updates(src, dst, label,
    key, value)`` merged into the edge props map. Later updates win per
    (edge, key). Edges are addressed by (src, dst, label) — multi-edges on
    the same triple (e.g. REL with different preds) all receive the update,
    the MERGE INTO semantics of a relational edge store."""
    per_edge = updates.groupBy("src", "dst", "label").agg(
        F.map_from_entries(F.collect_list(F.struct("key", "value"))).alias("__upd")
    )
    joined = edges.join(per_edge, ["src", "dst", "label"], "left")
    merged = F.when(
        F.col("__upd").isNotNull(),
        F.map_concat(
            F.map_filter(
                F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
                lambda k, _: ~F.array_contains(F.map_keys(F.col("__upd")), k),
            ),
            F.col("__upd"),
        ),
    ).otherwise(F.col("props"))
    return joined.withColumn("props", merged).drop("__upd")


def remove_node_property(nodes: DataFrame, removals: DataFrame) -> DataFrame:
    """RemoveNodeProperty (``DiffGraph.scala:123``): drop ``key`` from the
    props map of each node in ``removals(id, key)``."""
    per_node = removals.groupBy("id").agg(F.collect_set("key").alias("__rm"))
    joined = nodes.join(per_node, "id", "left")
    cleaned = F.when(
        F.col("__rm").isNotNull(),
        F.map_filter(
            F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
            lambda k, _: ~F.array_contains(F.col("__rm"), k),
        ),
    ).otherwise(F.col("props"))
    return joined.withColumn("props", cleaned).drop("__rm")


def remove_edge_property(edges: DataFrame, removals: DataFrame) -> DataFrame:
    """RemoveEdgeProperty (``DiffGraph.scala:124``): drop ``key`` from the
    props of each edge in ``removals(src, dst, label, key)``."""
    per_edge = removals.groupBy("src", "dst", "label").agg(
        F.collect_set("key").alias("__rm")
    )
    joined = edges.join(per_edge, ["src", "dst", "label"], "left")
    cleaned = F.when(
        F.col("__rm").isNotNull(),
        F.map_filter(
            F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
            lambda k, _: ~F.array_contains(F.col("__rm"), k),
        ),
    ).otherwise(F.col("props"))
    return joined.withColumn("props", cleaned).drop("__rm")


def remove_nodes(
    nodes: DataFrame, edges: DataFrame, ids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """RemoveNode with edge cascade: drop the nodes and every edge touching
    them (MERGE DELETE semantics). ids: a single-column 'id' frame."""
    ids = ids.select("id")
    new_nodes = nodes.join(ids, "id", "left_anti")
    new_edges = (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select(edges.columns)
    )
    return new_nodes, new_edges


def remove_edges(edges: DataFrame, edge_ids: DataFrame) -> DataFrame:
    """RemoveEdge by content identity (sha2 edge_id)."""
    with_id = edge_identity(edges)
    return with_id.join(edge_ids.select("edge_id"), "edge_id", "left_anti").drop(
        "edge_id"
    )


def remove_shadowed_stubs(
    nodes: DataFrame, edges: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """StubRemovalPass analog (A5): delete external stub ENTITY nodes whose
    surface form is shadowed by a real (non-external) entity of the same
    name — ``stubs LEFT ANTI JOIN defs ON signature`` in the reference,
    here on the surface name. A clean pipeline output has no shadowed
    stubs; this pass exists for dirty/merged inputs (e.g. unioning two
    independently-built graphs)."""
    ents = nodes.where(F.col("label") == S.ENTITY)
    stubs = ents.where(F.col("full_name").startswith(S.EXTERNAL_PREFIX)).withColumn(
        "__surface", F.expr(f"substring(full_name, {len(S.EXTERNAL_PREFIX) + 1})")
    )
    real = ents.where(~F.col("full_name").startswith(S.EXTERNAL_PREFIX)).select(
        F.col("full_name").alias("__surface")
    )
    shadowed = stubs.join(real, "__surface", "left_semi").select("id")
    return remove_nodes(nodes, edges, shadowed)
