"""Read-side traversal DSL over the materialized graph tables — the analog
of the reference's query steps (``semanticcpg/.../language/Steps.scala:
20-99``, ``NodeSteps.scala:16-123``, ``NodeTypeStarters.scala:10-315``).

The reference's Traversal is a lazy, fused, pull-based Scala iterator with
no optimizer; here each step composes a **lazy DataFrame plan** that
Catalyst fuses/pushes down, and materializers (`.df`, `.collect`, `.count`)
are the actions. Step-by-step mapping:

| reference step                      | here                                |
|-------------------------------------|-------------------------------------|
| ``cpg.method`` / label starters     | ``G.label("TURN")`` (partition-pruned scan) |
| ``.name(regex)`` / ``.nameExact``   | ``.name(regex)`` / ``.has(name=...)`` (rlike / equality) |
| ``.out(lbl)`` / ``.in(lbl)``        | equi hash join through the edges table |
| ``.repeat(...).until(...)``         | ``.repeat_out(lbl, max_hops)`` — iterative join loop |
| ``.where(trav)`` / ``.not(trav)``   | ``.where_in(other)`` / ``.where_not_in(other)`` — semi/anti join |
| ``.dedup``                          | ``.dedup()`` → dropDuplicates(id)   |
| ``.count`` / ``.l`` / ``.toJson``   | ``.count()`` / ``.collect()`` / ``.to_json()`` |
| trait starters (``is EXPRESSION``)  | ``G.trait_("EXPRESSION")`` → isin(labels_of_trait) |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S


class Traversal:
    """A lazy set of graph nodes (a DataFrame of the nodes schema)."""

    def __init__(self, graph: "GraphView", df: DataFrame):
        self._g = graph
        self.df = df

    # -- filters -------------------------------------------------------------

    def has(self, **props) -> "Traversal":
        df = self.df
        for k, v in props.items():
            df = df.where(F.col(k) == v)
        return Traversal(self._g, df)

    def name(self, regex: str) -> "Traversal":
        return Traversal(self._g, self.df.where(F.col("name").rlike(regex)))

    def filter(self, cond) -> "Traversal":
        return Traversal(self._g, self.df.where(cond))

    # -- expansion (graph hops) ----------------------------------------------

    def out(self, edge_label: str) -> "Traversal":
        """One output element per traversed edge (multiplicity preserved,
        like the reference's Traversal; use .dedup() for set semantics)."""
        e = self._g.edges.where(F.col("label") == edge_label)
        ids = self.df.select(F.col("id").alias("__src"))
        hop = e.join(ids, e.src == F.col("__src")).select(F.col("dst").alias("__id"))
        return Traversal(
            self._g,
            self._g.nodes.join(hop, self._g.nodes.id == F.col("__id")).drop("__id"),
        )

    def in_(self, edge_label: str) -> "Traversal":
        e = self._g.edges.where(F.col("label") == edge_label)
        ids = self.df.select(F.col("id").alias("__dst"))
        hop = e.join(ids, e.dst == F.col("__dst")).select(F.col("src").alias("__id"))
        return Traversal(
            self._g,
            self._g.nodes.join(hop, self._g.nodes.id == F.col("__id")).drop("__id"),
        )

    def repeat_out(self, edge_label: str, max_hops: int) -> "Traversal":
        """Bounded transitive expansion (repeat/until analog): iterative
        frontier join with dedup, driver-controlled (SURVEY.md §2.C)."""
        seen = self.df.select("id")
        frontier = self
        for _ in range(max_hops):
            nxt = frontier.out(edge_label)
            new = nxt.df.select("id").dropDuplicates(["id"]).join(seen, "id", "left_anti")
            if new.isEmpty():
                break
            seen = seen.unionByName(new).localCheckpoint(eager=True)
            frontier = Traversal(self._g, self._g.nodes.join(new, "id", "left_semi"))
        return Traversal(self._g, self._g.nodes.join(seen, "id", "left_semi"))

    # -- set semantics --------------------------------------------------------

    def where_in(self, other: "Traversal") -> "Traversal":
        return Traversal(
            self._g, self.df.join(other.df.select("id"), "id", "left_semi")
        )

    def where_not_in(self, other: "Traversal") -> "Traversal":
        return Traversal(
            self._g, self.df.join(other.df.select("id"), "id", "left_anti")
        )

    def union(self, other: "Traversal") -> "Traversal":
        return Traversal(self._g, self.df.unionByName(other.df))

    def dedup(self) -> "Traversal":
        return Traversal(self._g, self.df.dropDuplicates(["id"]))

    # -- side effects / tagging -------------------------------------------------

    def tag(self, name: str) -> DataFrame:
        """``.newTagNode(name)`` analog (``NodeSteps.scala:99-121``): returns
        the rows to append to a ``tags`` table — (node_id, tag). The caller
        commits them as an overlay (tags are additive DiffGraph rows, like
        everything else)."""
        return self.df.select(
            F.col("id").alias("node_id"), F.lit(name).alias("tag")
        ).dropDuplicates(["node_id", "tag"])

    # -- materializers (actions) ----------------------------------------------

    def count(self) -> int:
        return self.df.count()

    def collect(self):
        return self.df.orderBy("id").collect()

    def to_json(self) -> list[str]:
        return self.df.orderBy("id").toJSON().collect()


class GraphView:
    """Query root over materialized node/edge tables (the ``cpg`` object;
    NodeTypeStarters analog)."""

    def __init__(self, nodes: DataFrame, edges: DataFrame):
        self.nodes = nodes
        self.edges = edges

    def all(self) -> Traversal:
        return Traversal(self, self.nodes)

    def label(self, label: str) -> Traversal:
        # at scale `label` is the partition column of the Iceberg nodes
        # table, so this starter is a partition-pruned scan.
        return Traversal(self, self.nodes.where(F.col("label") == label))

    def trait_(self, trait: str) -> Traversal:
        return Traversal(
            self, self.nodes.where(F.col("label").isin(S.labels_of_trait(trait)))
        )

    # typed sugar (Method.parameter-style starters)
    def conversations(self) -> Traversal:
        return self.label(S.CONVERSATION)

    def turns(self) -> Traversal:
        return self.label(S.TURN)

    def mentions(self) -> Traversal:
        return self.label(S.MENTION)

    def entities(self) -> Traversal:
        return self.label(S.ENTITY)

    def toolcalls(self) -> Traversal:
        return self.label(S.TOOLCALL)
