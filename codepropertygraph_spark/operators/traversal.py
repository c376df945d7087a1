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
| ``.repeat(...).until(...)``         | ``.repeat_out(lbl, max_hops, until=pred, emit_all=...)`` — iterative join loop |
| ``.choose`` / ``.coalesce``         | ``.choose(cond, then, else)`` / ``.coalesce_steps(*branches)`` |
| ``.outE`` / ``.inE``                | ``.out_e(lbl)`` / ``.in_e(lbl)`` — edge rows with props |
| ``.calledMethod`` / ``.callIn``     | ``.callee()`` / ``.caller()`` over CALL edges |
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

    def _hop(self, edge_label: str, forward: bool) -> "Traversal":
        """Shared hop: one output element per traversed edge (multiplicity
        preserved, like the reference's Traversal; use .dedup() for set
        semantics). A ``__root`` provenance column (installed by coalesce /
        choose) and a ``__path`` tracking column (installed by
        :meth:`track_path`) are carried through the hop; ``__path`` also
        gains the hopped-to node id."""
        e = self._g.edges.where(F.col("label") == edge_label)
        from_col, to_col = ("src", "dst") if forward else ("dst", "src")
        keep = [c for c in ("__root", "__path") if c in self.df.columns]
        ids = self.df.select(F.col("id").alias("__from"), *keep)
        hop = e.join(ids, e[from_col] == F.col("__from")).select(
            F.col(to_col).alias("__id"), *keep
        )
        out = self._g.nodes.join(hop, self._g.nodes.id == F.col("__id")).drop("__id")
        if "__path" in keep:
            out = out.withColumn("__path", F.array_append("__path", F.col("id")))
        return Traversal(self._g, out)

    def track_path(self) -> "Traversal":
        """Install path tracking — the reference's TrackingPoint path
        carrying (``dataflowengineoss/.../TrackingPoint.scala:48-66``):
        every subsequent hop appends the visited node id to a path array.
        ``.dedup()`` after tracking keeps ONE witness path per element —
        the Engine's per-(head, last) path dedup discipline
        (``Engine.scala:217-239``). For bounded ALL-paths enumeration use
        :func:`dataflow.flow_paths_grouped` instead; a traversal chain
        tracks one array per row."""
        if "__path" in self.df.columns:
            return self
        return Traversal(
            self._g, self.df.withColumn("__path", F.array(F.col("id")))
        )

    def paths(self) -> DataFrame:
        """Materialize tracked paths: (path array<node id>, last) rows."""
        if "__path" not in self.df.columns:
            raise ValueError("call .track_path() before .paths()")
        return self.df.select(
            F.col("__path").alias("path"), F.col("id").alias("last")
        )

    def out(self, edge_label: str) -> "Traversal":
        return self._hop(edge_label, forward=True)

    def in_(self, edge_label: str) -> "Traversal":
        return self._hop(edge_label, forward=False)

    def out_e(self, edge_label: str) -> DataFrame:
        """Edge-exposing step (``outE``): the matching edge ROWS (src, dst,
        label, props) — for predicates over edge properties (e.g. REL pred
        filtering) before .in_v()/.out_v() via the edges' dst/src ids."""
        e = self._g.edges.where(F.col("label") == edge_label)
        ids = self.df.select(F.col("id").alias("__src"))
        return e.join(ids, e.src == F.col("__src")).drop("__src")

    def in_e(self, edge_label: str) -> DataFrame:
        """``inE``: edge rows arriving at the current elements."""
        e = self._g.edges.where(F.col("label") == edge_label)
        ids = self.df.select(F.col("id").alias("__dst"))
        return e.join(ids, e.dst == F.col("__dst")).drop("__dst")

    def repeat_out(
        self, edge_label: str, max_hops: int, until=None, emit_all: bool = True
    ) -> "Traversal":
        """Bounded transitive expansion — ``repeat(out(lbl)).until(pred)``
        (``Steps.scala`` repeat/until semantics): nodes satisfying ``until``
        (a Column predicate over node rows) stop expanding; without
        ``until`` this is plain bounded expansion. ``emit_all=True`` returns
        every visited node (the reference's ``emit`` flavor); False returns
        only the stops (until-satisfying nodes, plus the final frontier if
        the bound hit first). Iterative frontier join with dedup,
        driver-controlled, one isEmpty action per hop (SURVEY.md §2.C)."""
        seen = self.df.select("id")
        stops = None
        frontier = self
        if until is not None:
            stopped = frontier.df.where(until).select("id")
            stops = stopped
            frontier = Traversal(self._g, frontier.df.where(~until))
        for _ in range(max_hops):
            nxt = frontier.out(edge_label)
            new = nxt.df.select("id").dropDuplicates(["id"]).join(seen, "id", "left_anti")
            if new.isEmpty():
                break
            seen = seen.unionByName(new).localCheckpoint(eager=True)
            new_nodes = self._g.nodes.join(new, "id", "left_semi")
            if until is not None:
                stops = stops.unionByName(new_nodes.where(until).select("id"))
                new_nodes = new_nodes.where(~until)
            frontier = Traversal(self._g, new_nodes)
        if emit_all or until is None:
            keep = seen
        else:
            keep = stops.unionByName(frontier.df.select("id")).dropDuplicates(["id"])
        return Traversal(self._g, self._g.nodes.join(keep, "id", "left_semi"))

    # -- branching (NodeSteps.scala:28-33 choose / coalesce) -------------------

    def coalesce_steps(self, *branches) -> "Traversal":
        """Per-element first-non-empty branch (``coalesce`` semantics): each
        source element runs branch 1; elements that produced nothing run
        branch 2; and so on. Branches are Traversal → Traversal callables.
        Implemented with provenance roots + anti-joins — fully lazy, no
        driver iteration over elements."""
        remaining = Traversal(self._g, self.df.withColumn("__root", F.col("id")))
        outs: list[DataFrame] = []
        for branch in branches:
            res = branch(remaining)
            if "__root" not in res.df.columns:
                raise ValueError(
                    "coalesce branch must preserve provenance (use hop/filter steps)"
                )
            outs.append(res.df)
            matched = res.df.select(F.col("__root").alias("id")).distinct()
            remaining = Traversal(
                self._g, remaining.df.join(matched, "id", "left_anti")
            )
        unioned = outs[0]
        for o in outs[1:]:
            unioned = unioned.unionByName(o)
        return Traversal(self._g, unioned.drop("__root"))

    def choose(self, cond, on_true, on_false) -> "Traversal":
        """``choose`` (if/else branching): elements satisfying ``cond`` (a
        Column over node rows) flow through ``on_true``, the rest through
        ``on_false``; results union (NodeSteps.scala:28-33)."""
        t = on_true(Traversal(self._g, self.df.where(cond)))
        f = on_false(Traversal(self._g, self.df.where(~cond)))
        return t.union(f)

    # -- dominance / CFG steps (CfgNodeMethods.scala:26-82,
    #    generalizations/CfgNode.scala:36-46) --------------------------------

    def as_root(self) -> "Traversal":
        """Install provenance: subsequent hops carry ``__root`` (the element
        that started the walk), so closure steps can return PAIRS — the
        reference's path-tracking for ``dominates``-style expansions."""
        return Traversal(self._g, self.df.withColumn("__root", F.col("id")))

    def _rel_hop(self, rel_name: str, forward: bool) -> "Traversal":
        """One hop through a named auxiliary relation table (src, dst) —
        same join shape as :meth:`_hop` but over a committed relation
        (IDOM / IPDOM / CDG) instead of labeled graph edges."""
        rel = self._g.relation(rel_name)
        from_col, to_col = ("src", "dst") if forward else ("dst", "src")
        keep = ["__root"] if "__root" in self.df.columns else []
        ids = self.df.select(F.col("id").alias("__from"), *keep)
        hop = rel.join(ids, rel[from_col] == F.col("__from")).select(
            F.col(to_col).alias("__id"), *keep
        )
        return Traversal(
            self._g,
            self._g.nodes.join(hop, self._g.nodes.id == F.col("__id")).drop("__id"),
        )

    def _rel_closure(
        self, rel_name: str, forward: bool, max_hops: int = 64
    ) -> "Traversal":
        """Transitive closure over a named relation — the ``dominates`` /
        ``dominatedBy`` recursive walk (CfgNodeMethods.scala:26-44 walks the
        idom chain to a fixpoint). Iterative frontier join with per-(root,
        node) dedup; driver-controlled like :meth:`repeat_out`. Dominator
        chains are trees, so iterations = tree height."""
        rel = self._g.relation(rel_name)
        from_col, to_col = ("src", "dst") if forward else ("dst", "src")
        keep = ["__root"] if "__root" in self.df.columns else []
        frontier = self.df.select(F.col("id"), *keep)
        seen = frontier
        acc: DataFrame | None = None
        for _ in range(max_hops):
            step = (
                rel.join(
                    frontier.select(F.col("id").alias("__from"), *keep),
                    rel[from_col] == F.col("__from"),
                )
                .select(F.col(to_col).alias("id"), *keep)
                .dropDuplicates(["id", *keep])
            )
            new = step.join(seen, ["id", *keep], "left_anti").localCheckpoint(
                eager=True
            )
            if new.isEmpty():
                break
            acc = new if acc is None else acc.unionByName(new)
            seen = seen.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        if acc is None:
            empty = self.df.limit(0)
            return Traversal(self._g, empty)
        out = self._g.nodes.join(
            acc.withColumnRenamed("id", "__id"), self._g.nodes.id == F.col("__id")
        ).drop("__id")
        return Traversal(self._g, out)

    def dominated_by(self) -> "Traversal":
        """All strict dominators of the current elements (``dominatedBy``):
        the idom chain walked to the entry."""
        return self._rel_closure("IDOM", forward=True)

    def dominates(self) -> "Traversal":
        """All elements strictly dominated by the current ones
        (``dominates``): the inverse idom-chain closure."""
        return self._rel_closure("IDOM", forward=False)

    def post_dominated_by(self) -> "Traversal":
        """Strict post-dominators (``postDominatedBy``), over IPDOM."""
        return self._rel_closure("IPDOM", forward=True)

    def post_dominates(self) -> "Traversal":
        """Elements strictly post-dominated by these (``postDominates``)."""
        return self._rel_closure("IPDOM", forward=False)

    def controls(self) -> "Traversal":
        """CDG successors (``controls``): elements whose execution the
        current ones decide (CdgPass output, one hop)."""
        return self._rel_hop("CDG", forward=True)

    def controlled_by(self) -> "Traversal":
        """CDG predecessors (``controlledBy``)."""
        return self._rel_hop("CDG", forward=False)

    def cfg_next(self) -> "Traversal":
        """One step along the CFG (``cfgNext``) — NEXT-edge hop."""
        return self.out(S.NEXT)

    def cfg_prev(self) -> "Traversal":
        """One step back along the CFG (``cfgPrev``)."""
        return self.in_(S.NEXT)

    # -- call-graph sugar (callIn / calledMethod analog) -----------------------

    def callee(self) -> "Traversal":
        """TOOLCALL elements → the ENTITY each resolves to (CALL edge),
        the reference's ``call.calledMethod``."""
        return self.out(S.CALL)

    def caller(self) -> "Traversal":
        """ENTITY elements → the TOOLCALL sites invoking them
        (``method.callIn``)."""
        return self.in_(S.CALL)

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
        if "__path" in self.df.columns:
            # deterministic witness: keep the lexicographically smallest
            # path per element (dropDuplicates keeps an arbitrary row, which
            # would make the surviving witness partitioning-dependent)
            from pyspark.sql import Window

            w = Window.partitionBy("id").orderBy("__path")
            df = (
                self.df.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") == 1)
                .drop("__rk")
            )
            return Traversal(self._g, df)
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

    # -- aggregation / ordering sugar ------------------------------------------

    def group_count(self, *cols: str) -> DataFrame:
        """``groupCount`` analog: rows per key (defaults to label)."""
        keys = list(cols) or ["label"]
        return self.df.groupBy(*keys).agg(F.count("*").alias("n")).orderBy(*keys)

    def sort(self, *cols, ascending: bool = True) -> "Traversal":
        """``sortBy`` analog — total order materialized lazily; at scale
        prefer ``top_k`` (partial top-N per partition, no full sort)."""
        exprs = [F.col(c) if isinstance(c, str) else c for c in (cols or ["id"])]
        if not ascending:
            exprs = [e.desc() for e in exprs]
        return Traversal(self._g, self.df.orderBy(*exprs))

    def limit_(self, n: int) -> "Traversal":
        return Traversal(self._g, self.df.limit(n))

    def top_k(self, k: int, by: str = "id", ascending: bool = False) -> "Traversal":
        """Top-k by a column: orderBy+limit — Spark plans this as
        TakeOrderedAndProject (per-partition partial top-k, then a single
        merge), NOT a global sort."""
        col = F.col(by).asc() if ascending else F.col(by).desc()
        return Traversal(self._g, self.df.orderBy(col, F.col("id").asc()).limit(k))

    # -- help / reflection (the reference's .help step, Doc/TraversalHelp) -----

    @classmethod
    def help(cls) -> list[tuple[str, str]]:
        """Reflection over the available steps — (name, first doc line) per
        public method, the ``cpg.help`` / ``TraversalHelp`` analog (the
        reference generates this table from @Doc annotations; here the
        docstrings ARE the annotations)."""
        out = []
        for name in sorted(dir(cls)):
            if name.startswith("_"):
                continue
            fn = getattr(cls, name)
            if callable(fn) and fn.__doc__:
                out.append((name, fn.__doc__.strip().splitlines()[0]))
            elif callable(fn):
                out.append((name, ""))
        return out

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

    def __init__(
        self,
        nodes: DataFrame,
        edges: DataFrame,
        relations: dict[str, DataFrame] | None = None,
    ):
        self.nodes = nodes
        self.edges = edges
        # auxiliary binary relations as (src, dst) node-id pairs — the
        # committed pass outputs the dominance/CDG steps walk (IDOM, IPDOM,
        # CDG); kept separate from labeled edges because they are DERIVED
        # overlays, not base-graph structure (CfgDominatorPass/CdgPass write
        # separate edge kinds in the reference too).
        self.relations = relations or {}

    def relation(self, name: str) -> DataFrame:
        if name not in self.relations:
            raise KeyError(
                f"GraphView has no '{name}' relation — pass relations="
                f"{{'{name}': <(src, dst) id pairs>}} (e.g. from "
                "dataflow.dominators_grouped / control_dependence_grouped)"
            )
        return self.relations[name]

    def all(self) -> Traversal:
        return Traversal(self, self.nodes)

    @staticmethod
    def help() -> list[tuple[str, str]]:
        """Starter + step reflection (``cpg.help`` analog)."""
        starters = [
            (n, (getattr(GraphView, n).__doc__ or "").strip().splitlines()[0]
             if (getattr(GraphView, n).__doc__ or "").strip() else "")
            for n in sorted(dir(GraphView))
            if not n.startswith("_") and callable(getattr(GraphView, n))
        ]
        return starters + Traversal.help()

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

    # derived-analytics macro-steps over the REL entity graph (console
    # sugar over operators/centrality.py; see that module for the exact
    # integer recurrences and scale notes)
    def _rel_pairs(self) -> DataFrame:
        return (
            self.edges.where(F.col("label") == S.REL)
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .dropDuplicates(["src", "dst"])
        )

    def entity_pagerank(self, iters: int = 5) -> DataFrame:
        """Integer PageRank over REL edges → (node, score_micro)."""
        from codepropertygraph_spark.operators import centrality

        return centrality.pagerank_int(self._rel_pairs(), iters=iters)

    def entity_communities(self, iters: int = 3) -> DataFrame:
        """Deterministic label-propagation communities over REL edges →
        (node, community)."""
        from codepropertygraph_spark.operators import centrality

        return centrality.lpa_communities(self._rel_pairs(), iters=iters)

    def entity_kcore(self, k: int = 2, iters: int = 8) -> DataFrame:
        """k-core of the REL entity graph → (node, core_deg)."""
        from codepropertygraph_spark.operators import centrality

        return centrality.kcore(self._rel_pairs(), k=k, iters=iters)

    def entity_triangles(self) -> DataFrame:
        """Per-entity triangle counts over REL edges → (node, n_triangles)."""
        from codepropertygraph_spark.operators import centrality

        return centrality.triangle_counts(self._rel_pairs())

    def entity_linkpred(self, min_cn: int = 2) -> DataFrame:
        """Missing-edge candidates over REL edges → (a, b, cn, jaccard,
        ra_micro) — see centrality.link_prediction."""
        from codepropertygraph_spark.operators import centrality

        return centrality.link_prediction(self._rel_pairs(), min_cn=min_cn)

    def _rel_triples(self) -> DataFrame:
        """Name-level (subj, pred, obj) view of the REL edges — entity ids
        resolved back to canonical full_name via the ENTITY nodes (a
        broadcast-sized dimension at any scale where the console runs)."""
        ents = self.nodes.where(F.col("label") == S.ENTITY).select(
            "id", "full_name"
        )
        rel = self.edges.where(F.col("label") == S.REL).select(
            "src", "dst", F.element_at("props", F.lit("pred")).alias("pred")
        )
        return (
            rel.join(
                ents.select(
                    F.col("id").alias("src"), F.col("full_name").alias("subj")
                ),
                "src",
            )
            .join(
                ents.select(
                    F.col("id").alias("dst"), F.col("full_name").alias("obj")
                ),
                "dst",
            )
            .select("subj", "pred", "obj")
        )

    def match(
        self,
        patterns: list[tuple[str, str, str]],
        optional: list[tuple[str, str, str]] | None = None,
        not_exists: list[tuple[str, str, str]] | None = None,
    ) -> DataFrame:
        """Conjunctive basic-graph-pattern match over the name-level REL
        triples (kg.bgp_match): ``g.match([('?a', 'uses_tool', '?t'),
        ('?a', 'asks_about', '?b'), ('?b', 'refers_to', '?t')])`` — the
        console's MATCH clause; one column per ?variable. ``optional`` /
        ``not_exists`` are the SPARQL OPTIONAL and FILTER NOT EXISTS
        clauses (Cypher OPTIONAL MATCH / WHERE NOT exists)."""
        from codepropertygraph_spark.operators import kg

        return kg.bgp_match(
            self._rel_triples(),
            patterns,
            optional=optional,
            not_exists=not_exists,
        )

    def entity_walks(
        self, walks_per_node: int = 2, length: int = 4
    ) -> DataFrame:
        """Deterministic DeepWalk trajectories over REL edges →
        (walk_id, step, node) — see centrality.random_walks."""
        from codepropertygraph_spark.operators import centrality

        return centrality.random_walks(
            self._rel_pairs(), walks_per_node=walks_per_node, length=length
        )

    def entity_closeness(
        self, n_seeds: int = 8, max_dist: int = 4
    ) -> DataFrame:
        """Sampled harmonic closeness over REL edges → (node, harm_micro,
        n_reached) — see centrality.harmonic_closeness."""
        from codepropertygraph_spark.operators import centrality

        return centrality.harmonic_closeness(
            self._rel_pairs(), n_seeds=n_seeds, max_dist=max_dist
        )

    def entity_scc(self, max_hops: int = 4) -> DataFrame:
        """Bounded-diameter strongly connected components over the
        directed REL edges → (node, scc) — see centrality.scc_bounded."""
        from codepropertygraph_spark.operators import centrality

        return centrality.scc_bounded(self._rel_pairs(), max_hops=max_hops)

    def summary_graph(self, iters: int = 2) -> DataFrame:
        """Community quotient graph over REL edges → (c_src, c_dst,
        n_edges): LPA communities as super-nodes — the schema-level map
        of the committed graph (centrality.community_graph)."""
        from codepropertygraph_spark.operators import centrality

        pairs = self._rel_pairs().localCheckpoint(eager=True)
        return centrality.community_graph(
            pairs, centrality.lpa_communities(pairs, iters=iters)
        )
