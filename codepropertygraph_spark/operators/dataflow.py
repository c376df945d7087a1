"""Bounded graph reachability — the ``reachableBy`` query-engine analog.

The reference's dataflow query engine explores the DDG backwards from sinks
with a work-stealing task pool, per-task memoization, global dedup and a
bounded call depth (default 4) (``dataflowengineoss/.../queryengine/
Engine.scala:42-127`` scheduler, ``:255-331`` recursive expansion,
``:217-239`` dedup, ``EngineConfig.maxCallDepth:243-244``).

Spark translation (SURVEY.md §2.D): a bounded iterative **frontier join**
over the edge table — k hops = k broadcast-or-shuffle joins, dedup =
``dropDuplicates``, memoization = reusing the accumulated result as the
next frontier's filter. The loop is driver-controlled but each step is a
declarative join Catalyst optimizes; AQE rebalances skewed frontiers (hub
entities fan out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable_within(
    edges: DataFrame, max_hops: int = 4, keyed_by: str = "conv_id"
) -> DataFrame:
    """Transitive closure bounded at ``max_hops`` over a directed edge set
    ``(keyed_by, s, o)``. Returns DISTINCT (keyed_by, src, dst) pairs with a
    path of length 1..max_hops. Each iteration extends the frontier one hop
    and drops already-reached pairs (the ResultTable dedup analog)."""
    e = edges.select(keyed_by, "s", "o").dropDuplicates([keyed_by, "s", "o"])
    e = e.persist()
    e.count()  # materialize once; reused every hop
    reached = e
    frontier = e
    for _ in range(max_hops - 1):
        step = (
            frontier.alias("f")
            .join(
                e.alias("e"),
                (F.col(f"f.{keyed_by}") == F.col(f"e.{keyed_by}"))
                & (F.col("f.o") == F.col("e.s")),
            )
            .select(F.col(f"f.{keyed_by}").alias(keyed_by), F.col("f.s").alias("s"), F.col("e.o").alias("o"))
            .dropDuplicates([keyed_by, "s", "o"])
        )
        # drop already-reached pairs (ResultTable dedup): anti-join beats
        # exceptAll — no full-row sort, streams through one shuffle.
        new = step.join(reached, [keyed_by, "s", "o"], "left_anti").persist()
        if new.count() == 0:
            new.unpersist()
            break
        reached = reached.unionByName(new).persist()
        reached.count()
        frontier = new
    return reached.select(
        F.col(keyed_by), F.col("s").alias("src"), F.col("o").alias("dst")
    ).dropDuplicates([keyed_by, "src", "dst"])


def reaching_def_edges(
    transcripts: DataFrame, alias_dict: DataFrame, merge: DataFrame
) -> DataFrame:
    """REACHING_DEF analog (A19, ``dataflowengineoss/.../reachingdef/
    ReachingDefPass.scala:11-113``): a turn that mentions entity E *defines*
    E; the definition reaches forward until the next turn that redefines E
    (gen/kill on the linear per-conversation CFG). On a linear CFG the
    worklist fixpoint collapses exactly to a per-(conversation, entity) lag:
    consecutive E-mentioning turns yield ``src --REACHING_DEF(VARIABLE=E)-->
    dst`` edges. Output: (conv_id, variable, src_order, dst_order).

    Fully vectorized — two windows, no Python — because the CFG is a chain;
    the general DAG case runs the worklist solver inside ``applyInPandas``
    (see :func:`dominators_grouped` for that pattern).
    """
    from pyspark.sql import Window

    from . import extraction, linking

    flagged = extraction.flagged_tokens(transcripts)
    m = extraction.mention_candidates_from(flagged, alias_dict)
    m = m.where(F.col("is_mention"))
    m = linking.apply_merge(m, merge, "canonical")
    per_turn = m.select("conv_id", "turn_idx", "ts", "canonical").dropDuplicates()
    # stable turn rank without joining transcripts: rank the distinct turn
    # keys seen in mentions... rank must match the global turn_order, so
    # rank over ALL turns (mention-less turns shift the order) — derive from
    # the transcript turn frame, broadcast-free single window.
    turns = transcripts.select("conv_id", "turn_idx", "ts").withColumn(
        "turn_order",
        F.row_number().over(Window.partitionBy("conv_id").orderBy("turn_idx", "ts")),
    )
    per_turn = per_turn.join(turns, ["conv_id", "turn_idx", "ts"])
    w = Window.partitionBy("conv_id", "canonical").orderBy("turn_order")
    return (
        per_turn.withColumn("src_order", F.lag("turn_order").over(w))
        .where(F.col("src_order").isNotNull())
        .select(
            "conv_id",
            F.col("canonical").alias("variable"),
            F.col("src_order").cast("long").alias("src_order"),
            F.col("turn_order").cast("long").alias("dst_order"),
        )
    )


def dominators_grouped(edges: DataFrame, entries: DataFrame) -> DataFrame:
    """Per-group immediate dominators — the CfgDominatorPass analog (A17,
    ``semanticcpg/.../cfgdominator/CfgDominator.scala:15-116``, Cooper-
    Harvey-Kennedy iterative dataflow). The graph is conversation-local, so
    the whole fixpoint runs inside one ``applyInPandas`` group (zero
    iterative shuffles — SURVEY.md §4.2 item 3).

    edges: (conv_id, s, o) directed; entries: (conv_id, entry).
    Returns (conv_id, node, idom); the entry has idom = itself. Nodes not
    reachable from the entry are omitted (matching the reference, which
    walks from the entry).
    """
    import pandas as pd

    e = edges.select("conv_id", "s", "o").dropDuplicates()
    joined = e.join(F.broadcast(entries), "conv_id")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        entry = pdf["entry"].iloc[0]
        succ: dict[str, list[str]] = {}
        pred: dict[str, list[str]] = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            succ.setdefault(s, []).append(o)
            pred.setdefault(o, []).append(s)
        # reverse post-order from entry
        order: list[str] = []
        seen: set[str] = set()
        stack: list[tuple[str, int]] = [(entry, 0)]
        while stack:
            n, i = stack.pop()
            if i == 0:
                if n in seen:
                    continue
                seen.add(n)
            kids = succ.get(n, [])
            if i < len(kids):
                stack.append((n, i + 1))
                if kids[i] not in seen:
                    stack.append((kids[i], 0))
            else:
                order.append(n)
        rpo = list(reversed(order))
        idx = {n: i for i, n in enumerate(rpo)}
        idom: dict[str, str] = {entry: entry}

        def intersect(a: str, b: str) -> str:
            while a != b:
                while idx[a] > idx[b]:
                    a = idom[a]
                while idx[b] > idx[a]:
                    b = idom[b]
            return a

        changed = True
        while changed:
            changed = False
            for n in rpo:
                if n == entry:
                    continue
                ps = [p for p in pred.get(n, []) if p in idom]
                if not ps:
                    continue
                new = ps[0]
                for p in ps[1:]:
                    new = intersect(new, p)
                if idom.get(n) != new:
                    idom[n] = new
                    changed = True
        return pd.DataFrame(
            {"conv_id": conv, "node": list(idom), "idom": [idom[n] for n in idom]}
        )

    return joined.groupBy("conv_id").applyInPandas(
        per_group, schema="conv_id string, node string, idom string"
    )


def control_dependence_grouped(edges: DataFrame, exits: DataFrame) -> DataFrame:
    """CDG edges from the post-dominance frontier — the CdgPass analog (A18,
    ``semanticcpg/.../codepencegraph/CdgPass.scala:22-49``, frontier
    ``CfgDominatorFrontier.scala:1-40``): post-dominators = dominators of
    the reversed graph from the exit; node n is control-dependent on m when
    m ∈ PDF(n). Same per-group UDF pattern as :func:`dominators_grouped`.

    edges: (conv_id, s, o); exits: (conv_id, exit). Returns
    (conv_id, controller, dependent).
    """
    rev = edges.select(
        "conv_id", F.col("o").alias("s"), F.col("s").alias("o")
    )
    pdom = dominators_grouped(
        rev, exits.select("conv_id", F.col("exit").alias("entry"))
    ).select("conv_id", "node", F.col("idom").alias("ipdom"))

    import pandas as pd

    e = edges.select("conv_id", "s", "o").dropDuplicates()
    joined = e.join(pdom, "conv_id").withColumnRenamed("node", "pd_node")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        ipdom = dict(
            pdf[["pd_node", "ipdom"]].drop_duplicates().itertuples(index=False)
        )
        pairs = set()
        edge_set = set(
            pdf[["s", "o"]].drop_duplicates().itertuples(index=False, name=None)
        )
        # PDF via the standard two-pointer walk: for edge (a, b), runner = a
        # while runner != ipdom(b): b is control-dependent on runner
        for a, b in edge_set:
            if a not in ipdom or b not in ipdom:
                continue
            runner = a
            stop = ipdom[b]
            guard = 0
            while runner != stop and guard < 10000:
                pairs.add((runner, b))
                if runner == ipdom.get(runner):
                    break
                runner = ipdom.get(runner)
                if runner is None:
                    break
                guard += 1
        pairs = sorted(pairs)
        return pd.DataFrame(
            {
                "conv_id": conv,
                "controller": [p[0] for p in pairs],
                "dependent": [p[1] for p in pairs],
            }
        )

    return joined.groupBy("conv_id").applyInPandas(
        per_group, schema="conv_id string, controller string, dependent string"
    )


def flow_witness_grouped(
    edges: DataFrame, max_hops: int = 4, keyed_by: str = "conv_id"
) -> DataFrame:
    """The SCALE path for path-returning flows: ONE deterministic witness
    path per reachable (src, dst) pair — the shortest, tie-broken by the
    lexicographically smallest path at each BFS level — instead of
    enumerating every simple path (:func:`flow_paths_grouped`), which is
    output-exponential on hub-dense graphs. The reference's engine has the
    same discipline: its ResultTable dedups flows per (head, last) rather
    than returning every expansion (``Engine.scala:217-239``).

    The witness is defined by a level-synchronized recurrence (so the DuckDB
    oracle can mirror it with one unrolled CTE per level):
      W1(v)   = min over edges (start, v) of 'start->v'
      WL(v)   = min over edges (u, v), u reached at level L-1, v unreached
                at any level < L and v != start, of WL-1(u) || '->v'
    Appending a child preserves string order because the separator '-'
    sorts below every character used in canonical names, so per-level min
    composition is well-defined. Output bounded by the reachable pair count;
    per-group work is O(starts · E · max_hops)."""
    import pandas as pd

    def witness(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[keyed_by].iloc[0]
        adj: dict[str, set[str]] = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            if s != o:
                adj.setdefault(s, set()).add(o)
        out_src, out_dst, out_hops, out_path = [], [], [], []
        for start in adj:
            best: dict[str, str] = {start: start}
            frontier = [start]
            for hop in range(1, max_hops + 1):
                cand: dict[str, str] = {}
                for u in frontier:
                    pu = best[u]
                    for v in adj.get(u, ()):
                        if v in best:
                            continue
                        s = pu + "->" + v
                        if v not in cand or s < cand[v]:
                            cand[v] = s
                if not cand:
                    break
                for v, s in cand.items():
                    best[v] = s
                    out_src.append(start)
                    out_dst.append(v)
                    out_hops.append(hop)
                    out_path.append(s)
                frontier = sorted(cand)
        return pd.DataFrame(
            {
                keyed_by: key,
                "src": out_src,
                "dst": out_dst,
                "hops": out_hops,
                "path": out_path,
            }
        )

    e = edges.select(keyed_by, "s", "o").dropDuplicates([keyed_by, "s", "o"])
    return e.groupBy(keyed_by).applyInPandas(
        witness,
        schema=f"{keyed_by} string, src string, dst string, hops long, path string",
    )


def reachable_cross_conversation(
    edges: DataFrame,
    max_hops: int = 4,
    max_crossings: int = 1,
    keyed_by: str = "conv_id",
) -> DataFrame:
    """Cross-procedure propagation with a call-depth bound — the engine's
    continuation tasks at call sites (``Engine.scala:70-127`` params/returns,
    ``EngineConfig.maxCallDepth`` ``Engine.scala:243-244``): a canonical
    entity appearing in two conversations is the same global node, so flow
    leaving conversation A through entity x may continue in conversation B —
    one "crossing" is one call-depth unit.

    Returns DISTINCT global (src, dst, crossings) pairs where dst is
    reachable from src with ≤ max_hops hops inside each conversation and at
    most ``max_crossings`` conversation crossings; ``crossings`` is the
    MINIMUM number needed. Shape: the within-conversation closure runs once
    (grouped BFS, one shuffle), then each crossing level is one equi-join on
    the bridging entity + a min-aggregate — no per-level BFS re-run.
    """
    within = reachable_within_grouped(edges, max_hops=max_hops, keyed_by=keyed_by)
    within = within.persist()
    # depth 0: pairs reachable inside a single conversation
    levels = within.select("src", "dst").dropDuplicates().withColumn(
        "crossings", F.lit(0)
    )
    if max_crossings >= 1:
        # Skew-safe single crossing: carrying conv_id into the bridge join
        # makes the hub entity quadratic in its conversation count (org_1 in
        # 2/3 of conversations → ~(0.66·n_conv)² rows through one key). The
        # conv_id only matters through the constraint conv_a != conv_b, so
        # pre-aggregate each side to (entity pair, distinct-conv count, the
        # single conv when count == 1): a crossing is valid unless BOTH sides
        # have exactly one witness conversation and it is the same one. The
        # bridge join is then bounded by entity-pair counts, independent of
        # how many conversations the hub appears in.
        arrive = within.groupBy("src", F.col("dst").alias("bridge")).agg(
            F.countDistinct(keyed_by).alias("n_a"),
            F.min(keyed_by).alias("c_a"),
        )
        depart = within.groupBy(
            F.col("src").alias("bridge"), F.col("dst").alias("dst2")
        ).agg(
            F.countDistinct(keyed_by).alias("n_d"),
            F.min(keyed_by).alias("c_d"),
        )
        step1 = (
            arrive.join(depart, "bridge")
            .where(
                ~(
                    (F.col("n_a") == 1)
                    & (F.col("n_d") == 1)
                    & (F.col("c_a") == F.col("c_d"))
                )
            )
            .select("src", F.col("dst2").alias("dst"))
            .dropDuplicates()
            .withColumn("crossings", F.lit(1))
        )
        levels = levels.unionByName(step1)
    if max_crossings >= 2:
        # deeper call depths keep the exact conv-carrying frontier loop —
        # correct but hub-quadratic; salt the bridge key before using this
        # at scale (documented, not the shipped configuration).
        frontier = within.select("src", F.col("dst").alias("bridge"), keyed_by)
        for depth in range(1, max_crossings + 1):
            step = (
                frontier.alias("f")
                .join(
                    within.alias("w"),
                    (F.col("f.bridge") == F.col("w.src"))
                    & (F.col(f"f.{keyed_by}") != F.col(f"w.{keyed_by}")),
                )
                .select(
                    F.col("f.src").alias("src"),
                    F.col("w.dst").alias("dst"),
                    F.col(f"w.{keyed_by}").alias(keyed_by),
                )
                .dropDuplicates(["src", "dst", keyed_by])
            )
            if depth >= 2:
                levels = levels.unionByName(
                    step.select("src", "dst").dropDuplicates().withColumn(
                        "crossings", F.lit(depth)
                    )
                )
            frontier = step.select("src", F.col("dst").alias("bridge"), keyed_by)
    return levels.groupBy("src", "dst").agg(
        F.min("crossings").cast("long").alias("crossings")
    )


def flow_paths_grouped(
    edges: DataFrame,
    max_hops: int = 4,
    keyed_by: str = "conv_id",
    sources: DataFrame | None = None,
) -> DataFrame:
    """Path-returning reachability — the ``reachableByFlows`` analog: where
    :func:`reachable_within_grouped` returns (src, dst) *pairs*, this returns
    the EVIDENCE — every simple path (no repeated node, so no cycles and no
    self-loops) of length 1..max_hops, as the reference's flow results carry
    the full element path per flow (``dataflowengineoss/.../language/
    TrackingPoint.scala:48-66`` → ``queryengine/Engine.scala:255-331``; path
    dedup discipline ``Engine.scala:217-239``).

    Output: (keyed_by, src, dst, hops, path) with ``path`` the '->'-joined
    node sequence — a deterministic set, so it hash-checks against a DuckDB
    recursive-CTE oracle enumerating the same simple paths.

    Scale shape: one shuffle groups each conversation's edges; enumeration is
    conversation-local (graphs are small by construction — same skew argument
    as reachable_within_grouped). Path count is bounded by V·b^max_hops per
    group; max_hops=4 keeps the reference's default call-depth bound.

    ``sources`` (optional single-column 'src' DataFrame) restricts the
    enumeration to the given start nodes — the shape the reference actually
    runs (flows are always asked FROM a query-selected sink/source set,
    never all-pairs: ``MallocMemcpyTests.scala:30-43`` starts from
    ``cpg.call("malloc")``). On hub-dense graphs use this or
    :func:`flow_witness_grouped`; unrestricted enumeration is
    output-exponential by nature.
    """
    import pandas as pd

    src_set: set[str] | None = None
    if sources is not None:
        src_set = {r.src for r in sources.select("src").distinct().collect()}

    def paths(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[keyed_by].iloc[0]
        adj: dict[str, set[str]] = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            if s != o:
                adj.setdefault(s, set()).add(o)
        starts = adj if src_set is None else [s for s in adj if s in src_set]
        out_src, out_dst, out_hops, out_path = [], [], [], []
        for start in starts:
            # iterative DFS carrying the path; a node may appear on many
            # paths but never twice on one (simple-path discipline)
            stack: list[tuple[str, ...]] = [(start,)]
            while stack:
                path = stack.pop()
                node = path[-1]
                for nb in adj.get(node, ()):
                    if nb in path:
                        continue
                    new = path + (nb,)
                    out_src.append(start)
                    out_dst.append(nb)
                    out_hops.append(len(new) - 1)
                    out_path.append("->".join(new))
                    if len(new) <= max_hops:
                        stack.append(new)
        return pd.DataFrame(
            {
                keyed_by: key,
                "src": out_src,
                "dst": out_dst,
                "hops": out_hops,
                "path": out_path,
            }
        )

    e = edges.select(keyed_by, "s", "o").dropDuplicates([keyed_by, "s", "o"])
    return e.groupBy(keyed_by).applyInPandas(
        paths, schema=f"{keyed_by} string, src string, dst string, hops long, path string"
    )


def reachable_within_grouped(
    edges: DataFrame, max_hops: int = 4, keyed_by: str = "conv_id"
) -> DataFrame:
    """Same contract as :func:`reachable_within`, exploiting that the edge
    set is partitioned by ``keyed_by`` (conversation-local graphs): one
    shuffle groups each conversation's edges, then a vectorized pandas BFS
    computes the bounded closure group-locally — zero iterative shuffles.

    This is the reference's per-task recursive expansion with memoization
    (``Engine.scala:255-331``) run inside ``applyInPandas``; the global
    join-loop variant above remains the fallback for graphs that do NOT
    partition by a key. Mega-conversation skew: one group = one task, AQE
    cannot split it — acceptable because BFS is O(V·E_local) and even the
    20× mega conversation is small; beyond that, salt + two-level closure.
    """
    import pandas as pd

    def closure(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[keyed_by].iloc[0]
        adj: dict[str, set[str]] = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            adj.setdefault(s, set()).add(o)
        out_src, out_dst = [], []
        for start in adj:
            reached: set[str] = set()
            frontier = {start}
            for _ in range(max_hops):
                nxt = set()
                for n in frontier:
                    for m in adj.get(n, ()):
                        if m not in reached:
                            nxt.add(m)
                reached |= nxt
                frontier = nxt
                if not frontier:
                    break
            out_src += [start] * len(reached)
            out_dst += list(reached)
        return pd.DataFrame({keyed_by: key, "src": out_src, "dst": out_dst})

    e = edges.select(keyed_by, "s", "o").dropDuplicates([keyed_by, "s", "o"])
    return e.groupBy(keyed_by).applyInPandas(
        closure, schema=f"{keyed_by} string, src string, dst string"
    )
