"""Graph centrality over the canonical entity graph: PageRank salience and
label-propagation communities.

Training-data pipelines rank entities by structural importance (hub
entities get special skew handling, salience feeds curriculum/filter
decisions) and group them into communities for stratified sampling. The
reference's property graph stops at connected components
(``NamespaceCreator.scala:20-33`` canonicalization; our
``canonicalize.merge_map``); these operators extend the same entity graph
with the two standard iterative algorithms, kept Spark-first:

- Each iteration is ONE equi-join (edge src → score/label) plus ONE
  aggregation — the GraphFrames/Pregel shape expressed directly in the
  DataFrame API, so Catalyst plans partial (map-side) aggregation and AQE
  splits skewed hub keys. No per-row Python anywhere.
- The iteration count is a fixed small constant (synchronous updates), so
  the whole computation is a static plan chain; intermediate frames are
  localCheckpoint()ed every few rounds to cut lineage at scale.

**Integer arithmetic, deliberately.** Scores are micro-units (BIGINT) and
every divide is floor division, so results are bit-identical across
engines, run order, and partitioning — the same determinism discipline as
the repo's centi-unit sketches. Floating-point PageRank sums differ in the
last ulp under shuffle reordering, which would make the value-hash gate
flaky; integer PageRank trades ≤1 micro-unit of per-edge mass (dropped by
flooring, plus dangling-node mass, both documented) for exact
reproducibility. Recurrence (damping 0.85):

    score_0(u)   = 1_000_000
    contrib_t(u) = score_t(u) div out_deg(u)
    score_{t+1}(v) = 150_000 + (850 * sum_{u->v} contrib_t(u)) div 1000

Label propagation (synchronous, deterministic): every node starts as its
own label; each round it adopts the most frequent label among its
undirected neighbors, ties broken by the lexicographically smallest label,
isolated nodes keep their label. Fixed rounds, no convergence test — the
output is a reproducible function of (graph, iters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PAGERANK_INIT_MICRO = 1_000_000
PAGERANK_BASE_MICRO = 150_000  # (1 - d) * 1e6 with d = 0.85
PAGERANK_DAMP_MILLI = 850

#: walker-frame rows (|V| x walks_per_node) under which random_walks may
#: broadcast-hint its per-step joins; ~40 bytes/row keeps 10M rows well
#: inside executor broadcast headroom. Past the gate the joins stay the
#: unhinted shuffle shape.
WALK_BROADCAST_MAX_ROWS = 10_000_000


def entity_edges(triples: DataFrame) -> DataFrame:
    """Distinct directed (src, dst) entity pairs from the triple set,
    self-loops dropped (a self-edge changes no ranking and no community)."""
    return (
        triples.where(F.col("subj") != F.col("obj"))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 5,
    checkpoint_every: int = 4,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Integer-arithmetic PageRank → (node, score_micro BIGINT).

    With ``seeds`` (a one-column ``node`` frame) this is personalized
    PageRank: the restart mass (initial score and the per-iteration base
    term) goes only to seed nodes, so scores measure salience RELATIVE to
    the seed set (random walk with restart). Seeds are joined once into a
    0/1 indicator column on the node frame — the per-iteration plan is
    unchanged.

    Scale shape: ``deg`` is edge-count-proportional but computed once;
    each iteration shuffles (src-join, dst-groupBy) with automatic partial
    aggregation on the hub side. Dangling-node mass is dropped (not
    redistributed) — documented, and identical in the SQL oracle.
    """
    # Iteration-invariant frames are EAGERLY checkpointed: a lazy
    # checkpoint leaves the full upstream lineage in every iteration's
    # analyzed plan (the triple derivation would be replanned per round —
    # observed as 24 redundant broadcast subtrees in the audit); eager
    # materialization collapses each to a LogicalRDD leaf.
    nodes = _nodes(edges)
    if seeds is not None:
        nodes = nodes.join(
            seeds.select(F.col("node"), F.lit(1).alias("is_seed")).dropDuplicates(
                ["node"]
            ),
            "node",
            "left",
        ).select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
    else:
        nodes = nodes.withColumn("is_seed", F.lit(1))
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # node frame and degree-joined edge frame are independent derivations
    # of the edge input — materialize them on overlapped driver threads
    # (guide §2.6; the edge input is the caller's checkpointed frame).
    from ..parallel import eager_checkpoints

    nodes, ed = eager_checkpoints(nodes, edges.join(deg, "src"))
    scores = nodes.select(
        "node",
        (F.col("is_seed") * PAGERANK_INIT_MICRO).cast("long").alias("score"),
    )
    for i in range(iters):
        contribs = ed.join(scores, ed.src == scores.node).select(
            F.col("dst").alias("node"),
            F.expr("score div out_deg").alias("contrib"),
        )
        incoming = contribs.groupBy("node").agg(
            F.sum("contrib").alias("in_sum")
        )
        scores = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (
                    F.col("is_seed") * PAGERANK_BASE_MICRO
                    + F.expr(
                        f"{PAGERANK_DAMP_MILLI} * coalesce(in_sum, 0L) div 1000"
                    )
                )
                .cast("long")
                .alias("score"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            scores = scores.localCheckpoint(eager=True)
    return scores.select("node", F.col("score").alias("score_micro"))


def undirected_neighbors(edges: DataFrame) -> DataFrame:
    """Distinct symmetric (node, nbr) pairs from the directed edge set."""
    return (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(
            edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
        .dropDuplicates(["node", "nbr"])
    )


def lpa_communities(
    edges: DataFrame, iters: int = 3, checkpoint_every: int = 4
) -> DataFrame:
    """Deterministic synchronous label propagation → (node, community).

    Per round: neighbor-label histogram (join + count agg) and an argmax
    window partitioned by node — each node's candidate set is bounded by
    its degree, so the window never concentrates a group larger than the
    hub fan-in AQE already splits on the count agg.
    """
    # Eager for the same reason as pagerank_int: keep the per-round plan a
    # join of two checkpoint leaves, not a replanned extraction subtree.
    # Independent derivations -> overlapped materialization (guide §2.6).
    from ..parallel import eager_checkpoints

    nodes, nb = eager_checkpoints(_nodes(edges), undirected_neighbors(edges))
    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for i in range(iters):
        counts = (
            nb.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label")
                ),
                "nbr",
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        winner = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = labels.join(winner, "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-entity triangle counts over the undirected simple entity graph
    — the local-clustering signal next to PageRank salience (high-degree,
    low-triangle entities are the classic disambiguation-error smell in a
    constructed KG).

    Hub-safe by construction: each undirected edge {a, b} is ORIENTED from
    the endpoint that is smaller in (degree, id) order to the larger, and
    every triangle is enumerated exactly once as a wedge at its
    lowest-order apex closed by an oriented edge. Join fan-out per node is
    bounded by its oriented out-degree — O(sqrt(m)) on any graph — so a
    celebrity entity with 10^6 neighbors orients its edges INWARD and
    contributes no quadratic wedge set; the residual agg skew is AQE's
    bread and butter. Plan: two joins + one explode-agg, no Python.

    Returns (node, n_triangles) for every node of the edge set, 0 for
    triangle-free nodes. Orientation only affects enumeration, never the
    result — the oracle uses an independent id-ordered formulation.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    j = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    wedges = o1.join(o2, "u").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closer = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closer, ["v1", "v2"]).select("u", "v1", "v2")
    per_node = (
        tris.select(
            F.explode(F.array("u", "v1", "v2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
        )
    )


def entity_pmi(triples: DataFrame, min_count: int = 2) -> DataFrame:
    """Pointwise mutual information between entities co-occurring in the
    same conversation — the association-strength weight for entity-graph
    edges (raw co-occurrence counts over-weight frequent entities; PMI
    normalizes by both marginals).

    Returns (a, b, c_ab, pmi_micro) for unordered pairs with ≥
    ``min_count`` co-occurring conversations; PMI in integer MICRO-NATS
    (rounded once from a fixed-order double expression over exact BIGINT
    counts, so the value is engine-reproducible):

        pmi = ln( (c_ab * n_convs) / (c_a * c_b) )

    Scale shape: the unit of work is distinct (conversation, entity) —
    one dedup shuffle — then marginals are a two-phase agg and pair
    generation is a self-equi-join on conv_id whose fan-out is bounded by
    per-conversation entity count squared (the inherent output size of
    co-occurrence; mega-conversations are exactly the AQE-skew-split case,
    and the support threshold prunes before the PMI join). n_convs is a
    1-row broadcast, never a driver-side collect.
    """
    ce = (
        triples.select(
            "conv_id", F.explode(F.array("subj", "obj")).alias("ent")
        )
        .dropDuplicates(["conv_id", "ent"])
    )
    nconv = ce.agg(F.countDistinct("conv_id").alias("n_convs"))
    cnt = ce.groupBy("ent").agg(F.count("*").cast("long").alias("c"))
    pairs = (
        ce.alias("x")
        .join(ce.alias("y"), "conv_id")
        .where(F.col("x.ent") < F.col("y.ent"))
        .groupBy(F.col("x.ent").alias("a"), F.col("y.ent").alias("b"))
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    return (
        pairs.join(
            cnt.select(F.col("ent").alias("a"), F.col("c").alias("c_a")), "a"
        )
        .join(cnt.select(F.col("ent").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(nconv))
        .select(
            "a",
            "b",
            "c_ab",
            # each factor casts to double BEFORE multiplying: the BIGINT
            # product c_ab * n_convs wraps silently past int64 at corpus
            # scale (≥ ~3e9 conversations); the double product is exact
            # wherever the long product was (both ≤ 2^53 there) and merely
            # rounds above it, where ln() absorbs the relative error.
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_convs").cast("double"))
                    / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
                )
                * 1e6
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )


def pagerank_weighted(
    wedges: DataFrame,
    iters: int = 5,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted integer-arithmetic PageRank → (node, score_micro BIGINT):
    a node's outgoing mass splits PROPORTIONALLY to positive integer edge
    weights instead of uniformly — rank salience over an
    association-weighted entity graph (e.g. ``entity_pmi`` weights, which
    damp frequent-but-uninformative co-occurrence hubs).

    Recurrence (damping 0.85, all BIGINT floor arithmetic, so the result
    is bit-identical across engines and shuffle orders — the
    ``pagerank_int`` discipline):

        contrib(u→v) = (score(u) * w(u,v)) div out_w(u)
        score'(v)    = 150_000 + (850 * Σ contrib) div 1000

    Per-edge flooring drops < 1 micro-unit (documented, identical in the
    SQL oracle). Same scale shape as ``pagerank_int``: out_w computed
    once, each iteration is one src-join + one dst-groupBy with map-side
    partial aggregation; iteration-invariant frames eagerly checkpointed.
    """
    edges = wedges.select("src", "dst", F.col("w").cast("long").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    from ..parallel import eager_checkpoints

    nodes, ed = eager_checkpoints(_nodes(edges), edges.join(outw, "src"))
    scores = nodes.select(
        "node", F.lit(PAGERANK_INIT_MICRO).cast("long").alias("score")
    )
    for i in range(iters):
        contribs = ed.join(scores, ed.src == scores.node).select(
            F.col("dst").alias("node"),
            F.expr("(score * w) div out_w").alias("contrib"),
        )
        incoming = contribs.groupBy("node").agg(F.sum("contrib").alias("in_sum"))
        scores = nodes.join(incoming, "node", "left").select(
            "node",
            (
                F.lit(PAGERANK_BASE_MICRO)
                + F.expr(
                    f"{PAGERANK_DAMP_MILLI} * coalesce(in_sum, 0L) div 1000"
                )
            )
            .cast("long")
            .alias("score"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            scores = scores.localCheckpoint(eager=True)
    return scores.select("node", F.col("score").alias("score_micro"))


def lpa_communities_weighted(
    wedges: DataFrame, iters: int = 3, checkpoint_every: int = 4
) -> DataFrame:
    """Weighted deterministic label propagation → (node, community): each
    round a node adopts the label with the largest SUM OF EDGE WEIGHTS
    among its undirected neighbors (ties by smallest label) — community
    detection over an association-weighted graph (e.g. ``entity_pmi``
    weights), where a few strong ties outvote many weak ones.

    Input (src, dst, w) with positive integer weights; parallel duplicate
    pairs collapse by weight-sum first (so the vote per neighbor pair is
    well-defined), then edges symmetrize. Same per-round shape as the
    unweighted operator: one join + one two-phase sum agg + a per-node
    argmax window bounded by degree; integer weights keep every vote
    engine-exact.
    """
    und = (
        wedges.select("src", "dst", F.col("w").cast("long").alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    nb = (
        und.select(F.col("src").alias("node"), F.col("dst").alias("nbr"), "w")
        .unionByName(
            und.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr"), "w"
            )
        )
        .groupBy("node", "nbr")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = nb.select("node").dropDuplicates(["node"]).localCheckpoint(
        eager=True
    )
    labels = nodes.withColumn("label", F.col("node"))
    win = Window.partitionBy("node").orderBy(
        F.col("wsum").desc(), F.col("label").asc()
    )
    for i in range(iters):
        votes = (
            nb.join(
                labels.select(F.col("node").alias("nbr"), F.col("label")),
                "nbr",
            )
            .groupBy("node", "label")
            .agg(F.sum("w").alias("wsum"))
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = labels.join(winner, "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def community_graph(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Quotient (summary) graph → (c_src, c_dst, n_edges): communities as
    super-nodes, distinct directed entity edges rolled up between them —
    the KG summarization deliverable (the schema-level map of a
    billion-edge graph is community-count-sized; intra-community rows
    c_src == c_dst carry the density signal, kept deliberately). Two
    dimension joins (the community labeling, entity-vocabulary-sized — a
    broadcast at console scale, a hash join at 100 TB) + ONE two-phase
    count aggregate over at most |communities|² groups.
    """
    c_src = communities.select(
        F.col("node").alias("src"), F.col("community").alias("c_src")
    )
    c_dst = communities.select(
        F.col("node").alias("dst"), F.col("community").alias("c_dst")
    )
    return (
        edges.join(c_src, "src")
        .join(c_dst, "dst")
        .groupBy("c_src", "c_dst")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )


def kcore(edges: DataFrame, k: int, iters: int = 8) -> DataFrame:
    """k-core decomposition by synchronous peeling → (node, core_deg) for
    the nodes surviving in the k-core of the undirected simple entity
    graph; ``core_deg`` is the node's degree WITHIN the core.

    The k-core (maximal subgraph where every node has ≥ k neighbors inside
    the subgraph) separates the KG's dense backbone from its sparse fringe
    — the standard coreness signal next to PageRank salience and triangle
    clustering (a high-PageRank entity OUTSIDE the 2-core is a star hub
    with no peer structure; curriculum/sampling policies treat those
    differently from backbone entities).

    Peeling recurrence (synchronous, deterministic — no peel ORDER
    dependence, unlike sequential minimum-degree peeling):

        S_0     = all nodes
        deg_i(v)= |{u ∈ S_i : {u,v} edge, u ≠ v}|   for v ∈ S_i
        S_{i+1} = {v ∈ S_i : deg_i(v) ≥ k}

    ``iters`` is fixed (the repo's LPA discipline): the result is a
    reproducible function of (graph, k, iters), unrolled identically in
    the SQL oracle; on any graph the sequence is monotone-decreasing so a
    fixpoint round is idempotent — tests assert the fixpoint is reached
    within ``iters`` on the corpus (rounds needed = longest peel cascade,
    ≤ the graph's degeneracy ordering depth, small on real KGs).

    Scale shape: each round is two hash semi-joins (survivor filter on
    both endpoints) and ONE count agg with map-side partials; the neighbor
    frame is computed once and checkpointed, survivors shrink monotonically
    so per-round shuffle volume only decreases. No windows, no Python.
    """
    nb = undirected_neighbors(edges).where(
        F.col("node") != F.col("nbr")
    ).localCheckpoint(eager=True)
    surv = nb.select("node").dropDuplicates(["node"])
    deg = None
    for i in range(iters):
        alive = nb.join(surv, "node").join(
            surv.select(F.col("node").alias("nbr")), "nbr"
        )
        deg = alive.groupBy("node").agg(F.count("*").cast("long").alias("core_deg"))
        surv = deg.where(F.col("core_deg") >= k).select("node")
        if (i + 1) % 4 == 0 and i + 1 < iters:
            surv = surv.localCheckpoint(eager=True)
    # one more degree pass over the final survivor set so core_deg is the
    # within-core degree of the RETURNED set (deg above was measured one
    # round earlier, before the last peel).
    final = nb.join(surv, "node").join(
        surv.select(F.col("node").alias("nbr")), "nbr"
    )
    return (
        final.groupBy("node")
        .agg(F.count("*").cast("long").alias("core_deg"))
        .where(F.col("core_deg") >= k)
    )


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    length: int = 4,
    salt: str = "walk",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Deterministic DeepWalk-style random-walk corpus over the undirected
    simple entity graph → (walk_id, step, node): ``walks_per_node`` walks of
    ``length`` steps from every node OF THE EDGE SET (an isolated node has
    no successor distribution, hence no walk) — the sentence corpus a skip-gram
    KG-embedding trainer consumes (walks are to graph embeddings what
    documents are to word2vec; ``textstats.skipgram_pairs`` applies
    downstream unchanged).

    The "random" successor is a pure function of (salt, walk_id, step):
    neighbor at rank ``hash60(salt|walk_id|step) % deg(u)`` in each node's
    id-sorted adjacency — reproducible across engines, partitionings and
    cluster sizes (the ``kg.negative_samples`` sampler discipline), so the
    walk corpus is lineage-stable training data, and the whole trajectory
    set is value-hash-checkable against an unrolled SQL recurrence.

    Scale shape: the ranked adjacency (node, rank → nbr) is computed ONCE —
    a row_number window partitioned by node, per-task sort bounded by the
    node's DEGREE, never by corpus size — then eagerly checkpointed with the
    degree table. Each step is ONE equi-join of the walker frontier on
    (node, rank): a walker probes exactly one adjacency row, so a celebrity
    hub adds join-key skew (AQE's job) but never fan-out. Frontier volume is
    constant at |V| × walks_per_node rows per step; output is the long-form
    trajectory table, (length+1) × that.

    Join planning note: rk/deg/cur all descend from a checkpointed
    LogicalRDD, whose unknown size estimate makes every per-step join a
    sort-merge join regardless of actual size — ~10 micro-shuffles of
    walker-scale frames on a console-sized graph. The node count is known
    from the (materialized) node frame for one cheap cached count, so when
    the walker/degree frames are provably broadcast-small the joins get
    explicit broadcast hints; past the gate the plan is the unhinted
    scale shape unchanged. Identical rows either way.
    """
    nb = undirected_neighbors(edges).where(F.col("node") != F.col("nbr"))
    rk = nb.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("node").orderBy("nbr")).cast(
            "long"
        )
        - 1,
    ).localCheckpoint(eager=True)
    deg = rk.groupBy("node").agg(F.count("*").cast("long").alias("deg"))
    from ..ids import hash60

    nodes = rk.select("node").dropDuplicates(["node"]).localCheckpoint(
        eager=True
    )
    small = nodes.count() * walks_per_node <= WALK_BROADCAST_MAX_ROWS
    if small:
        deg = F.broadcast(deg)
    cur = nodes.select(
        "node",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        F.concat_ws("#", "node", F.col("w").cast("string")).alias("walk_id"),
        "node",
    )
    out = cur.select("walk_id", F.lit(0).cast("long").alias("step"), "node")
    for t in range(1, length + 1):
        pick = cur.join(deg, "node").select(
            "walk_id",
            F.col("node"),
            F.pmod(
                hash60(
                    F.concat_ws(
                        "|", F.lit(salt), F.col("walk_id"), F.lit(str(t))
                    )
                ),
                F.col("deg"),
            )
            .cast("long")
            .alias("rank"),
        )
        cur = (F.broadcast(pick) if small else pick).join(
            rk, ["node", "rank"]
        ).select("walk_id", F.col("nbr").alias("node"))
        # Walk frontiers chain: without a lineage cut, step t's subtree is
        # re-planned inside every later step AND every union branch —
        # quadratic replay at node2vec-scale walk lengths (the pagerank_int
        # checkpoint discipline).
        if t % checkpoint_every == 0 and t < length:
            cur = cur.localCheckpoint(eager=True)
        out = out.unionByName(
            cur.select(
                "walk_id", F.lit(t).cast("long").alias("step"), "node"
            )
        )
    return out


def harmonic_closeness(
    edges: DataFrame,
    n_seeds: int = 8,
    max_dist: int = 4,
    salt: str = "cls",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Sampled harmonic closeness centrality over the undirected simple
    entity graph → (node, harm_micro, n_reached): for a deterministic
    sample of ``n_seeds`` landmark nodes, every node's harmonic sum
    Σ_seeds 1_000_000 DIV dist(seed, node) over seeds within ``max_dist``
    hops (self-distances excluded) — the landmark/pivot estimator of
    closeness centrality (Eppstein-Wang style), the third structural
    salience signal next to PageRank and triangle clustering. Integer
    micro-units per (seed, node) term then an integer sum — order-free,
    engine-exact (the ``link_prediction`` ra_micro discipline).

    Landmarks are the ``n_seeds`` nodes smallest by (hash60(salt|node),
    node) — a deterministic uniform sample, reproducible across engines
    (ranked by one window over the DIMENSION-scale node set, the
    ``kg.negative_samples`` indexing shape).

    Scale shape: the distance table is level-synchronous min-dist
    iteration — per round ONE equi-join of the (seed, node, d) table to the
    adjacency on node and ONE two-phase min aggregation; table size is
    bounded by n_seeds × |V| rows, NEVER by path counts (min-agg collapses
    per level, the flow_witness discipline). n_seeds is the sampling knob:
    fixed sample ⇒ fixed cost multiple of the edge list, independent of
    corpus growth.
    """
    from ..ids import hash60

    nb = undirected_neighbors(edges).where(
        F.col("node") != F.col("nbr")
    ).localCheckpoint(eager=True)
    nodes = nb.select("node").dropDuplicates(["node"])
    # orderBy + limit instead of a global row_number window: the planner
    # runs TakeOrderedAndProject (map-side partial top-k, no
    # single-partition WindowExec over the whole node set) and the seed
    # set is identical — (hk, node) is a total order.
    seeds = (
        nodes.withColumn(
            "hk", hash60(F.concat_ws("|", F.lit(salt), F.col("node")))
        )
        .orderBy(F.col("hk"), F.col("node"))
        .limit(n_seeds)
        .select(F.col("node").alias("seed"))
        .localCheckpoint(eager=True)
    )
    dist = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("d")
    )
    for i in range(max_dist):
        expand = dist.join(nb, "node").select(
            "seed", F.col("nbr").alias("node"), (F.col("d") + 1).alias("d")
        )
        dist = (
            dist.unionByName(expand)
            .groupBy("seed", "node")
            .agg(F.min("d").cast("long").alias("d"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < max_dist:
            dist = dist.localCheckpoint(eager=True)
    return (
        dist.where(F.col("d") > 0)
        .groupBy("node")
        .agg(
            F.sum(F.expr("1000000 DIV d")).cast("long").alias("harm_micro"),
            F.count("*").cast("long").alias("n_reached"),
        )
    )


def scc_bounded(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Bounded-diameter strongly connected components over the DIRECTED
    entity graph → (node, scc): nodes mutually reachable within
    ``max_hops`` directed hops share a component (labeled by min member —
    the CC convention). The directed counterpart of canonicalization's
    same-as components: cyclic cores in the constructed KG (A refers_to B
    refers_to A chains) are where naive traversals loop and where
    summarization should collapse first; the hop bound makes the closure
    table size explicit instead of worst-case-quadratic (the reference
    bounds its reachableBy closures the same way; an exact SCC needs the
    unbounded closure no engine materializes at 100 TB).

    Plan: ``max_hops - 1`` linear expansions of the closure frame (one
    equi-join + dedup each — AQE-splittable), ONE self-join intersecting
    the closure with its transpose for mutual pairs, then min-label CC
    over the mutual pair graph (canonicalize.connected_components — the
    proven loop). Every node of the edge set appears in the output;
    non-cyclic nodes are singleton components.
    """
    from . import canonicalize

    e = edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).dropDuplicates(["src", "dst"])
    closure = e.localCheckpoint(eager=True)
    for _ in range(max_hops - 1):
        step = (
            closure.alias("c")
            .join(e.alias("e"), F.col("c.dst") == F.col("e.src"))
            .select(F.col("c.src").alias("src"), F.col("e.dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        closure = (
            closure.unionByName(step)
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)
        )
    mutual = closure.join(
        closure.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ),
        ["src", "dst"],
    ).where(F.col("src") < F.col("dst"))
    # default max_iter (30): the CC loop is diameter-bounded over the
    # MUTUAL-pair graph, whose diameter is independent of max_hops (a
    # chain of K overlapping cycles has diameter K) — don't under-run it.
    comp = canonicalize.connected_components(
        _nodes(e).select(F.col("node").alias("name")),
        mutual.select(F.col("src").alias("a"), F.col("dst").alias("b")),
    )
    return comp.select(F.col("name").alias("node"), F.col("component").alias("scc"))


def link_prediction(
    edges: DataFrame,
    min_cn: int = 2,
    max_witness_deg: int | None = None,
) -> DataFrame:
    """Structural link prediction over the undirected simple entity graph
    → (a, b, cn, jaccard, ra_micro) for every NON-adjacent pair (a < b)
    with at least ``min_cn`` common neighbors — the missing-edge candidates
    a KG-completion trainer scores (the open-world counterpart of
    kg.negative_samples, which corrupts EXISTING triples; this ranks pairs
    the graph plausibly forgot).

    Three classic indices, all engine-exact under the value-hash gate:

    - ``cn``       — common-neighbor count (integer).
    - ``jaccard``  — cn / (deg(a) + deg(b) − cn): ONE IEEE division of
      integers, bit-identical across engines without rounding tricks.
    - ``ra_micro`` — resource-allocation index (Zhou-Lü-Zhang) in integer
      micro-units: Σ_w 1_000_000 DIV deg(w) over common neighbors w.
      Integer division per witness TYPE then an integer sum — order-free,
      the repo's micro-unit discipline (vs Adamic-Adar's 1/ln(deg) whose
      libm transcendental differs across engines in the last ulp).

    Plan shape: witness enumeration is ARRAY-SIDE — each witness's sorted
    neighbor list is built once (one edge-list-sized groupBy), then the
    (a, b) combinations stream out of a two-stage explode straight into the
    partial aggregate: no wedge self-join, no 2nd scan of the neighbor
    frame, and the sorted array emits pairs already in ``a < b`` order (the
    skipgram array-side pair-generation discipline; replaced a SortMergeJoin
    producing the same 69.6M wedge rows — measured 10.2 s → 1.9 s at sf0.1).
    Per-wedge state is one slice bounded by the witness degree. Then a
    two-phase count/sum aggregate, a LEFT ANTI join against the adjacency to
    drop already-linked pairs, and two degree probes. No windows, no Python.

    100 TB note: fan-out at a witness is deg(w)² — a celebrity hub is
    quadratic, in ANY formulation (the join form concentrated a hub's
    wedges in one shuffle partition just the same). ``max_witness_deg``
    caps which witnesses may GENERATE candidates (the production
    discipline: hub witnesses carry ~zero RA/AA weight and mostly
    manufacture spurious pairs; the indices stay exact over the pairs that
    survive, they are just computed from the capped witness set — a
    documented semantic knob, mirrored in the oracle when set). Default
    None = exact over all witnesses; residual agg skew is AQE's job.

    The symmetric neighbor frame feeds THREE consumers (the witness
    grouping, the degree table, and the adjacency anti-join) —
    checkpointed once so the upstream triple pipeline is not re-derived
    per consumer (the kcore discipline; on a cluster this is a persist of
    the edge list).
    """
    nb = (
        undirected_neighbors(edges)
        .where(F.col("node") != F.col("nbr"))
        .localCheckpoint(eager=True)
    )
    deg = nb.groupBy("node").agg(F.count("*").cast("long").alias("deg"))
    # per witness: the sorted distinct neighbor list; size(xs) == deg(w)
    # because nb is symmetric, so the RA term and the cap both read it.
    grp = nb.groupBy(F.col("nbr").alias("w")).agg(
        F.sort_array(F.collect_list("node")).alias("xs")
    )
    if max_witness_deg is not None:
        grp = grp.where(F.size("xs") <= max_witness_deg)
    # two-stage explode: (w, i, a, suffix) rows bounded by deg(w) each,
    # then the inner explode streams wedge rows into the partial aggregate
    # — ascending array order makes every emitted pair satisfy a < b.
    wedges = (
        grp.select(
            F.expr("1000000 DIV size(xs)").alias("rav"),
            F.posexplode("xs").alias("i", "a"),
            F.col("xs"),
        )
        .select("rav", "a", F.expr("slice(xs, i + 2, size(xs))").alias("rest"))
        .select("rav", "a", F.explode("rest").alias("b"))
    )
    pairs = (
        wedges.groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("cn"),
            F.sum("rav").cast("long").alias("ra_micro"),
        )
        .where(F.col("cn") >= min_cn)
    )
    adj = nb.select(F.col("node").alias("a"), F.col("nbr").alias("b"))
    cand = pairs.join(adj, ["a", "b"], "left_anti")
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            (F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))).alias(
                "jaccard"
            ),
            "ra_micro",
        )
    )
