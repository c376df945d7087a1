"""Centrality operators: integer PageRank + deterministic LPA.

Checks the structural properties a reviewer can verify by hand (hub beats
spokes, cliques become communities), bit-exact parity with a pure-Python
mirror of the integer recurrences, and determinism across runs.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from codepropertygraph_spark.operators import centrality


@pytest.fixture(scope="module")
def spark():
    from codepropertygraph_spark.session import get_spark

    return get_spark(master="local[4]")


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _pagerank_py(pairs, iters):
    """Pure-Python mirror of centrality.pagerank_int's recurrence."""
    edges = sorted(set(pairs))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out_deg = Counter(s for s, _ in edges)
    score = {n: centrality.PAGERANK_INIT_MICRO for n in nodes}
    for _ in range(iters):
        in_sum = defaultdict(int)
        for s, d in edges:
            in_sum[d] += score[s] // out_deg[s]
        score = {
            n: centrality.PAGERANK_BASE_MICRO
            + centrality.PAGERANK_DAMP_MILLI * in_sum[n] // 1000
            for n in nodes
        }
    return score


def _lpa_py(pairs, iters):
    """Pure-Python mirror of centrality.lpa_communities."""
    und = set()
    for s, d in pairs:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = sorted({n for e in und for n in e})
    label = {n: n for n in nodes}
    for _ in range(iters):
        counts = defaultdict(Counter)
        for n, nbr in und:
            counts[n][label[nbr]] += 1
        new = {}
        for n in nodes:
            if counts[n]:
                # max count, then lexicographically smallest label
                new[n] = min(counts[n], key=lambda l: (-counts[n][l], l))
            else:
                new[n] = label[n]
        label = new
    return label


STAR = [("hub", f"s{i}") for i in range(6)] + [(f"s{i}", "hub") for i in range(6)]
TWO_CLIQUES = (
    [(a, b) for a in "abc" for b in "abc" if a != b]
    + [(a, b) for a in "xyz" for b in "xyz" if a != b]
    + [("c", "x")]
)


def test_pagerank_hub_ranks_highest(spark):
    got = dict(
        centrality.pagerank_int(_edges_df(spark, STAR), iters=5)
        .rdd.map(tuple)
        .collect()
    )
    assert max(got, key=got.get) == "hub"
    spoke_scores = {got[f"s{i}"] for i in range(6)}
    assert len(spoke_scores) == 1, "symmetric spokes must tie exactly"


@pytest.mark.parametrize("pairs", [STAR, TWO_CLIQUES], ids=["star", "cliques"])
def test_pagerank_matches_python_mirror(spark, pairs):
    got = dict(
        centrality.pagerank_int(_edges_df(spark, pairs), iters=5)
        .rdd.map(tuple)
        .collect()
    )
    assert got == _pagerank_py(pairs, 5)


def test_lpa_two_cliques_two_communities(spark):
    got = dict(
        centrality.lpa_communities(_edges_df(spark, TWO_CLIQUES), iters=3)
        .rdd.map(tuple)
        .collect()
    )
    assert got == _lpa_py(TWO_CLIQUES, 3)
    communities = defaultdict(set)
    for n, c in got.items():
        communities[c].add(n)
    groups = sorted(map(frozenset, communities.values()), key=sorted)
    assert groups == [frozenset("abc"), frozenset("xyz")]


def test_determinism_across_runs(spark):
    mk = lambda: sorted(
        centrality.pagerank_int(_edges_df(spark, TWO_CLIQUES), iters=5)
        .rdd.map(tuple)
        .collect()
    )
    assert mk() == mk()


def test_self_loops_dropped(spark):
    triples = spark.createDataFrame(
        [("c1", "a", "p", "a"), ("c1", "a", "p", "b")],
        "conv_id string, subj string, pred string, obj string",
    )
    got = centrality.entity_edges(triples).collect()
    assert [(r.src, r.dst) for r in got] == [("a", "b")]


def test_personalized_pagerank_seeded(spark):
    """Restart mass restricted to seeds: non-seed nodes score only via
    inflow; a node unreachable from the seed set converges to 0; the
    seeded run matches the pure-Python recurrence with is_seed applied."""
    # seed component a->b->c, plus an isolated pair u->v (unreachable)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("u", "v")]
    seeds = spark.createDataFrame([("a",)], "node string")
    got = dict(
        centrality.pagerank_int(_edges_df(spark, pairs), iters=5, seeds=seeds)
        .rdd.map(tuple)
        .collect()
    )

    def mirror():
        edges = sorted(set(pairs))
        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
        out_deg = Counter(s for s, _ in edges)
        is_seed = {n: int(n == "a") for n in nodes}
        score = {n: is_seed[n] * centrality.PAGERANK_INIT_MICRO for n in nodes}
        for _ in range(5):
            in_sum = defaultdict(int)
            for s, d in edges:
                in_sum[d] += score[s] // out_deg[s]
            score = {
                n: is_seed[n] * centrality.PAGERANK_BASE_MICRO
                + centrality.PAGERANK_DAMP_MILLI * in_sum[n] // 1000
                for n in nodes
            }
        return score

    assert got == mirror()
    assert got["u"] == 0 and got["v"] == 0, "unreachable from seeds -> 0"
    assert got["a"] > got["b"] > 0


def test_triangle_counts_known_graphs(spark):
    """K4 has 4 triangles with every node in 3; a pendant node and a
    square (4-cycle) have 0; direction/duplicate edges don't matter."""
    from itertools import combinations

    k4 = list(combinations("abcd", 2))
    extra = [("d", "e"),            # pendant off the clique
             ("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")]  # 4-cycle
    dup_rev = [("b", "a"), ("a", "b")]  # duplicates + reverse direction
    edges = spark.createDataFrame(
        k4 + extra + dup_rev, "src string, dst string"
    )
    got = {r.node: r.n_triangles
           for r in centrality.triangle_counts(edges).collect()}
    assert {n: c for n, c in got.items() if n in "abcd"} == {
        "a": 3, "b": 3, "c": 3, "d": 3
    }
    assert got["e"] == 0
    assert all(got[n] == 0 for n in "pqrs")


def test_triangle_counts_match_naive(spark):
    """Degree-ordered enumeration equals a brute-force Python count on a
    pseudo-random graph (orientation must not change the result)."""
    import hashlib
    from itertools import combinations

    nodes = [f"n{i}" for i in range(30)]
    pairs = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if int(hashlib.md5(f"{a}|{b}".encode()).hexdigest(), 16) % 5 == 0
    ]
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b), adj[b].add(a)
    want = {
        n: sum(
            1
            for x, y in combinations(sorted(adj[n]), 2)
            if y in adj[x]
        )
        for n in nodes
        if adj[n]
    }
    edges = spark.createDataFrame(pairs, "src string, dst string")
    got = {r.node: r.n_triangles
           for r in centrality.triangle_counts(edges).collect()}
    assert got == want


def test_entity_pmi_matches_python_mirror(spark):
    """entity_pmi equals a hand-rolled mirror (same count definitions,
    same round-to-micro-nats), and the support threshold prunes."""
    import math
    from collections import Counter
    from itertools import combinations

    rows = [  # (conv_id, subj, obj)
        ("c1", "a", "b"), ("c1", "b", "c"),
        ("c2", "a", "b"),
        ("c3", "a", "d"),
        ("c4", "b", "c"),
        ("c5", "a", "b"), ("c5", "c", "d"),
    ]
    tr = spark.createDataFrame(rows, "conv_id string, subj string, obj string")
    got = {
        (r.a, r.b): (r.c_ab, r.pmi_micro)
        for r in centrality.entity_pmi(tr, min_count=2).collect()
    }

    convs: dict[str, set] = {}
    for c, s, o in rows:
        convs.setdefault(c, set()).update((s, o))
    n = len(convs)
    marg = Counter(e for es in convs.values() for e in es)
    pair = Counter(
        p for es in convs.values() for p in combinations(sorted(es), 2)
    )
    want = {}
    for (a, b), cab in pair.items():
        if cab < 2:
            continue
        v = math.log((cab * n) / (marg[a] * marg[b])) * 1e6
        want[(a, b)] = (cab, int(math.copysign(math.floor(abs(v) + 0.5), v)))
    assert got == want
    assert ("a", "b") in got and got[("a", "b")][0] == 3


def test_pagerank_weighted_matches_python_mirror(spark):
    """pagerank_weighted equals a hand-rolled integer mirror, and a
    heavily-weighted edge pulls rank toward its target vs the unweighted
    rank."""
    from collections import defaultdict

    wedges = [
        ("a", "b", 100), ("a", "c", 1),
        ("b", "a", 1), ("c", "a", 1), ("d", "a", 5), ("a", "d", 1),
    ]
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    got = {
        r.node: r.score_micro
        for r in centrality.pagerank_weighted(df, iters=5).collect()
    }

    nodes = sorted({s for s, _, _ in wedges} | {d for _, d, _ in wedges})
    outw = defaultdict(int)
    for s, _, w in wedges:
        outw[s] += w
    score = {n: centrality.PAGERANK_INIT_MICRO for n in nodes}
    for _ in range(5):
        in_sum = defaultdict(int)
        for s, d, w in wedges:
            in_sum[d] += score[s] * w // outw[s]
        score = {
            n: centrality.PAGERANK_BASE_MICRO
            + centrality.PAGERANK_DAMP_MILLI * in_sum[n] // 1000
            for n in nodes
        }
    assert got == score
    # the 100x a->b edge must rank b above c (symmetric in the unweighted
    # graph: both have the single in-edge from a)
    assert got["b"] > got["c"]


def test_lpa_weighted_strong_tie_wins(spark):
    """Weighted LPA: one strong edge outvotes two weak ones (the inverse
    of the unweighted vote), and the result matches a Python mirror of
    the synchronous weighted recurrence."""
    from collections import defaultdict

    # x's neighbors: strong tie to a (w=10), weak ties to b and c (w=1).
    # Unweighted LPA would see labels {a, b, c} once each and pick 'a' by
    # tie-break anyway — so add d,e labeled like b,c to make the
    # unweighted majority AGAINST the strong tie.
    wedges = [
        ("x", "a", 10),
        ("x", "b", 1), ("x", "c", 1),
        ("b", "d", 5), ("c", "e", 5),
    ]
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    got = {
        r.node: r.community
        for r in centrality.lpa_communities_weighted(df, iters=1).collect()
    }

    nb = defaultdict(lambda: defaultdict(int))
    for s, d, w in wedges:
        nb[s][d] += w
        nb[d][s] += w
    want = {}
    for n, nbrs in nb.items():
        # round 1: every neighbor still carries its own name as label
        best = sorted(nbrs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        want[n] = best
    assert got == want
    assert got["x"] == "a"  # the strong tie won


# k-core ----------------------------------------------------------------------


def _kcore_py(pairs, k, iters):
    """Pure-Python mirror of centrality.kcore's synchronous peeling."""
    nbrs = defaultdict(set)
    for s, d in pairs:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    surv = set(nbrs)
    for _ in range(iters):
        surv = {n for n in surv if len(nbrs[n] & surv) >= k}
    return {n: len(nbrs[n] & surv) for n in surv if len(nbrs[n] & surv) >= k}


class TestKCore:
    # triangle {a,b,c} + pendant chain c-d-e: the 2-core is exactly the
    # triangle (d, e peel off in cascade), every core degree 2.
    PAIRS = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]

    def test_hand_checkable_triangle_with_tail(self, spark):
        out = {
            r["node"]: r["core_deg"]
            for r in centrality.kcore(_edges_df(spark, self.PAIRS), k=2).collect()
        }
        assert out == {"a": 2, "b": 2, "c": 2}

    def test_matches_python_mirror_on_random_graph(self, spark):
        import random

        rng = random.Random(7)
        pairs = [
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(80)
        ]
        got = {
            r["node"]: r["core_deg"]
            for r in centrality.kcore(_edges_df(spark, pairs), k=3, iters=8).collect()
        }
        assert got == _kcore_py(pairs, 3, 8)

    def test_peel_cascade_needs_the_rounds(self, spark):
        # path p0-p1-...-p5 plus a 4-clique: with k=2 the path peels one
        # endpoint per round from each side; iters=1 must NOT yet reach the
        # fixpoint while iters=8 must equal the python fixpoint.
        path = [(f"p{i}", f"p{i+1}") for i in range(6)]
        clique = [("c0", "c1"), ("c0", "c2"), ("c0", "c3"),
                  ("c1", "c2"), ("c1", "c3"), ("c2", "c3")]
        pairs = path + clique
        after1 = {
            r["node"]
            for r in centrality.kcore(_edges_df(spark, pairs), k=2, iters=1).collect()
        }
        fix = set(_kcore_py(pairs, 2, 20))
        assert fix == {"c0", "c1", "c2", "c3"}
        assert after1 > fix  # interior path nodes still alive after 1 round
        got = {
            r["node"]
            for r in centrality.kcore(_edges_df(spark, pairs), k=2, iters=8).collect()
        }
        assert got == fix

    def test_corpus_fixpoint_within_gate_rounds(self, spark):
        """The gate query runs iters=8; assert the sf0.001 corpus entity
        graph actually REACHES its 2-core fixpoint within that budget
        (one more round changes nothing)."""
        import __spark_entry__ as E
        from codepropertygraph_spark.operators import kg

        sf = "/root/testdata/sf0.001"
        triples = kg.final_triples(
            E._transcripts(spark, sf), E._alias_dict(spark, sf)
        )
        edges = centrality.entity_edges(triples).localCheckpoint(eager=True)
        r8 = sorted(
            (r["node"], r["core_deg"])
            for r in centrality.kcore(edges, k=2, iters=8).collect()
        )
        r9 = sorted(
            (r["node"], r["core_deg"])
            for r in centrality.kcore(edges, k=2, iters=9).collect()
        )
        assert r8 == r9 and len(r8) > 0


def _hash60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sym_nbrs(pairs):
    und = defaultdict(set)
    for s, d in pairs:
        if s != d:
            und[s].add(d)
            und[d].add(s)
    return {n: sorted(v) for n, v in und.items()}


class TestRandomWalks:
    def _walks_py(self, pairs, walks_per_node=2, length=4, salt="walk"):
        nbrs = _sym_nbrs(pairs)
        rows = set()
        for node in nbrs:
            for w in range(walks_per_node):
                wid = f"{node}#{w}"
                cur = node
                rows.add((wid, 0, cur))
                for t in range(1, length + 1):
                    pick = _hash60_py(f"{salt}|{wid}|{t}") % len(nbrs[cur])
                    cur = nbrs[cur][pick]
                    rows.add((wid, t, cur))
        return rows

    def test_matches_python_mirror(self, spark):
        pairs = TWO_CLIQUES + STAR
        got = {
            (r["walk_id"], r["step"], r["node"])
            for r in centrality.random_walks(
                _edges_df(spark, pairs), walks_per_node=2, length=4
            ).collect()
        }
        assert got == self._walks_py(pairs)

    def test_every_hop_is_an_edge(self, spark):
        pairs = TWO_CLIQUES
        rows = centrality.random_walks(
            _edges_df(spark, pairs), walks_per_node=1, length=3
        ).collect()
        nbrs = _sym_nbrs(pairs)
        traj = defaultdict(dict)
        for r in rows:
            traj[r["walk_id"]][r["step"]] = r["node"]
        assert len(traj) == len(nbrs)  # one walk per node
        for steps in traj.values():
            assert sorted(steps) == [0, 1, 2, 3]  # full-length, no dead ends
            for t in range(1, 4):
                assert steps[t] in nbrs[steps[t - 1]]

    def test_deterministic_across_runs(self, spark):
        pairs = STAR
        a = sorted(
            map(tuple, centrality.random_walks(_edges_df(spark, pairs)).collect())
        )
        b = sorted(
            map(tuple, centrality.random_walks(_edges_df(spark, pairs)).collect())
        )
        assert a == b


class TestHarmonicCloseness:
    def _closeness_py(self, pairs, n_seeds=8, max_dist=4, salt="cls"):
        nbrs = _sym_nbrs(pairs)
        seeds = sorted(nbrs, key=lambda n: (_hash60_py(f"{salt}|{n}"), n))[
            :n_seeds
        ]
        harm = defaultdict(lambda: [0, 0])
        for seed in seeds:
            dist = {seed: 0}
            frontier = [seed]
            for d in range(1, max_dist + 1):
                nxt = []
                for u in frontier:
                    for v in nbrs[u]:
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                frontier = nxt
            for node, d in dist.items():
                if d > 0:
                    harm[node][0] += 1_000_000 // d
                    harm[node][1] += 1
        return {n: tuple(v) for n, v in harm.items()}

    def test_matches_python_mirror(self, spark):
        pairs = TWO_CLIQUES + [("z", "q1"), ("q1", "q2"), ("q2", "q3")]
        got = {
            r["node"]: (r["harm_micro"], r["n_reached"])
            for r in centrality.harmonic_closeness(
                _edges_df(spark, pairs), n_seeds=3, max_dist=4
            ).collect()
        }
        assert got == self._closeness_py(pairs, n_seeds=3)

    def test_center_of_path_is_closest(self, spark):
        # path a-b-c-d-e with every node a seed: center c maximizes the
        # harmonic sum (shortest distances to everything else).
        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = {
            r["node"]: r["harm_micro"]
            for r in centrality.harmonic_closeness(
                _edges_df(spark, pairs), n_seeds=5, max_dist=4
            ).collect()
        }
        assert max(got, key=got.get) == "c"
        assert got["c"] == 2 * (1_000_000 + 1_000_000 // 2)


def test_deepwalk_composes_with_skipgram(spark):
    """End-to-end KG-embedding corpus: random-walk trajectories rendered as
    space-joined sentences feed textstats.skipgram_pairs unchanged (the
    DeepWalk recipe — walks are to graph embeddings what documents are to
    word2vec). Checks the composition against a pure-Python skip-gram count
    over the mirrored walks."""
    from collections import Counter

    from pyspark.sql import functions as F

    from codepropertygraph_spark.operators import textstats

    pairs = TWO_CLIQUES + STAR
    walks = centrality.random_walks(_edges_df(spark, pairs), walks_per_node=1, length=4)
    sentences = walks.groupBy("walk_id").agg(
        F.concat_ws(
            " ", F.transform(F.sort_array(F.collect_list(F.struct("step", "node"))), lambda s: s["node"])
        ).alias("text")
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in textstats.skipgram_pairs(sentences, window=2).collect()
    }
    # python mirror: regenerate the walks, count pairs within +/-2
    nbrs = _sym_nbrs(pairs)
    want = Counter()
    for node in nbrs:
        wid, cur, seq = f"{node}#0", node, [node]
        for t in range(1, 5):
            cur = nbrs[cur][_hash60_py(f"walk|{wid}|{t}") % len(nbrs[cur])]
            seq.append(cur)
        for i, c in enumerate(seq):
            for j in range(max(i - 2, 0), min(i + 2, len(seq) - 1) + 1):
                if j != i:
                    want[(c, seq[j])] += 1
    assert got == dict(want)


class TestSccBounded:
    def _scc_py(self, pairs, max_hops=4):
        nodes = sorted({n for e in pairs for n in e})
        adj = defaultdict(set)
        for s, d in pairs:
            if s != d:
                adj[s].add(d)
        reach = {}
        for n in nodes:
            seen, frontier = {n}, {n}
            for _ in range(max_hops):
                frontier = {w for u in frontier for w in adj[u]} - seen
                seen |= frontier
            reach[n] = seen - {n}
        # mutual pairs -> undirected CC labeled by min member
        comp = {n: n for n in nodes}
        changed = True
        while changed:
            changed = False
            for a in nodes:
                for b in reach[a]:
                    if a in reach[b]:
                        m = min(comp[a], comp[b])
                        if comp[a] != m or comp[b] != m:
                            comp[a] = comp[b] = m
                            changed = True
        return comp

    def test_two_cycles_and_a_chain(self, spark):
        pairs = [
            ("a", "b"), ("b", "c"), ("c", "a"),          # 3-cycle
            ("x", "y"), ("y", "x"),                        # 2-cycle
            ("c", "x"),                                    # one-way bridge
            ("p", "q"), ("q", "r"),                        # acyclic chain
        ]
        got = {
            (r["node"], r["scc"])
            for r in centrality.scc_bounded(_edges_df(spark, pairs)).collect()
        }
        assert got == {
            ("a", "a"), ("b", "a"), ("c", "a"),
            ("x", "x"), ("y", "x"),
            ("p", "p"), ("q", "q"), ("r", "r"),
        }

    def test_matches_python_mirror(self, spark):
        pairs = TWO_CLIQUES + STAR + [("s0", "hub")]
        got = {
            (r["node"], r["scc"])
            for r in centrality.scc_bounded(_edges_df(spark, pairs), max_hops=4).collect()
        }
        want = set(self._scc_py(pairs, max_hops=4).items())
        assert got == want


def test_community_graph_quotient(spark):
    """community_graph: rolled-up edge counts between community labels —
    two cliques bridged by one edge summarize to 2 super-nodes with the
    intra-clique counts on the diagonal and the single bridge off it."""
    e = _edges_df(spark, TWO_CLIQUES)
    comm = centrality.lpa_communities(e, iters=3)
    labels = {r["node"]: r["community"] for r in comm.collect()}
    la, lx = labels["a"], labels["x"]
    assert la != lx  # the cliques stay separate communities
    got = {
        (r["c_src"], r["c_dst"]): r["n_edges"]
        for r in centrality.community_graph(e, comm).collect()
    }
    assert got == {(la, la): 6, (lx, lx): 6, (la, lx): 1}
