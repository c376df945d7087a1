"""Link prediction, TF-IDF top terms, role-transition matrix."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from codepropertygraph_spark.operators import centrality, kg, textstats


@pytest.fixture(scope="module")
def spark():
    from codepropertygraph_spark.session import get_spark

    return get_spark(master="local[4]")


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _linkpred_py(pairs, min_cn=2, max_witness_deg=None):
    """Independent per-pair mirror of centrality.link_prediction."""
    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    deg = {n: len(s) for n, s in nbrs.items()}
    out = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b in nbrs[a]:
                continue
            wits = nbrs[a] & nbrs[b]
            if max_witness_deg is not None:
                wits = {w for w in wits if deg[w] <= max_witness_deg}
            if len(wits) < min_cn:
                continue
            cn = len(wits)
            out[(a, b)] = (
                cn,
                cn / (deg[a] + deg[b] - cn),
                sum(1_000_000 // deg[w] for w in wits),
            )
    return out


class TestLinkPrediction:
    # square a-b-c-d-a: the two diagonals (a,c) and (b,d) each have 2
    # common neighbors, jaccard 2/(2+2-2)=1.0, ra = 2 * (1e6 // 2).
    SQUARE = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]

    def test_hand_checkable_square(self, spark):
        got = {
            (r["a"], r["b"]): (r["cn"], r["jaccard"], r["ra_micro"])
            for r in centrality.link_prediction(
                _edges_df(spark, self.SQUARE)
            ).collect()
        }
        assert got == {
            ("a", "c"): (2, 1.0, 1_000_000),
            ("b", "d"): (2, 1.0, 1_000_000),
        }

    def test_adjacent_pairs_excluded(self, spark):
        # triangle + one wedge: (a,b),(b,c),(a,c),(c,d),(b,d) -> the only
        # non-adjacent pair with >=2 common neighbors is (a,d) via {b,c}.
        pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("b", "d")]
        rows = centrality.link_prediction(_edges_df(spark, pairs)).collect()
        assert {(r["a"], r["b"]) for r in rows} == {("a", "d")}
        r = rows[0]
        # deg: a=2, d=2, b=3, c=3; witnesses {b, c} each deg 3.
        assert r["cn"] == 2
        assert r["jaccard"] == 2 / (2 + 2 - 2)
        assert r["ra_micro"] == 2 * (1_000_000 // 3)

    def test_matches_python_mirror_on_random_graph(self, spark):
        import random

        rng = random.Random(11)
        pairs = [
            (f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
            for _ in range(70)
        ]
        got = {
            (r["a"], r["b"]): (r["cn"], r["jaccard"], r["ra_micro"])
            for r in centrality.link_prediction(
                _edges_df(spark, pairs), min_cn=2
            ).collect()
        }
        assert got == _linkpred_py(pairs, min_cn=2)

    def test_witness_degree_cap(self, spark):
        # star hub h connected to x0..x5 plus a path x0-x1: without the cap
        # every (xi, xj) pair is a candidate via h; capping witnesses below
        # the hub degree removes all hub-generated candidates.
        pairs = [("h", f"x{i}") for i in range(6)] + [("x0", "x1")]
        full = centrality.link_prediction(
            _edges_df(spark, pairs), min_cn=1
        ).collect()
        assert len(full) == len(_linkpred_py(pairs, min_cn=1))
        capped = centrality.link_prediction(
            _edges_df(spark, pairs), min_cn=1, max_witness_deg=3
        ).collect()
        assert capped == []  # h (deg 6) was the only witness anywhere
        assert (
            _linkpred_py(pairs, min_cn=1, max_witness_deg=3) == {}
        )  # mirror agrees


class TestTfidfTopTerms:
    DOCS = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry apple durian durian"),
    ]

    def _docs(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_hand_computed_scores(self, spark):
        out = textstats.tfidf_top_terms(self._docs(spark), k=3).collect()
        got = {
            (r["doc_id"], r["term"]): (r["tf"], r["score_micro"], r["rank"])
            for r in out
        }
        idf = lambda df: int(round(math.log(3 / df) * 1e6))
        # doc 1: apple tf2 df2, banana tf1 df2 -> apple first.
        assert got[(1, "apple")] == (2, 2 * idf(2), 1)
        assert got[(1, "banana")] == (1, idf(2), 2)
        # doc 3: durian tf2 df1 dominates; apple/cherry tie on score
        # (tf1, df2) -> term asc breaks the tie.
        assert got[(3, "durian")] == (2, 2 * idf(1), 1)
        assert got[(3, "apple")][2] == 2
        assert got[(3, "cherry")][2] == 3

    def test_df_equal_n_scores_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, "x y"), (2, "x z")], "doc_id long, text string"
        )
        out = {
            (r["doc_id"], r["term"]): r["score_micro"]
            for r in textstats.tfidf_top_terms(docs, k=5).collect()
        }
        assert out[(1, "x")] == 0 and out[(2, "x")] == 0  # ln(2/2) = 0
        assert out[(1, "y")] > 0 and out[(2, "z")] > 0

    def test_k_bounds_output(self, spark):
        out = textstats.tfidf_top_terms(self._docs(spark), k=1)
        rows = out.collect()
        assert len(rows) == 3 and all(r["rank"] == 1 for r in rows)


class TestRoleTransitions:
    def _t(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, ts timestamp, role string"
        ).withColumn("ts", F.col("ts"))

    def test_counts_and_boundaries(self, spark):
        import datetime as dt

        t0 = dt.datetime(2025, 1, 1)
        rows = [
            ("c1", 0, t0, "user"),
            ("c1", 1, t0, "assistant"),
            ("c1", 2, t0, "tool"),
            ("c1", 3, t0, "assistant"),
            ("c2", 0, t0, "user"),
            ("c2", 1, t0, "assistant"),
        ]
        got = {
            (r["prev_role"], r["role"]): r["cnt"]
            for r in kg.role_transitions(self._t(spark, rows)).collect()
        }
        # conversation boundary (c1 end -> c2 start) contributes nothing
        assert got == {
            ("user", "assistant"): 2,
            ("assistant", "tool"): 1,
            ("tool", "assistant"): 1,
        }

    def test_duplicate_turn_idx_disambiguated_by_ts(self, spark):
        import datetime as dt

        t0 = dt.datetime(2025, 1, 1)
        t1 = dt.datetime(2025, 1, 2)
        # same turn_idx twice: ts orders tool BEFORE assistant
        rows = [
            ("c1", 0, t0, "user"),
            ("c1", 1, t1, "assistant"),
            ("c1", 1, t0, "tool"),
        ]
        got = {
            (r["prev_role"], r["role"]): r["cnt"]
            for r in kg.role_transitions(self._t(spark, rows)).collect()
        }
        assert got == {("user", "tool"): 1, ("tool", "assistant"): 1}

    def test_corpus_matches_pandas_mirror(self, spark):
        import __spark_entry__ as E

        sf = "/root/testdata/sf0.001"
        t = E._transcripts(spark, sf)
        got = {
            (r["prev_role"], r["role"]): r["cnt"]
            for r in kg.role_transitions(t).collect()
        }
        pdf = t.select("conv_id", "turn_idx", "ts", "role").toPandas()
        pdf = pdf.sort_values(["conv_id", "turn_idx", "ts"])
        mirror = Counter()
        prev_conv, prev_role = None, None
        for row in pdf.itertuples(index=False):
            if row.conv_id == prev_conv:
                mirror[(prev_role, row.role)] += 1
            prev_conv, prev_role = row.conv_id, row.role
        assert got == dict(mirror)
