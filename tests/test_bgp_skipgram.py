"""BGP pattern matching, skip-gram pair extraction, hard-negative mining."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from codepropertygraph_spark.operators import kg, similarity, textstats


@pytest.fixture(scope="module")
def spark():
    from codepropertygraph_spark.session import get_spark

    return get_spark(master="local[4]")


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


TRIPLES = [
    ("u1", "uses_tool", "t1"),
    ("u1", "asks_about", "b1"),
    ("b1", "refers_to", "t1"),   # closes triangle (u1, b1, t1)
    ("u2", "uses_tool", "t1"),
    ("u2", "asks_about", "b2"),
    ("b2", "refers_to", "t2"),   # open: b2 refers to the WRONG tool
    ("u1", "uses_tool", "t1"),   # duplicate triple: set semantics
]


class TestBgpMatch:
    def test_triangle_bindings(self, spark):
        out = kg.bgp_match(
            _triples(spark, TRIPLES),
            [("?a", "uses_tool", "?t"),
             ("?a", "asks_about", "?b"),
             ("?b", "refers_to", "?t")],
        )
        assert out.columns == ["a", "b", "t"]
        assert [tuple(r) for r in out.collect()] == [("u1", "b1", "t1")]

    def test_constant_subject_and_object(self, spark):
        out = kg.bgp_match(
            _triples(spark, TRIPLES), [("u2", "uses_tool", "?t")]
        )
        assert [tuple(r) for r in out.collect()] == [("t1",)]
        out2 = kg.bgp_match(
            _triples(spark, TRIPLES), [("?a", "uses_tool", "t1")]
        )
        assert sorted(r["a"] for r in out2.collect()) == ["u1", "u2"]

    def test_repeated_var_within_pattern(self, spark):
        rows = TRIPLES + [("x", "refers_to", "x")]
        out = kg.bgp_match(_triples(spark, rows), [("?s", "refers_to", "?s")])
        assert [tuple(r) for r in out.collect()] == [("x",)]

    def test_variable_predicate(self, spark):
        out = kg.bgp_match(_triples(spark, TRIPLES), [("u1", "?p", "t1")])
        assert sorted(r["p"] for r in out.collect()) == ["uses_tool"]

    def test_disconnected_patterns_cross_join(self, spark):
        out = kg.bgp_match(
            _triples(spark, TRIPLES),
            [("u1", "asks_about", "?x"), ("u2", "asks_about", "?y")],
        )
        assert [tuple(r) for r in out.collect()] == [("b1", "b2")]

    def test_all_constant_existence(self, spark):
        hit = kg.bgp_match(_triples(spark, TRIPLES), [("u1", "uses_tool", "t1")])
        assert hit.count() == 1
        miss = kg.bgp_match(_triples(spark, TRIPLES), [("u1", "uses_tool", "t9")])
        assert miss.count() == 0

    def test_set_semantics_no_duplicate_bindings(self, spark):
        # u1/u2 both use t1; pattern on (?a uses_tool ?t) twice via two
        # patterns sharing ?t must not multiply duplicate rows.
        out = kg.bgp_match(
            _triples(spark, TRIPLES),
            [("?a", "uses_tool", "?t"), ("?a2", "uses_tool", "?t")],
        )
        rows = {tuple(r) for r in out.collect()}
        assert rows == {("u1", "u1", "t1"), ("u1", "u2", "t1"),
                        ("u2", "u1", "t1"), ("u2", "u2", "t1")}
        assert out.count() == 4


class TestSkipgramPairs:
    def test_hand_counted_window2(self, spark):
        docs = spark.createDataFrame([("d1", "a b c a")], "doc_id string, text string")
        out = {
            (r["center"], r["context"]): r["cnt"]
            for r in textstats.skipgram_pairs(docs, window=2).collect()
        }
        toks = "a b c a".split()
        exp = Counter()
        for i, t in enumerate(toks):
            for j in range(max(0, i - 2), min(len(toks), i + 3)):
                if j != i:
                    exp[(t, toks[j])] += 1
        assert out == dict(exp)

    def test_total_pair_mass(self, spark):
        docs = spark.createDataFrame(
            [("d1", "x y"), ("d2", "p q r s t")], "doc_id string, text string"
        )
        out = textstats.skipgram_pairs(docs, window=1)
        # window=1: each adjacent pair counted in both directions
        assert out.agg(F.sum("cnt")).first()[0] == 2 * (1 + 4)


class TestHardNegatives:
    def test_band_and_ranking(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = similarity.hard_negatives(
            emb, query_max_id=5, k=3, lo=0.3, hi=0.9
        ).collect()
        assert all(0.3 <= r["cos"] < 0.9 for r in out)
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rows in by_q.items():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
            cos = [r["cos"] for r in rows]
            assert cos == sorted(cos, reverse=True)
            assert all(r["neighbor_id"] != q for r in rows)

    def test_band_excludes_near_duplicates(self, spark):
        # exact top-1 of each query that lands >= hi must be absent
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = similarity.cosine_topk(emb, query_max_id=5, k=50).collect()
        hard = similarity.hard_negatives(
            emb, query_max_id=5, k=50, lo=0.3, hi=0.9
        ).collect()
        hard_set = {(r["query_id"], r["neighbor_id"]) for r in hard}
        for r in exact:
            if r["cos"] >= 0.9 or r["cos"] < 0.3:
                assert (r["query_id"], r["neighbor_id"]) not in hard_set
            elif 0.3 <= r["cos"] < 0.9 and r["rank"] <= 3:
                # a banded high-rank exact hit must appear unless k got cut
                pass


class TestBgpOptionalNotExists:
    """SPARQL OPTIONAL / FILTER NOT EXISTS semantics on a handcrafted
    triple set where every case is enumerable by eye."""

    def _triples(self, spark):
        rows = [
            # (conv, subj, pred, obj)
            ("c", "u1", "uses_tool", "hammer"),
            ("c", "u2", "uses_tool", "saw"),
            ("c", "u3", "uses_tool", "drill"),
            ("c", "b1", "asks_about", "u1"),
            ("c", "b2", "asks_about", "u1"),
            ("c", "u3", "follows", "drill"),  # filters u3 out
        ]
        return spark.createDataFrame(
            rows, "conv_id string, subj string, pred string, obj string"
        )

    def test_optional_and_not_exists(self, spark):
        from codepropertygraph_spark.operators import kg

        out = kg.bgp_match(
            self._triples(spark),
            [("?a", "uses_tool", "?t")],
            optional=[("?b", "asks_about", "?a")],
            not_exists=[("?a", "follows", "?t")],
        )
        got = {(r["a"], r["b"], r["t"]) for r in out.collect()}
        assert got == {
            ("u1", "b1", "hammer"),  # two optional matches multiply rows
            ("u1", "b2", "hammer"),
            ("u2", None, "saw"),     # unbound OPTIONAL survives as NULL
            # u3 removed by NOT EXISTS
        }

    def test_disconnected_optional_rejected(self, spark):
        import pytest as _pytest

        from codepropertygraph_spark.operators import kg

        with _pytest.raises(ValueError, match="OPTIONAL"):
            kg.bgp_match(
                self._triples(spark),
                [("?a", "uses_tool", "?t")],
                optional=[("?x", "asks_about", "?y")],
            ).collect()


class TestBgpAlgebraProperty:
    """Hypothesis property: for random triple sets and random pattern
    shapes, the planned bgp_match (selectivity reorder, broadcast probes,
    OPTIONAL left joins, NOT EXISTS anti joins) equals a brute-force
    SPARQL evaluator that walks patterns in GIVEN order — proving the
    planner is a pure rewrite under any join order it picks."""

    @staticmethod
    def _eval_bgp(triples, patterns, optional=(), not_exists=()):
        def match_pattern(binding, pat):
            outs = []
            for t in triples:
                b, ok = dict(binding), True
                for term, val in zip(pat, t):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in b and b[v] != val:
                            ok = False
                            break
                        b[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    outs.append(b)
            return outs

        sols = [{}]
        for pat in patterns:
            sols = [b2 for b in sols for b2 in match_pattern(b, pat)]
        for pat in optional:
            new_vars = {t[1:] for t in pat if t.startswith("?")}
            nxt = []
            for b in sols:
                ext = match_pattern(b, pat)
                if ext:
                    nxt.extend(ext)
                else:
                    bb = dict(b)
                    for v in new_vars:
                        bb.setdefault(v, None)
                    nxt.append(bb)
            sols = nxt
        for pat in not_exists:
            sols = [b for b in sols if not match_pattern(b, pat)]
        all_vars = sorted(
            {
                t[1:]
                for pat in list(patterns) + list(optional)
                for t in pat
                if t.startswith("?")
            }
        )
        return all_vars, {tuple(b.get(v) for v in all_vars) for b in sols}

    def test_matches_bruteforce(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        ent = st.sampled_from(["e0", "e1", "e2", "e3"])
        prd = st.sampled_from(["p0", "p1"])
        triple = st.tuples(ent, prd, ent)
        var = st.sampled_from(["?a", "?b", "?c"])
        s_term = st.one_of(var, ent)
        p_term = st.one_of(st.sampled_from(["?p"]), prd)
        pattern = st.tuples(s_term, p_term, s_term)

        @settings(max_examples=12, deadline=None)
        @given(
            ts=st.lists(triple, min_size=2, max_size=14, unique=True),
            req=st.lists(pattern, min_size=1, max_size=3),
            opt=st.lists(pattern, min_size=0, max_size=1),
            neg=st.lists(pattern, min_size=0, max_size=1),
            anchor=var,
        )
        def run(ts, req, opt, neg, anchor):
            from hypothesis import assume

            req_vars = {t[1:] for p in req for t in p if t.startswith("?")}
            assume(req_vars)  # all-constant BGP takes the existence branch
            # optional/not-exists must connect to the accumulated bindings
            # (bgp_match rejects disconnected ones by contract)
            a = anchor if anchor[1:] in req_vars else "?" + sorted(req_vars)[0]
            opt = [(a, p[1], p[2]) for p in opt]
            neg = [(a, n[1], n[2]) for n in neg]
            df = kg.bgp_match(
                _triples(spark, ts),
                req,
                optional=opt or None,
                not_exists=neg or None,
            )
            want_vars, want = self._eval_bgp(ts, req, opt, neg)
            assert sorted(df.columns) == want_vars
            got = {tuple(r[v] for v in want_vars) for r in df.collect()}
            assert got == want

        run()
