"""End-to-end invariants: P/R vs the frozen reference extractor, per-turn
text equality under stable ordering, and 3-run determinism — the analogs of
the reference's query tests (MallocMemcpyTests.scala:30-43), the input_hint
row-level invariant, and StableOutputTests.scala:8-29.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from codepropertygraph_spark import testdata as td
from codepropertygraph_spark.operators import kg, ordering


def _triples(df):
    return {(r.conv_id, r.subj, r.pred, r.obj) for r in df.collect()}


def test_precision_recall_vs_reference(spark, transcripts, alias_dict, expected_triples):
    got = _triples(kg.final_triples(transcripts, alias_dict))
    exp = _triples(expected_triples)
    tp = len(got & exp)
    precision = tp / len(got)
    recall = tp / len(exp)
    assert precision >= 0.95, f"precision {precision} < 0.95"
    assert recall >= 0.95, f"recall {recall} < 0.95"
    # in fact the pipelines agree exactly
    assert got == exp


def test_per_turn_text_equality_under_stable_ordering(spark, transcripts, tier_dir):
    """Row-level invariant from BASELINE.json input_hint: ordering the
    (shuffled) input by the window must reproduce the reference's per-turn
    texts exactly, position by position."""
    rows, _ = td.generate_transcripts("sf0.001")
    ref: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"], r["ts"])):
        ref.setdefault(r["conv_id"], []).append(r["text"])

    got = (
        ordering.ordered_turns(transcripts)
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(F.struct("turn_order", "text"))).alias("ts"))
        .collect()
    )
    spark_texts = {r.conv_id: [x.text for x in r.ts] for r in got}
    assert spark_texts == ref


def _content_hash(df, cols):
    rows = sorted("\x1f".join(str(v) for v in r) for r in df.select(*cols).collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()


def test_three_run_determinism(spark, transcripts, alias_dict):
    cols = ["conv_id", "subj", "pred", "obj"]
    hashes = {
        _content_hash(kg.final_triples(transcripts, alias_dict), cols)
        for _ in range(3)
    }
    assert len(hashes) == 1
