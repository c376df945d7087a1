"""Skew-handling operators: salted grouped extraction equals unsalted;
salted collect_set equals plain collect_set; hub detector finds the hub."""

from __future__ import annotations

from pyspark.sql import functions as F

from codepropertygraph_spark.operators import extraction, extraction_udf, linking, skew


def test_salted_grouped_extraction_equals_unsalted(spark, transcripts):
    cols = ["conv_id", "turn_idx", "pos", "subj_surface", "pred", "obj_surface"]
    plain = {
        tuple(r)
        for r in extraction_udf.raw_triples_grouped(transcripts).select(*cols).collect()
    }

    def fn(pdf):
        return extraction_udf._parse_batch(pdf)

    salted = skew.salted_grouped(
        transcripts.select("conv_id", "turn_idx", "ts", "text"),
        fn,
        schema="conv_id string, turn_idx int, ts timestamp, pos int, "
        "subj_surface string, pred string, obj_surface string",
    )
    got = {tuple(r) for r in salted.select(*cols).collect()}
    assert got == plain


def test_salted_collect_set_equals_plain(spark, transcripts, alias_dict):
    m = extraction.mention_surfaces(transcripts, alias_dict)
    linked = linking.link_surfaces(m, alias_dict, "surface", "canonical")
    plain = {
        r.conv_id: set(r.s)
        for r in linked.groupBy("conv_id")
        .agg(F.collect_set("canonical").alias("s"))
        .collect()
    }
    salted = {
        r.conv_id: set(r.canonical_set)
        for r in skew.salted_collect_set(linked, "conv_id", "canonical").collect()
    }
    assert salted == plain


def test_hub_entity_detected(spark, transcripts, alias_dict):
    m = extraction.mention_surfaces(transcripts, alias_dict)
    linked = linking.link_surfaces(m, alias_dict, "surface", "canonical")
    counts = skew.hub_entity_conversation_counts(linked)
    n_convs = transcripts.select("conv_id").distinct().count()
    top = counts.orderBy(F.col("n_conversations").desc()).limit(1).collect()[0]
    assert top.canonical == "org_1"  # the planted hub
    assert top.n_conversations >= 0.3 * n_convs
