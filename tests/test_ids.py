"""Deterministic id allocation (KeyPool analog) — run-to-run stability and
collision-freedom, mirroring KeyPoolTests + StableOutputTests discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from codepropertygraph_spark import ids


def test_hash_ids_stable_and_label_disjoint(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "k string")
    a = {r.k: r.id for r in df.select("k", ids.hash_id_col("TURN", F.col("k")).alias("id")).collect()}
    b = {r.k: r.id for r in df.select("k", ids.hash_id_col("TURN", F.col("k")).alias("id")).collect()}
    assert a == b  # run-to-run stable
    assert len(set(a.values())) == 1000  # no collisions at this scale
    ent = {
        r.k: r.id
        for r in df.select("k", ids.hash_id_col("ENTITY", F.col("k")).alias("id")).collect()
    }
    assert set(a.values()).isdisjoint(ent.values())  # label spaces disjoint


def test_interval_ids_dense_stable_unique(spark):
    df = spark.createDataFrame([(f"c{i % 7}", i) for i in range(500)], "conv string, seq int")
    out1 = ids.interval_ids(df, ["conv", "seq"], base=1 << 40)
    out2 = ids.interval_ids(df.repartition(13), ["conv", "seq"], base=1 << 40)
    m1 = {(r.conv, r.seq): r.id for r in out1.collect()}
    m2 = {(r.conv, r.seq): r.id for r in out2.collect()}
    assert m1 == m2  # stable under input partitioning
    assert len(set(m1.values())) == 500  # unique
    assert all(v >= 1 << 40 for v in m1.values())
