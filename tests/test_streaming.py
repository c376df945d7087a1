"""Streaming ingestion: foreachBatch triples over arriving files, with
exactly-once checkpoint semantics (rerun adds nothing)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from codepropertygraph_spark.operators import kg
from codepropertygraph_spark.streaming import ingest


def test_stream_triples_matches_batch(spark, transcripts, alias_dict, tmp_path):
    base = str(tmp_path)
    # one file per conversation bucket (pmod! xxhash64 % n can be negative)
    for i in range(3):
        part = transcripts.where(F.pmod(F.xxhash64("conv_id"), F.lit(3)) == i)
        part.coalesce(1).write.mode("overwrite").parquet(f"{base}/tmp{i}")
    os.makedirs(f"{base}/in", exist_ok=True)
    for i in range(3):
        for f in os.listdir(f"{base}/tmp{i}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{base}/tmp{i}/{f}", f"{base}/in/file{i}.parquet")

    ingest.stream_triples(spark, f"{base}/in", alias_dict, f"{base}/out", f"{base}/ckpt")
    got = {tuple(r) for r in spark.read.parquet(f"{base}/out").collect()}
    batch = {tuple(r) for r in kg.final_triples(transcripts, alias_dict).collect()}
    # whole conversations per file + one micro-batch drain → exact equality
    assert got == batch

    # exactly-once: rerun with the same checkpoint adds nothing
    ingest.stream_triples(spark, f"{base}/in", alias_dict, f"{base}/out", f"{base}/ckpt")
    got2 = {tuple(r) for r in spark.read.parquet(f"{base}/out").collect()}
    assert got2 == got
