"""Structured-Streaming ingestion of new transcript partitions.

The pass/overlay model is naturally incremental (SURVEY.md §2.F): a new
batch of transcripts is just more DiffGraph rows, so streaming ingestion
reuses the *identical* batch stage functions under ``foreachBatch``. The
reference has no streaming at all — this is the Spark-native extension the
overlay architecture makes free.

``stream_triples`` wires: file-source ``readStream`` over a transcripts
directory → per-micro-batch extract→link→merge (the same
``kg.clause_triples`` / ``follows`` code) → append to an output directory,
with checkpointing for exactly-once file-sink semantics. ``follows`` edges
are computed *within* each micro-batch (cross-batch adjacency would need
``applyInPandasWithState``; out of parity scope, noted not invented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema as S
from ..operators import canonicalize, kg


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    alias_dict: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start (and with trigger_once=True, run to completion) a streaming
    query that turns arriving transcript parquet files into triples."""
    merge = canonicalize.merge_map(alias_dict).localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(S.TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = (
            kg.clause_triples(batch_df, alias_dict, merge)
            .unionByName(kg.follows_triples(batch_df, alias_dict, merge))
            .dropDuplicates(["conv_id", "subj", "pred", "obj"])
        )
        triples.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
