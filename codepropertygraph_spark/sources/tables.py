"""Source readers — the x2cpg SourceFiles analog.

The reference scans a source tree by extension set (``codepropertygraph/
.../x2cpg/SourceFiles.scala``); our sources are parquet tables: the
driver-provided star schema + events/documents/embeddings under an sf dir,
and the generated transcript corpus (``testdata.ensure_generated``). In
production these reads are Iceberg tables partitioned by hash(conv_id)
buckets / date with snapshot pinning; locally they are plain parquet reads —
the call sites are identical DataFrames either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import testdata as td

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in DRIVER_TABLES:
        raise ValueError(f"unknown table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Transcripts from JSON-lines logs — the append-only export format agent
    runtimes actually emit. Schema is IMPOSED (not inferred): inference would
    scan the data twice and produce run-dependent types; the declared schema
    also makes the read a single pushdown-friendly pass and keeps corrupt
    rows visible (columnNameOfCorruptRecord default: nulls). ts must be ISO
    or epoch-millis per Spark's timestamp parsing."""
    from .. import schema as S

    return spark.read.schema(S.TRANSCRIPTS_SCHEMA).json(path)


def write_transcripts_jsonl(df: DataFrame, path: str) -> None:
    """Round-trip writer (tests + interchange)."""
    df.write.mode("overwrite").json(path)


def read_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = td.ensure_generated(td.tier_of_sf_dir(sf_dir))
    return spark.read.parquet(f"{d}/transcripts.parquet")


def read_alias_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = td.ensure_generated(td.tier_of_sf_dir(sf_dir))
    return spark.read.parquet(f"{d}/alias_dict.parquet")
