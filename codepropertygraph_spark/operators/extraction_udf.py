"""Pandas-UDF variant of the extraction frontend (the north-star's
"vectorized Arrow/pandas-UDF mention-detection + triple-extraction pass per
conversation partition").

Semantically identical to :mod:`extraction` (the test suite asserts equal
rows); use this shape when the per-turn grammar needs a real recursive
parser that SQL expressions can't express — the analog of the reference's
915-line AST visitor (``fuzzyc2cpg/.../astcreation/AstCreator.scala``)
running inside a per-file parallel pass (``AstCreationPass.scala:14-38``).

Two shapes are provided:

- ``raw_triples_map_in_arrow`` — ``mapInPandas`` over whatever partitions the
  input already has: ZERO shuffle (each batch is parsed independently; turn-
  local extraction needs no grouping). Preferred at scale.
- ``raw_triples_grouped`` — ``applyInPandas`` grouped by conversation: one
  group per conversation, required only when extraction is *conversation*-
  local rather than turn-local (cross-turn state). Costs one shuffle; skew
  from mega-conversations is the salting case (SURVEY.md §4.2).

The alias dictionary is NOT shipped into these UDFs — linking stays a
broadcast join outside, keeping the Python surface minimal.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import schema as S

RAW_TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("subj_surface", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_surface", T.StringType(), False),
    ]
)

_PREDS = frozenset(S.TEXT_PREDICATES)


def _parse_batch(pdf):
    """Vectorized-ish clause parse of one pandas batch (this is where a real
    recursive parser would run, batch-at-a-time over Arrow data)."""
    import pandas as pd

    out = {k: [] for k in ("conv_id", "turn_idx", "ts", "pos", "subj_surface", "pred", "obj_surface")}
    for conv_id, turn_idx, ts, text in zip(
        pdf["conv_id"], pdf["turn_idx"], pdf["ts"], pdf["text"]
    ):
        toks = text.split(" ")
        for i in range(1, len(toks) - 1):
            if toks[i] in _PREDS:
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(turn_idx)
                out["ts"].append(ts)
                out["pos"].append(i + 1)  # 1-based, matching the JVM path
                out["subj_surface"].append(toks[i - 1])
                out["pred"].append(toks[i])
                out["obj_surface"].append(toks[i + 1])
    return pd.DataFrame(out).astype(
        {"turn_idx": "int32", "pos": "int32"}, errors="ignore"
    )


def raw_triples_map_in_arrow(transcripts: DataFrame) -> DataFrame:
    """mapInPandas extractor: no shuffle, batches flow through Arrow."""

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _parse_batch(pdf)

    return transcripts.select("conv_id", "turn_idx", "ts", "text").mapInPandas(
        gen, schema=RAW_TRIPLES_SCHEMA
    )


def raw_triples_grouped(transcripts: DataFrame) -> DataFrame:
    """applyInPandas extractor grouped by conversation (one shuffle); the
    shape for conversation-local parsers that carry cross-turn state."""

    def per_conv(pdf):
        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
        return _parse_batch(pdf)

    return (
        transcripts.select("conv_id", "turn_idx", "ts", "text")
        .groupBy("conv_id")
        .applyInPandas(per_conv, schema=RAW_TRIPLES_SCHEMA)
    )
