"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; transforms that need a real codec (decode, resize,
frame-sample) run as Arrow-batched ``mapInArrow`` stages. The codec itself
is STUBBED here (the sandbox has no image/audio libraries): ``decode_stub``
produces deterministic fake "decoded" metadata from the payload bytes, and
the real-codec seam is a single clearly-marked function. Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
    ]
)


def to_binary_payloads(documents: DataFrame) -> DataFrame:
    """Treat each document's text bytes as an opaque media payload:
    (doc_id, payload binary, media_type, n_bytes, header_hex). Pure JVM
    expressions — this is the ingest shape for real media too."""
    payload = F.encode("text", "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring(F.hex(payload), 1, 16).alias("header_hex"),
    )


def _decode_one(payload: bytes) -> tuple[int, int, int]:
    """THE CODEC SEAM. A real deployment replaces this body with PIL /
    ffmpeg / soundfile decoding. Here: deterministic fake dimensions derived
    from payload length and first bytes, so tests are stable offline."""
    n = len(payload)
    w = 16 + (payload[0] if n else 0) % 240
    h = 16 + (payload[-1] if n else 0) % 240
    frames = 1 + n % 7
    return w, h, frames


def decode_stub(payloads: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched ``mapInArrow`` decode: record batches in, decoded-
    metadata batches out. Binary payloads are read straight off the Arrow
    buffers as ``bytes`` — no pandas hop boxing every payload into an
    object Series just for Spark to convert it back to Arrow. The batch
    loop is the real production shape (vectorized transfer, per-batch
    library calls); only ``_decode_one`` is fake."""
    import hashlib

    def decode(batches: Iterator) -> Iterator:
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            pays = [p.as_py() for p in batch.column(1)]
            dims = [_decode_one(p) for p in pays]
            yield pa.record_batch(
                [
                    ids.cast(pa.int64()),
                    pa.array([len(p) for p in pays], type=pa.int64()),
                    pa.array([d[0] for d in dims], type=pa.int32()),
                    pa.array([d[1] for d in dims], type=pa.int32()),
                    pa.array([d[2] for d in dims], type=pa.int32()),
                    pa.array(
                        [hashlib.md5(p).hexdigest() for p in pays],
                        type=pa.string(),
                    ),
                ],
                names=[
                    "doc_id",
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "content_hash",
                ],
            )

    return payloads.select("doc_id", "payload").mapInArrow(
        decode, schema=DECODED_SCHEMA
    )


def resize_plan(decoded: DataFrame, max_w: int = 64, max_h: int = 64) -> DataFrame:
    """Aspect-preserving resize TARGETS from decoded dimensions — the
    metadata half of a resize stage, pure JVM arithmetic (the pixel work
    happens inside the codec seam at decode time in production; computing
    targets relationally first lets the planner skip no-op resizes).
    Output: (doc_id, width, height, out_w, out_h, scale_milli, noop)."""
    scale = F.least(
        F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height"), F.lit(1.0)
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
        F.round(scale * 1000).cast("long").alias("scale_milli"),
        (scale >= 1.0).alias("noop"),
    )


def feature_extract_stub(payloads: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction: (doc_id, feature array<float>). The
    embedding model is behind the same codec seam (deterministic bytes →
    pseudo-features here); the OUTPUT CONTRACT — an array<float> column — is
    exactly what the similarity/dedup operators consume, so extracted
    features flow straight into cosine_topk / embedding_near_dup_pairs."""
    import hashlib

    def extract(batches: Iterator) -> Iterator:
        import pyarrow as pa

        for batch in batches:
            feats = []
            for p in batch.column(1):
                h = hashlib.md5(p.as_py()).digest()
                feats.append([((h[i] / 255.0) * 2.0 - 1.0) for i in range(dim)])
            yield pa.record_batch(
                [
                    batch.column(0).cast(pa.int64()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=["doc_id", "feature"],
            )

    return payloads.select("doc_id", "payload").mapInArrow(
        extract, schema="doc_id long, feature array<float>"
    )


def frame_sample(decoded: DataFrame, every: int = 2) -> DataFrame:
    """(doc_id, frame_idx): deterministic frame sampling — every `every`-th
    frame index from the decoded n_frames. JVM-side explode, no Python."""
    return decoded.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, n_frames - 1, {every})")).alias("__f"),
    ).select("doc_id", F.col("__f").cast("long").alias("frame_idx"))
