"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The engine treats images/audio/video as binary columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each python worker touches
one batch of payloads at a time (bounded memory, no driver collect).

The actual codecs (Pillow/ffmpeg/torchaudio) are NOT in this
container, so ``decode_stub`` produces a deterministic fake — the
Spark-side plumbing (schema, batch shape, partitioning) is real and
tested; swap ``_fake_decode`` for a real decoder to go live.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata contract for a binary payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, payload_col: str = "payload", mime: str = "text/plain"
) -> DataFrame:
    """Materialise a binary column + metadata struct from a source
    column (here: utf-8 text stands in for image bytes). All JVM-side."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.withColumn(payload_col, payload).withColumn(
        payload_col + "_meta",
        F.struct(
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.lit(mime).alias("mime"),
            F.sha2(payload, 256).alias("checksum"),
        ),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: dimensions derived
    from the byte length. Replace with e.g. PIL.Image.open for real
    media (not installed in this container)."""
    n = len(payload)
    return {"width": int(n % 640) + 1, "height": int(n % 480) + 1, "n_frames": 1, "ok": True}


def decode_stub(
    df: DataFrame, payload_col: str = "payload", out_col: str = "decoded", decoder=None
) -> DataFrame:
    """Batch 'decode' of binary payloads via mapInPandas. ``decoder``
    takes bytes → dict matching DECODED_SCHEMA; the default is the
    deterministic fake. Raises NotImplementedError for real media types
    when no decoder is supplied."""
    decoder = decoder or _fake_decode
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, DECODED_SCHEMA)])

    def run(batches):
        for pdf in batches:
            pdf[out_col] = [
                None if b is None else decoder(bytes(b)) for b in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample_stub(
    df: DataFrame, payload_col: str = "payload", every_n: int = 2
) -> DataFrame:
    """Frame-sampling plumbing demo: one output row per sampled frame
    (explode pattern). Real video decoding is NotImplemented in this
    container; the fake emits byte-offset 'frames'."""

    def sample(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                if payload is None:
                    continue
                for i in range(0, max(len(bytes(payload)) // 64, 1), every_n):
                    rows.append({"doc_id": row["doc_id"], "frame_idx": i})
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx"])

    return df.mapInPandas(sample, "doc_id long, frame_idx int")
