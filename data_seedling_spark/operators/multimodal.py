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


# ---------------------------------------------------------------------------
# Real decode path: BMP (the one raster codec that needs no library —
# a fixed 54-byte header + raw padded BGR rows). jpeg/png/video stay
# behind decoder= seams until their libs exist in the runtime.
# ---------------------------------------------------------------------------

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def encode_bmp(img) -> bytes:
    """uint8 RGB (H, W, 3) array → 24-bit uncompressed BMP bytes
    (bottom-up rows, BGR order, rows padded to 4 bytes)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    rows = [bgr[y].tobytes() + pad for y in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp_pixels(data: bytes):
    """24-bit uncompressed BMP bytes → uint8 RGB (H, W, 3) array —
    the pixel-level inverse of :func:`encode_bmp`."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24 or h <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, h={h})")
    row_size = (w * 3 + 3) & ~3
    buf = np.frombuffer(data, np.uint8, row_size * h, offset).reshape(h, row_size)
    return buf[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # un-flip, BGR→RGB


def decode_bmp(data: bytes) -> dict:
    """24-bit uncompressed BMP bytes → dims + per-channel means
    (matching DECODED_IMAGE_SCHEMA, ``ok`` excluded)."""
    px = decode_bmp_pixels(data)
    h, w = px.shape[0], px.shape[1]
    return {
        "width": int(w),
        "height": int(h),
        "mean_r": float(px[..., 0].mean()),
        "mean_g": float(px[..., 1].mean()),
        "mean_b": float(px[..., 2].mean()),
    }


def resize_nearest(px, width: int, height: int):
    """Nearest-neighbor resize by integer index mapping:
    ``src = (dst * src_dim) // dst_dim`` — pure integer arithmetic, so
    any engine (and the SQL oracle) reproduces the exact pixel
    selection."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[ys][:, xs]


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    width: int = 4,
    height: int = 3,
    out_col: str = "resized",
) -> DataFrame:
    """REAL image resize over ``mapInPandas``: decode BMP → nearest-
    neighbor index resize → re-encode BMP into ``out_col``. Per-row
    error isolation (undecodable payloads yield NULL, never a failed
    batch). Same Arrow-batched plumbing as ``decode_images``; a
    Pillow/opencv resampler swaps in as a kernel change, not a plan
    change."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    )

    def run(batches):
        for pdf in batches:
            resized = []
            for b in pdf[payload_col]:
                if b is None:
                    resized.append(None)
                    continue
                try:
                    px = decode_bmp_pixels(bytes(b))
                    resized.append(encode_bmp(resize_nearest(px, width, height)))
                except Exception:
                    resized.append(None)
            pdf[out_col] = resized
            yield pdf

    return df.mapInPandas(run, out_schema)


def decode_images(
    df: DataFrame, payload_col: str = "payload", out_col: str = "decoded"
) -> DataFrame:
    """REAL image decode over ``mapInPandas``: BMP payloads decode to
    dims + channel means; anything else yields ``ok=False`` instead of
    failing the batch (per-row error isolation — one corrupt asset
    must not kill a 100 TB decode job). Same batched plumbing as
    ``decode_stub``, so swapping in Pillow for jpeg/png is a decoder
    change, not a plan change."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, DECODED_IMAGE_SCHEMA)]
    )

    def run(batches):
        for pdf in batches:
            decoded = []
            for b in pdf[payload_col]:
                if b is None:
                    decoded.append(None)
                    continue
                try:
                    d = decode_bmp(bytes(b))
                    d["ok"] = True
                except Exception:
                    d = {
                        "width": None, "height": None,
                        "mean_r": None, "mean_g": None, "mean_b": None,
                        "ok": False,
                    }
                decoded.append(d)
            pdf[out_col] = decoded
            yield pdf

    return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Real audio path: WAV/PCM16 (RIFF header + raw little-endian samples —
# the audio twin of the BMP codec: no library needed). mp3/flac/ogg
# stay behind the decoder seam until their libs exist in the runtime.
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("windows", T.ArrayType(
            T.StructType(
                [
                    T.StructField("window_idx", T.IntegerType()),
                    T.StructField("rms", T.DoubleType()),
                    T.StructField("peak", T.IntegerType()),
                ]
            )
        )),
        T.StructField("ok", T.BooleanType()),
    ]
)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM array → WAV bytes (44-byte RIFF header +
    little-endian samples)."""
    import struct

    import numpy as np

    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16,
        b"data", len(data),
    )
    return header + data


def decode_wav(data: bytes):
    """WAV bytes → (sample_rate, int16 numpy array). Only the
    PCM16-mono subset ``encode_wav`` emits; anything else raises (the
    caller isolates per row)."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt, channels, rate, bits = struct.unpack_from("<HHIxxxxxxH", data, 20)
    if (fmt, channels, bits) != (1, 1, 16):
        raise ValueError(f"unsupported WAV variant ({fmt}, {channels}ch, {bits}bit)")
    n = struct.unpack_from("<I", data, 40)[0]
    return rate, np.frombuffer(data, "<i2", n // 2, 44)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    window: int = 256,
    out_col: str = "audio",
) -> DataFrame:
    """REAL audio feature extraction over ``mapInPandas``: decode
    WAV/PCM16, then per fixed-size window emit RMS energy
    (``sqrt(mean(x²))`` in float64 — integer squares sum exactly, and
    IEEE sqrt is correctly rounded, so the doubles are engine-portable
    as-is; round at the QUERY edge with ``F.round``, not here: Python
    ``round`` is banker's, SQL round is half-up) and the absolute
    peak — the
    segmentation/energy pass an audio curation pipeline runs before
    VAD or transcription. Short final windows keep their true length
    in the mean. Per-row error isolation: ``ok=False`` rows, never
    failed batches."""

    def run(batches):
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                if b is None:
                    feats.append(None)
                    continue
                try:
                    rate, samples = decode_wav(bytes(b))
                    x = samples.astype(np.float64)
                    wins = []
                    for i in range(0, max(len(x), 1), window):
                        seg = x[i : i + window]
                        if len(seg) == 0:
                            break
                        wins.append(
                            {
                                "window_idx": i // window,
                                "rms": float(np.sqrt((seg * seg).mean())),
                                "peak": int(np.abs(samples[i : i + window]).max()),
                            }
                        )
                    feats.append(
                        {
                            "sample_rate": int(rate),
                            "n_samples": len(samples),
                            "duration_ms": int(len(samples) * 1000 // rate),
                            "windows": wins,
                            "ok": True,
                        }
                    )
                except Exception:
                    feats.append(
                        {
                            "sample_rate": None, "n_samples": None,
                            "duration_ms": None, "windows": None, "ok": False,
                        }
                    )
            pdf[out_col] = feats
            yield pdf

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, AUDIO_FEATURES_SCHEMA)]
    )
    return df.mapInPandas(run, out_schema)
