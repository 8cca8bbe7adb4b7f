"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The engine treats images/audio/video as binary columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each python worker touches
one batch of payloads at a time (bounded memory, no driver collect).

BMP, PNG and WAV/PCM16 are REAL library-free codecs (fixed headers,
stdlib zlib for PNG's DEFLATE, numpy for filters/samples), decoded and
oracle-checked end-to-end. jpeg/mp3/video need external codecs
(Pillow/ffmpeg/torchaudio) that are NOT in this container, so they
stay behind ``decode_stub``'s deterministic fake — the Spark-side
plumbing (schema, batch shape, partitioning) is identical and tested;
swap ``_fake_decode`` for a real decoder to go live.
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
# Real decode path: BMP (fixed 54-byte header + raw padded BGR rows)
# and PNG (chunks + CRC32 + DEFLATE — stdlib zlib + numpy unfilter).
# jpeg/video stay behind decoder= seams until their libs exist in the
# runtime.
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


def decode_image(data: bytes) -> dict:
    """Image bytes (BMP or PNG, format-sniffed) → dims + per-channel
    means (matching DECODED_IMAGE_SCHEMA, ``ok`` excluded)."""
    px = decode_image_pixels(data)
    h, w = px.shape[0], px.shape[1]
    return {
        "width": int(w),
        "height": int(h),
        "mean_r": float(px[..., 0].mean()),
        "mean_g": float(px[..., 1].mean()),
        "mean_b": float(px[..., 2].mean()),
    }


def _png_filter_row(cur, prev, nch: int, f: int):
    """Apply PNG filter ``f`` to one scanline at ENCODE time. Unlike
    decoding, filtering is not a recurrence (predictors read original
    pixel values), so every filter vectorizes."""
    import numpy as np

    cur_i = cur.astype(np.int32)
    a = np.concatenate([np.zeros(nch, np.int32), cur_i[:-nch]])
    b = prev.astype(np.int32)
    c = np.concatenate([np.zeros(nch, np.int32), b[:-nch]])
    if f == 0:
        pred = np.zeros_like(cur_i)
    elif f == 1:  # Sub
        pred = a
    elif f == 2:  # Up
        pred = b
    elif f == 3:  # Average
        pred = (a + b) >> 1
    elif f == 4:  # Paeth
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    else:
        raise ValueError(f"bad PNG filter type {f}")
    return ((cur_i - pred) & 0xFF).astype(np.uint8)


def encode_png(img, filter_type: int = 0) -> bytes:
    """uint8 RGB (H, W, 3) array → PNG bytes (8-bit truecolor, one
    zlib-deflated IDAT). Library-free: PNG's container is chunks +
    CRC32 + DEFLATE, all stdlib. ``filter_type`` picks the scanline
    filter (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) — a real encoder
    chooses per row for compression; exposing it lets tests and
    oracle queries exercise every unfilter path in the decoder."""
    import struct
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, nch = img.shape
    prev = np.zeros(w * nch, np.uint8)
    lines = []
    for y in range(h):
        cur = img[y].reshape(-1)
        lines.append(
            bytes([filter_type])
            + _png_filter_row(cur, prev, nch, filter_type).tobytes()
        )
        prev = cur

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(data: bytes):
    """PNG bytes → uint8 RGB (H, W, 3) array. Real decoder, no
    imaging library: chunk walk → zlib inflate → per-scanline
    unfilter (all five filter types: None/Sub/Up/Average/Paeth).
    Supports 8-bit depth, color types gray(0)/RGB(2)/gray+alpha(4)/
    RGBA(6), non-interlaced; gray expands and alpha drops so every
    caller sees RGB. Up-filtered rows vectorize; Sub/Average/Paeth
    are sequential per scanline (their recurrence is inherently so)."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, "
            f"interlace={interlace})"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth
            cur = np.empty(stride, np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    return px


def decode_image_pixels(data: bytes):
    """Format-sniffing pixel decode: BMP and PNG are REAL library-free
    codecs; other magics raise (and the mapInPandas operators turn
    that into ok=False / NULL per row). jpeg/video stay behind the
    decoder seam until their libs exist in the runtime."""
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(data)
    raise ValueError("unrecognized image payload (supported: BMP, PNG)")


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
    """REAL image resize over ``mapInPandas``: decode (BMP or PNG,
    format-sniffed) → nearest-neighbor index resize → re-encode BMP
    into ``out_col``. Per-row error isolation (undecodable payloads
    yield NULL, never a failed batch). Same Arrow-batched plumbing as
    ``decode_images``; a Pillow/opencv resampler swaps in as a kernel
    change, not a plan change."""
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
                    px = decode_image_pixels(bytes(b))
                    resized.append(encode_bmp(resize_nearest(px, width, height)))
                except Exception:
                    resized.append(None)
            pdf[out_col] = resized
            yield pdf

    return df.mapInPandas(run, out_schema)


def decode_images(
    df: DataFrame, payload_col: str = "payload", out_col: str = "decoded"
) -> DataFrame:
    """REAL image decode over ``mapInPandas``: BMP and PNG payloads
    (format-sniffed) decode to dims + channel means; anything else
    yields ``ok=False`` instead of failing the batch (per-row error
    isolation — one corrupt asset must not kill a 100 TB decode job).
    Same batched plumbing as ``decode_stub``, so swapping in Pillow
    for jpeg swaps a decoder, not a plan."""
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
                    d = decode_image(bytes(b))
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
