"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, decoded in Arrow-batched ``mapInPandas`` kernels.

Image and audio decode are REAL, dependency-free stdlib codecs — 24-bit
uncompressed BMP (hand-parsed headers, row padding, bottom-up BGR order) and
16-bit PCM mono WAV (RIFF chunk walk).  The synthetic payloads are real
encoded files generated from closed-form integer formulas, so the expected
features are SQL-expressible and the whole decode path is oracle-checked
differentially (``multimodal_features``): a bug in header math, padding, or
sample parsing breaks the equality.  Video *content* decode stays honestly
stubbed (``NotImplementedError`` — no video codec is dependency-free), but
the Spark-side plumbing (pruned scan → bounded Arrow batches → typed schema,
frame-timestamp explode) is real and tested.

Reference analog: binary payload handling ``MongoWriter.cs:209-211``; the
Transform stage shape ``PipeFlow.cs:196-216``.

Batch shape: decode stages set ``spark.sql.execution.arrow.maxRecordsPerBatch``
small (media rows are MBs in production) — see :func:`decode_conf`.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
    ]
)


# conf recommended while a decode stage is in the plan
def decode_conf() -> dict[str, str]:
    return {"spark.sql.execution.arrow.maxRecordsPerBatch": "64"}


# -- real stdlib codecs -------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte order, rows bottom-up and
    zero-padded to 4-byte boundaries — the on-disk format, not a fake)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit BI_RGB BMP back to ``(h, w, 3)`` uint8 RGB.  Raises on
    anything but the uncompressed 24-bit form (this is a kernel, not a
    library)."""
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(payload, dtype=np.uint8, count=row_bytes, offset=off + i * stride)
        out[h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # bottom-up, BGR → RGB
    return out


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode an int16 array as 16-bit PCM mono WAV via the stdlib ``wave``
    module (independent of :func:`decode_wav`'s hand parser, so an encode bug
    can't cancel a decode bug)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Hand-parse a RIFF/WAVE payload: walk chunks to ``fmt `` and ``data``,
    return (int16 samples, sample rate).  PCM mono 16-bit only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate, _bps, _align, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt}, ch={channels}, bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return data, rate


def decode_video_stub(payload: bytes) -> np.ndarray:
    """Video content decode needs a real codec (ffmpeg/pyav — not in this
    container); only the metadata/frame-timestamp plumbing is implemented."""
    raise NotImplementedError("video frame decode requires ffmpeg/pyav (not installed)")


# -- deterministic synthesis (closed-form ⇒ SQL-expressible oracle) ----------

AUDIO_RATE = 8000


def _image_dims(i: int) -> tuple[int, int]:
    # width deliberately NOT a multiple of 4/3 so BMP row padding is exercised
    return 17 + (i % 4) * 8, 16 + (i % 5) * 4


def _audio_len(i: int) -> int:
    return 800 * (1 + (i % 7))


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded payloads.

    * image ``i`` (i%3==0): BMP of ``_image_dims(i)``, flat pixel ``k`` (RGB
      row-major) = ``(i*7 + k*13) % 256``;
    * audio ``i`` (i%3==1): WAV of ``_audio_len(i)`` samples at 8 kHz, sample
      ``j`` = ``(i*11 + j*17) % 2048 - 1024``;
    * video ``i`` (i%3==2): opaque seeded bytes (no dependency-free codec) —
      metadata-only, content decode stubbed.

    The integer formulas make every decoded feature reproducible in ANSI SQL
    (``generate_series`` twins) — the oracle for ``multimodal_features``.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = _image_dims(i)
            k = np.arange(h * w * 3, dtype=np.int64)
            pixels = ((i * 7 + k * 13) % 256).astype(np.uint8).reshape(h, w, 3)
            rows.append((i, kind, "image/bmp", w, h, None, encode_bmp(pixels)))
        elif kind == "audio":
            nsamp = _audio_len(i)
            j = np.arange(nsamp, dtype=np.int64)
            samples = ((i * 11 + j * 17) % 2048 - 1024).astype(np.int16)
            dur = nsamp * 1000 // AUDIO_RATE
            rows.append((i, kind, "audio/wav", None, None, dur, encode_wav(samples, AUDIO_RATE)))
        else:
            payload = rng.integers(0, 256, size=256 + (i % 5) * 128, dtype=np.uint8).tobytes()
            rows.append((i, kind, "video/mp4", None, None, 1000 * (1 + i % 30), payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    "n_samples int, duration_ms int, mean_feature double"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (iterator of Arrow
    batches): real BMP/WAV parsing per row, vectorized numpy feature math,
    typed output schema.  Video rows pass through metadata-only (content
    decode stubbed).  Column pruning happens BEFORE the Python stage so the
    scan ships only what the kernel reads."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf.media_id,
                "kind": pdf.kind,
                "n_bytes": pd.array([len(p) for p in pdf.payload], dtype="Int32"),
                "width": [],
                "height": [],
                "n_samples": [],
                "duration_ms": [],
                "mean_feature": [],
            }
            for kind, payload in zip(pdf.kind, pdf.payload):
                w = h = ns = dur = mean = None
                if kind == "image":
                    px = decode_bmp(bytes(payload))
                    h, w = px.shape[0], px.shape[1]
                    mean = float(px.astype(np.float64).mean())
                elif kind == "audio":
                    samples, rate = decode_wav(bytes(payload))
                    ns = len(samples)
                    dur = ns * 1000 // rate
                    mean = float(np.abs(samples.astype(np.float64)).mean())
                out["width"].append(w)
                out["height"].append(h)
                out["n_samples"].append(ns)
                out["duration_ms"].append(dur)
                out["mean_feature"].append(mean)
            for c in ("width", "height", "n_samples", "duration_ms"):
                out[c] = pd.array(out[c], dtype="Int32")
            yield pd.DataFrame(out)

    from ..session import ensure_shipped

    ensure_shipped(media.sparkSession)
    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame ts.
    Frame *content* decode is stubbed (:func:`decode_video_stub`); the explode
    of frame timestamps is the real Spark-side shape (1→N via
    sequence/explode, JVM-side)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
