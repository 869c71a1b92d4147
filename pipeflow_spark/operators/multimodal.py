"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, decoded in Arrow-batched ``mapInPandas`` kernels.

All three decode kernels are REAL, dependency-free stdlib codecs — 24-bit
uncompressed BMP (hand-parsed headers, row padding, bottom-up BGR order),
16-bit PCM mono WAV (RIFF chunk walk), and uncompressed RGB24 AVI (RIFF
``hdrl``/``movi`` walk, one raw DIB per ``00db`` chunk — the on-disk format
any media player accepts, not an invented container).  The synthetic
payloads are real encoded files generated from closed-form integer formulas,
so the expected features are SQL-expressible and the whole decode path is
oracle-checked differentially (``multimodal_features``,
``multimodal_frame_sample``): a bug in header math, padding, chunk walking,
or sample parsing breaks the equality.

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


def _dib_body(pixels: np.ndarray) -> bytes:
    """Raw 24-bit DIB bits for an ``(h, w, 3)`` uint8 RGB array: BGR byte
    order, rows bottom-up and zero-padded to 4-byte boundaries — the shared
    pixel layout of BMP files and uncompressed-AVI ``00db`` frames."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    pad = (4 - (w * 3) % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    return bytes(body)


def _parse_dib(buf: bytes, w: int, h: int, offset: int = 0) -> np.ndarray:
    """Inverse of :func:`_dib_body`: bottom-up padded BGR bits → RGB array."""
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(buf, dtype=np.uint8, count=row_bytes, offset=offset + i * stride)
        out[h - 1 - i] = row.reshape(w, 3)[:, ::-1]
    return out


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte order, rows bottom-up and
    zero-padded to 4-byte boundaries — the on-disk format, not a fake)."""
    h, w, _c = pixels.shape
    body = _dib_body(pixels)
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


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
    return _parse_dib(payload, w, h, offset=off)


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


AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


def encode_avi(frames: np.ndarray, fps: int = 4) -> bytes:
    """Encode an ``(n, h, w, 3)`` uint8 RGB array as an uncompressed RGB24
    AVI: RIFF('AVI ') → LIST('hdrl'){avih, LIST('strl'){strh, strf}} →
    LIST('movi'){'00db' raw DIB per frame} → 'idx1'.  Every header field is
    the documented MainAVIHeader / AVIStreamHeader / BITMAPINFOHEADER layout;
    the output opens in any AVI-capable player."""
    n, h, w, _c = frames.shape
    dibs = [_dib_body(f) for f in frames]
    fs = len(dibs[0])
    # stream header: 'vids'/'DIB ', scale 1 : rate fps, n frames
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, fs, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fs, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
    strl += b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, fs * fps, 0, AVIF_HASINDEX, n, 0, 1, fs, w, h, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl"
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih + strl
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for dib in dibs:
        idx += struct.pack("<4sIII", b"00db", AVIIF_KEYFRAME, len(movi_body), len(dib))
        movi_body += b"00db" + struct.pack("<I", len(dib)) + dib
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + bytes(idx)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Hand-parse an uncompressed RGB24 AVI: walk the RIFF tree to ``avih``
    (dims, frame count, frame interval) and the ``movi`` list's ``00db``
    chunks, DIB-decode each frame.  Returns ``(frames (n,h,w,3) RGB, fps)``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    pos, w = 12, None
    h = n = usec = None
    dibs: list[bytes] = []
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body_off = pos + 8
        if cid == b"LIST":
            ltype = payload[body_off : body_off + 4]
            if ltype == b"hdrl":
                # avih is the first chunk inside hdrl
                aid, alen = struct.unpack_from("<4sI", payload, body_off + 4)
                if aid != b"avih":
                    raise ValueError("malformed AVI: hdrl does not start with avih")
                fields = struct.unpack_from("<14I", payload, body_off + 12)
                usec, n, w, h = fields[0], fields[4], fields[8], fields[9]
            elif ltype == b"movi":
                mpos = body_off + 4
                end = body_off + clen
                while mpos + 8 <= end:
                    mid, mlen = struct.unpack_from("<4sI", payload, mpos)
                    if mid == b"00db":
                        dibs.append(payload[mpos + 8 : mpos + 8 + mlen])
                    mpos += 8 + mlen + (mlen % 2)
        pos += 8 + clen + (clen % 2)
    if w is None or not dibs or len(dibs) != n:
        raise ValueError("AVI missing hdrl/movi or frame count mismatch")
    frames = np.stack([_parse_dib(d, w, h) for d in dibs])
    return frames, round(1_000_000 / usec)


# -- deterministic synthesis (closed-form ⇒ SQL-expressible oracle) ----------

AUDIO_RATE = 8000
VIDEO_FPS = 4  # 250 ms per frame


def _image_dims(i: int) -> tuple[int, int]:
    # width deliberately NOT a multiple of 4/3 so BMP row padding is exercised
    return 17 + (i % 4) * 8, 16 + (i % 5) * 4


def _audio_len(i: int) -> int:
    return 800 * (1 + (i % 7))


def _video_dims(i: int) -> tuple[int, int, int]:
    """(width, height, n_frames); widths 18..22 make the DIB row padding
    cycle through 2/3/0/1/2 bytes, so every padding case is exercised
    (video ids are ≡2 mod 3, hence the modulus 5 — a multiple of 3 would
    collapse all videos onto one width)."""
    return 18 + (i % 5), 12 + (i % 4) * 4, 2 + (i % 9)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded payloads.

    * image ``i`` (i%3==0): BMP of ``_image_dims(i)``, flat pixel ``k`` (RGB
      row-major) = ``(i*7 + k*13) % 256``;
    * audio ``i`` (i%3==1): WAV of ``_audio_len(i)`` samples at 8 kHz, sample
      ``j`` = ``(i*11 + j*17) % 2048 - 1024``;
    * video ``i`` (i%3==2): uncompressed RGB24 AVI of ``_video_dims(i)`` at
      4 fps, frame ``f`` flat pixel ``k`` = ``(i*7 + f*31 + k*13) % 256``.

    The integer formulas make every decoded feature reproducible in ANSI SQL
    (``generate_series`` twins) — the oracles for ``multimodal_features`` and
    ``multimodal_frame_sample``.  ``seed`` is kept for API stability; the
    table is fully closed-form.
    """
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
            w, h, nf = _video_dims(i)
            f = np.arange(nf, dtype=np.int64)[:, None]
            k = np.arange(h * w * 3, dtype=np.int64)[None, :]
            frames = ((i * 7 + f * 31 + k * 13) % 256).astype(np.uint8).reshape(nf, h, w, 3)
            dur = nf * 1000 // VIDEO_FPS
            rows.append((i, kind, "video/avi", w, h, dur, encode_avi(frames, VIDEO_FPS)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    "n_samples int, duration_ms int, mean_feature double"
)
# n_samples = decoded unit count: PCM samples for audio, frames for video.


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (iterator of Arrow
    batches): real BMP/WAV/AVI parsing per row, vectorized numpy feature
    math, typed output schema.  Column pruning happens BEFORE the Python
    stage so the scan ships only what the kernel reads."""

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
                elif kind == "video":
                    frames, fps = decode_avi(bytes(payload))
                    ns, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
                    dur = ns * 1000 // fps
                    mean = float(frames.astype(np.float64).mean())
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


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_mean double"


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling with REAL content decode: parse the AVI once per
    row in a ``mapInPandas`` kernel, emit one output row per sampled frame
    (every ``every_ms`` of media time, frame 0 always included) with the
    frame's mean pixel value.  1→N fan-out happens inside the Arrow batch —
    the Spark-side shape is a pruned scan → vectorized flat-map, same as a
    production frame extractor in front of an image encoder."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, means = [], [], [], []
            for mid, payload in zip(pdf.media_id, pdf.payload):
                frames, fps = decode_avi(bytes(payload))
                step = max(1, round(every_ms * fps / 1000))
                for f in range(0, frames.shape[0], step):
                    ids.append(mid)
                    idxs.append(f)
                    tss.append(f * 1000 // fps)
                    means.append(float(frames[f].astype(np.float64).mean()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "frame_ts_ms": pd.array(tss, dtype="Int32"),
                    "frame_mean": pd.array(means, dtype="float64"),
                }
            )

    from ..session import ensure_shipped

    ensure_shipped(media.sparkSession)
    vids = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return vids.mapInPandas(op, schema=FRAME_SCHEMA)
