"""Multimodal-column plumbing (EXT): opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas``.

Decoders for COMPRESSED formats (PIL / ffmpeg / soundfile) are NOT in
this container, so the decode step is split:

* :func:`decode_image` / :func:`decode_audio` — the production entry
  points; dependency-free formats decode for REAL (16-bit PCM WAV via
  stdlib ``wave``, binary PPM via numpy — round-4), compressed formats
  raise a clearly-gated :class:`NotImplementedError`;
* :func:`fake_decode_stats` / :func:`fake_frame_sample` — deterministic
  stand-ins computing the same *shapes* (per-item metadata row, 1→N frame
  fan-out) from the real bytes, so the Spark-side plumbing — schema,
  Arrow batch transfer, partition-parallel mapInPandas, fan-out row
  counts — is fully real and oracle-tested.

Scale notes: mapInPandas streams Arrow record batches per partition — no
driver collect, memory bounded by spark.sql.execution.arrow.maxRecordsPerBatch;
binary payloads stay off the driver entirely. At 100 TB, payload columns
should live in their own parquet column chunk (they do: one column) so
metadata-only queries never read the bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: metadata row produced per media item
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("header", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)

FRAME_SIZE = 256
MAX_FRAMES = 5


def decode_image(payload: bytes) -> dict:
    """Decode an image payload to pixels + metadata.

    Binary PPM (P6) decodes for REAL (pure numpy — :func:`decode_ppm`);
    compressed formats (JPEG/PNG) need PIL/cv2, which are not in this
    container, and raise with a clear gate.
    """
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    raise NotImplementedError(
        "JPEG decoding requires PIL/cv2 (not in this env); P6 PPM, "
        "uncompressed 24-bit BMP and non-interlaced 8-bit RGB PNG "
        "decode natively"
    )


def decode_audio(payload: bytes) -> dict:
    """Decode an audio payload to samples + metadata.

    RIFF/WAVE (16-bit PCM) decodes for REAL (stdlib ``wave`` + numpy —
    :func:`decode_wav`); compressed codecs (MP3/OGG/FLAC) need
    soundfile/ffmpeg and raise with a clear gate."""
    if payload.startswith(b"RIFF"):
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed audio requires soundfile/ffmpeg (not in this env); WAV decodes natively"
    )


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text —
    deterministic stand-in for image/audio blobs)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def fake_decode_stats(df: DataFrame) -> DataFrame:
    """Per-item 'decode': payload → metadata row, via Arrow-batched
    mapInPandas (the exact plumbing a real decoder UDF would use)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len)
            header = n % 251
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "header": header,
                    "width": 64 + n % 193,
                    "height": 64 + (n * 7 + header) % 129,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, DECODE_SCHEMA)


def fake_frame_sample(df: DataFrame) -> DataFrame:
    """1→N frame sampling: each payload explodes into ≤MAX_FRAMES frame
    rows (offset/length bookkeeping computed from the real bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list[int]] = {k: [] for k in ("doc_id", "frame_idx", "frame_offset", "frame_bytes")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = min(MAX_FRAMES, 1 + n // FRAME_SIZE)
                for i in range(n_frames):
                    off = i * FRAME_SIZE
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(min(FRAME_SIZE, n - off))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


RESIZE_TARGET = 512

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("in_bytes", LongType()),
        StructField("stride", LongType()),
        StructField("out_bytes", LongType()),
    ]
)

FEATURE_DIM = 8


def fake_resize(df: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Binary→binary 'resize': stride-downsample each payload to ≤ target
    bytes (stand-in for image resize / audio downsample), returning the
    bookkeeping row. The resized bytes themselves are computed (and
    byte-checked in unit tests against a Python reference) but only the
    metadata is emitted — at scale the payload goes to a payload sink,
    not the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list[int]] = {k: [] for k in ("doc_id", "in_bytes", "stride", "out_bytes")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                stride = max(1, -(-n // target))  # ceil(n/target)
                resized = payload[::stride]
                out["doc_id"].append(doc_id)
                out["in_bytes"].append(n)
                out["stride"].append(stride)
                out["out_bytes"].append(len(resized))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


def fake_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Content-dependent feature extraction: payload → dim-float vector.

    Each dimension is an md5-derived 60-bit hash of (salt_j + payload),
    scaled to [0, 1) — a deterministic stand-in for a vision/audio
    encoder whose output the DuckDB oracle can recompute EXACTLY from
    the text twin of the payload (``functions/texthash.duck_hash60``),
    unlike a real model. Emitted as one column per dimension (f0..f{n})
    so the cross-engine value hash covers every component."""
    import hashlib

    schema = StructType(
        [StructField("doc_id", LongType())]
        + [StructField(f"f{j}", DoubleType()) for j in range(dim)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {"doc_id": list(pdf["doc_id"])}
            for j in range(dim):
                salt = f"feat{j}:".encode()
                cols[f"f{j}"] = [
                    (int(hashlib.md5(salt + p).hexdigest()[:15], 16) % 10_000) / 10_000.0
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(cols)

    return df.select("doc_id", "payload").mapInPandas(batches, schema)


def phash_dedup(feats: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Perceptual-hash near-dup detection over extracted media features
    (the image/audio analog of text minhash dedup).

    Classic pHash discipline: bit_j set iff feature_j exceeds the item's
    OWN feature mean — brightness/scale shifts that move all features
    together leave the bit pattern unchanged. Items sharing the dim-bit
    hash are duplicate candidates; the bucket count is emitted per item
    (a real pipeline would byte-verify within buckets, same
    candidates-then-verify shape as every dedup operator here).

    Pure column arithmetic over the feature columns (codegen): the mean
    is a fixed left-to-right sum so the DuckDB oracle's fold matches
    bit-for-bit; the only shuffle is the bucket-count window on the
    dim-bit key. At 100 TB: one scan + one narrow shuffle of
    (doc_id, phash).
    """
    from pyspark.sql.window import Window

    m = F.col("f0")
    for j in range(1, dim):
        m = m + F.col(f"f{j}")
    m = m / float(dim)
    phash = None
    for j in range(dim):
        bit = (F.col(f"f{j}") > m).cast("long") * (1 << j)
        phash = bit if phash is None else phash + bit
    w = Window.partitionBy("phash")
    return (
        feats.withColumn("phash", phash)
        .withColumn("n_same_hash", F.count("*").over(w))
        .select(
            "doc_id",
            F.col("phash").cast("long").alias("phash"),
            F.col("n_same_hash").cast("long").alias("n_same_hash"),
            (F.col("n_same_hash") > 1).cast("int").alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# round-4: REAL decoders for dependency-free formats (WAV via stdlib
# `wave`, binary PPM via numpy). The NotImplementedError stubs above
# remain only for formats that genuinely need external libs (JPEG/PNG/MP3).
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)

IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode for RIFF/WAVE payloads — stdlib ``wave`` parses
    the container, numpy folds the PCM samples. No external deps; raises
    ``wave.Error`` on non-WAV bytes (compressed formats stay behind
    :func:`decode_audio`'s documented gate)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width != 2:
        raise NotImplementedError("only 16-bit PCM is decoded here")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    rms = float(np.sqrt(np.mean(samples * samples))) if len(samples) else 0.0
    return {
        "sample_rate": sr,
        "n_channels": nch,
        "n_samples": n,
        "duration_s": n / sr if sr else 0.0,
        "rms": rms,
    }


def decode_ppm(payload: bytes) -> dict:
    """REAL image decode for binary PPM (P6) payloads — pure numpy.
    Header: ``P6 <w> <h> <maxval>\\n`` then w*h*3 raw bytes."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary PPM (P6) is decoded here")
    # header tokens may be separated by any whitespace; comments (#) are
    # legal in PPM but our encoder never writes them
    parts = payload.split(maxsplit=4)
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    pixel_bytes = payload[-(w * h * 3):]
    px = np.frombuffer(pixel_bytes, dtype=np.uint8).astype(np.float64)
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "mean_pixel": float(px.mean()) if len(px) else 0.0,
    }


def audio_decode_stats(df: DataFrame) -> DataFrame:
    """WAV payloads → per-item audio metadata via Arrow mapInPandas —
    the REAL decode path (container parse + PCM fold), not a stand-in."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_wav(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": m["sample_rate"],
                        "n_channels": m["n_channels"],
                        "n_samples": m["n_samples"],
                        "duration_s": round(m["duration_s"], 6),
                        "rms": round(m["rms"], 6),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, AUDIO_SCHEMA)


def image_decode_stats(df: DataFrame) -> DataFrame:
    """PPM payloads → per-item image metadata (real header+pixel parse)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_ppm(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": m["width"],
                        "height": m["height"],
                        "n_pixels": m["n_pixels"],
                        "mean_pixel": round(m["mean_pixel"], 6),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, IMAGE_SCHEMA)


def synth_wav_payloads(df: DataFrame) -> DataFrame:
    """Encode a REAL 16-bit mono WAV per doc — ``wave`` writes the RIFF
    container, samples are a doc_id-derived square wave (amplitude
    a = 1000 + (doc_id%10)*500, so RMS == a exactly and the DuckDB
    oracle can predict every decoded stat in closed form)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 800 + int(doc_id) % 7 * 160
                a = 1000 + int(doc_id) % 10 * 500
                samples = np.empty(n, dtype="<i2")
                samples[0::2] = a
                samples[1::2] = -a
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)


def synth_ppm_payloads(df: DataFrame) -> DataFrame:
    """Encode a REAL binary-PPM (P6) image per doc — constant pixel value
    v = doc_id % 256 over a (4+doc_id%5) x (3+doc_id%4) canvas, so the
    decoded mean_pixel is exactly v."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 4 + int(doc_id) % 5
                h = 3 + int(doc_id) % 4
                v = int(doc_id) % 256
                header = f"P6 {w} {h} 255\n".encode()
                payloads.append(header + bytes([v]) * (w * h * 3))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode for uncompressed 24-bit BMP — the container the
    PPM decoder can't stand in for: little-endian struct header at fixed
    offsets, rows padded to 4-byte boundaries, and BOTTOM-UP row storage
    (positive height means the first stored row is the image's bottom).
    Pure stdlib struct + numpy; compressed/paletted BMPs raise."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise NotImplementedError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is decoded here")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    stride = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    # Header fields are untrusted input: reject dimensions that would
    # produce empty/ragged rows or drive an unbounded loop, and demand
    # the full advertised pixel region be present (a truncated payload
    # must be an error, never silently-short rows and wrong stats).
    if w <= 0 or h_signed == 0:
        raise ValueError(f"malformed BMP header: width={w} height={h_signed}")
    # data_off is unpacked unsigned so it can't be negative, but it CAN
    # point back inside the 54-byte header — reject that rather than
    # silently decoding header bytes as pixels
    if data_off < 54:
        raise ValueError(f"malformed BMP header: data_off={data_off} < 54")
    if data_off + h * stride > len(payload):
        raise ValueError(
            f"truncated BMP: header promises {data_off + h * stride} bytes, "
            f"payload has {len(payload)}"
        )
    rows = []
    for r in range(h):
        start = data_off + r * stride
        rows.append(
            np.frombuffer(payload[start : start + w * 3], dtype=np.uint8)
        )
    if bottom_up:
        rows.reverse()  # storage order bottom→top; present top→bottom
    px = np.concatenate(rows).astype(np.float64) if rows else np.empty(0)
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "mean_pixel": float(px.mean()) if len(px) else 0.0,
        "top_left": float(rows[0][0]) if rows else 0.0,
        "bottom_left": float(rows[-1][0]) if rows else 0.0,
    }


BMP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
        StructField("top_left", DoubleType()),
        StructField("bottom_left", DoubleType()),
    ]
)


def bmp_decode_stats(df: DataFrame) -> DataFrame:
    """BMP payloads → per-item metadata incl. row-order witnesses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_bmp(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": m["width"],
                        "height": m["height"],
                        "n_pixels": m["n_pixels"],
                        "mean_pixel": round(m["mean_pixel"], 6),
                        "top_left": round(m["top_left"], 6),
                        "bottom_left": round(m["bottom_left"], 6),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, BMP_SCHEMA)


def synth_bmp_payloads(df: DataFrame) -> DataFrame:
    """Encode a REAL uncompressed 24-bit BMP per doc, written BOTTOM-UP
    with genuine row padding. Image row r (top = 0) is uniformly
    v + r with v = doc_id % 200 and h ≤ 5, so no uint8 wrap — the
    decoded stats are closed-form (mean = v + (h-1)/2, top_left = v,
    bottom_left = v + h - 1) and any decoder that ignores padding or
    row order produces different values, not just a different mean."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 3 + int(doc_id) % 5  # w*3 rarely a multiple of 4 → real padding
                h = 2 + int(doc_id) % 4
                v = int(doc_id) % 200
                stride = (w * 3 + 3) // 4 * 4
                data_off = 14 + 40
                size = data_off + stride * h
                hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
                info = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
                )
                body = bytearray()
                for r in range(h - 1, -1, -1):  # bottom-up storage order
                    row = bytes([(v + r) & 0xFF]) * (w * 3)
                    body += row + b"\x00" * (stride - w * 3)
                payloads.append(hdr + info + bytes(body))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)


# --------------------------------------------------------------------------
# PNG (round 6) — the first COMPRESSED container to decode for real:
# chunked layout with CRC32 integrity, a DEFLATE-compressed pixel stream
# (stdlib zlib), and per-row predictive filters that must be reversed
# sequentially. Non-interlaced 8-bit RGB (color type 2) only; palette /
# alpha / 16-bit / Adam7 raise the documented NotImplementedError gate.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: list[list[int]], w: int, h: int) -> bytes:
    """Encode 8-bit RGB rows (top-down, each row w*3 ints) as a REAL
    non-interlaced PNG. Filter type CYCLES r % 5 per row, so every
    decoder of this stream must implement all five reversals (None /
    Sub / Up / Average / Paeth) — a decoder that only handles filter 0
    gets wrong VALUES, not a parse error. The zlib stream is split
    across two IDAT chunks when long enough, exercising the spec rule
    that IDAT data concatenates across chunks."""
    import struct
    import zlib

    bpp = 3
    raw_prev = bytes(w * bpp)
    out = bytearray()
    for r in range(h):
        raw = bytes(pixels[r])
        f = r % 5
        line = bytearray([f])
        for i in range(w * bpp):
            x = raw[i]
            a = raw[i - bpp] if i >= bpp else 0
            b = raw_prev[i]
            c = raw_prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - (a + b) // 2
            else:
                v = x - _paeth(a, b, c)
            line.append(v & 0xFF)
        out += line
        raw_prev = raw
    z = zlib.compress(bytes(out), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idats = (
        [_png_chunk(b"IDAT", z[:10]), _png_chunk(b"IDAT", z[10:])]
        if len(z) > 10
        else [_png_chunk(b"IDAT", z)]
    )
    return b"".join(
        [_PNG_SIG, _png_chunk(b"IHDR", ihdr), *idats, _png_chunk(b"IEND", b"")]
    )


def decode_png(payload: bytes) -> dict:
    """REAL compressed-image decode: parse the chunk stream (verifying
    each CRC32 — chunk corruption is an error, never silent garbage
    pixels), inflate the concatenated IDAT data with stdlib zlib, and
    reverse the per-row filter chain. Header fields are untrusted:
    zero/negative dims, short/long inflated streams, unknown filter
    bytes and bad CRCs all raise ValueError; interlaced / non-RGB /
    non-8-bit images raise the documented NotImplementedError gate."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise NotImplementedError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header past end of payload")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG: chunk data past end of payload")
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG: chunk CRC past end of payload")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not seen_iend:
        raise ValueError("malformed PNG: missing IHDR or IEND")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype_n != 2:
        raise NotImplementedError("only 8-bit RGB (color type 2) PNG is decoded here")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing is not decoded here")
    if comp != 0 or filt != 0:
        raise ValueError(f"malformed PNG header: compression={comp} filter={filt}")
    if w <= 0 or h <= 0 or w > 1 << 24 or h > 1 << 24:
        raise ValueError(f"malformed PNG header: width={w} height={h}")
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    bpp = 3
    stride = w * bpp
    if len(inflated) != h * (1 + stride):
        raise ValueError(
            f"truncated PNG: header promises {h * (1 + stride)} filtered "
            f"bytes, IDAT inflates to {len(inflated)}"
        )
    rows: list[bytes] = []
    prev = bytes(stride)
    filters_used: set[int] = set()
    for r in range(h):
        base = r * (1 + stride)
        f = inflated[base]
        filters_used.add(f)
        line = inflated[base + 1 : base + 1 + stride]
        if f == 0:
            raw = bytes(line)
        elif f == 2:
            raw = bytes((x + b) & 0xFF for x, b in zip(line, prev))
        else:
            buf = bytearray(stride)
            for i in range(stride):
                a = buf[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    buf[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    buf[i] = (line[i] + (a + b) // 2) & 0xFF
                elif f == 4:
                    buf[i] = (line[i] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"malformed PNG: unknown filter type {f}")
            raw = bytes(buf)
        rows.append(raw)
        prev = raw
    px = np.frombuffer(b"".join(rows), dtype=np.uint8).astype(np.float64)
    return {
        "width": int(w),
        "height": int(h),
        "n_pixels": int(w * h),
        "mean_pixel": float(px.mean()) if len(px) else 0.0,
        "top_left": float(rows[0][0]) if rows else 0.0,
        "bottom_left": float(rows[-1][0]) if rows else 0.0,
        "n_filters_used": len(filters_used),
    }


PNG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
        StructField("top_left", DoubleType()),
        StructField("bottom_left", DoubleType()),
        StructField("n_filters_used", LongType()),
    ]
)


def png_decode_stats(df: DataFrame) -> DataFrame:
    """PNG payloads → per-item metadata incl. row-order + filter-mix
    witnesses (same Arrow mapInPandas plumbing as WAV/PPM/BMP)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_png(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": m["width"],
                        "height": m["height"],
                        "n_pixels": m["n_pixels"],
                        "mean_pixel": round(m["mean_pixel"], 6),
                        "top_left": round(m["top_left"], 6),
                        "bottom_left": round(m["bottom_left"], 6),
                        "n_filters_used": m["n_filters_used"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, PNG_SCHEMA)


def synth_png_payloads(df: DataFrame) -> DataFrame:
    """Encode a REAL compressed PNG per doc. Image row r (top = 0) is
    uniformly v + r with v = doc_id % 200 and h ≤ 5 (no uint8 wrap), on
    a (3+doc_id%5) x (2+doc_id%4) canvas — decoded stats are closed-form
    (mean = v + (h-1)/2, top_left = v, bottom_left = v + h - 1) and the
    encoder cycles the row filter r % 5, so n_filters_used == h is a
    witness that the filter bytes were genuinely parsed and all h
    distinct reversals ran."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 3 + int(doc_id) % 5
                h = 2 + int(doc_id) % 4
                v = int(doc_id) % 200
                pixels = [[(v + r) & 0xFF] * (w * 3) for r in range(h)]
                payloads.append(encode_png(pixels, w, h))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)
