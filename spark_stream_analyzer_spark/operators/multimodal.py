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


# --------------------------------------------------------------------------
# GIF (round 14) — the second REAL compressed container (r13 verdict
# task 4), exercising a compression class PNG's DEFLATE does not: GIF's
# variable-width LZW with an in-band growing dictionary, CLEAR-code
# resets, LSB-first bit packing, 255-byte sub-block framing, and the
# 4-pass interlace row permutation. Single-frame GIF87a/89a with a
# global color table only; animation / local color tables /
# transparency-composited frames raise the documented
# NotImplementedError gate (they need a frame compositor, not a codec).
# --------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")
#: 4-pass interlace schedule (GIF89a spec appendix E): (first row, step)
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(h: int) -> list[int]:
    """Storage order of image rows under the 4-pass interlace: the list
    of screen-row indices in the order their pixel data appears."""
    return [r for first, step in _GIF_INTERLACE_PASSES for r in range(first, h, step)]


class _BitWriter:
    """LSB-first bit packer (LZW codes fill bytes from the low bit)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_encode_rows(rows: list[bytes], mcs: int) -> bytes:
    """REAL GIF LZW over the row-ordered index stream, flushing with a
    CLEAR code at every row boundary — so a spec-correct decoder sees
    exactly ``len(rows)`` CLEAR codes (the initial one plus one per
    subsequent row): the dictionary-reset witness the registry row pins
    (the PNG n_filters_used discipline). Within a row the dictionary
    grows normally and the code width widens per spec (after the entry
    that fills the current width is added)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    width = mcs + 1
    bw.write(clear, width)
    for ri, row in enumerate(rows):
        table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
        next_code = eoi + 1
        width = mcs + 1
        w = b""
        for k in row:
            wk = w + bytes([k])
            if wk in table:
                w = wk
                continue
            bw.write(table[w], width)
            if next_code < 4096:
                table[wk] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    # the code we JUST made representable forces the
                    # next emitted code one bit wider (spec: width grows
                    # when next_code exceeds the current code range)
                    width += 1
            w = bytes([k])
        if w:
            bw.write(table[w], width)
        if ri + 1 < len(rows):
            bw.write(clear, width)
            width = mcs + 1
    bw.write(eoi, width)
    return bw.flush()


def encode_gif(
    rows: list[list[int]], w: int, h: int, interlace: bool = False
) -> bytes:
    """Encode index rows (top-down, each row w palette indices) as a
    REAL single-frame GIF89a: 256-entry grayscale global color table
    (index i -> (i,i,i)), real variable-width LZW with a CLEAR flush at
    every row boundary, LSB-first bit packing, 255-byte sub-block
    framing, and — when ``interlace`` — the 4-pass row permutation, so
    a decoder that ignores the interlace flag reads rows in the wrong
    ORDER (wrong values, not a parse error)."""
    import struct

    order = _gif_interlace_order(h) if interlace else list(range(h))
    stored = [bytes(rows[r]) for r in order]
    lzw = _lzw_encode_rows(stored, 8)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT flag, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(8)  # LZW minimum code size
    for off in range(0, len(lzw), 255):
        blk = lzw[off : off + 255]
        out.append(len(blk))
        out += blk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> tuple[bytes, int, int]:
    """Spec LZW decode → (index stream, number of CLEAR codes seen, max
    code width reached — the variable-width witness the growth test
    pins).  Untrusted input: a code beyond the dictionary, output past
    the promised pixel count, or a stream that ends before EOI/pixel
    count all raise ValueError."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = max_width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    n_clear = 0
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF: LZW stream ends before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            n_clear += 1
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW: code {code} beyond dictionary")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
                max_width = max(max_width, width)
        prev = entry
        if len(out) > n_expected:
            raise ValueError(
                f"corrupt GIF LZW: {len(out)} indices exceed the "
                f"{n_expected} the image descriptor promises"
            )
    if len(out) != n_expected:
        raise ValueError(
            f"truncated GIF: {len(out)} indices decoded, header promises "
            f"{n_expected}"
        )
    return bytes(out), n_clear, max_width


def decode_gif(payload: bytes) -> dict:
    """REAL LZW image decode: parse header + logical screen descriptor,
    read the global color table, skip extensions, de-frame the
    sub-blocks, run the variable-width LZW (counting dictionary
    resets), and UNDO the 4-pass interlace permutation when flagged.
    Header fields are untrusted: zero dims, truncated sub-blocks or
    color table, over/under-long index streams, out-of-range codes and
    a missing trailer all raise ValueError; animation, local color
    tables and non-GIF payloads raise the documented
    NotImplementedError gates."""
    import struct

    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise NotImplementedError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF: missing logical screen descriptor")
    _, _, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF: global color table past end")
        pos += 3 * n
    img = None
    n_clear = 0
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF: no trailer")
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF: extension past end")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"malformed GIF: unknown block introducer {b0:#x}")
        if img is not None:
            raise NotImplementedError(
                "animated (multi-frame) GIFs are not decoded here"
            )
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF: image descriptor past end")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if ipacked & 0x80:
            raise NotImplementedError("local color tables are not decoded here")
        if w <= 0 or h <= 0:
            raise ValueError(f"malformed GIF header: width={w} height={h}")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"malformed GIF: LZW min code size {mcs}")
        lzw = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF: image data past end")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            blk = payload[pos : pos + n]
            if len(blk) != n:
                raise ValueError("truncated GIF: sub-block past end of payload")
            lzw += blk
            pos += n
        idx, n_clear, _ = _lzw_decode(bytes(lzw), mcs, w * h)
        if ipacked & 0x40:
            rows = [b""] * h
            flat = [idx[r * w : (r + 1) * w] for r in range(h)]
            for stored, screen_row in enumerate(_gif_interlace_order(h)):
                rows[screen_row] = flat[stored]
            idx = b"".join(rows)
        img = (w, h, idx, bool(ipacked & 0x40))
    if img is None:
        raise ValueError("malformed GIF: no image descriptor before trailer")
    if gct is None:
        raise NotImplementedError("GIFs without a global color table need a caller-supplied palette")
    w, h, idx, interlaced = img
    if any(i >= len(gct) // 3 for i in idx):
        raise ValueError("corrupt GIF: pixel index beyond the color table")
    # map indices through the GCT so a mislocated table is a VALUE error
    gray = np.frombuffer(gct, dtype=np.uint8).reshape(-1, 3)[:, 0]
    px = gray[np.frombuffer(idx, dtype=np.uint8)].astype(np.float64)
    return {
        "width": int(w),
        "height": int(h),
        "n_pixels": int(w * h),
        "mean_pixel": float(px.mean()) if len(px) else 0.0,
        "top_left": float(px[0]) if len(px) else 0.0,
        "bottom_left": float(px[(h - 1) * w]) if len(px) else 0.0,
        "n_clear_codes": n_clear,
        "interlaced": int(interlaced),
    }


GIF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
        StructField("top_left", DoubleType()),
        StructField("bottom_left", DoubleType()),
        StructField("n_clear_codes", LongType()),
        StructField("interlaced", LongType()),
    ]
)


def gif_decode_stats(df: DataFrame) -> DataFrame:
    """GIF payloads → per-item metadata incl. row-order (interlace),
    dictionary-reset and palette witnesses (same Arrow mapInPandas
    plumbing as WAV/PPM/BMP/PNG)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_gif(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": m["width"],
                        "height": m["height"],
                        "n_pixels": m["n_pixels"],
                        "mean_pixel": round(m["mean_pixel"], 6),
                        "top_left": round(m["top_left"], 6),
                        "bottom_left": round(m["bottom_left"], 6),
                        "n_clear_codes": m["n_clear_codes"],
                        "interlaced": m["interlaced"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(batches, GIF_SCHEMA)


def synth_gif_payloads(df: DataFrame) -> DataFrame:
    """Encode a REAL LZW-compressed GIF per doc. Image row r (top = 0)
    is uniformly index v + r with v = doc_id % 200 and h <= 5 (no uint8
    wrap) on a (3+doc_id%5) x (2+doc_id%4) canvas, INTERLACED for even
    doc_ids — decoded stats are closed-form (mean = v + (h-1)/2,
    top_left = v, bottom_left = v + h - 1; under interlace those
    witness the de-interleave actually ran) and the encoder CLEAR-
    flushes at every row boundary, so n_clear_codes == height witnesses
    that the decoder genuinely handles in-band dictionary resets."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 3 + int(doc_id) % 5
                h = 2 + int(doc_id) % 4
                v = int(doc_id) % 200
                rows = [[(v + r) & 0xFF] * w for r in range(h)]
                payloads.append(encode_gif(rows, w, h, interlace=doc_id % 2 == 0))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)
