"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

Decode kernels: BMP, PNG, GIF, JPEG (baseline + progressive;
operators/jpeg.py) and WAV/PCM decode for REAL with pure numpy/stdlib — no imaging/audio
library needed — with matching encoders for fixtures and oracles. The
remaining formats (WebP, mp3/ogg) would need
Pillow/soundfile (not in this container): those raise unless
``deterministic_fake=True``, which substitutes a seeded, content-derived
fake so the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — still runs end-to-end.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)


def _decode_bmp(b: bytes) -> np.ndarray:
    """Pure-numpy BMP decode (uncompressed BI_RGB, 24/32 bpp — the format a
    library-free container can still parse) → HxWx3 uint8 RGB."""
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP variant unsupported (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    px = arr[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) → RGB, drop alpha


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP encoder (fixture/oracle helper — round-trips through
    :func:`_decode_bmp`)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    data_size = stride * h
    off = 14 + 40
    header = (
        b"BM" + (off + data_size).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + data_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    rows = [bgr[y].tobytes() + pad for y in range(h - 1, -1, -1)]
    return header + dib + b"".join(rows)


def _decode_png(b: bytes) -> np.ndarray:
    """Pure-Python PNG decode (stdlib zlib + scanline-filter reconstruction)
    for non-interlaced 8-bit RGB/RGBA/gray — no imaging library. The five
    PNG filters (None/Sub/Up/Average/Paeth) are undone per scanline; alpha
    drops, gray broadcasts → HxWx3 uint8 RGB."""
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG signature")
    pos, w = 8, 0
    h = bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, interlace = data[8], data[9], data[12]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG variant unsupported (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need the running left pixel — per-pixel
            rec = np.empty(stride, dtype=np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                bb = pv[i]
                if ftype == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    rec[i] = (line[i] + ((a + bb) >> 1)) & 0xFF
                elif ftype == 4:
                    cc = pv[i - nch] if i >= nch else 0
                    p = a + bb - cc
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                    rec[i] = (line[i] + pred) & 0xFF
                else:
                    raise NotImplementedError(f"PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    img = out.reshape(h, w, nch)
    if color_type == 0:
        return np.repeat(img, 3, axis=2)
    if color_type == 2:
        return img
    if color_type == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGBA → RGB


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT; round-trip-tested against
    :func:`_decode_png`). ``img``: HxWx3 uint8."""
    import struct
    import zlib

    h, w, _ = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_batch(payloads: pd.Series, deterministic_fake: bool = False) -> list[np.ndarray]:
    """Decode a batch of encoded image bytes → HxWx3 uint8 arrays.

    BMP (magic ``BM``), PNG (8-bit non-interlaced), GIF (LZW, first
    frame) and JPEG (baseline SOF0/1 + progressive SOF2 —
    operators/jpeg.py) payloads decode for REAL via the pure-Python
    parsers — no imaging library needed.
    Remaining formats (WebP, arithmetic-coded JPEG) would need Pillow:
    with ``deterministic_fake=True`` a seeded, content-derived fake is
    produced so the plumbing still exercises end-to-end; otherwise they
    raise.
    """
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        b = bytes(p)
        # every codec shares the same corrupt/unsupported-payload contract:
        # with deterministic_fake the plumbing keeps running on a content-
        # derived stand-in instead of failing the whole Arrow batch; without
        # it the error surfaces. Deliberately NOT a blanket Exception — a
        # programming error in a codec must surface, not become fakes.
        _decode_errors = (NotImplementedError, ValueError, IndexError,
                          KeyError, _struct.error, zlib.error)
        decoder = None
        if b[:2] == b"BM":
            decoder = _decode_bmp
        elif b[:8] == b"\x89PNG\r\n\x1a\n":
            decoder = _decode_png
        elif b[:4] == b"GIF8":
            decoder = _decode_gif
        elif b[:3] == b"\xff\xd8\xff":
            from quickwit_spark.operators.jpeg import decode_jpeg

            decoder = decode_jpeg
        if decoder is not None:
            try:
                out.append(decoder(b))
                continue
            except _decode_errors:
                if not deterministic_fake:
                    raise
        if not deterministic_fake:
            raise NotImplementedError(
                "only BMP, PNG and baseline JPEG decode without "
                "Pillow/opencv — pass deterministic_fake=True for plumbing "
                "tests of other formats"
            )
        digest = hashlib.sha256(b).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        out.append(rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8))
    return out


def image_features(
    media: DataFrame,
    target: tuple[int, int] = (8, 8),
    deterministic_fake: bool = False,
) -> DataFrame:
    """decode → resize → feature-extract as one ``mapInPandas`` pass.

    Batches stream through Arrow; the per-batch kernel is numpy-vectorized.
    Partitioning: inherit the scan partitions (payloads are large — do NOT
    shuffle binaries; filter/project first, extract features, then drop the
    payload column before any join).
    """
    th, tw = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf["payload"], deterministic_fake=deterministic_fake)
            feats, ws, hs = [], [], []
            for img in imgs:
                if img is None:
                    feats.append(None), ws.append(None), hs.append(None)
                    continue
                h, w, _ = img.shape
                # nearest-neighbor resize, vectorized
                yi = (np.arange(th) * h // th)[:, None]
                xi = (np.arange(tw) * w // tw)[None, :]
                small = img[yi, xi]  # th x tw x 3
                feats.append((small.astype(np.float32) / 255.0).mean(axis=2).ravel())
                ws.append(tw), hs.append(th)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": feats,
                    "out_width": pd.array(ws, dtype="Int32"),
                    "out_height": pd.array(hs, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (duration-driven explode — JVM-side), decode stubbed."""
    if not deterministic_fake:
        raise NotImplementedError("video decode not available in this container")
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn("frame_key", F.xxhash64("media_id", "frame_ts_ms"))


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("rms", T.FloatType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]
)


def _decode_wav(b: bytes) -> np.ndarray:
    """Pure-numpy WAV decode (RIFF/WAVE; PCM 8/16/32-bit and float32) →
    mono float32 in [-1, 1] (multi-channel downmixed by mean)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i: i + 4]
        sz = int.from_bytes(b[i + 4: i + 8], "little")
        body = b[i + 8: i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little") or 1
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype="u1").astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / float(1 << 31)
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(f"WAV variant unsupported (fmt={audio_fmt}, bits={bits})")
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return x.astype(np.float32)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000,
                     n_channels: int = 1) -> bytes:
    """16-bit PCM WAV encoder (fixture/oracle helper — round-trips through
    :func:`_decode_wav`). ``samples``: float in [-1, 1], interleaved if
    multi-channel."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767)
    data = pcm.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data + (b"\x00" if len(data) & 1 else b"")
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_audio_batch(payloads: pd.Series, deterministic_fake: bool = False) -> list:
    """Decode encoded audio bytes → mono float32 PCM arrays.

    WAV payloads (RIFF magic) decode for REAL via the pure-numpy parser.
    Compressed formats (mp3/ogg/flac) need soundfile/ffmpeg (not in this
    container): deterministic_fake substitutes a seeded 1k-sample waveform
    for plumbing tests; otherwise they raise."""
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        b = bytes(p)
        if b[:4] == b"RIFF":
            out.append(_decode_wav(b))
            continue
        if not deterministic_fake:
            raise NotImplementedError(
                "only WAV decodes without soundfile/ffmpeg — pass "
                "deterministic_fake=True for plumbing tests of other formats"
            )
        digest = hashlib.sha256(b).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        out.append(rng.standard_normal(1024).astype(np.float32))
    return out


def audio_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """decode → per-clip features (RMS loudness, zero-crossing count) in one
    ``mapInPandas`` pass — numpy-vectorized per batch, payloads never
    shuffled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pcms = decode_audio_batch(pdf["payload"], deterministic_fake=deterministic_fake)
            rms, zc, ns = [], [], []
            for pcm in pcms:
                if pcm is None:
                    rms.append(None), zc.append(None), ns.append(None)
                    continue
                rms.append(float(np.sqrt((pcm * pcm).mean())))
                zc.append(int((np.diff(np.signbit(pcm)) != 0).sum()))
                ns.append(len(pcm))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rms": pd.array(rms, dtype="float32"),
                    "zero_crossings": pd.array(zc, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


TEXT_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def extract_text(media: DataFrame, min_run: int = 4) -> DataFrame:
    """REAL (not stubbed) fallback text extraction from document binaries:
    printable-ASCII runs of length ≥ ``min_run`` (the classic `strings`
    heuristic — works on any payload without format libs). Proper PDF/DOCX
    parsing would slot into the same mapInPandas signature."""
    import re as _re

    run_re = _re.compile(rb"[\x20-\x7e]{%d,}" % min_run)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, sizes = [], []
            for p in pdf["payload"]:
                if p is None:
                    texts.append(None), sizes.append(None)
                    continue
                b = bytes(p)
                texts.append(" ".join(m.decode("ascii") for m in run_re.findall(b)))
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "extracted_text": texts,
                    "n_bytes": pd.array(sizes, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=TEXT_EXTRACT_SCHEMA)


def _decode_gif(b: bytes) -> np.ndarray:
    """Pure-Python GIF decode (GIF87a/89a, first frame): logical screen +
    global/local color tables, variable-width LZW with clear/EOI codes,
    interlace reordering → HxWx3 uint8 RGB. Animation beyond frame one and
    transparency compositing are out of scope (first frame only)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF signature")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension: skip sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:  # image descriptor
            ix = int.from_bytes(b[pos + 1:pos + 3], "little")
            iy = int.from_bytes(b[pos + 3:pos + 5], "little")
            iw = int.from_bytes(b[pos + 5:pos + 7], "little")
            ih = int.from_bytes(b[pos + 7:pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("corrupt GIF: no color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            px = np.zeros((ih, iw), dtype=np.uint8)
            flat = np.array(idx[: iw * ih], dtype=np.uint8).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                         + list(range(2, ih, 4)) + list(range(1, ih, 2)))
                px[order] = flat
            else:
                px = flat
            img = table[np.minimum(px, len(table) - 1)]
            # paint onto the logical screen (common case: full-screen frame)
            if (ix, iy, iw, ih) == (0, 0, sw, sh):
                return img
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            canvas[iy:iy + ih, ix:ix + iw] = img
            return canvas
        elif blk == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{blk:02x}")
    raise ValueError("no image data in GIF")


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list[int]:
    """GIF variable-width LZW (up to 12-bit codes, clear/EOI handling)."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    bitpos = 0
    prev: list[int] | None = None
    total_bits = len(data) * 8
    while bitpos + width <= total_bits and len(out) < max_pixels:
        byte = bitpos // 8
        code = int.from_bytes(data[byte:byte + 3], "little")
        code = (code >> (bitpos % 8)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dictionary) and dictionary[code]:
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("corrupt GIF: invalid LZW code")
        out.extend(entry)
        if prev is not None:
            dictionary.append(prev + [entry[0]])
            if len(dictionary) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def encode_gif(img: np.ndarray) -> bytes:
    """Minimal GIF89a encoder for fixtures: 256-entry global palette built
    from the image's distinct colors (≤256 required), LZW emitted as plain
    literal codes with a clear code before every pixel — valid, never grows
    the code width, round-trips through :func:`_decode_gif`."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif fixture supports <= 256 distinct colors")
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += palette.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    min_code = 8
    clear = 1 << min_code
    out += bytes([min_code])
    # bitstream: CLEAR before every literal keeps the dictionary empty so
    # the code width stays at 9 bits forever
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for v in inverse:
        emit(clear)
        emit(int(v))
    emit(clear + 1)  # EOI
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
