"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages (builder brief).

The *Spark-side* machinery is real and tested — schemas, batch
iteration, partition-preserving transforms, output contracts. Codec
kernels come in two tiers:

- REAL kernels, stdlib + numpy only (no external image/audio libs
  needed): BMP and PNG decode/encode (`decode_image`, `encode_bmp`,
  `encode_png`), baseline JPEG decode/encode (`pipeline/jpeg.py` —
  Huffman entropy coding, IDCT, chroma upsampling per ITU T.81),
  nearest-neighbor resize (`real_resize`), WAV audio features
  (`real_audio_features`), and AVI/MJPEG plus MP4/MJPEG video demux
  (`real_frame_sample`, `pipeline/avi.py`, `pipeline/mp4.py`). These
  are genuine byte-level codecs — zlib inflate + PNG unfiltering, JPEG
  entropy decode, BMP row parsing, RIFF/WAV PCM frames, RIFF/AVI
  movi-chunk walking, ISO-BMFF sample-table offset reconstruction —
  not fakes.
- Injectable slots for formats whose codecs genuinely need external
  libraries (WebP/AVIF, MP3, ffmpeg video):
  pass ``decode=`` / ``resize=`` / ``extract=`` callables; unsupported
  magic bytes raise ``NotImplementedError`` naming the slot.
  ``fake_*`` deterministic stand-ins remain for library-free pipeline
  tests.

Scale notes: binary payloads ride the Arrow batches — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 64) for
multi-MB assets so a batch fits executor memory. Metadata-only
operations (routing, filtering, sampling decisions) must run BEFORE the
decode stage so pruning happens on the cheap columns: the decode UDF is
the most expensive operator per byte in the whole pipeline.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON metadata
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def fake_image_decode(payload: bytes, dims: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: payload bytes →
    pseudo (width, height) + a stable feature vector. Keeps the whole
    Arrow/mapInPandas path testable without image libraries."""
    if payload is None:
        return 0, 0, [0.0] * dims
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feats = [digest[2 + i] / 255.0 for i in range(dims)]
    return width, height, feats


# --- real codecs (stdlib + numpy; no external libraries) -----------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BI_RGB bottom-up BMP."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (H, W, 3) uint8 RGB
    array (bottom-up or top-down rows)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp} unsupported")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, stride * h, offset).reshape(h, stride)
    img = rows[:, : w * nch].reshape(h, w, nch)[:, :, 2::-1]  # BGR(A)→RGB
    return img[::-1] if flip else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W) gray or (H, W, 3|4) uint8 array as a PNG
    (8-bit, filter 0, one zlib stream)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[nch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG: chunk walk,
    zlib inflate, scanline unfilter (types 0-4 incl. Paeth). Returns
    (H, W, 3) uint8 RGB (gray broadcast, alpha dropped)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    w, h, depth, color, _comp, _filt, interlace = meta
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} "
            "unsupported — inject a decode kernel"
        )
    nch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).copy()
        if ftype == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            line = line + prev  # uint8 wraps ≡ mod 256
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((int(a) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    img = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3]


#: low-level faults a corrupt payload can trip inside the bit-level
#: decoders; decode_image normalizes them all to ValueError so a bad
#: blob in a 100-TB ingest batch is a per-row error, not a task killer
#: with a format-internal traceback (r9 — found by fuzzing mutated
#: valid payloads)
_CORRUPT_FAULTS = (
    struct.error,
    IndexError,
    KeyError,
    TypeError,
    OverflowError,
    EOFError,
    zlib.error,
)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch to the real decoders (PNG, BMP, baseline
    AND progressive JPEG, lossless WebP). Other formats (lossy WebP,
    AVIF) need an external codec — inject via the ``decode=`` slot.

    Error contract: raises ``NotImplementedError`` for undecodable-by-
    design formats and ``ValueError`` for anything malformed — a
    truncated or bit-flipped payload never leaks a parser-internal
    ``struct.error``/``IndexError`` (fuzz-pinned in tests)."""
    if not payload:
        raise ValueError("empty image payload")
    try:
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            from grafeo_memory_spark.pipeline.jpeg import decode_jpeg

            return decode_jpeg(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from grafeo_memory_spark.pipeline.webp import decode_webp

            return decode_webp(payload)[:, :, :3]
    except (ValueError, NotImplementedError):
        raise
    except _CORRUPT_FAULTS as e:
        raise ValueError(
            f"corrupt {payload[:4]!r} image payload: {type(e).__name__}"
        ) from e
    raise NotImplementedError(
        f"no stdlib codec for magic {payload[:4]!r} (AVIF needs an "
        "injected decode kernel)"
    )


def probe_image_meta(payload: bytes) -> tuple[str | None, int, int]:
    """Header-only (format, width, height) probe — NO pixel decode.
    This is the metadata-prune primitive for 100-TB asset curation:
    size/format filters run over a few header bytes per asset, so the
    expensive decode tier only ever sees the survivors. Handles MORE
    formats than the pixel decoders do, because dimensions sit in
    plain header fields even where the pixel codec is injectable-only:
    PNG, BMP, GIF, JPEG (any SOFn), WebP — lossless VP8L, **lossy
    VP8** (the uncompressed keyframe header: 3-byte frame tag,
    9D 01 2A start code, 14-bit dimensions — readable without the
    bool-coder), and **extended VP8X** (24-bit canvas fields).
    Unknown/truncated payloads → (None, 0, 0), never an exception."""
    try:
        if payload is None or len(payload) < 10:
            return None, 0, 0
        if payload[:8] == _PNG_SIG:
            if len(payload) < 24:  # truncated IHDR: no dimension field
                return None, 0, 0
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return "png", w, h
        if payload[:2] == b"BM":
            if len(payload) < 26:  # truncated BITMAPINFOHEADER
                return None, 0, 0
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
            return "bmp", abs(w), abs(h)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return "gif", w, h
        if payload[:2] == b"\xff\xd8":
            # walk the marker stream to any SOFn (C0..CF minus C4/C8/CC)
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg = int.from_bytes(payload[i + 2:i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(payload[i + 5:i + 7], "big")
                    w = int.from_bytes(payload[i + 7:i + 9], "big")
                    return "jpeg", w, h
                i += 2 + seg
            return "jpeg", 0, 0
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            chunk = payload[12:16]
            if chunk == b"VP8L" and len(payload) >= 25 and payload[20] == 0x2F:
                bits = int.from_bytes(payload[21:25], "little")
                return "webp-vp8l", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
            if (
                chunk == b"VP8 "
                and len(payload) >= 30
                and payload[23:26] == b"\x9d\x01\x2a"
            ):
                w = int.from_bytes(payload[26:28], "little") & 0x3FFF
                h = int.from_bytes(payload[28:30], "little") & 0x3FFF
                return "webp-vp8", w, h
            if chunk == b"VP8X" and len(payload) >= 30:
                w = 1 + int.from_bytes(payload[24:27], "little")
                h = 1 + int.from_bytes(payload[27:30], "little")
                return "webp-vp8x", w, h
            return "webp", 0, 0
        return None, 0, 0
    except Exception:
        return None, 0, 0


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def probe_images(assets: DataFrame) -> DataFrame:
    """Assets → (asset_id, format, width, height) via the header-only
    probe — Arrow-batched mapInPandas over a few bytes per row, the
    cheap tier that gates :func:`decode_images` at corpus scale."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [probe_image_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                }
            )

    return assets.where(assets.kind == "image").mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


def real_image_decode(payload: bytes, dims: int = 8) -> tuple[int, int, list[float]]:
    """REAL decode kernel: BMP/PNG bytes → (width, height, features)
    where features is the L1-normalized ``dims``-bin grayscale
    histogram — an actual content-derived descriptor."""
    if payload is None:
        return 0, 0, [0.0] * dims
    img = decode_image(payload)
    h, w = img.shape[:2]
    gray = img.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=dims, range=(0.0, 256.0))
    total = max(1, int(hist.sum()))
    return w, h, [float(c) / total for c in hist]


def real_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize kernel: decode (BMP/PNG), nearest-neighbor resample
    to (height, width), re-encode as BMP."""
    if payload is None:
        return b""
    img = decode_image(payload)
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // max(1, height), h - 1)
    xs = np.minimum((np.arange(width) * w) // max(1, width), w - 1)
    return encode_bmp(img[ys][:, xs])


def real_audio_features(payload: bytes, dims: int = 8) -> tuple[int, list[float]]:
    """REAL audio kernel: RIFF/WAV PCM bytes → (duration_ms, features)
    where features is per-segment RMS energy over ``dims`` equal time
    segments, normalized to full scale. stdlib ``wave`` + numpy."""
    if payload is None:
        return 0, [0.0] * dims
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            nch, sampwidth, rate, nframes = (
                wf.getnchannels(), wf.getsampwidth(), wf.getframerate(),
                wf.getnframes(),
            )
            frames = wf.readframes(nframes)
    except (wave.Error, RuntimeError, *_CORRUPT_FAULTS) as e:
        # same contract as decode_image: corrupt bytes → ValueError
        # (stdlib wave raises a bare RuntimeError on a bad chunk seek)
        raise ValueError(
            f"corrupt WAV payload: {type(e).__name__}"
        ) from e
    if sampwidth == 2:
        samples = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 1:
        samples = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(
            f"{8 * sampwidth}-bit WAV needs an injected extract kernel"
        )
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    duration_ms = int(nframes * 1000 // max(1, rate))
    if samples.size == 0:
        return duration_ms, [0.0] * dims
    feats = [
        float(np.sqrt(np.mean(np.square(seg)))) if seg.size else 0.0
        for seg in np.array_split(samples, dims)
    ]
    return duration_ms, feats


def decode_images(
    assets: DataFrame,
    *,
    dims: int = 8,
    decode: Callable[[bytes, int], tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """Image assets → (asset_id, width, height, features) via
    Arrow-batched mapInPandas. Filter to ``kind='image'`` happens here
    so the predicate prunes *before* bytes cross into Python."""
    decode = decode or fake_image_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode(p, dims) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "features": [r[2] for r in rows],
                }
            )

    return assets.where(assets.kind == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: truncate/pad the payload to a
    size proportional to the target area — stable, size-monotonic, and
    library-free. A real kernel decodes, resamples, re-encodes."""
    if payload is None:
        return b""
    target = max(1, (width * height) // 8)
    return (payload * (target // max(1, len(payload)) + 1))[:target]


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    *,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image assets → fixed-dimension payloads (training-shard prep).
    Same mapInPandas contract as decode_images; the kernel slot takes
    (payload, width, height) → bytes."""
    resize = resize or fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": [resize(p, width, height) for p in pdf["payload"]],
                }
            )

    return assets.where(assets.kind == "image").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def fake_audio_features(
    payload: bytes, dims: int = 8
) -> tuple[int, list[float]]:
    """Deterministic audio stand-in: bytes → pseudo duration + stable
    feature vector (a real kernel runs an STFT/mel pipeline)."""
    if payload is None:
        return 0, [0.0] * dims
    digest = hashlib.sha256(b"audio" + payload).digest()
    duration_ms = len(payload) * 1000 // 16  # fake 16 bytes/ms rate
    feats = [digest[i] / 255.0 for i in range(dims)]
    return duration_ms, feats


def audio_features(
    assets: DataFrame,
    *,
    dims: int = 8,
    extract: Callable[[bytes, int], tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Audio assets → (asset_id, duration_ms, features) via Arrow-batched
    mapInPandas, mirroring decode_images for the audio modality."""
    extract = extract or fake_audio_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [extract(p, dims) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "duration_ms": [r[0] for r in rows],
                    "features": [r[1] for r in rows],
                }
            )

    return assets.where(assets.kind == "audio").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def fake_frame_sample(
    payload: bytes, every_nth: int = 10, max_frames: int = 4
) -> list[bytes]:
    """Deterministic stand-in frame extractor: payload sliced into
    chunks standing in for decoded frames."""
    if payload is None:
        return []
    n = min(max_frames, max(1, len(payload) // every_nth))
    step = max(1, len(payload) // n)
    return [payload[i * step : (i + 1) * step] for i in range(n)]


def real_frame_sample(
    payload: bytes, every_nth: int = 10, max_frames: int = 4
) -> list[bytes]:
    """REAL video kernel: AVI/MJPEG or MP4/MJPEG container bytes →
    every ``every_nth``-th frame payload (a decodable JPEG), up to
    ``max_frames``. Codec bitstreams that need ffmpeg (H.264/VP9 in
    MP4/WebM) stay injectable via the ``sample=`` slot."""
    from grafeo_memory_spark.pipeline import avi, mp4

    if payload is None:
        return []
    if avi.is_avi(payload):
        frames = avi.parse_avi_frames(payload)
    elif mp4.is_mp4(payload):
        frames = mp4.parse_mp4_frames(payload)  # NotImplementedError for avc1 etc.
    else:
        raise NotImplementedError(
            f"no stdlib demuxer for magic {bytes(payload[:4])!r} "
            "(WebM needs an injected sample kernel)"
        )
    return frames[:: max(1, every_nth)][:max_frames]


def sample_frames(
    assets: DataFrame,
    every_nth: int = 10,
    max_frames: int = 4,
    *,
    sample: Callable[[bytes, int, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video assets → sampled frame rows via Arrow-batched mapInPandas
    (one output row per frame). The kernel slot takes
    (payload, every_nth, max_frames) → list of frame payloads;
    ``real_frame_sample`` demuxes AVI/MJPEG into decodable JPEGs, the
    default fake keeps the fan-out path testable container-free."""
    sample = sample or fake_frame_sample

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "frame_index": [], "frame_payload": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, frame in enumerate(sample(payload, every_nth, max_frames)):
                    out["asset_id"].append(aid)
                    out["frame_index"].append(i)
                    out["frame_payload"].append(frame)
            yield pd.DataFrame(out)

    return assets.where(assets.kind == "video").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )
