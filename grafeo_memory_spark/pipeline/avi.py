"""Minimal AVI (RIFF) container codec for MJPEG video — stdlib only.

Fills the video slot of the multimodal pipeline with a REAL kernel:
``encode_avi_mjpeg`` writes a spec-shaped AVI (hdrl with avih/strh/strf,
movi LIST of ``00dc`` frame chunks, idx1 index) and
``parse_avi_frames`` walks any RIFF/AVI byte stream and returns the raw
per-frame payloads (JPEG images for MJPEG streams), which then feed the
existing baseline-JPEG decoder (`pipeline/jpeg.py`).

Reference parity note: the reference treats video as an opaque asset
handed to an external describer (src/grafeo_memory/vision.py:24-55);
this module is the builder-brief "frame-sample kernel" that makes the
Spark-side sampling path (`multimodal.sample_frames`) produce *real*
decodable frames instead of deterministic fakes. Codecs that genuinely
need ffmpeg (H.264/VP9/AV1) remain injectable slots.

Container shape (OpenDML AVI subset, all little-endian):

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' 56   MainAVIHeader
        LIST <size> 'strl'
          'strh' 56 AVIStreamHeader (fccType 'vids', handler 'MJPG')
          'strf' 40 BITMAPINFOHEADER (biCompression 'MJPG')
      LIST <size> 'movi'
        '00dc' <n>  one JPEG per frame (padded to even length)
      'idx1' 16*n   AVIOLDINDEX entries
"""

from __future__ import annotations

import struct

_U32 = struct.Struct("<I")


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + _U32.pack(len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads → AVI/MJPEG container bytes."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(frames)
    max_len = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_len * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_len,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sI2HIIIIIIiI4H",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate
        0,  # dwStart
        n,  # dwLength (frames)
        max_len,  # dwSuggestedBufferSize
        -1,  # dwQuality
        0,  # dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    index = b""
    for frame in frames:
        # idx1 offsets are relative to the start of the 'movi' fourcc
        index += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(frame))
        movi_body += _chunk(b"00dc", frame)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", index)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _U32.pack(len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk_movi(data: bytes, pos: int, end: int, out: list[bytes]) -> None:
    """Collect compressed/uncompressed video frame chunks (``##dc`` /
    ``##db``) from a movi (or nested ``rec ``) LIST body.

    Iterative with an explicit range stack (r10): a crafted payload can
    nest ``rec `` LISTs thousands deep in a few KB, and the former
    recursion leaked RecursionError through the per-row error contract
    — each nesting level costs 8 header bytes, so the stack is bounded
    by ``len(data) / 8`` entries of two ints, never the interpreter's
    call-stack limit."""
    stack = [(pos, end)]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = _U32.unpack_from(data, pos + 4)[0]
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if (
                fourcc == b"LIST"
                and data[body_start : body_start + 4] == b"rec "
            ):
                # resume the current body after the nested rec LIST
                stack.append((body_start + size + (size & 1), end))
                pos, end = body_start + 4, body_end
                continue
            if fourcc[2:4] in (b"dc", b"db") and size > 0:
                out.append(data[body_start:body_end])
            pos = body_start + size + (size & 1)


def parse_avi_frames(payload: bytes) -> list[bytes]:
    """RIFF/AVI bytes → list of raw frame payloads (JPEGs for MJPEG),
    in stream order. Raises ValueError on a non-AVI payload; corrupt
    RIFF structures also surface as ValueError, never a parser-internal
    struct.error/RecursionError (r10 — the same fuzz-pinned per-row
    error contract as `parse_mp4_frames` / `decode_image`: a bad blob
    inside a mapInPandas batch must be catchable per row, not a task
    killer)."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    try:
        return _parse_avi_frames_unsafe(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError, TypeError, RecursionError) as e:
        raise ValueError(f"corrupt AVI payload: {type(e).__name__}") from e


def _parse_avi_frames_unsafe(payload: bytes) -> list[bytes]:
    frames: list[bytes] = []
    pos, end = 12, min(len(payload), 8 + _U32.unpack_from(payload, 4)[0])
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = _U32.unpack_from(payload, pos + 4)[0]
        body_start = pos + 8
        body_end = min(body_start + size, end)
        if fourcc == b"LIST" and payload[body_start : body_start + 4] == b"movi":
            _walk_movi(payload, body_start + 4, body_end, frames)
        pos = body_start + size + (size & 1)
    return frames
