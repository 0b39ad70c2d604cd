"""Minimal MP4 (ISO BMFF, ISO/IEC 14496-12) container codec for
Motion-JPEG video — stdlib only.

Completes the video-container slots of the multimodal pipeline:
``encode_mp4_mjpeg`` writes a spec-shaped MP4 (``ftyp`` + ``mdat`` +
``moov`` with a full sample-table: stsd/stts/stsc/stsz/stco) whose
track carries ``jpeg`` VisualSampleEntry samples, and
``parse_mp4_frames`` walks any BMFF byte stream, reconstructs the
per-sample file offsets from the stbl tables (including multi-sample
chunks and 64-bit ``co64`` offsets), and returns the raw frame
payloads — decodable baseline/progressive JPEGs for MJPEG tracks —
which feed the existing JPEG decoder (`pipeline/jpeg.py`).

Reference parity note: the reference treats video as an opaque asset
handed to an external describer (src/grafeo_memory/vision.py:24-55);
this module is the builder-brief "frame-sample kernel" for the
Spark-side sampling path (`multimodal.sample_frames`). Codecs that
genuinely need ffmpeg (H.264/HEVC/VP9/AV1 bitstreams) remain
injectable slots: a track whose sample description is not JPEG raises
``NotImplementedError`` naming the codec.

Box layout written by the encoder (all integers big-endian):

    ftyp  'isom' [isom iso2 mp41]
    mdat  concatenated JPEG sample payloads
    moov
      mvhd                       movie header (timescale, duration)
      trak
        tkhd                     track 1, width/height as 16.16 fixed
        mdia
          mdhd                   media timescale/duration
          hdlr 'vide'
          minf
            vmhd
            dinf > dref > 'url ' (self-contained flag)
            stbl
              stsd > 'jpeg' VisualSampleEntry
              stts               one run: (n_samples, delta)
              stsc               chunk→sample-count runs
              stsz               per-sample byte sizes
              stco               absolute chunk file offsets
"""

from __future__ import annotations

import struct

_U16 = struct.Struct(">H")
_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")

#: sample-description fourccs we can hand to the JPEG decoder.
_JPEG_CODECS = (b"jpeg", b"mjpa", b"mjpb", b"MJPG")


def _box(fourcc: bytes, body: bytes) -> bytes:
    return _U32.pack(8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    samples_per_chunk: int = 1,
) -> bytes:
    """JPEG frame payloads → MP4 container bytes.

    ``samples_per_chunk`` controls how many samples share one mdat
    chunk (and thus how stsc/stco compress) — exercised by tests to
    pin the demuxer's chunk-walk logic.
    """
    if fps <= 0:
        raise ValueError("fps must be positive")
    if samples_per_chunk <= 0:
        raise ValueError("samples_per_chunk must be positive")
    n = len(frames)
    timescale = fps * 1000
    delta = 1000  # per-frame duration in timescale units
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))

    # Chunk offsets: mdat payload starts after ftyp + 8-byte mdat header.
    base = len(ftyp) + 8
    chunk_offsets: list[int] = []
    pos = base
    for i, frame in enumerate(frames):
        if i % samples_per_chunk == 0:
            chunk_offsets.append(pos)
        pos += len(frame)

    mvhd = _full(
        b"mvhd", 0, 0,
        _U32.pack(0) * 2  # creation/modification (epoch 1904, fixed 0)
        + _U32.pack(timescale)
        + _U32.pack(duration)
        + _U32.pack(0x00010000)  # rate 1.0
        + _U16.pack(0)  # volume (video-only)
        + b"\x00" * 10  # reserved
        + _UNITY_MATRIX
        + _U32.pack(0) * 6  # pre_defined
        + _U32.pack(2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 0x7,  # enabled | in-movie | in-preview
        _U32.pack(0) * 2
        + _U32.pack(1)  # track_ID
        + _U32.pack(0)  # reserved
        + _U32.pack(duration)
        + _U32.pack(0) * 2  # reserved
        + _U16.pack(0) * 2  # layer, alternate_group
        + _U16.pack(0)  # volume
        + _U16.pack(0)  # reserved
        + _UNITY_MATRIX
        + _U32.pack(width << 16)
        + _U32.pack(height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        _U32.pack(0) * 2
        + _U32.pack(timescale)
        + _U32.pack(duration)
        + _U16.pack(0x55C4)  # language 'und'
        + _U16.pack(0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        _U32.pack(0) + b"vide" + _U32.pack(0) * 3 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, _U16.pack(0) * 4)
    dref = _full(b"dref", 0, 0, _U32.pack(1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6  # reserved
        + _U16.pack(1)  # data_reference_index
        + _U16.pack(0) * 2  # pre_defined, reserved
        + _U32.pack(0) * 3  # pre_defined[3]
        + _U16.pack(width)
        + _U16.pack(height)
        + _U32.pack(0x00480000) * 2  # 72 dpi horiz/vert
        + _U32.pack(0)  # reserved
        + _U16.pack(1)  # frame_count
        + bytes([4]) + b"jpeg" + b"\x00" * 27  # compressorname (32 bytes)
        + _U16.pack(24)  # depth
        + struct.pack(">h", -1),  # pre_defined
    )
    stsd = _full(b"stsd", 0, 0, _U32.pack(1) + sample_entry)
    stts = _full(b"stts", 0, 0, _U32.pack(1) + _U32.pack(n) + _U32.pack(delta))
    # stsc: one run if every chunk is full; a second run for a short tail.
    runs = [(1, samples_per_chunk)]
    tail = n % samples_per_chunk
    if tail and n > tail:
        runs.append((len(chunk_offsets), tail))
    elif tail:  # n < samples_per_chunk: single short chunk
        runs = [(1, tail)]
    stsc = _full(
        b"stsc", 0, 0,
        _U32.pack(len(runs))
        + b"".join(
            _U32.pack(first) + _U32.pack(count) + _U32.pack(1)
            for first, count in runs
        ),
    )
    stsz = _full(
        b"stsz", 0, 0,
        _U32.pack(0)
        + _U32.pack(n)
        + b"".join(_U32.pack(len(f)) for f in frames),
    )
    stco = _full(
        b"stco", 0, 0,
        _U32.pack(len(chunk_offsets))
        + b"".join(_U32.pack(o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def is_mp4(payload: bytes) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[4:8] == b"ftyp"
    )


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range,
    handling 64-bit largesize and size==0 (extends to end)."""
    while pos + 8 <= end:
        size = _U32.unpack_from(data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                return
            size = _U64.unpack_from(data, pos + 8)[0]
            body += 8
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, path: list[bytes]):
    """Return (body_start, body_end) of the first box at a nested
    fourcc path, or None."""
    head, rest = path[0], path[1:]
    for fourcc, b, e in _boxes(data, pos, end):
        if fourcc == head:
            return (b, e) if not rest else _find(data, b, e, rest)
    return None


class _Repeat:
    """O(1)-memory stand-in for ``[value] * n`` (fixed-size stsz).

    A corrupt-but-plausible sample count in a legitimately large
    payload must never materialize a count-sized Python list (~8 B
    per entry) before the mdat walk validates it — the walk only
    needs ``len()`` and indexed reads.
    """

    __slots__ = ("value", "n")

    def __init__(self, value: int, n: int):
        self.value, self.n = value, n

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i) -> int:
        # Bounds-checked (ADVICE r11): without the IndexError the
        # legacy iteration protocol (`for s in sizes`, `sum(sizes)`)
        # would loop forever on a crafted fixed-stsz payload, and a
        # slice would silently return a bare int. Current consumers
        # only use len() + guarded integer indexing, but the contract
        # must hold for any future consumer.
        if not isinstance(i, int):
            raise TypeError(f"_Repeat indices must be integers, not {type(i).__name__}")
        if not -self.n <= i < self.n:
            raise IndexError("_Repeat index out of range")
        return self.value


def _parse_stbl(data: bytes, pos: int, end: int):
    """stbl body → (codec_fourcc, sizes, chunk_offsets, stsc_runs)."""
    codec = None
    sizes: list[int] = []
    offsets: list[int] = []
    runs: list[tuple[int, int]] = []
    for fourcc, b, e in _boxes(data, pos, end):
        if fourcc == b"stsd":
            count = _U32.unpack_from(data, b + 4)[0]
            if count >= 1 and b + 16 <= e:
                codec = data[b + 12 : b + 16]
        elif fourcc == b"stsz":
            fixed = _U32.unpack_from(data, b + 4)[0]
            n = _U32.unpack_from(data, b + 8)[0]
            if fixed:
                # Every sample occupies `fixed` bytes of mdat, which
                # lives inside this payload, so a count whose total
                # size exceeds the payload is physically impossible —
                # reject the 4-byte corruption as a per-row error. The
                # surviving list is lazy (_Repeat) so even a plausible
                # count costs O(1) memory, never ~8 B/entry up front.
                if fixed * n > len(data):
                    raise ValueError(
                        "corrupt MP4 payload: implausible sample count"
                    )
                sizes = _Repeat(fixed, n)
            else:
                if b + 12 + 4 * n > e:
                    raise ValueError(
                        "corrupt MP4 payload: implausible sample count"
                    )
                sizes = [
                    _U32.unpack_from(data, b + 12 + 4 * i)[0] for i in range(n)
                ]
        elif fourcc in (b"stco", b"co64"):
            n = _U32.unpack_from(data, b + 4)[0]
            width, unpack = (4, _U32) if fourcc == b"stco" else (8, _U64)
            if b + 8 + width * n > e:
                raise ValueError(
                    "corrupt MP4 payload: implausible chunk count"
                )
            offsets = [
                unpack.unpack_from(data, b + 8 + width * i)[0]
                for i in range(n)
            ]
        elif fourcc == b"stsc":
            n = _U32.unpack_from(data, b + 4)[0]
            if b + 8 + 12 * n > e:
                raise ValueError(
                    "corrupt MP4 payload: implausible stsc entry count"
                )
            runs = [
                (
                    _U32.unpack_from(data, b + 8 + 12 * i)[0],
                    _U32.unpack_from(data, b + 12 + 12 * i)[0],
                )
                for i in range(n)
            ]
    return codec, sizes, offsets, runs


def _samples_per_chunk(runs: list[tuple[int, int]], n_chunks: int) -> list[int]:
    """Expand stsc (first_chunk, samples_per_chunk) runs to a
    per-chunk sample count list."""
    out: list[int] = []
    for i, (first, count) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        # A run can never span more chunks than the chunk-offset table
        # holds — a corrupt first_chunk in the NEXT run would otherwise
        # drive `[count] * run_len` to a multi-GB allocation.
        last = min(last, n_chunks)
        out.extend([count] * max(0, last - first + 1))
        if len(out) > n_chunks:
            del out[n_chunks:]
    return out


def parse_mp4_frames(payload: bytes) -> list[bytes]:
    """BMFF/MP4 bytes → list of raw video frame payloads (JPEGs for
    MJPEG tracks), in sample order.

    Raises ValueError on a non-BMFF payload or one without a video
    sample table, and NotImplementedError when the video track's
    codec needs an external decoder (names the fourcc — the
    injectable slot). Corrupt box structures (truncated sample
    tables, box sizes pointing past the payload) also raise
    ValueError — never a parser-internal struct.error (fuzz-pinned,
    same r9 contract as decode_image).
    """
    if not is_mp4(payload):
        raise ValueError("not an ISO-BMFF/MP4 payload")
    try:
        return _parse_mp4_frames_unsafe(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, OverflowError, TypeError) as e:
        raise ValueError(
            f"corrupt MP4 payload: {type(e).__name__}"
        ) from e


def _parse_mp4_frames_unsafe(payload: bytes) -> list[bytes]:
    end = len(payload)
    moov = _find(payload, 0, end, [b"moov"])
    if moov is None:
        raise ValueError("no moov box")
    for fourcc, b, e in _boxes(payload, *moov):
        if fourcc != b"trak":
            continue
        hdlr = _find(payload, b, e, [b"mdia", b"hdlr"])
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _find(payload, b, e, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            continue
        codec, sizes, offsets, runs = _parse_stbl(payload, *stbl)
        if codec is not None and codec not in _JPEG_CODECS:
            raise NotImplementedError(
                f"MP4 video codec {codec!r} needs an injected sample kernel"
            )
        per_chunk = _samples_per_chunk(runs, len(offsets))
        frames: list[bytes] = []
        si = 0
        for ci, off in enumerate(offsets):
            pos = off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= len(sizes):
                    break
                frames.append(payload[pos : pos + sizes[si]])
                pos += sizes[si]
                si += 1
        return frames
    raise ValueError("no video track with a sample table")
