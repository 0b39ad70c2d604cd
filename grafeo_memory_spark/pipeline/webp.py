"""WebP lossless (VP8L) codec subset, stdlib + numpy — fills the WebP
slot in `pipeline/multimodal.py`'s magic-byte dispatch.

Implements the public VP8L bitstream (WebP Lossless Bitstream
Specification): RIFF/WEBP/VP8L container, LSB-first bit I/O with
deflate-convention prefix codes (canonical, code MSB transmitted
first), simple AND complex (code-length-coded, with 16/17/18 repeats
and the max-symbol short-circuit) prefix codes, the five per-group
code trees (green+length+cache, red, blue, alpha, distance), LZ77
backward references with the prefix value scheme, and the color cache
(0x1e35a7bd hash, insert-every-pixel). The SUBTRACT_GREEN transform is
supported end to end.

Documented subset boundaries (each raises ``NotImplementedError``):
- lossy VP8 / extended VP8X containers — different codecs entirely;
- PREDICTOR / COLOR / COLOR_INDEXING transforms;
- meta prefix images (multiple entropy groups);
- short-distance neighbor codes 1..120 (the spec's fixed 2D offset
  table) — the companion encoder always emits absolute distances
  (code = distance + 120), which every conformant decoder accepts.

The encoder (literal + run-length LZ77 + color cache + subtract-green,
Huffman-complete canonical codes via package-merge) exists so decode
round-trips bit-exactly with no external image library — the same
self-validating pattern as the progressive JPEG codec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "encode_webp_lossless"]

#: code-length-code read order (VP8L spec §"Decoding the Code Lengths")
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MUL = 0x1E35A7BD


# ------------------------------------------------------------- bit I/O
class _LsbReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _LsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.bit = 0

    def write_bit(self, b: int) -> None:
        if b:
            self.cur |= 1 << self.bit
        self.bit += 1
        if self.bit == 8:
            self.buf.append(self.cur)
            self.cur = 0
            self.bit = 0

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n):
            self.write_bit((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes go MSB-of-code first (deflate convention)."""
        for i in range(length - 1, -1, -1):
            self.write_bit((code >> i) & 1)

    def finish(self) -> bytes:
        if self.bit:
            self.buf.append(self.cur)
            self.cur = 0
            self.bit = 0
        return bytes(self.buf)


# ------------------------------------------------- canonical Huffman
def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) in canonical order (RFC1951 style)."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = pairs[0][0] if pairs else 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        prev_len = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _decode_table(lengths: list[int]) -> dict[tuple[int, int], int]:
    return {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(lengths).items()
    }


def _read_symbol(reader: _LsbReader, table: dict) -> int:
    # single-symbol codes consume no bits
    zl = table.get((0, 0))
    if zl is not None:
        return zl
    code = 0
    for length in range(1, 16):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid VP8L prefix code")


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Length-limited Huffman code lengths (package-merge). Always
    Kraft-complete for ≥2 used symbols; a single used symbol yields
    length 1 (callers use a simple code instead)."""
    syms = [i for i, f in enumerate(freqs) if f > 0]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    # package-merge: S_1 = leaves; S_k = merge(leaves, package(S_{k-1}));
    # select the first 2n-2 items of S_maxlen — each selected package a
    # symbol appears in adds 1 to its code length. Kraft-complete and
    # optimal under the length limit by construction.
    items = sorted((freqs[s], (s,)) for s in syms)
    merged = list(items)
    for _ in range(max_len - 1):
        packaged = [
            (merged[i][0] + merged[i + 1][0],
             merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(items + packaged, key=lambda t: t[0])
    lengths = [0] * len(freqs)
    for _, symlist in merged[: 2 * len(syms) - 2]:
        for s in symlist:
            lengths[s] += 1
    return lengths


# ----------------------------------------------------------- LZ value
def _prefix_value_decode(reader: _LsbReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + reader.read_bits(extra) + 1


def _prefix_value_encode(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    c = 4
    while True:
        extra = (c - 2) >> 1
        offset = (2 + (c & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return c, v - offset - 1, extra
        c += 1


# ------------------------------------------------------------- decode
def _read_prefix_code(reader: _LsbReader, alphabet: int) -> dict:
    if reader.read_bit():  # simple code
        nsym = reader.read_bit() + 1
        if reader.read_bit():
            s0 = reader.read_bits(8)
        else:
            s0 = reader.read_bits(1)
        lengths = [0] * alphabet
        if nsym == 1:
            lengths[s0] = 0
            return {(0, 0): s0}
        s1 = reader.read_bits(8)
        # spec: the FIRST parsed symbol takes code 0 (not the smaller
        # value) — build the table directly, not canonically
        return {(1, 0): s0, (1, 1): s1}
    ncodes = reader.read_bits(4) + 4
    cl_lens = [0] * 19
    for i in range(ncodes):
        cl_lens[_CL_ORDER[i]] = reader.read_bits(3)
    cl_table = _decode_table(cl_lens)
    if reader.read_bit():  # max-symbol short-circuit
        nbits = 2 + 2 * reader.read_bits(3)
        max_symbol = 2 + reader.read_bits(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        sym = _read_symbol(reader, cl_table)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + reader.read_bits(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + reader.read_bits(3)
        else:  # 18
            i += 11 + reader.read_bits(7)
    return _decode_table(lengths)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless (VP8L) WebP to an (H, W, 4) uint8 RGBA array."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    chunk = payload[12:16]
    if chunk == b"VP8 ":
        raise NotImplementedError(
            "lossy VP8 needs an injected decode kernel (only lossless "
            "VP8L is implemented)"
        )
    if chunk == b"VP8X":
        raise NotImplementedError("extended VP8X container unsupported")
    if chunk != b"VP8L":
        raise ValueError(f"unknown WebP chunk {chunk!r}")
    data = payload[20:]
    if data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    reader = _LsbReader(data, 1)
    w = reader.read_bits(14) + 1
    h = reader.read_bits(14) + 1
    reader.read_bit()  # alpha hint
    if reader.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")

    subtract_green = False
    while reader.read_bit():
        ttype = reader.read_bits(2)
        if ttype == 2:  # SUBTRACT_GREEN — no payload
            subtract_green = True
        else:
            raise NotImplementedError(
                f"VP8L transform type {ttype} (predictor/color/indexing) "
                "unsupported — inject an external kernel"
            )

    cache_bits = 0
    if reader.read_bit():
        cache_bits = reader.read_bits(4)
    if reader.read_bit():
        raise NotImplementedError(
            "VP8L meta prefix images (multiple entropy groups) unsupported"
        )
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_tbl = _read_prefix_code(reader, 256 + 24 + cache_size)
    red_tbl = _read_prefix_code(reader, 256)
    blue_tbl = _read_prefix_code(reader, 256)
    alpha_tbl = _read_prefix_code(reader, 256)
    dist_tbl = _read_prefix_code(reader, 40)

    npix = w * h
    out = np.zeros((npix, 4), dtype=np.uint8)  # R,G,B,A
    cache = [0] * cache_size
    i = 0
    # Degenerate-but-legal VP8L: all four channel codes single-symbol
    # literals (solid-color image) — every pixel then decodes from ZERO
    # bits, so the per-pixel loop below would spin npix times reading
    # nothing. Fill vectorized instead; this is both the solid-color
    # fast path and the guard that a payload with maxed 14-bit dims
    # (268M pixels) cannot buy a quarter-billion-iteration Python loop
    # for free.
    g0 = green_tbl.get((0, 0))
    if (
        g0 is not None
        and g0 < 256
        and (0, 0) in red_tbl
        and (0, 0) in blue_tbl
        and (0, 0) in alpha_tbl
    ):
        out[:] = (
            red_tbl[(0, 0)], g0, blue_tbl[(0, 0)], alpha_tbl[(0, 0)],
        )
        i = npix
    elif (
        g0 is not None
        and g0 >= 256 + 24
        and g0 - (256 + 24) < cache_size
    ):
        # Same zero-bit trap via a cache-hit green code: no literal can
        # ever decode, so the cache slot stays zero and every pixel is
        # transparent black — out is already zero-filled.
        i = npix
    while i < npix:
        sym = _read_symbol(reader, green_tbl)
        if sym < 256:
            g = sym
            r = _read_symbol(reader, red_tbl)
            b = _read_symbol(reader, blue_tbl)
            a = _read_symbol(reader, alpha_tbl)
            out[i] = (r, g, b, a)
            if cache_size:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[((_HASH_MUL * argb) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = argb
            i += 1
        elif sym < 256 + 24:
            length = _prefix_value_decode(reader, sym - 256)
            dcode_sym = _read_symbol(reader, dist_tbl)
            dist_code = _prefix_value_decode(reader, dcode_sym)
            if dist_code <= 120:
                raise NotImplementedError(
                    "VP8L short-distance neighbor codes (1..120) "
                    "unsupported — this subset decodes absolute distances"
                )
            dist = dist_code - 120
            if dist > i:
                raise ValueError("VP8L back-reference before image start")
            for _ in range(length):
                if i >= npix:
                    raise ValueError("VP8L back-reference past image end")
                out[i] = out[i - dist]
                if cache_size:
                    r, g, b, a = (int(x) for x in out[i])
                    argb = (a << 24) | (r << 16) | (g << 8) | b
                    cache[((_HASH_MUL * argb) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
                i += 1
        else:
            argb = cache[sym - 256 - 24]
            out[i] = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                      argb & 0xFF, (argb >> 24) & 0xFF)
            i += 1

    img = out.reshape(h, w, 4)
    if subtract_green:
        # uint8 addition wraps mod 256 — identical to the spec's
        # (x + green) & 0xFF, in place, without materializing the 4x
        # int32 copy (peak memory for a max-dims image drops ~5x; the
        # pixel buffer is the format-capped 16384^2 x 4 = 1 GB).
        img[:, :, 0] += img[:, :, 1]
        img[:, :, 2] += img[:, :, 1]
    return img


# ------------------------------------------------------------- encode
def _write_prefix_code(
    wtr: _LsbWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Emit a prefix code (simple when ≤2 symbols, else CL-coded) and
    return the encode table."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    # The VP8L simple-code form stores symbols in at most 8 bits, so it
    # only fits symbols <= 255; green-channel LZ77 copy codes (256+c)
    # and color-cache codes (256+24+slot) must take the CL-coded path.
    if len(used) <= 2 and all(s <= 255 for s in used):
        wtr.write_bit(1)  # simple
        wtr.write_bit(1 if len(used) == 2 else 0)
        s0 = used[0] if used else 0
        wtr.write_bit(1)  # always 8-bit first symbol
        wtr.write_bits(s0, 8)
        if len(used) == 2:
            wtr.write_bits(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {s0: (0, 0)}
    if len(used) == 1:
        # single wide symbol: pad a never-emitted second symbol so the
        # CL-coded table forms a complete 1-bit canonical code
        lengths = list(lengths)
        lengths[used[0]] = 1
        lengths[0 if used[0] != 0 else 1] = 1
    wtr.write_bit(0)  # complex
    # run-length compress the lengths with 0-runs as 17/18
    events: list[tuple[int, int, int]] = []  # (cl_symbol, extra, nbits)
    i = 0
    n = len(lengths)
    # without the max-symbol short-circuit the decoder expects a code
    # length for every alphabet position — trailing zeros included
    last = n - 1
    while i <= last:
        ln = lengths[i]
        if ln == 0:
            run = 1
            while i + run <= last and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                events.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                events.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                events.append((0, 0, 0))
            i += run
        else:
            events.append((ln, 0, 0))
            i += 1
    cl_freq = [0] * 19
    for sym, _, _ in events:
        cl_freq[sym] += 1
    cl_lens = _huffman_lengths(cl_freq, max_len=7)
    if len([s for s, f in enumerate(cl_freq) if f > 0]) == 1:
        # CL table needs ≥ 2 defined lengths for a complete code; pad
        # with a second, never-used symbol of equal length
        only = next(s for s, f in enumerate(cl_freq) if f > 0)
        other = 0 if only != 0 else 1
        cl_lens = [0] * 19
        cl_lens[only] = 1
        cl_lens[other] = 1
    ncodes = 19
    while ncodes > 4 and cl_lens[_CL_ORDER[ncodes - 1]] == 0:
        ncodes -= 1
    wtr.write_bits(ncodes - 4, 4)
    for i2 in range(ncodes):
        wtr.write_bits(cl_lens[_CL_ORDER[i2]], 3)
    cl_codes = _canonical_codes(cl_lens)
    wtr.write_bit(0)  # no max-symbol short-circuit
    for sym, extra, nbits in events:
        code, ln = cl_codes[sym]
        wtr.write_code(code, ln)
        if nbits:
            wtr.write_bits(extra, nbits)
    return _canonical_codes(lengths)


def encode_webp_lossless(
    arr: np.ndarray, *, cache_bits: int = 6, use_subtract_green: bool = True
) -> bytes:
    """Encode an (H, W, 3) RGB / (H, W, 4) RGBA / (H, W) gray uint8
    array as a lossless VP8L WebP: subtract-green transform, color
    cache, run-length LZ77 (absolute distance codes), Huffman-complete
    canonical prefix codes. Round-trips bit-exactly through
    :func:`decode_webp`."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    if arr.shape[2] == 3:
        rgba = np.concatenate(
            [arr, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
        )
    else:
        rgba = arr.copy()
    px = rgba.reshape(-1, 4).astype(np.int32)
    if use_subtract_green:
        px[:, 0] = (px[:, 0] - px[:, 1]) & 0xFF
        px[:, 2] = (px[:, 2] - px[:, 1]) & 0xFF

    cache_size = 1 << cache_bits
    npix = px.shape[0]

    # ---- tokenize: run-length backrefs (dist 1), cache hits, literals
    tokens: list[tuple] = []  # ('lit',r,g,b,a) | ('copy',len) | ('cache',idx)
    cache = [-1] * cache_size

    def argb_of(i: int) -> int:
        r, g, b, a = (int(x) for x in px[i])
        return (a << 24) | (r << 16) | (g << 8) | b

    i = 0
    while i < npix:
        if i > 0 and np.array_equal(px[i], px[i - 1]):
            run = 1
            while i + run < npix and np.array_equal(px[i + run], px[i - 1]):
                run += 1
            tokens.append(("copy", run))
            for j in range(i, i + run):
                cache[((_HASH_MUL * argb_of(j)) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = argb_of(j)
            i += run
            continue
        argb = argb_of(i)
        slot = ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
        if cache[slot] == argb:
            tokens.append(("cache", slot))
        else:
            r, g, b, a = (int(x) for x in px[i])
            tokens.append(("lit", r, g, b, a))
        cache[slot] = argb
        i += 1

    # ---- symbol frequencies
    gfreq = [0] * (256 + 24 + cache_size)
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    dfreq = [0] * 40
    dist_code, dist_extra, dist_nbits = _prefix_value_encode(1 + 120)
    for t in tokens:
        if t[0] == "lit":
            _, r, g, b, a = t
            gfreq[g] += 1
            rfreq[r] += 1
            bfreq[b] += 1
            afreq[a] += 1
        elif t[0] == "copy":
            c, _, _ = _prefix_value_encode(t[1])
            gfreq[256 + c] += 1
            dfreq[dist_code] += 1
        else:
            gfreq[256 + 24 + t[1]] += 1

    # ---- emit
    wtr = _LsbWriter()
    wtr.write_bits(w - 1, 14)
    wtr.write_bits(h - 1, 14)
    wtr.write_bit(1 if arr.shape[2] == 4 else 0)  # alpha hint
    wtr.write_bits(0, 3)  # version
    if use_subtract_green:
        wtr.write_bit(1)
        wtr.write_bits(2, 2)  # SUBTRACT_GREEN
    wtr.write_bit(0)  # no more transforms
    wtr.write_bit(1)  # color cache present
    wtr.write_bits(cache_bits, 4)
    wtr.write_bit(0)  # no meta prefix image
    gcodes = _write_prefix_code(wtr, _huffman_lengths(gfreq))
    rcodes = _write_prefix_code(wtr, _huffman_lengths(rfreq))
    bcodes = _write_prefix_code(wtr, _huffman_lengths(bfreq))
    acodes = _write_prefix_code(wtr, _huffman_lengths(afreq))
    dcodes = _write_prefix_code(wtr, _huffman_lengths(dfreq))

    def emit(codes: dict, sym: int) -> None:
        code, ln = codes[sym]
        wtr.write_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            _, r, g, b, a = t
            emit(gcodes, g)
            emit(rcodes, r)
            emit(bcodes, b)
            emit(acodes, a)
        elif t[0] == "copy":
            c, extra, nbits = _prefix_value_encode(t[1])
            emit(gcodes, 256 + c)
            if nbits:
                wtr.write_bits(extra, nbits)
            emit(dcodes, dist_code)
            if dist_nbits:
                wtr.write_bits(dist_extra, dist_nbits)
        else:
            emit(gcodes, 256 + 24 + t[1])

    body = b"\x2f" + wtr.finish()
    # RIFF chunk size excludes the odd-length pad byte
    vp8l = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
