"""Baseline JPEG codec, stdlib + numpy only — fills the ``decode_jpeg``
kernel slot in `pipeline/multimodal.py` (reference consumes JPEG data
URLs in `vision.py:24-55`; VERDICT r3 next-round item 6).

Implements the baseline sequential DCT process from the public JPEG
spec (ITU-T T.81 / ISO 10918-1): marker parse (SOI/APPn/DQT/SOF0/DHT/
DRI/SOS), entropy decode with byte stuffing + restart markers, Huffman
DC prediction + AC run-length, dequantize, zigzag, 8×8 IDCT (separable
basis-matrix multiply), chroma upsampling for arbitrary sampling
factors (4:4:4 / 4:2:2 / 4:2:0), and YCbCr→RGB (JFIF full-range
BT.601). The companion encoder emits baseline 4:4:4 with the spec's
Annex-K quantization and Huffman tables, so decode can be round-trip
tested without any external image library.

Progressive (SOF2) is fully supported — multi-scan coefficient
accumulation with spectral selection AND successive approximation (DC
first/refine, AC first with EOB runs, AC refinement with correction
bits, T.81 Annex G), plus a progressive encoder whose scan script
exercises every path so decode round-trips without an external image
library. Arithmetic coding and 12-bit precision raise
``NotImplementedError`` — those remain injectable-kernel territory.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag order: index i of the scan → (row, col) flat offset in the block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 — standard quantization tables (natural order)
_STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_STD_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 — standard Huffman tables as (bits[1..16], values)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8×8 DCT-II basis matrix: C[u, x] = a(u) cos((2x+1)uπ/16).
# forward: F = C @ block @ C.T ; inverse: block = C.T @ F @ C
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at any non-stuffed marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                raise _RestartMarker(nxt)
            else:
                raise _EndOfScan()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_restart(self) -> None:
        """Drop partial byte, consume the 2-byte RSTn marker."""
        self.acc = 0
        self.nbits = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _EndOfScan(Exception):
    pass


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to an
    (H, W, 3) uint8 RGB array (grayscale broadcast to 3 channels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, components)
    progressive = False
    coef_store: list[np.ndarray] | None = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI — no length word follows
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, off)
                quant[tq] = tbl
                off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                values = list(seg[off + 17 : off + 17 + n])
                table = _build_decode_table(bits, values)
                (huff_ac if tc else huff_dc)[th] = table
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 0x0F, tq=tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (arithmetic/lossless/"
                "hierarchical) unsupported — inject an external kernel"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            if not progressive:
                scan_sel = {cs: (td, ta) for cs, td, ta in scan_comps}
                return _decode_scan(
                    payload, pos + seglen, frame, scan_sel, quant,
                    huff_dc, huff_ac, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if ss == 0 and se != 0:
                raise ValueError(
                    "progressive DC scan must have Se=0 (G.1.1.1.1); "
                    f"got Ss={ss}, Se={se}"
                )
            if coef_store is None:
                coef_store = _alloc_coef_store(frame)
            pos = _decode_progressive_scan(
                payload, pos + seglen, frame, scan_comps,
                ss, se, ah, al, huff_dc, huff_ac,
                restart_interval, coef_store,
            )
            continue
        elif marker == 0xD9:  # EOI
            break
        pos += seglen
    if progressive and coef_store is not None:
        return _reconstruct_progressive(frame, coef_store, quant)
    raise ValueError("no scan data found")


# --- progressive decode (T.81 Annex G) -----------------------------------


def _alloc_coef_store(frame) -> list[np.ndarray]:
    """Per-component coefficient accumulators at the interleaved-MCU
    grid size: (blocks_y, blocks_x, 64) int32, natural order filled via
    zigzag index at decode time (we keep SCAN order here and zigzag at
    reconstruction)."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _comp_block_grid(frame, ci) -> tuple[int, int]:
    """Non-interleaved block grid of component ci: ceil over the
    component's own sample dimensions (T.81 A.1.1)."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    c = comps[ci]
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _next_marker(data: bytes, pos: int) -> int:
    """Skip past any remaining entropy bytes to the next real marker."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return pos


def _decode_progressive_scan(
    data, pos, frame, scan_comps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval, coef_store,
):
    """One progressive scan: dispatch on (Ss, Ah) to DC-first /
    DC-refine / AC-first / AC-refine and update ``coef_store`` (scan-
    order coefficients). Returns the stream position of the next
    marker."""
    h, w, comps = frame
    cid_index = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(data, pos)
    state = {"eobrun": 0}

    def reset_state(pred):
        reader.align_and_skip_restart()
        state["eobrun"] = 0
        for i in range(len(pred)):
            pred[i] = 0

    try:
        if ss == 0:
            # DC scan — may be interleaved over multiple components
            members = [cid_index[cs] for cs, _, _ in scan_comps]
            tables = {cid_index[cs]: td for cs, td, _ in scan_comps}
            pred = [0] * len(comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            if len(members) == 1:
                ci = members[0]
                by, bx = _comp_block_grid(frame, ci)
                units = [
                    (ci, y, x) for y in range(by) for x in range(bx)
                ]
            else:
                units = []
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in members:
                            c = comps[ci]
                            for vy in range(c["v"]):
                                for vx in range(c["h"]):
                                    units.append(
                                        (ci, my * c["v"] + vy,
                                         mx * c["h"] + vx)
                                    )
            per_mcu = max(1, len(units) // max(1, mcux * mcuy)) \
                if len(members) > 1 else 1
            count = 0
            for ci, y, x in units:
                if restart_interval and count and count % (
                    restart_interval * per_mcu
                ) == 0:
                    try:
                        reset_state(pred)
                    except AssertionError:
                        pass
                try:
                    if ah == 0:
                        t = _decode_huffman(reader, huff_dc[tables[ci]])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef_store[ci][y, x, 0] = pred[ci] << al
                    else:
                        if reader.read_bit():
                            coef_store[ci][y, x, 0] |= 1 << al
                except _RestartMarker:
                    reset_state(pred)
                count += 1
        else:
            # AC scan — exactly one component (T.81 G.1.1.1.1)
            if len(scan_comps) != 1:
                raise ValueError("progressive AC scan must be single-component")
            cs, _, ta = scan_comps[0]
            ci = cid_index[cs]
            table = huff_ac[ta]
            by, bx = _comp_block_grid(frame, ci)
            count = 0
            for y in range(by):
                for x in range(bx):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        try:
                            reset_state([])
                        except AssertionError:
                            pass
                    blk = coef_store[ci][y, x]
                    try:
                        if ah == 0:
                            _ac_first(reader, table, blk, ss, se, al, state)
                        else:
                            _ac_refine(reader, table, blk, ss, se, al, state)
                    except _RestartMarker:
                        reset_state([])
                    count += 1
    except _EndOfScan:
        pass
    return _next_marker(data, reader.pos)


def _ac_first(reader, table, blk, ss, se, al, state):
    """AC first scan for one block (G.1.2.2): EOB runs + run-length
    coded magnitudes scaled by 2^Al. ``blk`` holds SCAN-order coefs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huffman(reader, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, table, blk, ss, se, al, state):
    """AC refinement scan for one block (G.1.2.3): correction bits for
    already-nonzero coefficients, newly visible ±1<<Al insertions, and
    EOB runs that still carry correction bits."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if reader.read_bit():
            if blk[k] > 0 and not (blk[k] & p1):
                blk[k] += p1
            elif blk[k] < 0 and not (blk[k] & p1):
                blk[k] += m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huffman(reader, table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    # FULL count here — the current block's remainder is
                    # handled (corrections + the decrement) by the
                    # trailing eobrun block below
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                newval = p1 if reader.read_bit() else m1
            # advance over r zero-history positions, correcting any
            # nonzero coefficients passed on the way
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # inside an EOB run: only correction bits for nonzero coefs
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(frame, coef_store, quant) -> np.ndarray:
    """Dequantize + IDCT every accumulated block and hand off to the
    shared upsample/color-convert tail."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        store = coef_store[ci]
        by, bx, _ = store.shape
        plane = np.zeros((by * 8, bx * 8), dtype=np.float32)
        q = quant[c["tq"]]
        for y in range(by):
            for x in range(bx):
                # store is SCAN order; zigzag to natural, then × the
                # natural-order quant table
                nat = np.zeros(64, dtype=np.float64)
                nat[_ZIGZAG] = store[y, x]
                block = (nat * q).reshape(8, 8)
                pix = _DCT_C.T @ block @ _DCT_C + 128.0
                plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = pix
        planes.append(plane)
    return _finish(planes, comps, h, w, hmax, vmax)


def _decode_scan(data, pos, frame, scan_sel, quant, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float32))
    pred = [0] * len(comps)
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_and_skip_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    td, ta = scan_sel[c["id"]]
                    q = quant[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coefs = _decode_block(
                                reader, huff_dc[td], huff_ac[ta], pred, ci
                            )
                            block = (coefs * q).astype(np.float64)
                            blk = block.reshape(8, 8)
                            pix = _DCT_C.T @ blk @ _DCT_C + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            except _RestartMarker:
                # tolerated: some encoders restart slightly early
                reader.align_and_skip_restart()
                pred = [0] * len(comps)
            except _EndOfScan:
                return _finish(planes, comps, h, w, hmax, vmax)
            mcu_count += 1
    return _finish(planes, comps, h, w, hmax, vmax)


def _decode_block(reader, dc_table, ac_table, pred, ci) -> np.ndarray:
    coefs = np.zeros(64, dtype=np.int32)
    t = _decode_huffman(reader, dc_table)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[ci] += diff
    coefs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huffman(reader, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coefs[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return coefs


def _finish(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    out = []
    for c, plane in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out.append(plane[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --- encoder (baseline 4:4:4, standard tables) ---------------------------


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (bit-length category, magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of a quant table (public libjpeg
    convention): q<50 → 5000/q %, else 200-2q %."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W, 3) uint8 RGB (or (H, W) gray) array as a
    baseline 4:4:4 JFIF JPEG with Annex-K tables."""
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    f = arr.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qluma = _quality_scale(_STD_QUANT_LUMA, quality)
    qchroma = _quality_scale(_STD_QUANT_CHROMA, quality)
    qtabs = [qluma] + ([] if gray else [qchroma])
    enc_dc = [_build_encode_table(*_STD_DC_LUMA),
              _build_encode_table(*_STD_DC_CHROMA)]
    enc_ac = [_build_encode_table(*_STD_AC_LUMA),
              _build_encode_table(*_STD_AC_CHROMA)]

    by = (h + 7) // 8
    bx = (w + 7) // 8
    writer = _BitWriter()
    pred = [0] * len(planes)
    for yb in range(by):
        for xb in range(bx):
            for ci, plane in enumerate(planes):
                tid = 0 if ci == 0 else 1
                block = np.full((8, 8), plane[min(yb * 8, h - 1),
                                              min(xb * 8, w - 1)])
                ys = min(8, h - yb * 8)
                xs = min(8, w - xb * 8)
                block[:ys, :xs] = plane[yb * 8 : yb * 8 + ys,
                                        xb * 8 : xb * 8 + xs]
                coefs = _DCT_C @ (block - 128.0) @ _DCT_C.T
                quantized = np.round(
                    coefs.reshape(64) / qtabs[tid]
                ).astype(np.int32)
                zz = quantized[_ZIGZAG]  # natural → scan order
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, mag = _magnitude(diff)
                code, ln = enc_dc[tid][t]
                writer.write(code, ln)
                if t:
                    writer.write(mag, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[tid][0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    s, mag = _magnitude(v)
                    code, ln = enc_ac[tid][(run << 4) | s]
                    writer.write(code, ln)
                    writer.write(mag, s)
                    run = 0
                if run:
                    code, ln = enc_ac[tid][0x00]  # EOB
                    writer.write(code, ln)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs):
        zzq = np.empty(64, dtype=np.uint8)
        zzq[:] = q[_ZIGZAG]
        out += seg(0xDB, bytes([tid]) + zzq.tobytes())
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    tables = [(0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA)]
    if not gray:
        tables += [(0x01, _STD_DC_CHROMA), (0x11, _STD_AC_CHROMA)]
    for tclass, (bits, values) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(values))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.buf
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive encoder (SOF2, 4:4:4, successive approximation) ----------

#: uniform-length custom Huffman tables for the progressive scans: the
#: Annex-K AC tables lack the EOBn (r<<4, r=1..14) symbols progressive
#: needs, so we emit canonical tables with every symbol at one length —
#: valid per T.81 C.2 as long as the all-ones code stays unassigned.
_PROG_DC_SPEC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_PROG_AC_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(14)]
_PROG_AC_SPEC = ([0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMBOLS),
                  0, 0, 0, 0, 0, 0, 0, 0], _PROG_AC_SYMBOLS)


def _quantized_planes(arr: np.ndarray, quality: int):
    """Shared front half of both encoders: color transform, 8×8 DCT,
    quantize, zigzag → per-component (by, bx, 64) int32 scan-order
    coefficient arrays + the quant tables used."""
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    f = arr.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qluma = _quality_scale(_STD_QUANT_LUMA, quality)
    qchroma = _quality_scale(_STD_QUANT_CHROMA, quality)
    qtabs = [qluma] + ([] if gray else [qchroma])
    by = (h + 7) // 8
    bx = (w + 7) // 8
    coef = []
    for ci, plane in enumerate(planes):
        tid = 0 if ci == 0 else 1
        out = np.zeros((by, bx, 64), dtype=np.int32)
        for yb in range(by):
            for xb in range(bx):
                block = np.full((8, 8), plane[min(yb * 8, h - 1),
                                              min(xb * 8, w - 1)])
                ys = min(8, h - yb * 8)
                xs = min(8, w - xb * 8)
                block[:ys, :xs] = plane[yb * 8 : yb * 8 + ys,
                                        xb * 8 : xb * 8 + xs]
                coefs = _DCT_C @ (block - 128.0) @ _DCT_C.T
                quantized = np.round(
                    coefs.reshape(64) / qtabs[tid]
                ).astype(np.int32)
                out[yb, xb] = quantized[_ZIGZAG]
        coef.append(out)
    return h, w, gray, coef, qtabs


class _ProgACWriter:
    """Encoder-side state for one progressive AC scan: EOB-run
    aggregation plus the refinement correction-bit buffer."""

    def __init__(self, writer: "_BitWriter", enc_ac: dict):
        self.w = writer
        self.enc = enc_ac
        self.eobrun = 0
        self.bits: list[int] = []  # correction bits pending an EOB flush

    def flush_eobrun(self) -> None:
        if self.eobrun == 0 and not self.bits:
            return
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = self.enc[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W, 3) uint8 RGB (or (H, W) gray) array as a
    progressive (SOF2) 4:4:4 JFIF JPEG whose scan script covers every
    Annex-G decode path: interleaved DC first (Al=1) + DC refinement,
    then per component two spectral AC bands (1-5, 6-63), each with a
    first pass at Al=1 (EOB runs) and a refinement pass to Al=0
    (correction bits + newly-visible insertions). Quantized
    coefficients are identical to :func:`encode_jpeg` at the same
    quality, so baseline and progressive decodes of the same image are
    exactly equal."""
    h, w, gray, coef, qtabs = _quantized_planes(arr, quality)
    ncomp = len(coef)
    by, bx, _ = coef[0].shape
    enc_dc = _build_encode_table(*_PROG_DC_SPEC)
    enc_ac = _build_encode_table(*_PROG_AC_SPEC)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs):
        zzq = np.empty(64, dtype=np.uint8)
        zzq[:] = q[_ZIGZAG]
        out += seg(0xDB, bytes([tid]) + zzq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(_PROG_DC_SPEC[0])
               + bytes(_PROG_DC_SPEC[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_PROG_AC_SPEC[0])
               + bytes(_PROG_AC_SPEC[1]))

    def sos_header(comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, 0x00])  # Td=0, Ta=0 (shared tables)
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # ---- scan 1: DC first, interleaved, Al=1
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    wtr = _BitWriter()
    pred = [0] * ncomp
    for yb in range(by):
        for xb in range(bx):
            for ci in range(ncomp):
                v = int(coef[ci][yb, xb, 0]) >> 1  # DC point transform
                diff = v - pred[ci]
                pred[ci] = v
                t, mag = _magnitude(diff)
                code, ln = enc_dc[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(mag, t)
    wtr.flush()
    out += wtr.buf

    # ---- per component, two spectral bands: AC first at Al=1
    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos_header([ci], ss, se, 0, 1)
            wtr = _BitWriter()
            ac = _ProgACWriter(wtr, enc_ac)
            for yb in range(by):
                for xb in range(bx):
                    blk = coef[ci][yb, xb]
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        temp = abs(v) >> 1
                        if temp == 0:
                            run += 1
                            continue
                        ac.flush_eobrun()
                        while run > 15:
                            code, ln = enc_ac[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        sv = temp if v > 0 else -temp
                        s, mag = _magnitude(sv)
                        code, ln = enc_ac[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(mag, s)
                        run = 0
                    if run:
                        ac.eobrun += 1
                        if ac.eobrun == 0x3FFF:
                            ac.flush_eobrun()
            ac.flush_eobrun()
            wtr.flush()
            out += wtr.buf

    # ---- DC refinement: one raw bit per block, interleaved
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    for yb in range(by):
        for xb in range(bx):
            for ci in range(ncomp):
                wtr.write(int(coef[ci][yb, xb, 0]) & 1, 1)
    wtr.flush()
    out += wtr.buf

    # ---- per component, two spectral bands: AC refinement to Al=0
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos_header([ci], ss, se, 1, 0)
            wtr = _BitWriter()
            ac = _ProgACWriter(wtr, enc_ac)
            for yb in range(by):
                for xb in range(bx):
                    blk = coef[ci][yb, xb]
                    absv = [abs(int(blk[k])) for k in range(64)]
                    # last newly-visible position in this band
                    eob = ss - 1
                    for k in range(ss, se + 1):
                        if absv[k] == 1:
                            eob = k
                    run = 0
                    pending: list[int] = []
                    for k in range(ss, se + 1):
                        temp = absv[k]
                        if temp == 0:
                            run += 1
                            continue
                        if temp > 1:
                            # previously visible: buffer its bit-0
                            pending.append(temp & 1)
                            continue
                        # newly visible (temp == 1)
                        ac.flush_eobrun()
                        while run > 15 and k <= eob:
                            code, ln = enc_ac[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                            for b in pending:
                                wtr.write(b, 1)
                            pending = []
                        code, ln = enc_ac[(run << 4) | 1]
                        wtr.write(code, ln)
                        wtr.write(1 if int(blk[k]) > 0 else 0, 1)
                        for b in pending:
                            wtr.write(b, 1)
                        pending = []
                        run = 0
                    if run > 0 or pending:
                        ac.eobrun += 1
                        ac.bits.extend(pending)
                        if ac.eobrun == 0x3FFF:
                            ac.flush_eobrun()
            ac.flush_eobrun()
            wtr.flush()
            out += wtr.buf

    out += b"\xff\xd9"
    return bytes(out)
