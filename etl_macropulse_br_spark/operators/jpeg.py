"""Baseline JPEG codec on pure stdlib + numpy.

Mirrors the PNG work in :mod:`.multimodal` (reference behavior:
``src/pipeline.py`` treats media payloads as opaque bytes; this repo
extends the surface with real decode so the multimodal curation plan
exercises a genuine codec in codec-less containers): ITU T.81
baseline sequential DCT (SOF0), Huffman entropy coding, standard
Annex K tables in the encoder, arbitrary DHT/DQT in the decoder,
4:4:4 and subsampled (4:2:0 / 4:2:2) layouts, restart intervals.

Contract (same as the PNG path): malformed payloads raise
``ValueError`` (→ ``decode_ok=False`` / resize pass-through);
valid-but-unsupported variants (progressive SOF2, arithmetic coding,
12-bit precision) raise ``NotImplementedError`` (→ stub fallback /
pass-through). The IDCT is floating-point (orthonormal separable
8×8), so decode is standards-accurate but NOT bit-identical to
libjpeg's fixed-point fast paths — tests therefore pin exactness on
this codec's own round-trips (flat blocks are DC-only and exact) and
tolerance bands elsewhere, never cross-library bit equality.

Everything here runs inside Arrow-batched executors via
``multimodal.extract_features`` / ``resize_plan``; no driver-side
byte handling.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared transform pieces

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16).
# Forward per block: F = C @ B @ C.T ; inverse: B = C.T @ F @ C.
_DCT_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ],
    dtype=np.float64,
)

# Annex K quantization tables (K.1 luminance, K.2 chrominance),
# natural (row-major) order.
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL).
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], values: list[int]):
    """(length, code) → value map per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if idx >= len(values):
                raise ValueError("JPEG Huffman table BITS/HUFFVAL mismatch")
            table[(length, code)] = values[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], values: list[int]):
    """value → (code, length) map for the encoder."""
    return {
        v: (code, length)
        for (length, code), v in _canonical_codes(bits, values).items()
    }


# ---------------------------------------------------------------------------
# Bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1s (T.81 F.1.2.3)
        self._acc = 0
        self._n = 0


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling
    0xFF00 stuffing; stops (raises StopIteration semantics as
    ValueError) at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data ended at marker")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                raise ValueError("JPEG entropy data ended at marker")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Discard pad bits, consume one RSTn marker."""
        self._acc = 0
        self._n = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("JPEG restart marker expected")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError("JPEG restart marker expected")
        self.pos += 2

    def decode_huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Encoder


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int64)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane → (H/8 * W/8, 8, 8) blocks, row-major block order.
    H and W must already be multiples of 8."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to_block(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to (bh, bw) multiples (T.81 A.2.4 recommends
    replication so padded pixels don't ring into real ones)."""
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_component_blocks(
    blocks_q: np.ndarray, dc_map, ac_map, writer: _BitWriter, pred: int
) -> int:
    """Entropy-encode quantized blocks (already in MCU order for this
    component). Returns the updated DC predictor."""
    for blk in blocks_q:
        zz = blk.reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = int(abs(diff)).bit_length()
        code, length = dc_map[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            if k > last_nz:
                code, length = ac_map[0x00]  # EOB
                writer.write(code, length)
                break
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_map[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = abs(v).bit_length()
            code, length = ac_map[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
    return pred


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in table[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def _dht_segment(cls: int, tid: int, spec) -> bytes:
    bits, values = spec
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal deterministic baseline JPEG writer (stdlib + numpy):
    SOF0, Annex K quant (quality-scaled, libjpeg convention) and
    Huffman tables, grayscale or JFIF YCbCr with 4:4:4 / 4:2:0
    subsampling, optional restart intervals. ``pixels`` is row-major
    gray (channels=1) or RGB (channels=3) bytes. Exists so tests and
    the resize pass can craft exact inputs without a codec library
    (same role as :func:`.multimodal.png_encode`)."""
    if channels not in (1, 3):
        raise ValueError("jpeg_encode writes gray or RGB only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    a = a.astype(np.float64)

    q_lum = _quality_scale(_Q_LUM, quality)
    q_chr = _quality_scale(_Q_CHR, quality)

    if channels == 1:
        planes = [a[:, :, 0]]
        samp = [(1, 1)]
        qsel = [q_lum]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            # Box-average chroma over 2x2 (pad odd dims first).
            cbp = _pad_to_block(cb, 2, 2)
            crp = _pad_to_block(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [q_lum, q_chr, q_chr]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # Quantized blocks per component, indexed [mcu_y][mcu_x][v][h].
    comp_blocks = []
    for plane, (sh, sv), q in zip(planes, samp, qsel):
        # Edge-replicate to full MCU coverage (dims = mcus * 8 * samp).
        target_h, target_w = 8 * mcus_y * sv, 8 * mcus_x * sh
        ph, pw = plane.shape
        if ph < target_h or pw < target_w:
            plane = np.pad(
                plane, ((0, target_h - ph), (0, target_w - pw)), mode="edge"
            )
        shifted = plane - 128.0
        blocks = _blocks_of(shifted)
        coeffs = _DCT_C @ blocks @ _DCT_C.T
        quant = np.rint(coeffs / q.reshape(8, 8)).astype(np.int64)
        comp_blocks.append(
            quant.reshape(target_h // 8, target_w // 8, 8, 8)
        )

    dc_lum = _encode_codes(*_HUFF_DC_LUM)
    ac_lum = _encode_codes(*_HUFF_AC_LUM)
    dc_chr = _encode_codes(*_HUFF_DC_CHR)
    ac_chr = _encode_codes(*_HUFF_AC_CHR)
    maps = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (len(planes) - 1)

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, ((sh, sv), (dc_map, ac_map)) in enumerate(zip(samp, maps)):
                blks = [
                    comp_blocks[ci][my * sv + by, mx * sh + bx]
                    for by in range(sv)
                    for bx in range(sh)
                ]
                preds[ci] = _encode_component_blocks(
                    np.stack(blks), dc_map, ac_map, writer, preds[ci]
                )
            mcu_count += 1
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _dqt_segment(0, q_lum)
    if channels == 3:
        out += _dqt_segment(1, q_chr)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _HUFF_DC_LUM)
    out += _dht_segment(1, 0, _HUFF_AC_LUM)
    if channels == 3:
        out += _dht_segment(0, 1, _HUFF_DC_CHR)
        out += _dht_segment(1, 1, _HUFF_AC_CHR)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder


def jpeg_read(content: bytes):
    """Decode a baseline JPEG → (width, height, channels, uint8 array
    of shape (height, width, channels)). Channels is 1 (grayscale)
    or 3 (YCbCr upsampled to full resolution, still in YCbCr order —
    callers convert). Raises ValueError on corrupt streams,
    NotImplementedError on valid-but-unsupported variants."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    n = len(content)
    while pos + 1 < n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte before a marker
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > n:
            raise ValueError("JPEG segment length truncated")
        seglen = struct.unpack(">H", content[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > n:
            raise ValueError("JPEG segment overruns stream")
        body = content[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                if i + 65 > len(body):
                    raise ValueError("JPEG DQT truncated")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("JPEG DHT truncated")
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                if i + 17 + cnt > len(body):
                    raise ValueError("JPEG DHT values truncated")
                values = list(body[i + 17 : i + 17 + cnt])
                htables[(cls, tid)] = _canonical_codes(bits, values)
                i += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tsel = body[1 + si * 2 : 3 + si * 2]
                scan.append((cs, tsel >> 4, tsel & 0x0F))
            break  # entropy data follows
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF or SOS")
    width, height, comps = frame
    if width == 0 or height == 0:
        raise ValueError("JPEG zero dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("JPEG zero sampling factor")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    comp_by_id = {c[0]: c for c in comps}
    order = []
    for cs, dc_id, ac_id in scan:
        if cs not in comp_by_id:
            raise ValueError("JPEG scan references unknown component")
        cid, sh, sv, tq = comp_by_id[cs]
        if tq not in qtables:
            raise ValueError("JPEG scan references missing quant table")
        if (0, dc_id) not in htables or (1, ac_id) not in htables:
            raise ValueError("JPEG scan references missing Huffman table")
        order.append((sh, sv, qtables[tq], htables[(0, dc_id)], htables[(1, ac_id)]))
    if len(order) != len(comps):
        raise NotImplementedError("multi-scan JPEG is not supported")

    # Coefficient planes per component.
    coeff = [
        np.zeros((mcus_y * sv * 8, mcus_x * sh * 8), dtype=np.float64)
        for (sh, sv, _, _, _) in order
    ]
    reader = _BitReader(content, pos)
    preds = [0] * len(order)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(order)
            for ci, (sh, sv, q, dct, act) in enumerate(order):
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_huff(dct)
                        if s > 11:
                            raise ValueError("JPEG DC category out of range")
                        diff = _extend(reader.bits(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[_ZIGZAG] = zz
                        blk = nat.reshape(8, 8) * q
                        pix = _DCT_C.T @ blk.astype(np.float64) @ _DCT_C
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        coeff[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    out_planes = []
    for (sh, sv, _, _, _), plane in zip(order, coeff):
        pix = np.clip(np.rint(plane + 128.0), 0, 255).astype(np.uint8)
        # Crop to component resolution, then replicate up to full.
        cw = -(-width * sh // hmax)
        ch = -(-height * sv // vmax)
        pix = pix[:ch, :cw]
        if sh != hmax or sv != vmax:
            pix = np.repeat(np.repeat(pix, vmax // sv, axis=0), hmax // sh, axis=1)
        out_planes.append(pix[:height, :width])
    arr = np.stack(out_planes, axis=-1)
    return width, height, arr.shape[-1], arr


def jpeg_luminance(content: bytes):
    """(width, height, float64 luminance array) for a JPEG payload.
    Grayscale → samples as-is; YCbCr → JFIF inverse transform to RGB
    (rounded, clamped) then the same integer ITU-R 601-2 fold the PNG
    path uses, so both codecs share one luminance definition."""
    width, height, channels, arr = jpeg_read(content)
    if channels == 1:
        return width, height, arr[:, :, 0].reshape(-1).astype(np.float64)
    y = arr[:, :, 0].astype(np.float64)
    cb = arr[:, :, 1].astype(np.float64) - 128.0
    cr = arr[:, :, 2].astype(np.float64) - 128.0
    r = np.clip(np.rint(y + 1.402 * cr), 0, 255).astype(np.uint32)
    g = np.clip(
        np.rint(y - 0.344136286 * cb - 0.714136286 * cr), 0, 255
    ).astype(np.uint32)
    b = np.clip(np.rint(y + 1.772 * cb), 0, 255).astype(np.uint32)
    lum = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
    return width, height, lum.reshape(-1).astype(np.float64)
