"""From-scratch baseline JPEG codec (pure NumPy + stdlib) — ITU-T T.81
sequential DCT, Huffman entropy coding, 4:4:4 (no chroma subsampling).

Round-6 counterpart of ``sources/png.py``: the last compressed image format
implementable from public spec without external libs, closing the
multimodal-column story for real web-crawl payloads (the reference engine's
ecosystem delegates media handling to fluentd plugins; here decode is a
first-class columnar operator — see ``operators/multimodal.py``).

Implements the full baseline container and entropy layer:
- markers: SOI / APP0(JFIF) / DQT / SOF0 / DHT / SOS / EOI, byte stuffing
- quantization: Annex-K tables scaled by the libjpeg-convention quality
  knob (quality=100 → all-ones tables: the DCT round-trip is then exact
  for per-block-constant images, which is what makes an independent-SQL
  oracle possible for a lossy format — see the oracle query)
- entropy: canonical Huffman from DHT bits/values (the standard Annex-K
  tables are written, but the decoder always builds from the file's DHT,
  so encoder and decoder share no hidden state)
- transform: orthonormal 8×8 DCT-II/IDCT as two NumPy matmuls; JFIF
  YCbCr<->RGB with float rounding per spec

Limitations (raise, never silently wrong): baseline sequential only (no
progressive SOF2), 3-component 4:4:4 only, no restart intervals.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# standard Huffman specs: (bits[1..16] code-length histogram, values)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_CHROMA_SPEC = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# orthonormal DCT-II basis: D = C @ X @ C.T, X = C.T @ D @ C
_x = np.arange(8)
_C = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * 0.5
_C[0, :] = 0.5 / np.sqrt(2.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling; quality=100 → all ones."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) in canonical order (T.81 Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the inverse mapping the bit reader probes."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:           # stuffed 0xFF data byte
                self.pos += 2
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} "
                                 "inside entropy data")
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

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) — negatives in one's complement (F.1.4)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), \
        px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(px: np.ndarray, quality: int = 100) -> bytes:
    """RGB (h, w, 3) uint8 → baseline sequential JFIF bytes (4:4:4)."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w = px.shape[:2]
    qy = _scaled_quant(Q_LUMA, quality)
    qc = _scaled_quant(Q_CHROMA, quality)

    # pad to 8×8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = _rgb_to_ycbcr(px) - 128.0
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_codes = [_canonical_codes(*DC_LUMA_SPEC),
                _canonical_codes(*DC_CHROMA_SPEC)]
    ac_codes = [_canonical_codes(*AC_LUMA_SPEC),
                _canonical_codes(*AC_CHROMA_SPEC)]
    quants = [qy, qc, qc]
    tsel = [0, 1, 1]  # Huffman/quant table per component

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):  # interleaved Y, Cb, Cr per MCU (4:4:4)
                block = ycc[by:by + 8, bx:bx + 8, comp]
                q = np.round(_dct2(block) / quants[comp].reshape(8, 8)) \
                    .astype(np.int64)
                zz = q.reshape(64)[ZIGZAG]
                t = tsel[comp]
                # DC: differential, category + amplitude
                diff = int(zz[0]) - pred[comp]
                pred[comp] = int(zz[0])
                cat, amp = _magnitude(diff)
                code, ln = dc_codes[t][cat]
                bw.write(code, ln)
                if cat:
                    bw.write(amp, cat)
                # AC: run/size with ZRL and EOB
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) \
                    else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[t][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    cat, amp = _magnitude(v)
                    code, ln = ac_codes[t][(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(amp, cat)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[t][0x00]      # EOB
                    bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qy.reshape(64)[ZIGZAG].tolist()))
    out += _seg(0xDB, bytes([1]) + bytes(qc.reshape(64)[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)      # 1x1 sampling
    out += _seg(0xC0, sof)
    for tc_th, spec in (((0, 0), DC_LUMA_SPEC), ((0, 1), DC_CHROMA_SPEC),
                        ((1, 0), AC_LUMA_SPEC), ((1, 1), AC_CHROMA_SPEC)):
        tc, th = tc_th
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(spec[0])
                    + bytes(spec[1]))
    sos = bytes([3])
    for cid, t in ((1, 0), (2, 1), (3, 1)):
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JFIF bytes → RGB (h, w, 3) uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []   # (component id, sampling, tq)
    scan: list[tuple[int, int, int]] = []    # (component id, td, ta)
    data_at = -1

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # spec-legal fill: any run of 0xFF bytes may pad before the marker
        # byte (ITU T.81 §B.1.1.2) — real web-crawl JPEGs use this
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                    # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, stray RSTn) carry no length field
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        length = struct.unpack(">H", payload[pos:pos + 2])[0]
        if pos + length > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 2:pos + length]
        if marker == 0xDB:                    # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[o + 1:o + 65], dtype=np.uint8) \
                    .astype(np.int64)
                quants[tq] = tbl[UNZIGZAG].reshape(8, 8)
                o += 65
        elif marker == 0xC0:                  # SOF0 baseline
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = [(body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                     for i in range(nc)]
            if nc != 3 or any(s != 0x11 for _, s, _t in comps):
                raise NotImplementedError(
                    "only 3-component 4:4:4 baseline supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02x}")
        elif marker == 0xC4:                  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1:o + 17])
                nvals = sum(bits)
                values = list(body[o + 17:o + 17 + nvals])
                huff[(tc, th)] = _decode_table(bits, values)
                o += 17 + nvals
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:                  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0x0F) for i in range(ns)]
            data_at = pos + length
            break
        pos += length
    if data_at < 0 or not comps:
        raise ValueError("truncated JPEG (no SOS/SOF)")

    order = {cid: i for i, (cid, _s, _q) in enumerate(comps)}
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = np.zeros((3, ph, pw), dtype=np.float64)
    br = _BitReader(payload, data_at)
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for cid, td, ta in scan:
                ci = order[cid]
                q = quants[comps[ci][2]]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                zz = np.zeros(64, dtype=np.int64)
                cat = br.read_symbol(dc_tab)
                diff = _extend(br.read_bits(cat), cat)
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = br.read_symbol(ac_tab)
                    run, size = rs >> 4, rs & 0x0F
                    if rs == 0x00:            # EOB
                        break
                    if rs == 0xF0:            # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                coef = np.zeros(64, dtype=np.int64)
                coef[ZIGZAG] = zz
                planes[ci, by:by + 8, bx:bx + 8] = \
                    _idct2(coef.reshape(8, 8) * q)
    ycc = np.stack([planes[0], planes[1], planes[2]], axis=-1) + 128.0
    return _ycbcr_to_rgb(ycc)[:h, :w]
