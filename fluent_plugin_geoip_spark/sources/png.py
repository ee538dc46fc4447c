"""From-scratch PNG codec (public W3C PNG spec, stdlib ``zlib`` only).

PNG is the ONE compressed media format implementable without external
libraries: the container is length-prefixed CRC-checked chunks, the stream
is DEFLATE (stdlib zlib), and the per-scanline filters are five small
integer predictors (spec §9: None/Sub/Up/Average/Paeth). This gives the
multimodal pipeline (``operators/multimodal.py``) a real compressed-image
decode path; JPEG and real audio/video containers still honestly raise —
their codecs are not reimplementable here.

Decoder support: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), no interlacing. Output is always (h, w, 3) uint8
RGB (gray replicated, alpha dropped) — the registry contract
``operators/multimodal.DECODERS`` expects.

Filter reconstruction is NumPy-vectorized where the spec's data dependence
allows: Sub is a wrapping per-column prefix sum (``np.add.accumulate`` with
uint8 wrap), Up a wrapping row add; Average and Paeth carry a true
left-neighbour dependence and run per-pixel (rows are independent of the
Python loop's cost profile at thumbnail sizes; at scale the decode runs
inside Arrow-batched ``mapInPandas`` so per-image cost parallelizes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth_scalar(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _iter_chunks(payload: bytes):
    pos = len(PNG_SIG)
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} fails CRC")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + ln
    raise ValueError("PNG truncated before IEND")


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB, pure stdlib-zlib + NumPy."""
    if not payload or not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    ihdr = plte = None
    idat: list[bytes] = []
    for ctype, data in _iter_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing/short IHDR")
    w, h = struct.unpack(">II", ihdr[:8])
    bit_depth, color_type, comp, filt, interlace = ihdr[8:13]
    if bit_depth != 8:
        raise ValueError(f"only 8-bit PNG supported (bit depth {bit_depth})")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("non-standard compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    if not idat:
        raise ValueError("PNG missing IDAT")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes, expected "
            f"{(stride + 1) * h}")
    rows = raw.reshape(h, stride + 1)
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(rows[y, 0]), rows[y, 1:].copy()
        if f == 0:                                    # None
            rec = line
        elif f == 1:                                  # Sub: prefix sum / bpp
            rec = np.add.accumulate(
                line.reshape(-1, ch), axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:                                  # Up
            rec = line + prev                         # uint8 wraps mod 256
        elif f == 3:                                  # Average (left dep)
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + (left + int(prev[x])) // 2) % 256
        elif f == 4:                                  # Paeth (left dep)
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x])
                          + _paeth_scalar(a, int(prev[x]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        recon[y] = rec
        prev = rec
    px = recon.reshape(h, w, ch)
    if color_type == 2:
        return px
    if color_type == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color_type == 3: palette
    if plte is None or len(plte) % 3:
        raise ValueError("palette PNG missing/bad PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    return pal[idx]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big"))


def _filter_row(f: int, row: np.ndarray, prev: np.ndarray,
                ch: int) -> np.ndarray:
    """Forward-apply filter ``f`` (encoder side, fully vectorized — every
    predictor input is a known reconstructed byte)."""
    r = row.astype(np.int64)
    left = np.zeros_like(r)
    left[ch:] = r[:-ch]
    up = prev.astype(np.int64)
    upleft = np.zeros_like(up)
    upleft[ch:] = up[:-ch]
    if f == 0:
        pred = 0
    elif f == 1:
        pred = left
    elif f == 2:
        pred = up
    elif f == 3:
        pred = (left + up) // 2
    elif f == 4:
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, upleft))
    else:
        raise ValueError(f"bad filter type {f}")
    return ((r - pred) % 256).astype(np.uint8)


def encode_png(pixels: np.ndarray, filters: str | int = "cycle",
               level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, 8-bit, no interlace).

    ``filters``: an int pins one filter type for every row; ``"cycle"``
    (default) uses ``row % 5`` so a single fixture exercises all five
    reconstruction paths in the decoder."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_png expects (h, w, 3) RGB")
    flat = px.reshape(h, w * 3)
    out = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        f = (y % 5) if filters == "cycle" else int(filters)
        out.append(bytes([f]) + _filter_row(f, flat[y], prev, 3).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(out), level))
            + _chunk(b"IEND", b""))
