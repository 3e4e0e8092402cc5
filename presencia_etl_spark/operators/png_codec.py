"""Minimal pure-Python PNG codec — the real-decode fallback.

This container ships no image library (no Pillow, no ffmpeg), but PNG's
compression is zlib, which IS stdlib — so the multimodal operators'
"real" branch can decode actual pixels without any dependency: parse the
chunk stream, inflate IDAT, undo the per-scanline filters, normalize to
raw RGB. Scope is deliberately tiny (the test-fixture/smoke path, not a
production decoder): 8-bit depth, color types 0 (gray), 2 (RGB), 4
(gray+alpha), 6 (RGBA), no interlacing, no palette. Anything else — and
any non-PNG payload — raises, and callers fall back to their stub or to
PIL when it exists. Per-byte defiltering is Python-slow; production
decode belongs in PIL/libvips behind the same ``decode_real`` seam.

Reference: the PNG spec (RFC 2083) filter definitions; this is original
code against the spec, not a port.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[bytes, int, int]:
    """PNG bytes → (raw RGB bytes, width, height)."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); the "
            "fallback codec handles 8-bit non-interlaced gray/RGB/alpha"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    prev = bytearray(stride)
    out = bytearray()
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                upleft = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(left, prev[x], upleft)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        prev = line
        # Normalize to RGB.
        if color_type == 2:
            out.extend(line)
        elif color_type == 6:
            for x in range(0, stride, 4):
                out.extend(line[x : x + 3])
        elif color_type == 0:
            for v in line:
                out.extend((v, v, v))
        else:  # gray + alpha
            for x in range(0, stride, 2):
                v = line[x]
                out.extend((v, v, v))
    return bytes(out), width, height


def encode_png(rgb: bytes, width: int, height: int) -> bytes:
    """Raw RGB bytes → PNG (filter 0, one zlib stream). The fixture
    generator for tests and the inverse of ``decode_png``."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} RGB bytes, got {len(rgb)}"
        )
    stride = width * 3
    scan = bytearray()
    for y in range(height):
        scan.append(0)
        scan.extend(rgb[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def resize_rgb_nearest(
    rgb: bytes, width: int, height: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor RGB resample (numpy-vectorized) — the dependency-
    free stand-in for PIL's resize on the real branch."""
    import numpy as np

    arr = np.frombuffer(bytes(rgb), dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return arr[ys][:, xs].tobytes()
