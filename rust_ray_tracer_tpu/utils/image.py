"""PNG output.

The reference renders into a mutex-guarded ``RgbImage`` with a vertical flip
at pixel-write time (``/root/reference/src/main.rs:105-109``) and saves via
the ``image`` crate (``main.rs:116``). Here the renderer produces a top-down
[H,W,3] array on device; this module applies the same vertical flip and
encodes PNG on the host.

Encoding prefers the native C++ encoder (``native/rrt_native.cpp``, loaded
via ctypes) and falls back to a self-contained pure-Python zlib encoder —
no external imaging dependency either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an [H,W,3] uint8 array as an 8-bit RGB PNG."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3, "expected RGB"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def save_png(path: str, rgb: np.ndarray, flip_vertical: bool = True) -> None:
    """Save [H,W,3] u8. ``flip_vertical=True`` replicates the reference's
    ``put_pixel(x, height-1-y)`` convention (main.rs:108)."""
    img = np.asarray(rgb)
    if flip_vertical:
        img = img[::-1]
    try:
        from rust_ray_tracer_tpu.native import png_encode_native
        data = png_encode_native(img)
    except Exception:
        data = encode_png(img)
    with open(path, "wb") as f:
        f.write(data)


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder for 8-bit RGB/RGBA with filters 0-4 (used by
    golden-image tests and ImageTexture loading without PIL)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    bit_depth = color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    assert bit_depth == 8 and color_type in (2, 6), "only 8-bit RGB(A)"
    nch = 3 if color_type == 2 else 4
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        filt = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if filt == 0:
            cur = line
        elif filt == 1:
            cur = line.copy()
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif filt == 2:
            cur = (line + prev) & 0xFF
        elif filt == 3:
            cur = line.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:
            cur = line.copy()
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                cc = prev[i - nch] if i >= nch else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {filt}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, nch)[..., :3]
