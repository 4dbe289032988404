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


# ---------------------------------------------------------------------------
# Baseline JPEG decoder (pure numpy) — the PIL-free fallback for
# ImageTexture (models/scene.py). The reference reads textures with the
# `image` crate (texture.rs:84-131); this covers the same practical
# surface for its assets: baseline sequential DCT (SOF0), 8-bit, greyscale
# or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers.
# Progressive/arithmetic JPEGs raise ValueError (caller degrades to the
# reference's solid-yellow missing-texture behaviour).
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal 8-point DCT-II basis; IDCT(block) = A.T @ block @ A
_DCT_A = np.array([[np.cos((2 * j + 1) * i * np.pi / 16)
                    * (np.sqrt(0.125) if i == 0 else 0.5)
                    for j in range(8)] for i in range(8)])


class _Bits:
    """MSB-first bit reader over entropy-coded data (FF00 unstuffed)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read(self) -> int:
        b = self.d[self.pos]
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, n: int) -> int:
    """JPEG F.2.2.1 sign extension."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def _huff_table(bits_counts, symbols):
    """code -> symbol dict keyed by (length, code)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 [H, W, 3]."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt = {}
    huff_dc, huff_ac = {}, {}
    comps = None
    h = w = 0
    restart_interval = 0
    i = 2
    scan = None
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = (data[i] << 8) | data[i + 1]
        seg = data[i + 2:i + seg_len]
        if marker == 0xDB:                       # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    tbl = np.frombuffer(seg[j:j + 128],
                                        dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    tbl = np.frombuffer(seg[j:j + 64],
                                        dtype=np.uint8).astype(np.int32)
                    j += 64
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):             # SOF0/1 (baseline)
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline JPEG supported")
        elif marker == 0xC4:                     # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1:j + 17])
                n = sum(counts)
                syms = list(seg[j + 17:j + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _huff_table(counts,
                                                               syms)
                j += 17 + n
        elif marker == 0xDD:                     # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                sel[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4,
                                       seg[2 + 2 * c] & 15)
            # entropy-coded data runs from here to the next real marker
            j = i + seg_len
            chunks = []
            while j < len(data) - 1:
                if data[j] == 0xFF and data[j + 1] not in (0x00,):
                    if 0xD0 <= data[j + 1] <= 0xD7:
                        chunks.append(b"\xff" + bytes([data[j + 1]]))
                        j += 2
                        continue
                    break
                if data[j] == 0xFF:
                    chunks.append(b"\xff")
                    j += 2
                else:
                    chunks.append(bytes([data[j]]))
                    j += 1
            scan = (sel, b"".join(chunks))
            i = j
            continue
        i += seg_len
    if comps is None or scan is None:
        raise ValueError("incomplete JPEG")

    sel, payload = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               np.float32))

    # split payload on restart markers
    segments = []
    if restart_interval:
        seg_bytes = []
        j = 0
        cur = bytearray()
        while j < len(payload):
            if (payload[j] == 0xFF and j + 1 < len(payload)
                    and 0xD0 <= payload[j + 1] <= 0xD7):
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
            else:
                cur.append(payload[j])
                j += 1
        segments.append(bytes(cur))
    else:
        segments = [payload.replace(b"\xff\xd0", b"")]

    pred = [0] * len(comps)
    bits = _Bits(segments[0])
    seg_idx = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                seg_idx += 1
                bits = _Bits(segments[seg_idx])
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        s = _huff_decode(bits, huff_dc[dc_t])
                        diff = _extend(bits.receive(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(bits, huff_ac[ac_t])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            zz[k] = _extend(bits.receive(s), s)
                            k += 1
                        blk = np.zeros(64, np.float32)
                        blk[_ZIGZAG] = zz * qt[c["tq"]]
                        px = _DCT_A.T @ blk.reshape(8, 8) @ _DCT_A
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px + 128.0

    # upsample to full resolution and convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = full[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
