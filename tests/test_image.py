"""PNG encode/decode roundtrip + vertical-flip convention."""

import numpy as np

from rust_ray_tracer_tpu.utils import image as im


def test_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    data = im.encode_png(rgb)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = im.decode_png(data)
    np.testing.assert_array_equal(back, rgb)


def test_save_flip(tmp_path):
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[0, 0] = (255, 0, 0)   # row 0 (camera-space bottom after flip)
    p = tmp_path / "out.png"
    im.save_png(str(p), rgb, flip_vertical=True)
    back = im.decode_png(p.read_bytes())
    # main.rs:108 put_pixel(x, height-1-y): row 0 ends up at the bottom
    np.testing.assert_array_equal(back[3, 0], [255, 0, 0])
    np.testing.assert_array_equal(back[0, 0], [0, 0, 0])


def test_decoder_handles_filters():
    """Exercise decode on an image with gradients (zlib may pick any
    filter; our encoder always uses filter 0, so synthesize filter-2)."""
    import struct
    import zlib
    h, w = 3, 5
    rows = []
    base = np.arange(w * 3, dtype=np.uint8).reshape(w, 3)
    prev = np.zeros((w, 3), np.int32)
    img = []
    for y in range(h):
        cur = (base + 10 * y).astype(np.uint8)
        img.append(cur)
        diff = ((cur.astype(np.int32) - prev) & 0xFF).astype(np.uint8)
        rows.append(b"\x02" + diff.tobytes())
        prev = cur.astype(np.int32)
    raw = b"".join(rows)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    back = im.decode_png(data)
    np.testing.assert_array_equal(back, np.stack(img))
