"""PNG encode/decode roundtrip + vertical-flip convention."""

import numpy as np
import pytest

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


def test_decode_jpeg_baseline():
    """The self-contained baseline JPEG decoder (texture fallback when
    PIL is absent — texture.rs:84-131 surface) vs PIL's libjpeg, for
    4:4:4 / 4:2:2 / 4:2:0 and greyscale."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 / w), (yy * 255 / h),
                    ((xx + yy) * 255 / (w + h))], -1).astype(np.uint8)
    for subs in (0, 1, 2):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90,
                                  subsampling=subs)
        ours = im.decode_jpeg(buf.getvalue())
        ref = np.asarray(Image.open(buf).convert("RGB"))
        assert ours.shape == ref.shape
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 8

    buf = io.BytesIO()
    Image.fromarray(img[:, :, 0]).save(buf, format="JPEG", quality=85)
    ours = im.decode_jpeg(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)


def test_image_texture_jpeg_fallback(tmp_path, monkeypatch):
    """ImageTexture loads a JPEG through the self-contained decoder when
    PIL import is blocked (models/scene.py fallback chain)."""
    pytest.importorskip("PIL")
    import builtins
    import io

    from PIL import Image

    from rust_ray_tracer_tpu.models.scene import ImageTexture

    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :8] = (200, 40, 40)
    img[:, 8:] = (40, 200, 40)
    p = tmp_path / "tex.jpg"
    Image.fromarray(img).save(p, format="JPEG", quality=95)

    real_import = builtins.__import__

    def no_pil(name, *a, **k):
        if name.startswith("PIL"):
            raise ImportError("blocked")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pil)
    out = ImageTexture(path=str(p)).load()
    assert out is not None and out.shape == (16, 16, 3)
    assert abs(float(out[:, :4, 0].mean()) - 200 / 255) < 0.06
    assert abs(float(out[:, 12:, 1].mean()) - 200 / 255) < 0.06


@pytest.mark.parametrize("block_pil", [False, True],
                         ids=["via-PIL", "self-contained"])
@pytest.mark.parametrize("fmt,kw", [
    ("BMP", {}),
    ("GIF", {}),
    ("TIFF", {}),
    ("PNG", {}),
    ("JPEG", {"quality": 95, "progressive": True}),  # progressive scan
])
def test_image_texture_format_breadth(tmp_path, monkeypatch, fmt, kw,
                                      block_pil):
    """The reference's `image` crate reads PNG/JPEG/BMP/GIF/TIFF
    (texture.rs:84-107); ImageTexture covers the same breadth BOTH via
    PIL and via the self-contained decoders (utils/image.decode_image)
    when PIL import is blocked."""
    pytest.importorskip("PIL")
    import builtins

    from PIL import Image

    from rust_ray_tracer_tpu.models.scene import ImageTexture

    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :8] = (200, 40, 40)
    img[:, 8:] = (40, 200, 40)
    p = tmp_path / f"tex.{fmt.lower()}"
    Image.fromarray(img).save(p, format=fmt, **kw)

    if block_pil:
        real_import = builtins.__import__

        def no_pil(name, *a, **k):
            if name.startswith("PIL"):
                raise ImportError("blocked")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_pil)

    out = ImageTexture(path=str(p)).load()
    assert out is not None and out.shape == (16, 16, 3)
    assert abs(float(out[:, :4, 0].mean()) - 200 / 255) < 0.06
    assert abs(float(out[:, 12:, 1].mean()) - 200 / 255) < 0.06


def _grad(h=41, w=57):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx * 255 / w, yy * 255 / h,
                     (xx + yy) * 255 / (w + h)], -1).astype(np.uint8)


def test_decode_jpeg_progressive():
    """Progressive (SOF2) decode — spectral selection + successive
    approximation, all subsamplings, greyscale, restart markers — vs
    PIL's libjpeg (texture.rs:84-107 `image`-crate surface)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    img = _grad()
    for subs in (0, 1, 2):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90,
                                  subsampling=subs, progressive=True)
        ours = im.decode_jpeg(buf.getvalue())
        ref = np.asarray(Image.open(buf).convert("RGB"))
        assert ours.shape == ref.shape
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 8

    buf = io.BytesIO()
    Image.fromarray(img[:, :, 0]).save(buf, format="JPEG", quality=85,
                                       progressive=True)
    ours = im.decode_jpeg(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90,
                              progressive=True, restart_marker_blocks=2)
    ours = im.decode_jpeg(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("RGB"))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 8


def test_decode_bmp_gif_tiff_exact():
    """Lossless-format decoders are bitwise vs PIL: BMP 24-bit, GIF
    (palette), TIFF raw/PackBits/LZW + greyscale."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (41, 57, 3), dtype=np.uint8)

    buf = io.BytesIO()
    Image.fromarray(noise).save(buf, format="BMP")
    np.testing.assert_array_equal(im.decode_image(buf.getvalue()), noise)

    pal_img = (noise // 32) * 32   # <=256 colors -> exact GIF roundtrip
    buf = io.BytesIO()
    Image.fromarray(pal_img).save(buf, format="GIF")
    ref = np.asarray(Image.open(buf).convert("RGB"))
    np.testing.assert_array_equal(im.decode_image(buf.getvalue()), ref)

    for comp in (None, "packbits", "tiff_lzw"):
        buf = io.BytesIO()
        kw = {"compression": comp} if comp else {}
        Image.fromarray(noise).save(buf, format="TIFF", **kw)
        np.testing.assert_array_equal(im.decode_image(buf.getvalue()),
                                      noise, err_msg=f"tiff {comp}")

    buf = io.BytesIO()
    Image.fromarray(noise[..., 0]).save(buf, format="TIFF")
    np.testing.assert_array_equal(
        im.decode_image(buf.getvalue()),
        np.stack([noise[..., 0]] * 3, -1))
