"""Pure-Python image codec: header parsing, pixel decode (all PNG
filter types), encoder round-trips, error paths. No Spark session —
these run at import speed."""

import random
import struct
import zlib

import pytest

from feature_store_api_spark.operators import image_codec as ic


def test_header_parse_all_formats():
    assert ic.parse_image_header(ic.encode_png(6, 4)) == {
        "format": "png", "width": 6, "height": 4, "n_channels": 3, "bit_depth": 8,
    }
    assert ic.parse_image_header(ic.encode_bmp(5, 3)) == {
        "format": "bmp", "width": 5, "height": 3, "n_channels": 3, "bit_depth": 8,
    }
    g = ic.parse_image_header(ic.encode_gif(7, 2))
    assert (g["format"], g["width"], g["height"], g["n_channels"]) == ("gif", 7, 2, 3)
    j = ic.parse_image_header(ic.encode_jpeg_header(123, 45, 3))
    assert (j["format"], j["width"], j["height"], j["n_channels"]) == ("jpeg", 123, 45, 3)
    # grayscale jpeg
    j1 = ic.parse_image_header(ic.encode_jpeg_header(10, 20, 1))
    assert j1["n_channels"] == 1


def test_pixel_roundtrip_png_bmp():
    rnd = random.Random(3)
    pix = [bytes(rnd.randrange(256) for _ in range(8 * 3)) for _ in range(5)]
    for enc in (ic.encode_png, ic.encode_bmp):
        hdr, back = ic.decode_pixels(enc(8, 5, pixels=pix))
        assert back == pix, enc.__name__
        assert (hdr["width"], hdr["height"]) == (8, 5)


def test_channel_means_exact_on_solid_color():
    _, rows = ic.decode_pixels(ic.encode_png(6, 4, (10, 20, 30)))
    assert ic.channel_means(rows, 3) == [10 / 255, 20 / 255, 30 / 255]
    _, rows = ic.decode_pixels(ic.encode_bmp(5, 3, (200, 100, 50)))
    assert ic.channel_means(rows, 3) == [200 / 255, 100 / 255, 50 / 255]


def _png_with_filters(lines, w, h, ch, filters):
    """Hand-build a PNG whose scanlines use the given filter types."""
    stride = w * ch

    def filt(ftype, cur, prev):
        out = bytearray([ftype])
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                v = cur[x]
            elif ftype == 1:
                v = (cur[x] - a) & 0xFF
            elif ftype == 2:
                v = (cur[x] - b) & 0xFF
            elif ftype == 3:
                v = (cur[x] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (cur[x] - pred) & 0xFF
            out.append(v)
        return bytes(out)

    raw, prev = b"", bytes(stride)
    for cur, f in zip(lines, filters):
        raw += filt(f, cur, prev)
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_every_filter_type():
    rnd = random.Random(9)
    w, h, ch = 4, 5, 3
    lines = [bytes(rnd.randrange(256) for _ in range(w * ch)) for _ in range(h)]
    png = _png_with_filters(lines, w, h, ch, [0, 1, 2, 3, 4])
    _, back = ic.decode_pixels(png)
    assert back == lines


def test_error_paths():
    with pytest.raises(ValueError, match="empty"):
        ic.parse_image_header(b"")
    with pytest.raises(ValueError, match="unrecognized"):
        ic.parse_image_header(b"plain text, no magic")
    with pytest.raises(ValueError, match="IHDR"):
        ic.parse_image_header(b"\x89PNG\r\n\x1a\nxx")
    with pytest.raises(ValueError, match="SOF"):
        ic.parse_image_header(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    # GIF/JPEG are header-only for pixel decode
    with pytest.raises(ValueError, match="not supported"):
        ic.decode_pixels(ic.encode_gif(2, 2))
    # truncated IDAT → clear error, not garbage pixels
    png = bytearray(ic.encode_png(4, 4))
    with pytest.raises(ValueError):
        ic.decode_pixels(bytes(png[:40]) + b"\x00" * 20)
