"""Pure-Python (stdlib-only) image codecs for multimodal columns.

The container ships no image library, but real header decoding needs
none: PNG/GIF/BMP/JPEG dimensions, channel counts and bit depths are
plain struct fields behind magic bytes, and PNG/BMP pixel data is
reachable with ``zlib`` + the published filter algorithms. This module
gives the multimodal operators a REAL bytes→metadata (and, for
PNG/BMP, bytes→pixels) path instead of a stub:

- :func:`parse_image_header` — format/width/height/channels/bit depth
  from magic bytes (PNG IHDR, GIF logical screen descriptor, BMP
  BITMAPINFOHEADER, JPEG SOFn scan). Raises ``ValueError`` on
  unrecognized or truncated input.
- :func:`decode_pixels` — full pixel decode for non-interlaced 8-bit
  PNG (all five filter types) and uncompressed 24/32-bit BMP.
- :func:`channel_means` — per-channel mean intensity (the feature the
  decode stage emits).
- :func:`encode_png` / :func:`encode_bmp` / :func:`encode_gif` /
  :func:`encode_jpeg_header` — minimal valid encoders used to
  synthesize deterministic test/benchmark media without any library.

Format references are the public specs (PNG RFC 2083 / ISO 15948, the
GIF89a specification, the Windows BMP file format, JPEG ITU-T.81);
the reference repo's engine offloads media to external services
(``engine/spark.py:921-949`` reads raw binary files only), so this is
an extension surface, not a port.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# header parsing
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(content: bytes) -> Dict:
    """Identify an image from its magic bytes and parse its header.

    Returns ``{"format", "width", "height", "n_channels", "bit_depth"}``.
    Raises ``ValueError`` for anything unrecognized/truncated — callers
    surface that per-row as ``decode_error`` instead of failing a job.
    """
    if not content:
        raise ValueError("empty content")
    if content.startswith(_PNG_MAGIC):
        return _parse_png_header(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return _parse_gif_header(content)
    if content[:2] == b"BM":
        return _parse_bmp_header(content)
    if content[:2] == b"\xff\xd8":
        return _parse_jpeg_header(content)
    raise ValueError("unrecognized image format (no known magic bytes)")


def _parse_png_header(content: bytes) -> Dict:
    # first chunk must be IHDR: length(4) type(4) data(13) crc(4)
    if len(content) < 33 or content[12:16] != b"IHDR":
        raise ValueError("PNG: missing IHDR chunk")
    width, height = struct.unpack(">II", content[16:24])
    bit_depth, color_type = content[24], content[25]
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: invalid color type {color_type}")
    return {
        "format": "png",
        "width": width,
        "height": height,
        "n_channels": _PNG_CHANNELS[color_type],
        "bit_depth": bit_depth,
    }


def _parse_gif_header(content: bytes) -> Dict:
    if len(content) < 13:
        raise ValueError("GIF: truncated logical screen descriptor")
    width, height = struct.unpack("<HH", content[6:10])
    # palette-indexed RGB; bits per palette entry from the packed field
    packed = content[10]
    return {
        "format": "gif",
        "width": width,
        "height": height,
        "n_channels": 3,
        "bit_depth": (packed & 0x07) + 1,
    }


def _parse_bmp_header(content: bytes) -> Dict:
    if len(content) < 26:
        raise ValueError("BMP: truncated header")
    dib_size = struct.unpack("<I", content[14:18])[0]
    if dib_size >= 40:  # BITMAPINFOHEADER and later
        width, height = struct.unpack("<ii", content[18:26])
        bpp = struct.unpack("<H", content[28:30])[0]
    elif dib_size == 12:  # BITMAPCOREHEADER
        width, height = struct.unpack("<HH", content[18:22])
        bpp = struct.unpack("<H", content[24:26])[0]
    else:
        raise ValueError(f"BMP: unsupported DIB header size {dib_size}")
    return {
        "format": "bmp",
        "width": abs(width),
        "height": abs(height),
        "n_channels": 4 if bpp == 32 else (3 if bpp >= 16 else 1),
        "bit_depth": 8 if bpp >= 16 else bpp,
    }


# JPEG start-of-frame markers carrying dimensions (baseline, extended
# sequential, progressive, lossless, and the differential variants)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _parse_jpeg_header(content: bytes) -> Dict:
    i, n = 2, len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers, no length field
            continue
        if i + 4 > n:
            break
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 2 + seg_len > n or seg_len < 8:
                raise ValueError("JPEG: truncated SOF segment")
            precision = content[i + 4]
            height, width = struct.unpack(">HH", content[i + 5 : i + 9])
            n_components = content[i + 9]
            return {
                "format": "jpeg",
                "width": width,
                "height": height,
                "n_channels": n_components,
                "bit_depth": precision,
            }
        i += 2 + seg_len
    raise ValueError("JPEG: no SOF marker found")


# ---------------------------------------------------------------------------
# pixel decode (PNG 8-bit non-interlaced; BMP 24/32-bit uncompressed)
# ---------------------------------------------------------------------------

def decode_pixels(content: bytes) -> Tuple[Dict, List[bytes]]:
    """Decode pixels to scanlines of packed samples (top-down, one
    ``bytes`` of ``width * n_channels`` values per row).

    Supports non-interlaced 8-bit-per-sample PNG (gray, RGB, RGBA,
    gray+alpha — every filter type) and uncompressed 24/32-bit BMP.
    Header-only formats (GIF, JPEG) raise ``ValueError``; callers that
    just need metadata use :func:`parse_image_header`.
    """
    hdr = parse_image_header(content)
    if hdr["format"] == "png":
        return hdr, _decode_png_pixels(content, hdr)
    if hdr["format"] == "bmp":
        return hdr, _decode_bmp_pixels(content, hdr)
    raise ValueError(f"pixel decode not supported for {hdr['format']}")


def _iter_png_chunks(content: bytes):
    i = 8
    while i + 8 <= len(content):
        (length,) = struct.unpack(">I", content[i : i + 4])
        ctype = content[i + 4 : i + 8]
        data = content[i + 8 : i + 8 + length]
        yield ctype, data
        i += 12 + length
        if ctype == b"IEND":
            break


def _decode_png_pixels(content: bytes, hdr: Dict) -> List[bytes]:
    if hdr["bit_depth"] != 8:
        raise ValueError(f"PNG: only 8-bit decode supported, got {hdr['bit_depth']}")
    if content[26] != 0 or content[27] != 0 or content[28] != 0:
        # compression method / filter method must be 0; interlace 0
        raise ValueError("PNG: unsupported compression/filter/interlace method")
    if _PNG_CHANNELS.get(content[25]) is None or content[25] == 3:
        raise ValueError("PNG: palette images not supported for pixel decode")
    try:
        raw = zlib.decompress(
            b"".join(d for t, d in _iter_png_chunks(content) if t == b"IDAT")
        )
    except zlib.error as e:
        raise ValueError(f"PNG: corrupt IDAT stream ({e})") from e
    w, h, ch = hdr["width"], hdr["height"], hdr["n_channels"]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: IDAT size does not match dimensions")
    rows: List[bytes] = []
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: invalid filter type {ftype}")
        rows.append(bytes(line))
        prev = line
    return rows


def _decode_bmp_pixels(content: bytes, hdr: Dict) -> List[bytes]:
    if hdr["bit_depth"] != 8 or hdr["n_channels"] not in (3, 4):
        raise ValueError("BMP: only 24/32-bit uncompressed decode supported")
    compression = struct.unpack("<I", content[30:34])[0]
    if compression != 0:
        raise ValueError(f"BMP: compression {compression} not supported")
    (data_off,) = struct.unpack("<I", content[10:14])
    w, h, ch = hdr["width"], hdr["height"], hdr["n_channels"]
    height_raw = struct.unpack("<i", content[22:26])[0]
    row_bytes = ((w * ch + 3) // 4) * 4  # rows pad to 4-byte boundary
    rows: List[bytes] = []
    for y in range(h):
        # BMP stores bottom-up unless height is negative
        src_y = (h - 1 - y) if height_raw > 0 else y
        off = data_off + src_y * row_bytes
        line = content[off : off + w * ch]
        if len(line) != w * ch:
            raise ValueError("BMP: truncated pixel data")
        # BGR(A) → RGB(A)
        out = bytearray(w * ch)
        for x in range(w):
            px = x * ch
            out[px], out[px + 1], out[px + 2] = line[px + 2], line[px + 1], line[px]
            if ch == 4:
                out[px + 3] = line[px + 3]
        rows.append(bytes(out))
    return rows


def channel_means(rows: List[bytes], n_channels: int) -> List[float]:
    """Per-channel mean intensity over decoded scanlines, scaled to
    [0, 1] — the fixed-width feature the decode stage ships instead of
    pixels."""
    sums = [0] * n_channels
    count = 0
    for line in rows:
        count += len(line) // n_channels
        for x in range(0, len(line), n_channels):
            for c in range(n_channels):
                sums[c] += line[x + c]
    if count == 0:
        return [0.0] * n_channels
    return [s / count / 255.0 for s in sums]


# ---------------------------------------------------------------------------
# minimal encoders (deterministic synthetic media, stdlib only)
# ---------------------------------------------------------------------------

def encode_png(
    width: int,
    height: int,
    color: Tuple[int, int, int] = (0, 0, 0),
    pixels: Optional[List[bytes]] = None,
) -> bytes:
    """A valid non-interlaced 8-bit RGB PNG. ``pixels`` (scanlines of
    packed RGB) override the solid ``color`` fill."""
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    if pixels is None:
        line = bytes(color) * width
        raw = b"".join(b"\x00" + line for _ in range(height))
    else:
        raw = b"".join(b"\x00" + p for p in pixels)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(
    width: int,
    height: int,
    color: Tuple[int, int, int] = (0, 0, 0),
    pixels: Optional[List[bytes]] = None,
) -> bytes:
    """A valid 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up)."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (row_bytes - width * 3)
    if pixels is None:
        r, g, b = color
        line = bytes((b, g, r)) * width + pad  # stored BGR
        body = line * height
    else:
        # pixels are top-down RGB scanlines; store bottom-up BGR
        lines = []
        for p in reversed(pixels):
            bgr = bytearray(width * 3)
            for x in range(width):
                bgr[3 * x], bgr[3 * x + 1], bgr[3 * x + 2] = (
                    p[3 * x + 2], p[3 * x + 1], p[3 * x],
                )
            lines.append(bytes(bgr) + pad)
        body = b"".join(lines)
    data_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def encode_gif(width: int, height: int, color: Tuple[int, int, int] = (0, 0, 0)) -> bytes:
    """A valid single-frame GIF89a with a 2-entry palette and a minimal
    LZW-coded solid image (clear+stop codes only works for tiny images;
    we emit the canonical all-index-0 stream)."""
    # logical screen descriptor: global palette, 1 bit per entry
    lsd = struct.pack("<HHBBB", width, height, 0x80, 0, 0)
    palette = bytes(color) + b"\x00\x00\x00"
    # image descriptor covering the full canvas
    imgdesc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    # LZW minimum code size 2: clear=4, stop=5; emit pixel index 0
    # n_pixels times. Codes are 3 bits wide to start; emitting literal
    # 0 codes with periodic clears keeps the code width fixed at 3 —
    # valid and decoder-portable for arbitrary sizes.
    n = width * height
    bits: List[int] = []

    def put(code: int, width_bits: int = 3):
        for i in range(width_bits):
            bits.append((code >> i) & 1)

    put(4)  # initial clear
    for i in range(n):
        put(0)
        if i + 1 < n:
            # clear after every literal: the decoder dictionary never
            # grows, so the code width stays 3 bits under every bump
            # convention — wasteful but unambiguous for tiny synthetics
            put(4)
    put(5)  # stop
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)
    blocks = b""
    for i in range(0, len(data), 255):
        sub = bytes(data[i : i + 255])
        blocks += bytes([len(sub)]) + sub
    return (
        b"GIF89a" + lsd + palette + imgdesc + b"\x02" + blocks + b"\x00" + b"\x3b"
    )


def encode_jpeg_header(width: int, height: int, n_channels: int = 3) -> bytes:
    """SOI + JFIF APP0 + a baseline SOF0 segment (+EOI): enough for any
    header parser to read real dimensions. Not a decodable scan — pixel
    JPEG needs a DCT codec this container doesn't ship."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    comps = b"".join(
        bytes([cid + 1, 0x11, 0]) for cid in range(n_channels)
    )
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n_channels, 8, height, width, n_channels) + comps
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def resize_nearest(content: bytes, target_width: int, target_height: int) -> Dict:
    """Nearest-neighbor resize for decodable formats (8-bit PNG,
    24/32-bit BMP), re-encoded as PNG. Pure stdlib; returns
    ``{"content", "width", "height"}``. Header-only formats raise
    ``ValueError`` (their pixels need codecs this container lacks)."""
    hdr, rows = decode_pixels(content)
    w, h, ch = hdr["width"], hdr["height"], hdr["n_channels"]
    if ch not in (1, 3, 4):
        raise ValueError(f"resize: unsupported channel count {ch}")
    out_rows: List[bytes] = []
    for ty in range(target_height):
        sy = min(h - 1, (ty * h) // target_height)
        src = rows[sy]
        line = bytearray(target_width * 3)
        for tx in range(target_width):
            sx = min(w - 1, (tx * w) // target_width)
            px = sx * ch
            if ch == 1:
                r = g = b = src[px]
            else:
                r, g, b = src[px], src[px + 1], src[px + 2]
            tp = tx * 3
            line[tp], line[tp + 1], line[tp + 2] = r, g, b
        out_rows.append(bytes(line))
    return {
        "content": encode_png(target_width, target_height, pixels=out_rows),
        "width": target_width,
        "height": target_height,
    }


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM) — the one audio container fully decodable with stdlib
# ---------------------------------------------------------------------------

def parse_wav_header(content: bytes) -> Dict:
    """RIFF/WAVE fmt-chunk parse: channels, sample rate, bit depth,
    frame count, duration. Raises ``ValueError`` on anything that is
    not a RIFF/WAVE stream."""
    if not content or len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i, n = 12, len(content)
    fmt = None
    data_len = None
    while i + 8 <= n:
        cid = content[i : i + 4]
        (clen,) = struct.unpack("<I", content[i + 4 : i + 8])
        if cid == b"fmt " and i + 8 + 16 <= n:
            audio_fmt, channels, rate = struct.unpack("<HHI", content[i + 8 : i + 16])
            bits = struct.unpack("<H", content[i + 22 : i + 24])[0]
            fmt = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV: no fmt chunk")
    audio_fmt, channels, rate, bits = fmt
    frames = None
    duration_ms = None
    if data_len is not None and channels and bits:
        frames = data_len // (channels * (bits // 8 or 1))
        if rate:
            duration_ms = int(frames * 1000 / rate)
    return {
        "format": "wav",
        "codec": "pcm" if audio_fmt == 1 else f"fmt_{audio_fmt}",
        "n_channels": channels,
        "sample_rate": rate,
        "bit_depth": bits,
        "n_frames": frames,
        "duration_ms": duration_ms,
    }


def decode_wav_samples(content: bytes) -> Tuple[Dict, List[List[float]]]:
    """Decode 16-bit PCM WAV to per-channel float samples in [-1, 1].
    Only PCM-16 (the overwhelmingly common archival format) — anything
    else raises with the detected codec named."""
    hdr = parse_wav_header(content)
    if hdr["codec"] != "pcm" or hdr["bit_depth"] != 16:
        raise ValueError(
            f"WAV decode supports PCM-16 only; got {hdr['codec']}/{hdr['bit_depth']}-bit"
        )
    i, n = 12, len(content)
    raw = b""
    while i + 8 <= n:
        cid = content[i : i + 4]
        (clen,) = struct.unpack("<I", content[i + 4 : i + 8])
        if cid == b"data":
            raw = content[i + 8 : i + 8 + clen]
            break
        i += 8 + clen + (clen & 1)
    ch = hdr["n_channels"]
    vals = struct.unpack(f"<{len(raw) // 2}h", raw[: (len(raw) // 2) * 2])
    chans: List[List[float]] = [[] for _ in range(ch)]
    for j, v in enumerate(vals):
        chans[j % ch].append(v / 32768.0)
    return hdr, chans


def encode_wav(
    samples: List[List[float]], sample_rate: int = 16000
) -> bytes:
    """Minimal valid PCM-16 WAV from per-channel float samples."""
    ch = len(samples)
    frames = len(samples[0]) if ch else 0
    raw = bytearray()
    for j in range(frames):
        for c in range(ch):
            v = max(-1.0, min(1.0, samples[c][j]))
            raw += struct.pack("<h", int(round(v * 32767)))
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + bytes(raw)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
