"""Pure-Python baseline image codecs (PNG + BMP) for the multimodal
pipeline.

The container has no PIL/libav, but neither format needs one at baseline
fidelity: BMP 24-bit is uncompressed, and PNG's only mandatory
compression is zlib (stdlib). These codecs exist so the multimodal
operators (functions/multimodal.py) compute features from REAL decoded
pixels instead of byte-fold fakes — the decode kernel a production
pipeline would swap for a SIMD codec, with identical schema and batch
mechanics.

Scope (documented, asserted): 8-bit depth; PNG color types 0 (grey),
2 (RGB), 6 (RGBA), non-interlaced, all five scanline filters; BMP
24-bit uncompressed bottom-up. Encoders emit RGB; decoders return
row-major top-down RGB (grey expanded, alpha dropped) so every caller
sees one layout.

Everything here is per-item CPU work executed inside Arrow-batched
``mapInPandas`` kernels — no Spark dependency in this module, so the
functions are unit-testable without a session and pickle cheaply to
executors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal RGB8 PNG: one IDAT, filter 0 on every scanline. ``rgb``
    is row-major top-down, 3 bytes/pixel, len == width*height*3."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo PNG scanline filters (types 0-4). ``bpp`` = bytes per pixel.

    Fast path: when every scanline uses filter 0 (what ``encode_png``
    emits, and what many encoders pick for synthetic/flat content) the
    filter bytes are stripped with one vectorized reshape instead of the
    per-byte Python loop — the loop is the general-correctness fallback
    for arbitrary PNGs."""
    stride = width * bpp
    arr = np.frombuffer(raw, dtype=np.uint8)
    if len(arr) == height * (stride + 1):
        rows = arr.reshape(height, stride + 1)
        if height and not rows[:, 0].any():  # all filter type 0
            return bytearray(rows[:, 1:].tobytes())
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev_base = base - stride
        for x in range(stride):
            a = out[base + x - bpp] if x >= bpp else 0           # left
            b = out[prev_base + x] if y > 0 else 0               # up
            c = out[prev_base + x - bpp] if (y > 0 and x >= bpp) else 0  # up-left
            v = line[x]
            if ftype == 0:
                r = v
            elif ftype == 1:
                r = v + a
            elif ftype == 2:
                r = v + b
            elif ftype == 3:
                r = v + (a + b) // 2
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r = v + pred
            else:
                raise ValueError(f"unsupported PNG filter type {ftype}")
            out[base + x] = r & 0xFF
    return out


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit non-interlaced PNG (grey/RGB/RGBA) to
    ``(width, height, rgb)`` with rgb row-major top-down 3 B/px."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG layout: depth={depth} interlace={interlace}"
                )
            if color_type not in (0, 2, 6):
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    pix = _unfilter(zlib.decompress(bytes(idat)), width, height, bpp)
    if color_type == 2:
        return width, height, bytes(pix)
    rgb = bytearray(width * height * 3)
    if color_type == 0:  # grey → replicate
        for i in range(width * height):
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = pix[i]
    else:  # RGBA → drop alpha
        for i in range(width * height):
            rgb[3 * i : 3 * i + 3] = pix[4 * i : 4 * i + 3]
    return width, height, bytes(rgb)


# --------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# --------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB BMP from top-down RGB bytes. Written bottom-up with
    4-byte row padding (the canonical layout every viewer accepts). The
    total file size sits at byte offset 2 — which is what makes a
    CONCATENATION of BMPs a seekable multi-frame container."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    stride = width * 3
    pad = (4 - stride % 4) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * stride : (y + 1) * stride]
        # RGB → BGR per pixel
        bgr = bytearray(stride)
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + b"\x00" * pad)
    pixel_data = b"".join(rows)
    file_size = 54 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP to top-down RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = width * 3
    pad = (4 - stride % 4) % 4
    rgb = bytearray(stride * height)
    for i in range(height):
        src = data_offset + i * (stride + pad)
        y = (height - 1 - i) if bottom_up else i
        row = payload[src : src + stride]
        dst = y * stride
        rgb[dst : dst + stride : 3] = row[2::3]
        rgb[dst + 1 : dst + stride : 3] = row[1::3]
        rgb[dst + 2 : dst + stride : 3] = row[0::3]
    return width, height, bytes(rgb)


def bmp_size(payload: bytes, offset: int = 0) -> int:
    """File size of the BMP starting at ``offset`` (from its header) —
    the frame-boundary primitive for the concatenated-BMP container."""
    if payload[offset : offset + 2] != b"BM":
        raise ValueError(f"no BMP header at offset {offset}")
    (size,) = struct.unpack_from("<I", payload, offset + 2)
    return size


def split_bmp_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-BMP container into its frames by walking the
    per-frame size fields. Raises on trailing garbage or a truncated
    frame — a corrupt container should fail loudly, not yield partial
    frames."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        size = bmp_size(payload, pos)
        if pos + size > len(payload):
            raise ValueError(
                f"truncated BMP frame at offset {pos}: header says {size} bytes, "
                f"{len(payload) - pos} remain"
            )
        frames.append(payload[pos : pos + size])
        pos += size
    return frames


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Magic-dispatched decode: PNG or BMP → (width, height, top-down
    RGB). The single entry point the mapInPandas kernels call."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(
        f"undecodable image payload (magic {payload[:8]!r}); supported: PNG, BMP"
    )
