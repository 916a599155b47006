"""Pure-stdlib/numpy media decoders for codec-less environments.

The multimodal kernels (:mod:`operators.multimodal`) treat media as
opaque ``binary`` columns and decode inside Arrow-batched
``mapInPandas``. Containers without PIL/ffmpeg can still REALLY
decode the uncompressed/stdlib-compressed formats:

- **WAV** (RIFF PCM): stdlib ``wave`` + ``numpy.frombuffer`` —
  8/16/32-bit integer PCM, any channel count.
- **BMP** (Windows DIB, 24/32-bit uncompressed): manual header
  parse + numpy row reshape (4-byte row padding, bottom-up rows).
- **PNG** (non-interlaced, 8-bit gray/RGB/RGBA): stdlib ``zlib``
  inflate of IDAT + scanline unfilter (filters 0-4 per the PNG
  spec §6). Sub/up/average are vectorized; paeth falls back to a
  per-pixel loop — correctness over speed; at production scale a
  real codec library replaces this module entirely.

Formats that require actual codec libraries (JPEG, MP3, H.264/MP4)
remain stubbed in :mod:`operators.multimodal` with
``NotImplementedError`` under ``strict=True`` — that boundary is now
*format-based*, not blanket.

All decoders are deterministic pure functions of the input bytes and
raise ``ValueError`` on malformed input (never a silent wrong
answer).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------
def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode RIFF PCM audio.

    Returns ``(sample_rate, n_channels, samples)`` where ``samples``
    is float32 in [-1, 1], shape ``(n_frames, n_channels)``.
    """
    with wave.open(io.BytesIO(content), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        # 8-bit WAV is unsigned.
        arr = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        arr = (arr - 128.0) / 128.0
    elif width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 3:
        # 24-bit little-endian: widen each 3-byte sample to int32 by
        # sign-extending through the high byte.
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        widened = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
        )
        arr = widened.astype(np.float32) / 8388608.0
    elif width == 4:
        arr = (
            np.frombuffer(frames, dtype="<i4").astype(np.float32)
            / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    if channels > 1:
        arr = arr.reshape(-1, channels)
    else:
        arr = arr.reshape(-1, 1)
    return rate, channels, arr


# ---------------------------------------------------------------------------
# BMP (24/32-bit uncompressed DIB)
# ---------------------------------------------------------------------------
def decode_bmp(content: bytes) -> np.ndarray:
    """Decode an uncompressed 24- or 32-bit BMP to ``(H, W, 3)``
    uint8 RGB."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core headers unsupported")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    need = data_offset + row_stride * height
    if len(content) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(content, dtype=np.uint8, count=row_stride * height,
                        offset=data_offset)
    rows = raw.reshape(height, row_stride)[:, : width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BMP stores BGR(A): reorder to RGB, drop alpha.
    return px[:, :, 2::-1].copy()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode ``(H, W, 3)`` uint8 RGB as a 24-bit bottom-up BMP —
    the write-side twin of :func:`decode_bmp` (decoded/resized
    media can be landed back as binary columns without a codec
    library; also used to synthesize deterministic real-decodable
    fixtures)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + bytes(body)


# ---------------------------------------------------------------------------
# PNG (non-interlaced, 8-bit gray / RGB / RGBA)
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels


def decode_png(content: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to ``(H, W, C)`` uint8.
    Palette images (color type 3) are expanded to RGB via PLTE."""
    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG file")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, [], None
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        body = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} "
            f"interlace={interlace}"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f, line = filters[y], lines[y]
        up = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = line
        elif f == 1:  # sub: cumulative sum over pixel stride
            px = line.reshape(width, ch)
            out[y] = np.cumsum(px, axis=0).reshape(stride) % 256
        elif f == 2:  # up
            out[y] = (line + up) % 256
        elif f == 3:  # average
            row = out[y]
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (line[i] + (left + up[i]) // 2) % 256
        elif f == 4:  # paeth
            row = out[y]
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = up[i]
                c = up[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
    px = out.astype(np.uint8).reshape(height, width, ch)
    if color == 3:
        return plte[px[:, :, 0]]  # palette index -> RGB
    return px


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed DIB video stream)
# ---------------------------------------------------------------------------
def decode_avi_frames(content: bytes) -> tuple[float, list[np.ndarray]]:
    """Decode an uncompressed (BI_RGB) video AVI.

    Returns ``(fps, frames)`` with each frame ``(H, W, 3)`` uint8
    RGB. Only the codec-less case is handled: ``biCompression=0``
    DIB frames (bottom-up BGR rows, 4-byte stride padding — the same
    pixel layout BMP uses). Compressed streams (MJPG/H.264) raise
    ``ValueError`` — those need a real codec library.
    """
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI file")

    fps, width, height, bpp, compression = 0.0, None, None, None, None
    frames: list[bytes] = []
    # strf carries a different struct per stream type (BITMAPINFOHEADER
    # for 'vids', WAVEFORMATEX for 'auds'); strf always follows its strh
    # within the same strl LIST, so gate on the last-seen strh fcc — an
    # AVI whose audio strl precedes the video one must not have its
    # WAVEFORMATEX parsed as a video header.
    last_strh_fcc = b""

    def walk(start: int, end: int) -> None:
        nonlocal fps, width, height, bpp, compression, last_strh_fcc
        pos = start
        while pos + 8 <= end:
            cid, size = content[pos : pos + 4], struct.unpack_from(
                "<I", content, pos + 4
            )[0]
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)  # skip list type tag
            elif cid == b"strh":
                last_strh_fcc = content[body_at : body_at + 4]
                if last_strh_fcc == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", content, body_at + 20
                    )
                    fps = rate / scale if scale else 0.0
            elif cid == b"strf" and last_strh_fcc == b"vids" and width is None:
                (
                    _sz, width, height, _planes, bpp, compression,
                ) = struct.unpack_from("<IiiHHI", content, body_at)
            elif cid[2:] in (b"db", b"dc") and size:
                frames.append(content[body_at : body_at + size])
            pos = body_at + size + (size & 1)  # chunks are word-aligned

    walk(12, len(content))
    if width is None or not frames:
        raise ValueError("AVI missing video stream headers or frames")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported AVI: bpp={bpp} compression={compression} "
            "(only uncompressed DIB decodes without a codec)"
        )
    bottom_up = height > 0
    h = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    out = []
    for raw in frames:
        if len(raw) < stride * h:
            raise ValueError("truncated AVI frame")
        px = (
            np.frombuffer(raw, dtype=np.uint8, count=stride * h)
            .reshape(h, stride)[:, : width * bytes_pp]
            .reshape(h, width, bytes_pp)
        )
        if bottom_up:
            px = px[::-1]
        out.append(px[:, :, 2::-1].copy())  # BGR(A) -> RGB
    return fps, out


# ---------------------------------------------------------------------------
# Deterministic features over decoded media
# ---------------------------------------------------------------------------
def image_features(pixels: np.ndarray, dim: int) -> list[float]:
    """Grid-pooled luminance features: the image is partitioned into
    ``dim`` near-equal cell groups and each feature is that group's
    mean luminance / 255. Deterministic, resolution-independent."""
    if pixels.ndim == 3:
        lum = pixels[:, :, :3].mean(axis=2) if pixels.shape[2] >= 3 else (
            pixels[:, :, 0].astype(np.float64)
        )
    else:
        lum = pixels.astype(np.float64)
    flat = lum.reshape(-1)
    cells = np.array_split(flat, dim)
    return [float(c.mean() / 255.0) if c.size else 0.0 for c in cells]


def audio_features(rate: int, samples: np.ndarray) -> list[float]:
    """[duration_s, rms, zero_crossing_rate, peak] over the mono
    mixdown — the standard cheap audio-quality signals."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    return [
        float(n) / float(rate),
        float(np.sqrt(np.mean(mono**2))),
        zc,
        float(np.max(np.abs(mono))),
    ]
