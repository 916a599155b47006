"""Pure-stdlib/numpy media decoders for codec-less environments.

The multimodal kernels (:mod:`operators.multimodal`) treat media as
opaque ``binary`` columns and decode inside Arrow-batched
``mapInPandas``. Containers without PIL/ffmpeg can still REALLY
decode the uncompressed/stdlib-compressed formats:

- **WAV** (RIFF): stdlib ``wave`` + ``numpy.frombuffer`` —
  8/16/24/32-bit integer PCM, any channel count — plus manual-parse
  G.711 μ-law/A-law expansion (telephony speech corpora).
- **BMP** (Windows DIB, 24/32-bit uncompressed): manual header
  parse + numpy row reshape (4-byte row padding, bottom-up rows).
- **PNG** (non-interlaced, 8-bit gray/RGB/RGBA): stdlib ``zlib``
  inflate of IDAT + scanline unfilter (filters 0-4 per the PNG
  spec §6). Sub/up/average are vectorized; paeth falls back to a
  per-pixel loop — correctness over speed; at production scale a
  real codec library replaces this module entirely.
- **JPEG** (baseline sequential DCT per ITU-T T.81): full marker
  parse, canonical Huffman decode, dequant + numpy IDCT, 4:4:4/
  4:2:2/4:2:0 chroma upsampling, restart intervals, JFIF BT.601
  color. Progressive/arithmetic/12-bit modes raise ``ValueError``.
  The entropy decode is a per-bit Python loop — correct and
  deterministic, not fast; same production caveat as PNG paeth.
- **GIF** (87a/89a): LZW decompression, global/local color
  tables, interlace reordering; first frame of animations
  (:func:`decode_gif_frames` composes all of them).
- **TIFF** (baseline 8-bit, both byte orders): strip layout,
  compression none/LZW (early-change, predictor 2)/PackBits;
  gray, white-is-zero, RGB(A), palette.

Formats that require actual codec libraries (MP3, H.264/MP4)
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
def _decode_wav_companded(content: bytes) -> tuple[int, int, np.ndarray]:
    """G.711 μ-law / A-law RIFF WAV (wFormatTag 7 / 6) — the
    telephony/speech-corpus encodings stdlib ``wave`` rejects.
    Manual RIFF parse + vectorized expansion tables (ITU-T G.711)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from(
            "<I", content, pos + 4
        )[0]
        body = content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunks")
    tag, channels, rate, _bps, _align, bits = fmt
    if tag not in (6, 7) or bits != 8:
        raise ValueError(f"unsupported WAVE format tag {tag}/{bits}-bit")
    codes = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if tag == 7:  # μ-law (G.711): invert, extract exponent/mantissa
        u = ~codes & 0xFF
        sign = np.where(u & 0x80, -1, 1)
        exp = (u >> 4) & 7
        mant = u & 0x0F
        mag = ((mant << 1) + 33) * (1 << exp) - 33
        lin = sign * mag * 4  # 14-bit -> 16-bit range
    else:  # A-law: even-bit inversion, segment expansion. NB the
        # sign convention is OPPOSITE μ-law: after the 0x55 XOR a set
        # 0x80 bit means POSITIVE (G.711 / classic g711.c).
        a = codes ^ 0x55
        sign = np.where(a & 0x80, 1, -1)
        seg = (a >> 4) & 7
        mant = a & 0x0F
        mag = np.where(
            seg == 0,
            (mant << 1) + 1,
            ((mant << 1) + 33) * (1 << (seg - 1)),
        )
        lin = sign * mag * 8  # 13-bit -> 16-bit range
    arr = (lin / 32768.0).astype(np.float32)
    arr = arr.reshape(-1, channels) if channels > 1 else arr.reshape(-1, 1)
    return rate, channels, arr


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode RIFF audio: integer PCM (8/16/24/32-bit via stdlib
    ``wave``) plus G.711 μ-law / A-law companded streams.

    Returns ``(sample_rate, n_channels, samples)`` where ``samples``
    is float32 in [-1, 1], shape ``(n_frames, n_channels)``.
    """
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except wave.Error:
        # stdlib wave only reads format-1 PCM; G.711 goes manual.
        return _decode_wav_companded(content)
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


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2.
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    raw: np.ndarray, width: int, height: int, ch: int
) -> np.ndarray:
    """Reverse PNG scanline filtering over one (sub-)image —
    ``raw`` is the ``(height, width*ch + 1)`` filter-byte-prefixed
    scanline matrix. Returns ``(height, width, ch)`` uint8."""
    stride = width * ch
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
    return out.astype(np.uint8).reshape(height, width, ch)


def decode_png(content: bytes) -> np.ndarray:
    """Decode an 8-bit PNG (non-interlaced or Adam7) to ``(H, W, C)``
    uint8. Palette images (color type 3) are expanded to RGB via
    PLTE; Adam7 passes are each unfiltered as their own sub-image
    (per spec §8.2) and scattered back onto the pixel grid."""
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
    if depth != 8 or interlace not in (0, 1) or color not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} "
            f"interlace={interlace}"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        stride = width * ch
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG scanline data size mismatch")
        mat = np.frombuffer(raw, dtype=np.uint8).reshape(
            height, stride + 1
        )
        px = _png_unfilter(mat, width, height, ch)
    else:
        px = np.zeros((height, width, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            need = (pw * ch + 1) * ph
            if off + need > len(raw):
                raise ValueError("PNG Adam7 pass data truncated")
            mat = np.frombuffer(
                raw[off : off + need], dtype=np.uint8
            ).reshape(ph, pw * ch + 1)
            off += need
            px[y0::dy, x0::dx] = _png_unfilter(mat, pw, ph, ch)
        if off != len(raw):
            raise ValueError("PNG Adam7 trailing data")
    if color == 3:
        return plte[px[:, :, 0]]  # palette index -> RGB
    return px


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed DIB video stream)
# ---------------------------------------------------------------------------
def decode_avi_frames(content: bytes) -> tuple[float, list[np.ndarray]]:
    """Decode an uncompressed (BI_RGB) or Motion-JPEG video AVI.

    Returns ``(fps, frames)`` with each frame ``(H, W, 3)`` uint8
    RGB. Two codec-less cases are handled: ``biCompression=0`` DIB
    frames (bottom-up BGR rows, 4-byte stride padding — the same
    pixel layout BMP uses) and ``biCompression='MJPG'``, where every
    ``..dc``/``..db`` chunk is an independent baseline JPEG decoded
    via :func:`decode_jpeg`. Other compressed streams (H.264 etc.)
    raise ``ValueError`` — those need a real codec library.
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
    if compression == struct.unpack("<I", b"MJPG")[0]:
        out = [decode_jpeg(raw) for raw in frames]
        for px in out:
            if px.shape[:2] != (abs(height), width):
                raise ValueError("MJPG frame size disagrees with header")
        return fps, out
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported AVI: bpp={bpp} compression={compression} "
            "(only uncompressed DIB and MJPG decode without a codec)"
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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, 8-bit Huffman)
# ---------------------------------------------------------------------------
# Raster index for each zigzag position (ITU-T T.81 figure A.6).
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II matrix: spatial = C.T @ coeffs @ C.
_DCT_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _jpeg_build_huffman(counts: list[int], symbols: list[int]) -> dict:
    """Canonical JPEG Huffman table → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(value: int, t: int) -> int:
    if t == 0:
        return 0
    if value < (1 << (t - 1)):
        return value - (1 << t) + 1
    return value


def _jpeg_entropy_segments(data: bytes, start: int) -> list[bytes]:
    """De-stuffed entropy data split at restart markers. Scans from
    ``start`` to the next non-RST marker."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # real marker: end of scan
    segments.append(bytes(cur))
    return segments


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG (SOF0/SOF1, 8-bit, Huffman) to
    ``(H, W, 3)`` uint8 RGB — pure stdlib/numpy, per ITU-T T.81.

    Supports 1- or 3-component images, arbitrary h/v sampling factors
    whose maxima are integer multiples of each component's (covers
    4:4:4, 4:2:2, 4:2:0), restart intervals, and 16-bit quant tables.
    Progressive (SOF2), arithmetic coding, hierarchical and 12-bit
    modes raise ``ValueError`` — never a silent wrong answer.
    Chroma upsampling is sample replication; color conversion is the
    JFIF full-range BT.601 matrix."""
    data = bytes(content)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 1 < len(data):
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = data[i + 1]
        i += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        if i + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        (length,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + length]
        i += length
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                if tbl.size != 64:
                    raise ValueError("truncated JPEG DQT")
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                p += 1
                counts = list(seg[p : p + 16])
                p += 16
                nsym = sum(counts)
                symbols = list(seg[p : p + nsym])
                if len(symbols) != nsym:
                    raise ValueError("truncated JPEG DHT")
                p += nsym
                huff[(tc, th)] = _jpeg_build_huffman(counts, symbols)
        elif m in (0xC0, 0xC1):  # SOF0 / SOF1
            if seg[0] != 8:
                raise ValueError("unsupported JPEG sample precision")
            hh, ww = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": hh, "w": ww, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (progressive/arithmetic/"
                "hierarchical) — baseline sequential only"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # A valid baseline file may carry one scan PER
                # component (non-interleaved); decoding just the
                # first scan would silently return grayscale from
                # the Y plane alone. Fail loudly like the other
                # unsupported modes — never a silent wrong answer.
                raise ValueError(
                    "unsupported JPEG scan layout: non-interleaved "
                    f"scan covers {ns} of {len(frame['comps'])} "
                    "components — single interleaved scan only"
                )
            scomp = []
            for c in range(ns):
                scomp.append(
                    {"id": seg[1 + 2 * c], "dc": seg[2 + 2 * c] >> 4,
                     "ac": seg[2 + 2 * c] & 15}
                )
            segments = _jpeg_entropy_segments(data, i)
            return _jpeg_decode_scan(
                frame, scomp, qt, huff, restart_interval, segments
            )
        # APPn / COM: skipped
    raise ValueError("no scan data in JPEG")


def _jpeg_decode_block(reader, dc_table, ac_table, quant):
    """One 8×8 block: Huffman-decode, dequantize, de-zigzag, IDCT.
    Returns (dc_diff_applied_externally) spatial block WITHOUT the DC
    predictor — caller adds pred via the returned dc coefficient."""
    coeffs = np.zeros(64, dtype=np.int64)
    t = reader.read_symbol(dc_table)
    coeffs[0] = _jpeg_extend(reader.read_bits(t), t)
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_table)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        s = rs & 15
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        coeffs[k] = _jpeg_extend(reader.read_bits(s), s)
        k += 1
    return coeffs


def _jpeg_decode_scan(frame, scomp, qt, huff, restart_interval, segments):
    hh, ww = frame["h"], frame["w"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    for c in comps:
        if maxh % c["h"] or maxv % c["v"]:
            raise ValueError("unsupported JPEG sampling factors")
    mcux = -(-ww // (8 * maxh))
    mcuy = -(-hh // (8 * maxv))
    planes = {}
    for sc in scomp:
        fc = by_id.get(sc["id"])
        if fc is None:
            raise ValueError("JPEG scan references unknown component")
        planes[sc["id"]] = np.zeros(
            (mcuy * 8 * fc["v"], mcux * 8 * fc["h"]), dtype=np.float64
        )
    preds = {sc["id"]: 0 for sc in scomp}
    seg_idx = 0
    reader = _JpegBitReader(segments[0])
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                reader = _JpegBitReader(segments[seg_idx])
                preds = {sc["id"]: 0 for sc in scomp}
            for sc in scomp:
                fc = by_id[sc["id"]]
                dc_tbl = huff.get((0, sc["dc"]))
                ac_tbl = huff.get((1, sc["ac"]))
                quant = qt.get(fc["tq"])
                if dc_tbl is None or ac_tbl is None or quant is None:
                    raise ValueError("JPEG references undefined table")
                for by in range(fc["v"]):
                    for bx in range(fc["h"]):
                        coeffs = _jpeg_decode_block(
                            reader, dc_tbl, ac_tbl, quant
                        )
                        preds[sc["id"]] += int(coeffs[0])
                        coeffs[0] = preds[sc["id"]]
                        block = np.zeros(64, dtype=np.float64)
                        block[_JPEG_ZIGZAG] = coeffs * quant
                        spatial = (
                            _DCT_C.T @ block.reshape(8, 8) @ _DCT_C + 128.0
                        )
                        y0 = (my * fc["v"] + by) * 8
                        x0 = (mx * fc["h"] + bx) * 8
                        planes[sc["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    out_planes = []
    for sc in scomp:
        fc = by_id[sc["id"]]
        pl = planes[sc["id"]]
        pl = pl.repeat(maxv // fc["v"], axis=0).repeat(
            maxh // fc["h"], axis=1
        )
        out_planes.append(pl[:hh, :ww])
    if len(out_planes) == 1:
        y = out_planes[0]
        rgb = np.stack([y, y, y], axis=2)
    elif len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
    else:
        raise ValueError("unsupported JPEG component count")
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)





# ---------------------------------------------------------------------------
# GIF (87a/89a, LZW)
# ---------------------------------------------------------------------------
def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW: LSB-first bitstream, clear/end codes, table
    grows to 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1

    def reset_table():
        return {i: (i,) for i in range(clear)}

    table = reset_table()
    next_code = end + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = reset_table()
            next_code = end + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("invalid first GIF LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt GIF LZW code")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to ``(H, W, 3)`` uint8
    RGB — pure stdlib/numpy: logical-screen parse, global/local color
    tables, LZW decompression, interlace reordering. Delegates to
    :func:`decode_gif_frames` and returns the composed first frame.
    Raises ``ValueError`` on malformed input."""
    return decode_gif_frames(content)[1][0]


def decode_gif_frames(content: bytes) -> tuple[float, list[np.ndarray]]:
    """Decode ALL frames of a GIF87a/89a with full animation
    composition — graphic-control delays, disposal methods 0-3
    (none/keep, restore-to-background, restore-to-previous) and
    transparency masking, per the GIF89a spec §23.

    Returns ``(fps, frames)`` in the same contract as
    :func:`decode_avi_frames` so animated GIFs ride the video
    frame-sampling kernel. ``fps`` derives from the mean per-frame
    delay (a 0 delay counts as 10 cs, the conventional browser
    treatment); the canvas initializes to the logical-screen
    background color (black when absent)."""
    data = bytes(content)
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    bg_idx = data[11]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    bg_color = (
        global_pal[bg_idx]
        if global_pal is not None and bg_idx < len(global_pal)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_color
    frames: list[np.ndarray] = []
    delays_cs: list[int] = []
    # Graphic-control state: applies to the NEXT image, then resets.
    delay_cs, transparent, disposal = 0, None, 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gflags = data[pos + 1]
                delay_cs = struct.unpack_from("<H", data, pos + 2)[0]
                transparent = (
                    data[pos + 4] if gflags & 1 else None
                )
                disposal = (gflags >> 2) & 7
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError("unexpected GIF block")
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        iflags = data[pos + 8]
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            cnt = data[pos]
            lzw += data[pos + 1 : pos + 1 + cnt]
            pos += 1 + cnt
        pos += 1
        idx = np.array(
            _gif_lzw_decode(min_code, bytes(lzw), w * h), dtype=np.int64
        )
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index outside color table")
        rows = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = [
                y
                for start, step in _GIF_INTERLACE_PASSES
                for y in range(start, h, step)
            ]
            un = np.empty_like(rows)
            un[order] = rows
            rows = un
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        colors = pal[rows]
        if transparent is not None:
            mask = rows != transparent
            region[mask] = colors[mask]
        else:
            region[:] = colors
        frames.append(canvas.copy())
        delays_cs.append(delay_cs or 10)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_color
        elif disposal == 3 and prev is not None:
            canvas = prev
        delay_cs, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    fps = 100.0 / (sum(delays_cs) / len(delays_cs))
    return fps, frames





# ---------------------------------------------------------------------------
# TIFF (baseline: uncompressed / LZW / PackBits, 8-bit)
# ---------------------------------------------------------------------------
def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, 256=Clear,
    257=EOI, EARLY code-width change (one code before the table
    fills — unlike GIF)."""
    CLEAR, EOI = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < max_out:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("invalid first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # Early change (the TIFF spec §13 off-by-one): the ENCODER
        # widens when its next code hits 2^width - 1; the decoder's
        # table runs one entry behind, so it must widen at
        # 2^width - 2 (510/1022/2046) to stay in step.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < max_out:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def decode_tiff(content: bytes) -> np.ndarray:
    """Decode a baseline 8-bit TIFF (first IFD) to ``(H, W, 3)``
    uint8 RGB — both byte orders, strip layout, compression none (1),
    LZW (5, incl. horizontal-differencing predictor), or PackBits
    (32773); photometric gray (0/1, incl. white-is-zero inversion),
    RGB(A) (2), and palette (3). Tiled, 16-bit, CMYK and JPEG-in-TIFF
    raise ``ValueError``."""
    data = bytes(content)
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    n_entries = struct.unpack_from(bo + "H", data, ifd_off)[0]
    tags: dict[int, tuple] = {}
    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    for i in range(n_entries):
        tag, typ, cnt = struct.unpack_from(
            bo + "HHI", data, ifd_off + 2 + 12 * i
        )
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        voff = ifd_off + 2 + 12 * i + 8
        if size > 4:
            voff = struct.unpack_from(bo + "I", data, voff)[0]
        if typ == 3:
            vals = struct.unpack_from(bo + f"{cnt}H", data, voff)
        elif typ == 4:
            vals = struct.unpack_from(bo + f"{cnt}I", data, voff)
        elif typ == 1:
            vals = tuple(data[voff : voff + cnt])
        else:
            continue  # ASCII/RATIONAL irrelevant here
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width, height = one(256), one(257)
    if not width or not height:
        raise ValueError("TIFF missing dimensions")
    compression = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, (8,) * spp)
    rows_per_strip = one(278, height)
    offsets = tags.get(273)
    counts = tags.get(279)
    predictor = one(317, 1)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported")
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/counts")
    if compression not in (1, 5, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression} "
            "(none/LZW/PackBits decode without a codec)"
        )
    if photometric not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photometric}")

    stride = width * spp
    rows = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, height - s * rows_per_strip)
        raw = data[off : off + cnt]
        if compression == 5:
            raw = _tiff_lzw_decode(raw, stride * nrows)
        elif compression == 32773:
            raw = _packbits_decode(raw, stride * nrows)
        if len(raw) < stride * nrows:
            raise ValueError("truncated TIFF strip")
        strip = np.frombuffer(
            raw, dtype=np.uint8, count=stride * nrows
        ).reshape(nrows, width, spp)
        if predictor == 2:  # horizontal differencing per sample
            strip = np.cumsum(strip.astype(np.int64), axis=1) % 256
            strip = strip.astype(np.uint8)
        rows.append(strip)
    px = np.concatenate(rows, axis=0)
    if photometric == 3:  # palette: 16-bit RGB colormap
        cmap = tags.get(320)
        if cmap is None or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing colormap")
        n = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257
        ).astype(np.uint8)
        return pal[px[:, :, 0]]
    if photometric in (0, 1):
        g = px[:, :, 0]
        if photometric == 0:  # white-is-zero
            g = 255 - g
        return np.stack([g, g, g], axis=2)
    return px[:, :, :3].copy()


# ---------------------------------------------------------------------------
# Image dispatch
# ---------------------------------------------------------------------------
_IMAGE_DECODERS = {
    "image/bmp": decode_bmp,
    "image/x-ms-bmp": decode_bmp,
    "image/png": decode_png,
    "image/jpeg": decode_jpeg,
    "image/jpg": decode_jpeg,
    "image/gif": decode_gif,
    "image/tiff": decode_tiff,
    "image/tif": decode_tiff,
}


def decode_image(content: bytes, mime: str) -> np.ndarray:
    """Route to the pure-python decoder for ``mime``. Raises
    ``KeyError`` for formats with no codec-less decoder (the caller
    owns the strict/fallback policy)."""
    return _IMAGE_DECODERS[mime](bytes(content))


_VIDEO_DECODERS = {
    "video/avi": decode_avi_frames,
    "video/x-msvideo": decode_avi_frames,
    "image/gif": decode_gif_frames,  # animated GIF as a video source
}


def decode_video_frames(
    content: bytes, mime: str
) -> tuple[float, list[np.ndarray]]:
    """Route to the pure-python frame decoder for ``mime`` —
    ``(fps, frames)``. Raises ``KeyError`` for codec-bound
    containers."""
    return _VIDEO_DECODERS[mime](bytes(content))
