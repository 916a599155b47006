"""GIF decoder (operators/media_codecs.py::decode_gif) against
independent fixture encoders: a real LZW compressor (exercises dict
growth, the code==next_code case, and code-width widening) and an
uncompressed-style writer (root codes + frequent clears — trivially
correct by construction, so it pins the bit-unpacking and clear-reset
logic even if both LZW implementations were somehow wrong the same
way)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from serverless_data_lake_spark.operators.media_codecs import decode_gif


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_compress(min_code: int, indices: list[int]) -> bytes:
    """Standard (non-early-change) GIF LZW. The encoder widens one
    step after the decoder's table position: when its next_code
    exceeds the current width's capacity."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    w = _LsbBitWriter()
    width = min_code + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, width)
    cur: tuple = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = (px,)
    if cur:
        w.write(table[cur], width)
    w.write(end, width)
    return w.flush()


def lzw_uncompressed(min_code: int, indices: list[int]) -> bytes:
    """Root-codes-only stream with a clear before every group that
    would otherwise grow the table into a width change."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    w = _LsbBitWriter()
    width = min_code + 1
    group = max(1, (1 << min_code) - 2)
    for i, px in enumerate(indices):
        if i % group == 0:
            w.write(clear, width)
        w.write(px, width)
    w.write(end, width)
    return w.flush()


def make_gif(
    idx: np.ndarray,
    palette: list[tuple[int, int, int]],
    compressor=lzw_compress,
    interlace: bool = False,
    version: bytes = b"GIF89a",
    extension: bool = False,
) -> bytes:
    h, w_ = idx.shape
    pal_bits = max(1, (len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    pal = bytes(
        c for i in range(pal_n)
        for c in (palette[i] if i < len(palette) else (0, 0, 0))
    )
    out = bytearray(version)
    out += struct.pack("<HH", w_, h)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # global table
    out += pal
    if extension:  # graphic control extension, should be skipped
        out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    rows = idx
    if interlace:
        order = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(s, h, st)]
        rows = idx[order]
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w_, h)
    out += bytes([0x40 if interlace else 0x00])
    min_code = max(2, pal_bits)
    out += bytes([min_code])
    data = compressor(min_code, [int(v) for v in rows.reshape(-1)])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


_PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def _expect(idx, palette):
    return np.array(
        [[palette[v] for v in row] for row in idx], dtype=np.uint8
    )


class TestGif:
    def test_lzw_roundtrip_repetitive(self):
        # Heavy repetition drives multi-symbol dictionary entries and
        # the code==next_code corner (e.g. 'aaaa...' patterns).
        rng = np.random.default_rng(5)
        idx = np.repeat(
            rng.integers(0, 4, size=(6, 10)), 2, axis=1
        )[:, :16]
        out = decode_gif(make_gif(idx, _PAL4))
        np.testing.assert_array_equal(out, _expect(idx, _PAL4))

    def test_width_growth_large_image(self):
        # >2^(min_code+1) dictionary entries force code widening.
        rng = np.random.default_rng(9)
        idx = rng.integers(0, 4, size=(24, 40))
        out = decode_gif(make_gif(idx, _PAL4))
        np.testing.assert_array_equal(out, _expect(idx, _PAL4))

    def test_uncompressed_writer_agrees(self):
        rng = np.random.default_rng(2)
        idx = rng.integers(0, 4, size=(8, 8))
        a = decode_gif(make_gif(idx, _PAL4, compressor=lzw_compress))
        b = decode_gif(make_gif(idx, _PAL4, compressor=lzw_uncompressed))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, _expect(idx, _PAL4))

    def test_interlaced(self):
        rng = np.random.default_rng(4)
        idx = rng.integers(0, 4, size=(13, 7))  # odd dims
        out = decode_gif(make_gif(idx, _PAL4, interlace=True))
        np.testing.assert_array_equal(out, _expect(idx, _PAL4))

    def test_gif87a_and_extension_skipping(self):
        idx = np.array([[0, 1], [2, 3]])
        a = decode_gif(make_gif(idx, _PAL4, version=b"GIF87a"))
        b = decode_gif(make_gif(idx, _PAL4, extension=True))
        np.testing.assert_array_equal(a, _expect(idx, _PAL4))
        np.testing.assert_array_equal(b, _expect(idx, _PAL4))

    def test_rejects_garbage_and_truncation(self):
        with pytest.raises(ValueError):
            decode_gif(b"NOTAGIF")
        idx = np.zeros((8, 8), dtype=int)
        good = make_gif(idx, _PAL4)
        with pytest.raises(ValueError):
            decode_gif(good[:20])
