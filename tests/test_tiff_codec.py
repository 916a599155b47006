"""TIFF decoder (operators/media_codecs.py::decode_tiff) against
independent fixture encoders written here: an IFD writer for both
byte orders, a TIFF-variant LZW compressor (MSB packing,
EARLY-change code widening — the rule that differs from GIF), a
PackBits encoder, and predictor-2 differencing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from serverless_data_lake_spark.operators.media_codecs import decode_tiff


class _MsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF spec §13 LZW with early change: the encoder widens when
    next_code reaches 2^width - 1."""
    CLEAR, EOI = 256, 257
    w = _MsbBitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    w.write(CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # stay clear of the 12-bit ceiling
            w.write(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        w.write(table[cur], width)
    w.write(EOI, width)
    return w.flush()


def packbits_encode(data: bytes) -> bytes:
    """Simple PackBits: runs ≥3 as replicate, else literal groups."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (
            i + run < len(data) and run < 128 and data[i + run] == data[i]
        ):
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < len(data) and i - lit_start < 128:
            nxt = 1
            while (
                i + nxt < len(data) and nxt < 3 and data[i + nxt] == data[i]
            ):
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def make_tiff(
    px: np.ndarray,
    bo: str = "<",
    compression: int = 1,
    photometric: int = 2,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    colormap: np.ndarray | None = None,
) -> bytes:
    """px: (H, W, spp) uint8 (or (H, W) for gray/palette)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w_, spp = px.shape
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        strip = px[y0 : y0 + rps]
        if predictor == 2:
            d = strip.astype(np.int64)
            d = np.concatenate(
                [d[:, :1], (d[:, 1:] - d[:, :-1]) % 256], axis=1
            ).astype(np.uint8)
            raw = d.tobytes()
        else:
            raw = strip.tobytes()
        if compression == 5:
            raw = tiff_lzw_encode(raw)
        elif compression == 32773:
            raw = packbits_encode(raw)
        strips.append(raw)

    entries = []  # (tag, type, count, value_or_bytes)
    def short(tag, *vals):
        entries.append((tag, 3, len(vals), vals))
    def long_(tag, *vals):
        entries.append((tag, 4, len(vals), vals))

    short(256, w_)
    short(257, h)
    short(258, *([8] * spp))
    short(259, compression)
    short(262, photometric)
    short(277, spp)
    short(278, rps)
    if predictor != 1:
        short(317, predictor)
    if colormap is not None:
        n = colormap.shape[0]
        cm16 = (colormap.astype(np.uint32) * 257).astype(np.uint32)
        short(320, *[int(v) for v in cm16.T.reshape(-1)])
    # strip offsets/counts get placeholder values fixed up below
    long_(273, *([0] * len(strips)))
    long_(279, *[len(s) for s in strips])
    entries.sort(key=lambda e: e[0])

    # Layout: header(8) + IFD + overflow values + strip data
    ifd_off = 8
    n = len(entries)
    overflow_off = ifd_off + 2 + 12 * n + 4
    blobs = []
    fixed = []
    tsz = {3: 2, 4: 4}
    for tag, typ, cnt, vals in entries:
        size = tsz[typ] * cnt
        if size <= 4:
            fixed.append((tag, typ, cnt, vals, None))
        else:
            fixed.append((tag, typ, cnt, vals, overflow_off))
            overflow_off += size
    data_off = overflow_off
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_off)
        data_off += len(s)

    def pack_vals(typ, cnt, vals):
        fmt = bo + ("H" if typ == 3 else "I") * cnt
        b = struct.pack(fmt, *vals)
        return b.ljust(4, b"\x00") if len(b) < 4 else b

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", n)
    overflow = bytearray()
    for tag, typ, cnt, vals, off in fixed:
        if tag == 273:
            vals = strip_offsets
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        if off is None:
            out += pack_vals(typ, cnt, vals)
        else:
            out += struct.pack(bo + "I", off)
            overflow += pack_vals(typ, cnt, vals)
    out += struct.pack(bo + "I", 0)  # next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)


def _rand(rng, h, w, c=3):
    return rng.integers(0, 256, size=(h, w, c) if c else (h, w)).astype(
        np.uint8
    )


class TestTiff:
    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_uncompressed_rgb_both_byte_orders(self, bo):
        rng = np.random.default_rng(1)
        px = _rand(rng, 10, 7)
        np.testing.assert_array_equal(decode_tiff(make_tiff(px, bo=bo)), px)

    def test_lzw_with_predictor_and_strips(self):
        rng = np.random.default_rng(2)
        px = _rand(rng, 21, 13)
        t = make_tiff(px, compression=5, rows_per_strip=5, predictor=2)
        np.testing.assert_array_equal(decode_tiff(t), px)

    def test_lzw_early_change_boundary(self):
        # A wide repetitive image drives the dictionary past 510 and
        # 1022 — both early-change widenings.
        rng = np.random.default_rng(3)
        base = rng.integers(0, 8, size=(4, 600, 3)).astype(np.uint8) * 16
        t = make_tiff(base, compression=5)
        np.testing.assert_array_equal(decode_tiff(t), base)

    def test_packbits(self):
        px = np.zeros((6, 50, 3), dtype=np.uint8)
        px[:, 10:20] = 200  # runs + literals
        px[0, ::2, 0] = np.arange(25, dtype=np.uint8)
        t = make_tiff(px, compression=32773, rows_per_strip=2)
        np.testing.assert_array_equal(decode_tiff(t), px)

    def test_grayscale_and_white_is_zero(self):
        rng = np.random.default_rng(4)
        g = _rand(rng, 9, 5, c=0)
        black0 = decode_tiff(make_tiff(g, photometric=1))
        np.testing.assert_array_equal(black0, np.stack([g] * 3, axis=2))
        white0 = decode_tiff(make_tiff(g, photometric=0))
        np.testing.assert_array_equal(
            white0, np.stack([255 - g] * 3, axis=2)
        )

    def test_palette(self):
        pal = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]],
            dtype=np.uint8,
        ).repeat(64, axis=0)[:256]
        rng = np.random.default_rng(5)
        idx = rng.integers(0, 4, size=(6, 6)).astype(np.uint8)
        t = make_tiff(idx, photometric=3, colormap=pal)
        np.testing.assert_array_equal(decode_tiff(t), pal[idx])

    def test_rejections(self):
        with pytest.raises(ValueError):
            decode_tiff(b"not a tiff at all")
        rng = np.random.default_rng(6)
        px = _rand(rng, 4, 4)
        good = bytearray(make_tiff(px))
        # Flip compression to JPEG-in-TIFF (7): unsupported.
        bad = make_tiff(px).replace(
            struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 1).ljust(4, b"\x00"),
            struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 7).ljust(4, b"\x00"),
        )
        with pytest.raises(ValueError, match="compression"):
            decode_tiff(bad)
