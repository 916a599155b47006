"""Baseline JPEG decoder (operators/media_codecs.py::decode_jpeg)
against an INDEPENDENT minimal encoder defined here.

The fixture encoder implements ITU-T T.81 baseline sequential
encoding from scratch (its own DCT matrix, its own canonical Huffman
construction, its own bit/stuffing writer) so agreement is two
implementations meeting at the spec, not one function inverting
itself. With all-ones quant tables the pipeline is exact up to DCT
coefficient rounding — decoded pixels must sit within ±2 of the
source; flat blocks decode exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from serverless_data_lake_spark.operators.media_codecs import (
    decode_jpeg,
)

# --- independent forward DCT (decoder uses its own copy) -------------------
_D = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


def _canonical(counts, symbols):
    """symbol -> (code, length) for a canonical table."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc

# DC: 12 categories, all 4-bit codes. AC: all 256 symbols — 255 at
# 9 bits + 1 at 10 (a DHT count is a single byte, so max 255/length).
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = list(range(256))
_DC_ENC = _canonical(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _canonical(_AC_COUNTS, _AC_SYMBOLS)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _emit_coeff(w: _BitWriter, v: int, t: int) -> None:
    if t:
        w.write(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_block(w: _BitWriter, block: np.ndarray, pred: int) -> int:
    """DCT + quant(1) + zigzag + Huffman one 8x8 level-shifted block.
    Returns the new DC predictor."""
    coef = _D @ (block - 128.0) @ _D.T
    q = np.round(coef).astype(int)
    zz = [q.reshape(-1)[i] for i in _ZZ]
    dc = zz[0]
    diff = dc - pred
    t = _category(diff)
    code, length = _DC_ENC[t]
    w.write(code, length)
    _emit_coeff(w, diff, t)
    # AC run-length
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_ENC[0xF0]
            w.write(code, length)
            run -= 16
        s = _category(zz[k])
        code, length = _AC_ENC[(run << 4) | s]
        w.write(code, length)
        _emit_coeff(w, int(zz[k]), s)
        run = 0
    if last_nz < 63:
        code, length = _AC_ENC[0x00]  # EOB
        w.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc, th, counts, symbols):
    return bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols)


def make_jpeg(
    rgb: np.ndarray, subsample: bool = False, restart: int = 0
) -> bytes:
    """Minimal baseline JPEG: 4:4:4 (or 4:2:0 with ``subsample``),
    all-ones quant table, the fixed canonical Huffman tables above,
    optional restart interval (MCUs)."""
    h, w, _ = rgb.shape
    fr = rgb.astype(np.float64)
    y = 0.299 * fr[..., 0] + 0.587 * fr[..., 1] + 0.114 * fr[..., 2]
    cb = 128.0 - 0.168736 * fr[..., 0] - 0.331264 * fr[..., 1] + 0.5 * fr[..., 2]
    cr = 128.0 + 0.5 * fr[..., 0] - 0.418688 * fr[..., 1] - 0.081312 * fr[..., 2]

    def pad(plane, mult):
        ph = -(-plane.shape[0] // mult) * mult
        pw = -(-plane.shape[1] // mult) * mult
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0]:, :plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1]:] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    if subsample:
        ypad = pad(y, 16)
        # 2x2 mean chroma on the padded grid
        cbp, crp = pad(cb, 16), pad(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        comps = [(1, 2, 2, ypad), (2, 1, 1, cbs), (3, 1, 1, crs)]
        mcuy, mcux = ypad.shape[0] // 16, ypad.shape[1] // 16
    else:
        comps = [(1, 1, 1, pad(y, 8)), (2, 1, 1, pad(cb, 8)), (3, 1, 1, pad(cr, 8))]
        mcuy = comps[0][3].shape[0] // 8
        mcux = comps[0][3].shape[1] // 8

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, all ones
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, ch, cv, _pl in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, _DC_COUNTS, _DC_SYMBOLS))
    out += _seg(0xC4, _dht_body(1, 0, _AC_COUNTS, _AC_SYMBOLS))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([3])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                wtr = _BitWriter()
                preds = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, pl in comps:
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[cid] = _encode_block(
                            wtr, pl[y0 : y0 + 8, x0 : x0 + 8], preds[cid]
                        )
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
def _rand_rgb(rng, h, w):
    # Smooth-ish image: random low-frequency field, so quant rounding
    # is the only error source (pure noise would also round fine with
    # q=1, but smooth data exercises realistic DC/AC mixes).
    base = rng.integers(0, 256, size=(h // 4 + 2, w // 4 + 2, 3))
    img = np.kron(base, np.ones((4, 4, 1)))[:h, :w, :]
    return img.astype(np.uint8)


class TestJpegRoundtrip:
    def test_flat_color_exact(self):
        px = np.full((8, 8, 3), 130, dtype=np.uint8)
        out = decode_jpeg(make_jpeg(px))
        assert out.shape == (8, 8, 3)
        np.testing.assert_allclose(
            out.astype(int), px.astype(int), atol=1
        )

    def test_444_roundtrip_within_quant_tolerance(self):
        rng = np.random.default_rng(7)
        px = _rand_rgb(rng, 24, 33)  # non-multiple-of-8 width
        out = decode_jpeg(make_jpeg(px))
        assert out.shape == px.shape
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.max() <= 2, err.max()

    def test_420_subsampled_roundtrip(self):
        rng = np.random.default_rng(11)
        # Chroma-smooth image: luma varies, chroma constant per 2x2,
        # so 4:2:0 averaging loses nothing and the decode must land
        # within quant tolerance.
        base = rng.integers(60, 196, size=(10, 18, 3))
        px = np.kron(base, np.ones((2, 2, 1)))[:19, :35, :].astype(np.uint8)
        out = decode_jpeg(make_jpeg(px, subsample=True))
        assert out.shape == px.shape
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.max() <= 3, err.max()

    def test_restart_markers(self):
        rng = np.random.default_rng(3)
        px = _rand_rgb(rng, 16, 40)  # 2x5 MCUs at 4:4:4
        out = decode_jpeg(make_jpeg(px, restart=2))
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.max() <= 2, err.max()

    def test_grayscale_single_component(self):
        # Hand-build a 1-component stream via the encoder's internals.
        g = np.full((8, 8), 200.0)
        out_stream = bytearray(b"\xff\xd8")
        out_stream += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        out_stream += _seg(
            0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        )
        out_stream += _seg(0xC4, _dht_body(0, 0, _DC_COUNTS, _DC_SYMBOLS))
        out_stream += _seg(0xC4, _dht_body(1, 0, _AC_COUNTS, _AC_SYMBOLS))
        out_stream += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        w = _BitWriter()
        _encode_block(w, g, 0)
        w.flush()
        out_stream += w.out + b"\xff\xd9"
        px = decode_jpeg(bytes(out_stream))
        assert px.shape == (8, 8, 3)
        np.testing.assert_allclose(px.astype(int), 200, atol=1)


class TestJpegRejection:
    def test_rejects_progressive(self):
        px = np.zeros((8, 8, 3), dtype=np.uint8)
        good = make_jpeg(px)
        bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bad)

    def test_rejects_non_interleaved_scan(self):
        """A 3-component frame whose first scan covers only one
        component (non-interleaved layout) must fail loudly, not
        silently decode grayscale from the Y scan alone."""
        px = np.full((8, 8, 3), 120, dtype=np.uint8)
        good = make_jpeg(px)
        i = good.index(b"\xff\xda")
        # SOS: marker, 2-byte length, ns at offset 4 — claim ns=1.
        bad = good[: i + 4] + bytes([1]) + good[i + 5 :]
        with pytest.raises(ValueError, match="non-interleaved"):
            decode_jpeg(bad)

    def test_rejects_garbage_and_truncation(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")
        px = np.full((8, 8, 3), 90, dtype=np.uint8)
        good = make_jpeg(px)
        with pytest.raises(ValueError):
            decode_jpeg(good[: len(good) // 2])
