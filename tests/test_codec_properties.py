"""Cross-checked codec properties for the round-5 image additions.

Same discipline as the LZW/ADPCM suites: the library's output is
decoded by INDEPENDENT spec-rule implementations written here over
their own table/rule copies, so a symmetric bug in the library's
encoder+decoder pair cannot hide behind roundtrips."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_scraper_db_spark.llm import multimodal as M


def _ref_lossless_decode(blob: bytes):
    """Independent Annex H decoder: its own marker walk, canonical
    Huffman table build, and predictor rules — no library calls."""
    i = 2
    bits = vals = None
    h = w = prec = sel = ri = None
    data_at = None
    while i + 4 <= len(blob):
        assert blob[i] == 0xFF
        m = blob[i + 1]
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        pay = blob[i + 4 : i + 2 + ln]
        if m == 0xC4:
            bits, vals = list(pay[1:17]), list(pay[17:])
        elif m == 0xC3:
            prec = pay[0]
            h, w = struct.unpack(">HH", pay[1:5])
        elif m == 0xDD:
            (ri,) = struct.unpack(">H", pay[:2])
        elif m == 0xDA:
            sel = pay[3]
            data_at = i + 2 + ln
            break
        i += 2 + ln
    # canonical decode table
    table = {}
    code = 0
    k = 0
    for L in range(1, 17):
        for _ in range(bits[L - 1]):
            table[(L, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1

    pos = data_at
    acc = nbits = 0

    def fill():
        nonlocal pos, acc, nbits
        byte = blob[pos]
        if byte == 0xFF:
            nxt = blob[pos + 1]
            if nxt == 0x00:
                pos += 2
            else:
                raise EOFError
        else:
            pos += 1
        acc = (acc << 8) | byte
        nbits += 8

    def bit():
        nonlocal acc, nbits
        if nbits == 0:
            fill()
        nbits -= 1
        return (acc >> nbits) & 1

    def read_sym():
        code, L = 0, 0
        while True:
            code = (code << 1) | bit()
            L += 1
            if (L, code) in table:
                return table[(L, code)]

    out = np.zeros((h, w), np.int64)
    default = 1 << (prec - 1)
    n = 0
    start = True
    for y in range(h):
        for x in range(w):
            if ri and n and n % ri == 0:
                # byte-align and consume the RST marker
                acc = nbits = 0
                assert blob[pos] == 0xFF and 0xD0 <= blob[pos + 1] <= 0xD7
                pos += 2
                start = True
            t = read_sym()
            if t == 16:
                diff = 32768
            elif t:
                v = 0
                for _ in range(t):
                    v = (v << 1) | bit()
                diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
            else:
                diff = 0
            if start:
                pred = default
                start = False
            elif y == 0:
                pred = int(out[y, x - 1])
            elif x == 0:
                pred = int(out[y - 1, x])
            else:
                ra, rb, rc = (
                    int(out[y, x - 1]),
                    int(out[y - 1, x]),
                    int(out[y - 1, x - 1]),
                )
                pred = [
                    None, ra, rb, rc, ra + rb - rc,
                    ra + ((rb - rc) >> 1), rb + ((ra - rc) >> 1),
                    (ra + rb) >> 1,
                ][sel]
            out[y, x] = (pred + diff) & 0xFFFF
            n += 1
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=7),
    st.sampled_from([8, 12, 16]),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_lossless_jpeg_matches_independent_reference(sel, prec, ri, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 1 << prec, (5, 7)).astype(np.int64)
    blob = M.encode_jpeg_lossless(
        px, predictor=sel, restart_interval=ri, precision=prec
    )
    lib = M.decode_jpeg_pixels(blob)
    ref = _ref_lossless_decode(blob)
    assert lib is not None
    assert np.array_equal(lib[:, :, 0].astype(np.int64), ref)
    assert np.array_equal(ref, px)  # and the codec is actually lossless


@settings(max_examples=30, deadline=None)
@given(
    st.sampled_from([1, 2, 4]),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_sub8_roundtrip_property(depth, h, w, interlace, seed):
    """Any sub-8 image, any geometry (odd widths exercise the pad
    bits), both interlace modes, mixed filters — decode must equal the
    ×255/(2^d−1) expansion exactly."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
    blob = M.encode_png_pixels(
        px, [4, 1, 3, 2, 0], bit_depth=depth, interlace=interlace
    )
    got = M.decode_png_pixels(blob)
    exp = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)[:, :, None]
    assert got is not None and np.array_equal(got, exp)
