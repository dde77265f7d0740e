"""Progressive JPEG (SOF2) decode — T.81 Annex G.

Every case is HAND-BUILT scan by scan (the repo has no progressive
encoder, deliberately: libjpeg-era tooling writes progressive, a fixture
generator needn't), and every expectation is computed INDEPENDENTLY of
the decoder by assembling the true coefficient array in numpy and
IDCTing it — so a bug in the scan logic cannot be masked by a symmetric
bug in the expectation (the GIF LZW lesson applies doubly to a decoder
with no encoder twin)."""

from __future__ import annotations

import struct

import numpy as np

from youtube_scraper_db_spark.llm import multimodal as M

ZZ = M._JPEG_ZZ
QZZ = M._JPEG_FIXTURE_QT.reshape(-1)[ZZ].astype(np.int64)

#: Progressive-capable AC Huffman table: EOBn (r=0..14), ZRL, and every
#: (run, size) pair — flat 8-bit canonical codes, all-ones unused.
AC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
AC_BITS = [0] * 16
AC_BITS[7] = len(AC_VALS)
DC_VALS = list(range(12))
DC_BITS = [0] * 16
DC_BITS[3] = 12
DC_CODES = M._jpeg_huff_codes(DC_BITS, DC_VALS)
AC_CODES = M._jpeg_huff_codes(AC_BITS, AC_VALS)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _head(h: int, w: int, comps: list[tuple[int, int]]) -> bytes:
    """SOI + DQT + DHT + SOF2 for components [(id, hv_byte), ...]."""
    dqt = _seg(0xDB, b"\x00" + bytes(QZZ.astype(np.uint8)))
    dht = _seg(
        0xC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    sof = _seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, len(comps))
        + b"".join(bytes([cid, hv, 0]) for cid, hv in comps),
    )
    return b"\xff\xd8" + dqt + dht + sof


def _sos(comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    p = bytes([len(comps)])
    for cs in comps:
        p += bytes([cs, 0x00])
    return _seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))


class _W(M._JpegBitWriter):
    def sym(self, codes, s):
        c, ln = codes[s]
        self.put(c, ln)

    def dc_diff(self, diff: int) -> None:
        t = abs(diff).bit_length()
        self.sym(DC_CODES, t)
        if t:
            self.put(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def take(self) -> bytes:
        self.flush()
        out = bytes(self.buf)
        self.buf = bytearray()
        return out


def _expected_gray(coef_zz: np.ndarray) -> np.ndarray:
    """Independent reconstruction: (bh, bw, 64) zigzag coefficients →
    gray pixels, never touching the decoder."""
    bh, bw = coef_zz.shape[:2]
    out = np.zeros((bh * 8, bw * 8))
    for by in range(bh):
        for bx in range(bw):
            blk = np.zeros(64)
            blk[ZZ] = coef_zz[by, bx] * QZZ
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                M._DCT_A.T @ blk.reshape(8, 8) @ M._DCT_A + 128
            )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_progressive_four_scan_species_single_block():
    """DC first (Al=1) → DC refine → AC first (band, Al=1) → AC refine:
    successive approximation must land every coefficient exactly —
    corrections for already-sent values (5, −3), fresh ±1 insertions at
    full precision (z7=+1, z60=−1 exercising ZRL runs), EOB closing."""
    coef = np.zeros((1, 1, 64), np.int64)
    coef[0, 0, [0, 1, 4, 7, 60]] = [2, 5, -3, 1, -1]

    w = _W()
    w.sym(DC_CODES, 1)  # DC first Al=1: 2>>1 = 1 → cat 1
    w.put(1, 1)
    d1 = w.take()
    w.put(0, 1)  # DC refine: bit (2 & 1) = 0
    d2 = w.take()
    # AC first Ss=1 Se=63 Al=1: z1 → 5//2=2 (r0,s2 '10'); z4 → −3//2=−1
    # (r2,s1 '0'); EOB
    w.sym(AC_CODES, 0x02)
    w.put(2, 2)
    w.sym(AC_CODES, 0x21)
    w.put(0, 1)
    w.sym(AC_CODES, 0x00)
    d3 = w.take()
    # AC refine Ah=1 Al=0: insert +1 at z7 after 4 zero-history skips
    # (correction bits for z1 and z4 ride along), 3×ZRL, insert −1 at
    # z60, EOB
    w.sym(AC_CODES, 0x41)
    w.put(1, 1)  # sign +
    w.put(1, 1)  # correction z1: 5 has low bit set
    w.put(1, 1)  # correction z4
    for _ in range(3):
        w.sym(AC_CODES, 0xF0)
    w.sym(AC_CODES, 0x41)
    w.put(0, 1)  # sign −
    w.sym(AC_CODES, 0x00)
    d4 = w.take()

    jpg = (
        _head(8, 8, [(1, 0x11)])
        + _sos([1], 0, 0, 0, 1) + d1
        + _sos([1], 0, 0, 1, 0) + d2
        + _sos([1], 1, 63, 0, 1) + d3
        + _sos([1], 1, 63, 1, 0) + d4
        + b"\xff\xd9"
    )
    got = M.decode_jpeg_pixels(jpg)
    assert got is not None and got.shape == (8, 8, 1)
    assert np.array_equal(got[:, :, 0], _expected_gray(coef))


def test_progressive_eobrun_and_restarts():
    """EOB-run coding spans blocks; restart markers apply to progressive
    scans too (DC predictors and the EOB run reset, entropy data
    realigns) — and an EOB run may NOT span a restart interval."""
    coef = np.zeros((2, 2, 64), np.int64)
    coef[0, 0, 0], coef[0, 1, 0], coef[1, 0, 0], coef[1, 1, 0] = 2, 6, -4, 10
    coef[0, 0, 1] = 4

    # no restarts: DC full precision + AC with eobrun=3 after block 0
    w = _W()
    for diff in (2, 4, -10, 14):
        w.dc_diff(diff)
    d1 = w.take()
    w.sym(AC_CODES, 0x03)
    w.put(4, 3)
    w.sym(AC_CODES, 0x20)
    w.put(0, 2)  # eobrun = 3
    d2 = w.take()
    jpg = (
        _head(16, 16, [(1, 0x11)])
        + _sos([1], 0, 0, 0, 0) + d1
        + _sos([1], 1, 63, 0, 0) + d2
        + b"\xff\xd9"
    )
    got = M.decode_jpeg_pixels(jpg)
    assert got is not None and np.array_equal(got[:, :, 0], _expected_gray(coef))

    # DRI=2: RST between block pairs in BOTH scans, predictors reset
    coef2 = coef.copy()
    coef2[0, 0, 1] = 0
    dri = _seg(0xDD, struct.pack(">H", 2))
    w = _W()
    w.dc_diff(2)
    w.dc_diff(4)
    w.flush()
    w.buf += bytes([0xFF, 0xD0])
    w.dc_diff(-4)   # predictor reset: dc −4 is its own diff
    w.dc_diff(14)   # hmm: pred now −4, dc 10 → diff 14
    d1 = w.take()
    w.sym(AC_CODES, 0x10)
    w.put(0, 1)  # blocks 0-1: EOB, eobrun=1
    w.flush()
    w.buf += bytes([0xFF, 0xD0])
    w.sym(AC_CODES, 0x10)
    w.put(0, 1)  # blocks 2-3
    d2 = w.take()
    head = _head(16, 16, [(1, 0x11)]) + dri
    jpg2 = head + _sos([1], 0, 0, 0, 0) + d1 + _sos([1], 1, 63, 0, 0) + d2 + b"\xff\xd9"
    got2 = M.decode_jpeg_pixels(jpg2)
    assert got2 is not None and np.array_equal(got2[:, :, 0], _expected_gray(coef2))

    # an EOB run that tries to coast through the restart is a violation
    w = _W()
    w.sym(AC_CODES, 0x30)
    w.put(0, 3)  # eobrun = 7: spans the DRI=2 boundary
    bad_ac = w.take()
    jpg3 = head + _sos([1], 0, 0, 0, 0) + d1 + _sos([1], 1, 63, 0, 0) + bad_ac + b"\xff\xd9"
    assert M.decode_jpeg_pixels(jpg3) is None


def test_progressive_color_interleaved_dc_and_subsampling():
    """Interleaved DC scans walk the MCU grid (including the PADDING
    blocks of a subsampled component); per-component AC scans walk the
    component's own un-padded block grid — the distinction only shows
    at 4:2:0, where Y's padded grid is 2×2 blocks but its own grid for
    an 8×8 frame is a single block."""
    # 4:4:4 flat color 16×16: interleaved DC (4 MCUs × 3 comps) + AC EOBs
    w = _W()
    for mcu in range(4):
        w.dc_diff(2 if mcu == 0 else 0)
        w.dc_diff(0)
        w.dc_diff(0)
    d1 = w.take()
    parts = [_sos([1, 2, 3], 0, 0, 0, 0) + d1]
    for cs in (1, 2, 3):
        w.sym(AC_CODES, 0x20)
        w.put(0, 2)  # eobrun exactly covers the remaining 3 blocks
        parts.append(_sos([cs], 1, 63, 0, 0) + w.take())
    jpg = (
        _head(16, 16, [(1, 0x11), (2, 0x11), (3, 0x11)])
        + b"".join(parts)
        + b"\xff\xd9"
    )
    got = M.decode_jpeg_pixels(jpg)
    assert got is not None and got.shape == (16, 16, 3) and (got == 130).all()

    # 4:2:0, 8×8 frame: DC codes 4 Y blocks + Cb + Cr; Y's AC scan codes 1
    w = _W()
    w.dc_diff(2)
    for _ in range(3):
        w.dc_diff(0)
    w.dc_diff(0)
    w.dc_diff(0)
    d1 = w.take()
    w.sym(AC_CODES, 0x03)
    w.put(4, 3)  # Y z1 = 4
    w.sym(AC_CODES, 0x00)
    dY = w.take()
    parts = [_sos([1, 2, 3], 0, 0, 0, 0) + d1, _sos([1], 1, 63, 0, 0) + dY]
    for cs in (2, 3):
        w.sym(AC_CODES, 0x00)
        parts.append(_sos([cs], 1, 63, 0, 0) + w.take())
    jpg = (
        _head(8, 8, [(1, 0x22), (2, 0x11), (3, 0x11)])
        + b"".join(parts)
        + b"\xff\xd9"
    )
    got = M.decode_jpeg_pixels(jpg)
    assert got is not None and got.shape == (8, 8, 3)
    blk = np.zeros(64)
    blk[ZZ[0]], blk[ZZ[1]] = 2 * 8, 4 * 16
    y = M._DCT_A.T @ blk.reshape(8, 8) @ M._DCT_A + 128
    exp = np.clip(np.round(y), 0, 255).astype(np.uint8)
    for c in range(3):  # neutral chroma ⇒ R=G=B=Y
        assert np.array_equal(got[:, :, c], exp)


def test_progressive_encoder_matches_baseline_and_interops():
    """encode_jpeg_pixels(progressive=True) writes SOF2 with an
    interleaved DC-first (Al=1) scan, a DC refinement scan, and
    per-component EOB-run-coded AC scans; the quantized coefficients
    are the baseline stream's, so both modes must decode to identical
    pixels — across shapes, color, and restart intervals."""
    rng = np.random.default_rng(11)
    for shape, ri in [
        ((8, 8), 0), ((24, 33), 0), ((24, 33), 3),
        ((16, 16, 3), 0), ((21, 13, 3), 2), ((40, 40), 1),
    ]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        blob = M.encode_jpeg_pixels(px, restart_interval=ri, progressive=True)
        assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") >= 3, (shape, ri)
        base = M.decode_jpeg_pixels(
            M.encode_jpeg_pixels(px, restart_interval=ri)
        )
        prog = M.decode_jpeg_pixels(blob)
        assert prog is not None and np.array_equal(base, prog), (shape, ri)

    # flat multi-block image: every AC block is empty, so each
    # component's whole AC scan collapses to ONE cross-block EOBn —
    # the encoder must emit it and the decoder must coast through it
    px = np.full((64, 64), 77, np.uint8)
    blob = M.encode_jpeg_pixels(px, progressive=True)
    assert len(blob) < len(M.encode_jpeg_pixels(px))
    got = M.decode_jpeg_pixels(blob)
    exp = M.decode_jpeg_pixels(M.encode_jpeg_pixels(px))
    assert got is not None and np.array_equal(got, exp)


def test_twelve_bit_precision_both_entropy_layouts():
    """12-bit JPEG (SOF1 extended sequential / 12-bit SOF2): wider
    DC/AC category ranges, 2048 level shift, uint16 output. Both
    layouts must decode a block-constant image bit-exactly (the gate's
    exactness precondition) and agree bit-for-bit on arbitrary images;
    SOF0 claiming 12-bit precision is a spec violation and rejects."""
    rng = np.random.default_rng(21)
    bv = ((np.arange(3)[:, None] * 31 + np.arange(4)[None, :] * 7) * 16 + 5) % 4096
    px = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).astype(np.uint16)
    for prog in (False, True):
        for ri in (0, 2):
            got = M.decode_jpeg_pixels(
                M.encode_jpeg_pixels(
                    px, restart_interval=ri, progressive=prog, precision=12
                )
            )
            assert got is not None and got.dtype == np.uint16
            assert np.array_equal(got[:, :, 0], px), (prog, ri)

    rnd = rng.integers(0, 4096, (24, 17)).astype(np.uint16)
    a = M.decode_jpeg_pixels(M.encode_jpeg_pixels(rnd, precision=12))
    b = M.decode_jpeg_pixels(
        M.encode_jpeg_pixels(rnd, precision=12, progressive=True)
    )
    assert a is not None and np.array_equal(a, b)
    assert np.abs(a[:, :, 0].astype(int) - rnd.astype(int)).max() <= 4 * 8

    color = rng.integers(0, 4096, (16, 16, 3)).astype(np.uint16)
    c = M.decode_jpeg_pixels(M.encode_jpeg_pixels(color, precision=12))
    assert c is not None and c.shape == (16, 16, 3) and c.dtype == np.uint16

    blob = bytearray(M.encode_jpeg_pixels(px.astype(np.uint8)))
    i = blob.index(b"\xff\xc0")
    blob[i + 4] = 12  # SOF0 + 12-bit: forbidden combination
    assert M.decode_jpeg_pixels(bytes(blob)) is None


def test_lossless_exact_all_predictors_and_precisions():
    """SOF3 lossless (Annex H): every predictor selector 1-7 at
    8/12/16-bit precision must decode ARBITRARY images bit-exactly,
    with and without restart intervals; 16-bit extremes exercise the
    modulo-2^16 difference wrap and the no-magnitude-bits category
    16."""
    rng = np.random.default_rng(31)
    for prec, hi in ((8, 256), (12, 4096), (16, 65536)):
        for sel in range(1, 8):
            px = rng.integers(0, hi, (9, 13)).astype(np.int64)
            for ri in (0, 5):
                got = M.decode_jpeg_pixels(
                    M.encode_jpeg_lossless(
                        px, predictor=sel, restart_interval=ri,
                        precision=prec,
                    )
                )
                assert got is not None, (prec, sel, ri)
                assert np.array_equal(
                    got[:, :, 0].astype(np.int64), px
                ), (prec, sel, ri)

    extreme = np.array([[0, 65535], [65535, 0]], np.int64)
    got = M.decode_jpeg_pixels(
        M.encode_jpeg_lossless(extreme, predictor=4, precision=16)
    )
    assert np.array_equal(got[:, :, 0].astype(np.int64), extreme)

    # hand-derived two-sample check, predictor 1 at 8-bit: the first
    # sample predicts the midpoint 128, the second predicts Ra — so
    # [130, 131] codes diffs (+2, +1), and a spec decoder must land
    # exactly there (pins the default/first-line rules independently
    # of the encoder)
    got = M.decode_jpeg_pixels(
        M.encode_jpeg_lossless(np.array([[130, 131]]), predictor=1)
    )
    assert got[:, :, 0].tolist() == [[130, 131]]

    blob = M.encode_jpeg_lossless(
        rng.integers(0, 256, (6, 6)), predictor=7
    )
    for cut in range(0, len(blob), 7):  # truncation totality
        M.decode_jpeg_pixels(blob[:cut])
    # bad predictor selector rejects
    bad = blob.replace(bytes([0xFF, 0xDA, 0, 8, 1, 1, 0, 7, 0, 0]),
                       bytes([0xFF, 0xDA, 0, 8, 1, 1, 0, 8, 0, 0]))
    assert M.decode_jpeg_pixels(bad) is None


def test_progressive_rejects_malformed():
    head = _head(8, 8, [(1, 0x11)])
    assert M.decode_jpeg_pixels(head + b"\xff\xd9") is None  # no scans
    w = _W()
    w.sym(DC_CODES, 1)
    w.put(1, 1)
    d1 = w.take()
    full = head + _sos([1], 0, 0, 0, 1) + d1 + b"\xff\xd9"
    assert M.decode_jpeg_pixels(full) is not None
    assert M.decode_jpeg_pixels(full[: len(full) - 6]) is None  # truncated
    # AC scan must be single-component
    bad = head + _sos([1, 1], 1, 63, 0, 0) + d1 + b"\xff\xd9"
    assert M.decode_jpeg_pixels(bad) is None
