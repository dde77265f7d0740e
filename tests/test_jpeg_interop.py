"""Third-party JPEG stream interop (round 6 — the GIF-LZW lesson
institutionalized for the progressive decoder).

The repo's own progressive tests pin hand-derived spec bitstreams and an
independent numpy IDCT, but every entropy stream they decode was written
by the repo's own encoder — and the encoder never emits AC-REFINEMENT
scans (its progressive AC scans are all Ah=0), so a symmetric
convention bug in the refinement path is roundtrip-invisible. This
suite decodes streams produced by OTHER encoders (libjpeg-family) that
ship with the container:

- the Spark distribution's mllib sample images ($SPARK_HOME/data/mllib/
  images — progressive grayscale with AC-refinement EOB runs, baseline
  4:2:0 photos),
- the nodejs doc assets (/usr/share/doc/nodejs — progressive color),
- the Rust embedded-book photo (progressive 4:2:2),
- CPython's test-suite 16×16 logo (baseline 4:2:0).

Ground truth is Java ImageIO (the JDK's independent libjpeg6b-derived
decoder; the JDK is a hard dependency of this Spark repo, so it is
always present), reading RAW raster samples — BufferedImage.getRGB
gamma-converts grayscale and would fake mismatches.

Tolerances: luma must be tight everywhere (entropy decode + IDCT are
the things under test). Chroma of SUBSAMPLED images is compared
loosely: this decoder upsamples nearest-neighbor while ImageIO
interpolates ("fancy" upsampling) — both spec-legal (T.81 leaves the
reconstruction filter open), diverging by design at sharp chroma
edges.

This suite caught a real bug on first contact: the AC-refinement
EOB-run count excluded the current block (the AC-FIRST convention), so
the block's remaining correction bits were never read and the bitstream
desynced — grayscale.jpg failed outright. Fixed in
multimodal.py ac_refine_block (eob = 1 << r, run includes the current
block); grayscale.jpg now matches ImageIO within ±1.

No third-party SOF3 (lossless) or 12-bit streams exist in the
container, and fabricating them from memory would recreate the
symmetric-bug blind spot this suite exists to remove — that boundary
stays honest (hand-derived + independent-IDCT coverage only).
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from youtube_scraper_db_spark.llm import multimodal as M

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
_IMAGES = os.path.join(SPARK_HOME, "data", "mllib", "images", "origin")

JAVA_SRC = """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;

public class DumpPixels {
    public static void main(String[] args) throws Exception {
        BufferedImage img = ImageIO.read(new File(args[0]));
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        int bands = r.getNumBands();
        DataOutputStream out = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(args[1])));
        out.writeInt(h); out.writeInt(w); out.writeInt(bands);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                for (int b = 0; b < bands; b++)
                    out.writeByte(r.getSample(x, y, b));
        out.close();
    }
}
"""


@pytest.fixture(scope="module")
def imageio_decode(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available for the ImageIO reference decoder")
    d = tmp_path_factory.mktemp("jio")
    (d / "DumpPixels.java").write_text(JAVA_SRC)
    subprocess.run(
        ["javac", "DumpPixels.java"], cwd=d, check=True, capture_output=True
    )

    def decode(path: str) -> np.ndarray:
        out = d / "out.bin"
        subprocess.run(
            ["java", "-cp", str(d), "DumpPixels", path, str(out)],
            check=True,
            capture_output=True,
        )
        b = out.read_bytes()
        h, w, bands = struct.unpack(">iii", b[:12])
        return np.frombuffer(b[12:], np.uint8).reshape(h, w, bands)

    return decode


def _need(path: str) -> bytes:
    if not os.path.exists(path):
        pytest.skip(f"third-party fixture not present: {path}")
    return open(path, "rb").read()


def _luma(a: np.ndarray) -> np.ndarray:
    if a.shape[2] == 1:
        return a[:, :, 0].astype(float)
    return (a.astype(float) * [0.299, 0.587, 0.114]).sum(axis=2)


#: (path, kind, max_total_diff or None when only luma is comparable)
THIRD_PARTY = [
    # progressive grayscale, AC-refinement EOB runs — the bug-catcher
    (os.path.join(_IMAGES, "multi-channel", "grayscale.jpg"), "SOF2", 2),
    # progressive color, 1x1 sampling (flat content, tight everywhere)
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", "SOF2", 4),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", "SOF2", 4),
    # baseline 4:2:0 photo — chroma upsampling differs by design
    (os.path.join(_IMAGES, "kittens", "29.5.a_b_EGDP022204.jpg"), "SOF0", None),
    # progressive 4:2:2 photo
    (
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
        "rust/html/embedded-book/assets/f3.jpg",
        "SOF2",
        None,
    ),
]


def _sof_marker(b: bytes) -> int | None:
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        m = b[i + 1]
        if m in (0x01,) or 0xD0 <= m <= 0xD9:
            i += 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        i += 2 + struct.unpack(">H", b[i + 2 : i + 4])[0]
    return None


@pytest.mark.parametrize("path,kind,tight", THIRD_PARTY, ids=lambda v: str(v).split("/")[-1])
def test_third_party_stream_matches_imageio(path, kind, tight, imageio_decode):
    data = _need(path)
    # the fixture really is the mode it claims (progressive coverage is
    # the point — fail loudly if a distro swap changes the encoding)
    marker = _sof_marker(data)
    assert marker == {"SOF0": 0xC0, "SOF2": 0xC2}[kind], hex(marker or 0)
    mine = M.decode_jpeg_pixels(data)
    assert mine is not None, "decode refused a conforming third-party stream"
    ref = imageio_decode(path)
    assert mine.shape == ref.shape
    if tight is not None:
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert d.max() <= tight, f"maxdiff {d.max()} > {tight}"
    # luma must be tight for every stream — entropy decode and IDCT are
    # under test; only subsampled-chroma reconstruction may differ
    dl = np.abs(_luma(mine) - _luma(ref))
    assert dl.max() <= 4.0, f"luma maxdiff {dl.max():.1f}"
    if tight is None:
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert d.mean() <= 2.5, f"mean diff {d.mean():.2f} — beyond upsample variance"


def test_cpython_logo_luma(imageio_decode):
    """CPython's 16×16 baseline logo: sharp saturated color edges at
    4:2:0 make per-pixel chroma incomparable across upsample filters,
    but luma must still agree."""
    path = None
    for root in ("/root/.pyenv/versions",):
        if os.path.isdir(root):
            for v in sorted(os.listdir(root), reverse=True):
                cand = os.path.join(
                    root, v, "lib", f"python{'.'.join(v.split('.')[:2])}",
                    "test", "test_email", "data", "python.jpg",
                )
                if os.path.exists(cand):
                    path = cand
                    break
        if path:
            break
    if path is None:
        pytest.skip("CPython test-suite python.jpg not present")
    data = open(path, "rb").read()
    mine = M.decode_jpeg_pixels(data)
    assert mine is not None and mine.shape == (16, 16, 3)
    ref = imageio_decode(path)
    # the RGB-space luma proxy still carries ~0.3×chroma-diff bleed, and
    # an 8×8 chroma plane under a 16×16 saturated logo maximizes the
    # nearest-vs-fancy divergence — hence the looser bound here
    dl = np.abs(_luma(mine) - _luma(ref))
    assert dl.max() <= 10.0, f"luma maxdiff {dl.max():.1f}"


def test_ac_refine_eob_run_regression():
    """The exact failure grayscale.jpg exposed, reproduced self-contained
    (no external file needed): an AC-refinement scan whose EOB-run
    symbol (r=0 → run of exactly one block) arrives while the block
    still has nonzero history — its correction bits must be consumed.
    Build the stream by hand: one 8×8 grayscale block, AC-first scan
    sets coef[1]=-2 (al=1), then a refinement scan (ah=1, al=0) opens
    with EOB0 whose correction bit refines coef[1] to -3."""
    import numpy as np

    qt = np.ones((8, 8), np.int64)

    def dqt():
        payload = bytes([0]) + bytes(
            int(qt.flat[int(z)]) for z in M._JPEG_ZZ.argsort()
        )
        # table 0, 8-bit — serialize in zigzag order
        tbl = np.zeros(64, np.int64)
        tbl[:] = 1
        return b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + bytes([1] * 64)

    # Huffman: DC table {0: cat0} ; AC table with symbols 0x00 (EOB) and
    # 0x02 (run 0, size 2) and 0x01 (run 0, size 1)
    def dht(tc, th, syms):
        bits = [0] * 16
        bits[len(syms) - 1 if len(syms) > 1 else 0] = 0  # rebuilt below
        # canonical: all codes at length ceil(log2(n+1)) — use length 2
        L = 2
        bits = [0] * 16
        bits[L - 1] = len(syms)
        return (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 17 + len(syms))
            + bytes([(tc << 4) | th])
            + bytes(bits)
            + bytes(syms)
        )

    sof = b"\xff\xc2" + struct.pack(">H", 11) + bytes([8]) + struct.pack(
        ">HH", 8, 8
    ) + bytes([1, 1, 0x11, 0])

    def sos(ss, se, ah, al):
        return (
            b"\xff\xda"
            + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        )

    w = M._JpegBitWriter()
    # DC first scan (al=1): category 0 diff → code for symbol 0
    # DC table: symbols [0,1] at length 2 → codes 00, 01
    w.put(0b00, 2)
    w.flush()
    dc_scan = bytes(w.buf)

    # AC first scan ss=1 se=63 al=1: symbol 0x02 (r=0,s=2) value -2 →
    # receive bits '01' (two's complement of -2 at size 2), then EOB
    # AC table symbols [0x00, 0x01, 0x02] at length 2 → codes 00,01,10
    w = M._JpegBitWriter()
    w.put(0b10, 2)  # 0x02
    w.put(0b01, 2)  # -2
    w.put(0b00, 2)  # EOB (r=0)
    w.flush()
    ac_first = bytes(w.buf)

    # AC refinement ss=1 se=63 ah=1 al=0: EOB0 (r=0, run = THIS block
    # only) followed by one correction bit=1 for coef[1] (nonzero
    # history) → value -2<<1=-4 refined to -5
    w = M._JpegBitWriter()
    w.put(0b00, 2)  # EOB0
    w.put(1, 1)  # correction bit for coef k=1
    w.flush()
    ac_refine = bytes(w.buf)

    stream = (
        b"\xff\xd8"
        + dqt()
        + dht(0, 0, [0, 1])
        + dht(1, 0, [0x00, 0x01, 0x02])
        + sof
        + sos(0, 0, 0, 1)
        + dc_scan
        + sos(1, 63, 0, 1)
        + ac_first
        + sos(1, 63, 1, 0)
        + ac_refine
        + b"\xff\xd9"
    )
    out = M.decode_jpeg_pixels(stream)
    assert out is not None, "refinement EOB-run correction bits desynced"
    # coefficient 1 (zigzag) = -4 - 1 = -5 with qt=1: IDCT of
    # [0, -5, 0, ...] — just assert decode succeeded and is 8x8 gray
    assert out.shape == (8, 8, 1)
