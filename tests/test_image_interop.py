"""Third-party PNG/GIF stream interop — the sibling of
tests/test_jpeg_interop.py for the lossless codecs, where agreement
with an independent decoder must be EXACT (no IDCT/upsampling
variance exists to hide behind).

Streams come from unrelated software shipped in the container — libpng's
own canonical test image (Adam7-interlaced RGBA — the upstream example
from the library that DEFINES the format), GNOME/vim icon themes
(8-bit and 4-bit palette, gray+alpha, RGBA), Python/nodejs doc images
(8-bit gray, RGB), and the libxslt documentation GIFs (LZW streams from
a 1990s-era encoder lineage). Reference is Java ImageIO reading raw
raster samples, with palette images expanded through getRGB (their
raster holds indices).

Tolerance: ZERO. PNG filters, palette lookup and GIF LZW are exact
transforms; any nonzero diff is a decoder bug. GIF transparent pixels
are excluded (this decoder keeps the palette color where ImageIO
reports alpha 0 — both are faithful readings of the same bytes).
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from youtube_scraper_db_spark.llm import multimodal as M

JAVA_SRC = """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.Raster;
import java.io.*;

public class DumpPixels2 {
    public static void main(String[] args) throws Exception {
        BufferedImage img = ImageIO.read(new File(args[0]));
        int w = img.getWidth(), h = img.getHeight();
        DataOutputStream out = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(args[1])));
        if (img.getColorModel() instanceof IndexColorModel) {
            boolean alpha = img.getColorModel().hasAlpha();
            int bands = alpha ? 4 : 3;
            out.writeInt(h); out.writeInt(w); out.writeInt(bands);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int rgb = img.getRGB(x, y);
                    out.writeByte((rgb >> 16) & 0xFF);
                    out.writeByte((rgb >> 8) & 0xFF);
                    out.writeByte(rgb & 0xFF);
                    if (alpha) out.writeByte((rgb >> 24) & 0xFF);
                }
        } else {
            Raster r = img.getRaster();
            int bands = r.getNumBands();
            out.writeInt(h); out.writeInt(w); out.writeInt(bands);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int b = 0; b < bands; b++)
                        out.writeByte(r.getSample(x, y, b));
        }
        out.close();
    }
}
"""


@pytest.fixture(scope="module")
def imageio_decode(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available for the ImageIO reference decoder")
    d = tmp_path_factory.mktemp("jio2")
    (d / "DumpPixels2.java").write_text(JAVA_SRC)
    subprocess.run(
        ["javac", "DumpPixels2.java"], cwd=d, check=True, capture_output=True
    )

    def decode(path: str) -> np.ndarray:
        out = d / "out.bin"
        subprocess.run(
            ["java", "-cp", str(d), "DumpPixels2", path, str(out)],
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


#: (path, what it exercises). Channel counts may differ from the
#: reference (palette PNGs decode to RGB here but carry a tRNS-derived
#: alpha band through ImageIO) — the shared leading channels must be
#: byte-identical.
PNGS = [
    (
        "/usr/share/doc/libpng-dev/examples/pngtest.png",
        "libpng's own Adam7-interlaced RGBA example",
    ),
    (
        "/usr/share/icons/locolor/16x16/apps/gvim.png",
        "4-bit palette (sub-8 packed indices)",
    ),
    (
        "/usr/share/icons/Adwaita/24x24/legacy/view-fullscreen.png",
        "8-bit palette",
    ),
    (
        "/usr/share/icons/Adwaita/24x24/legacy/input-dialpad.png",
        "8-bit gray+alpha (color type 4)",
    ),
    (
        "/usr/share/doc/python3-dev/_static/minus.png",
        "8-bit grayscale",
    ),
    (
        "/usr/share/doc/nodejs/contributing/doc_img/youtube-stream-status.png",
        "8-bit RGB truecolor",
    ),
]

GIFS = [
    "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-90x34.gif",
    "/usr/share/doc/libxslt1-dev/html/contexts.gif",
    "/usr/share/doc/libxslt1-dev/html/processing.gif",
]


@pytest.mark.parametrize(
    "path,what", PNGS, ids=lambda v: str(v).split("/")[-1]
)
def test_third_party_png_exact(path, what, imageio_decode):
    data = _need(path)
    mine = M.decode_png_pixels(data)
    assert mine is not None, f"decode refused a conforming stream ({what})"
    ref = imageio_decode(path)
    assert mine.shape[:2] == ref.shape[:2]
    c = min(mine.shape[2], ref.shape[2])
    d = np.abs(mine[:, :, :c].astype(int) - ref[:, :, :c].astype(int))
    assert d.max() == 0, f"{what}: maxdiff {d.max()}"


@pytest.mark.parametrize("path", GIFS, ids=lambda v: str(v).split("/")[-1])
def test_third_party_gif_exact(path, imageio_decode):
    data = _need(path)
    mine = M.decode_gif_pixels(data)
    assert mine is not None
    ref = imageio_decode(path)
    assert mine.shape[:2] == ref.shape[:2]
    d = np.abs(mine.astype(int) - ref[:, :, :3].astype(int))
    if ref.shape[2] == 4:
        opaque = ref[:, :, 3] == 255
        assert opaque.mean() > 0.5  # the comparison must be meaningful
        assert d[opaque].max() == 0
    else:
        assert d.max() == 0


def test_gray_alpha_roundtrip():
    """Color type 4 (added with this suite): encode→decode roundtrip at
    8 and 16 bit."""
    rng = np.random.default_rng(7)
    for depth in (8, 16):
        hi = (1 << depth) - 1
        img = rng.integers(0, hi + 1, (9, 7, 2), dtype=np.uint16)
        if depth == 8:
            img = img.astype(np.uint8)
        enc = M.encode_png_pixels(img, bit_depth=depth)
        dec = M.decode_png_pixels(enc)
        assert dec is not None and dec.shape == (9, 7, 2)
        assert (dec == img).all()


def test_third_party_bmp_exact(imageio_decode):
    """CPython's 32-bit BI_BITFIELDS BMP (V5 header) — byte-exact
    against ImageIO including alpha."""
    path = (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/"
        "data/python.bmp"
    )
    data = _need(path)
    mine = M.decode_bmp_pixels(data)
    assert mine is not None and mine.shape[2] == 4
    ref = imageio_decode(path)
    assert mine.shape == ref.shape
    assert np.abs(mine.astype(int) - ref.astype(int)).max() == 0


def test_bmp_8bit_palette_and_32bit_handbuilt():
    """Hand-constructed 8-bit palette and 32-bit BI_RGB BMPs decode to
    the expected RGB(A) — palette lookup, BGRA order, padding, and
    bottom-up flip all covered without an encoder."""
    import struct as st

    # 8-bit palette: 3x2, palette [red, green, blue] as BGRX
    w, h = 3, 2
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0]) + bytes([255, 0, 0, 0])
    rows = bytes([0, 1, 2, 0]) + bytes([2, 1, 0, 0])  # padded to 4
    off = 14 + 40 + len(pal)
    hdr = b"BM" + st.pack("<IHHI", off + len(rows), 0, 0, off)
    dib = st.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 0, 0, 3, 0)
    bmp = hdr + dib + pal + rows
    px = M.decode_bmp_pixels(bmp)
    # bottom-up: file row 0 is image bottom
    assert px.shape == (2, 3, 3)
    assert px[1].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert px[0].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]

    # 32-bit BI_RGB: 2x1, BGRA stored
    data = bytes([10, 20, 30, 40]) + bytes([50, 60, 70, 80])
    off = 14 + 40
    hdr = b"BM" + st.pack("<IHHI", off + len(data), 0, 0, off)
    dib = st.pack("<IiiHHIIiiII", 40, 2, 1, 1, 32, 0, len(data), 0, 0, 0, 0)
    px = M.decode_bmp_pixels(hdr + dib + data)
    assert px.shape == (1, 2, 4)
    assert px[0, 0].tolist() == [30, 20, 10, 40]  # BGRA -> RGBA
    assert px[0, 1].tolist() == [70, 60, 50, 80]
