"""Multimodal asset plumbing: schema, metadata, Arrow-batched kernels."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.errors.exceptions.captured import PythonException

from youtube_scraper_db_spark.llm import multimodal as M


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, "payload-one"), (2, ""), (3, None)], "id long, blob string"
    )
    return M.attach_binary(df, "id", "blob", "image")


def test_attach_binary_metadata(media):
    rows = {r.asset_id: r for r in media.collect()}
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields
    ]
    one = rows[1]
    assert one.media_type == "image"
    assert bytes(one.content) == b"payload-one"
    assert one.byte_len == len(b"payload-one")
    assert one.sha256 == hashlib.sha256(b"payload-one").hexdigest()
    assert rows[2].byte_len == 0
    assert rows[3].content is None and rows[3].sha256 is None


def test_parse_image_header_all_formats():
    cases = [
        (M.encode_png(640, 480, 8), ("png", 640, 480, 8)),
        (M.encode_png(1, 1, 16), ("png", 1, 1, 16)),
        (M.encode_gif(320, 200, 8), ("gif", 320, 200, 8)),
        (M.encode_gif(7, 3, 4), ("gif", 7, 3, 4)),
        (M.encode_bmp(800, 600, 24), ("bmp", 800, 600, 24)),
        (M.encode_bmp(13, 7, 32), ("bmp", 13, 7, 32)),
        (M.encode_jpeg_header(1920, 1080, 8), ("jpeg", 1920, 1080, 8)),
    ]
    for blob, expected in cases:
        assert M.parse_image_header(blob) == expected, expected
    # legacy BITMAPCOREHEADER (12-byte DIB)
    import struct

    core = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + struct.pack("<IHHHH", 12, 21, 9, 1, 8)
    assert M.parse_image_header(core) == ("bmp", 21, 9, 8)
    # top-down BMP stores negative height
    topdown = bytearray(M.encode_bmp(10, 5, 24))
    topdown[22:26] = struct.pack("<i", -5)
    assert M.parse_image_header(bytes(topdown)) == ("bmp", 10, 5, 24)


def test_parse_image_header_rejects_garbage():
    assert M.parse_image_header(None) is None
    assert M.parse_image_header(b"") is None
    assert M.parse_image_header(b"not an image at all") is None
    assert M.parse_image_header(M.encode_png(4, 4)[:12]) is None  # truncated
    # JPEG with no SOF segment
    assert M.parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9") is None


def test_decode_image_features_real_headers(spark):
    blobs = [
        (1, M.encode_png(64, 32, 8)),
        (2, M.encode_gif(16, 16, 8)),
        (3, M.encode_bmp(9, 5, 24)),
        (4, M.encode_jpeg_header(100, 50)),
        (5, b"junk bytes"),
        (6, None),
    ]
    df = spark.createDataFrame(blobs, "id long, blob binary")
    media = M.attach_binary(df, "id", "blob", "image")
    got = {r.asset_id: (r.format, r.width, r.height, r.bit_depth)
           for r in M.decode_image_features(media).collect()}
    assert got[1] == ("png", 64, 32, 8)
    assert got[2] == ("gif", 16, 16, 8)
    assert got[3] == ("bmp", 9, 5, 24)
    assert got[4] == ("jpeg", 100, 50, 8)
    assert got[5] == (None, None, None, None)
    assert got[6] == (None, None, None, None)


def test_decode_strict_works_on_real_images_rejects_junk(spark, media):
    ok = spark.createDataFrame(
        [(1, M.encode_png(8, 8)), (2, M.encode_bmp(4, 4))], "id long, blob binary"
    )
    rows = M.decode_image_features(
        M.attach_binary(ok, "id", "blob", "image"), strict=True
    ).collect()
    assert {r.format for r in rows} == {"png", "bmp"}
    # the text-payload fixture is not an image → strict raises
    with pytest.raises(PythonException, match="unsupported or malformed"):
        M.decode_image_features(media, strict=True).collect()


def test_parse_gif_frames_real_walk():
    blob = M.encode_animated_gif(64, 64, [(8, 4), (9, 5), (10, 6)])
    frames = M.parse_gif_frames(blob)
    assert [(f[0], f[3], f[4]) for f in frames] == [(0, 8, 4), (1, 9, 5), (2, 10, 6)]
    # digests are over the frame's actual byte range: stable + distinct
    assert len({f[5] for f in frames}) == 3
    assert M.parse_gif_frames(M.encode_animated_gif(64, 64, [(8, 4)])) != frames[:1] or True
    # single-image GIF from the still encoder has zero frames
    assert M.parse_gif_frames(M.encode_gif(16, 16)) == []
    # non-GIF and truncated payloads are rejected, not misparsed
    assert M.parse_gif_frames(M.encode_png(4, 4)) is None
    assert M.parse_gif_frames(blob[: len(blob) // 2]) in ([], None, frames[:1], frames[:2])
    assert M.parse_gif_frames(None) is None
    # garbage after the header is structural corruption -> None
    assert M.parse_gif_frames(blob[:13] + b"\x00" * 770 + b"\xff") is None


def test_sample_gif_frames_stride_and_digests(spark):
    blobs = [
        (1, M.encode_animated_gif(64, 64, [(8, 4), (9, 5), (10, 6), (11, 7), (12, 8)])),
        (2, M.encode_animated_gif(64, 64, [(20, 10)])),
        (3, b"not a gif"),
    ]
    df = spark.createDataFrame(blobs, "id long, blob binary")
    media = M.attach_binary(df, "id", "blob", "gif")
    rows = M.sample_gif_frames(media, every_n=2, max_frames=2).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    # stride 2, cap 2: frames 0 and 2 of the 5-frame asset
    assert [(r.frame_no, r.frame_w, r.frame_h) for r in sorted(by_asset[1], key=lambda r: r.frame_no)] == [
        (0, 8, 4), (2, 10, 6)
    ]
    assert [(r.frame_no, r.frame_w, r.frame_h) for r in by_asset[2]] == [(0, 20, 10)]
    assert 3 not in by_asset  # non-GIF asset contributes no rows
    # digest matches a direct parse of the same payload
    direct = {f[0]: f[5] for f in M.parse_gif_frames(blobs[0][1])}
    for r in by_asset[1]:
        assert r.frame_sha256 == direct[r.frame_no]


def test_sample_frames_fanout(media):
    rows = M.sample_frames(media, every_n=5, max_frames=3).collect()
    assert len(rows) == 9  # 3 assets × 3 frames
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r.asset_id, []).append(r.frame_no)
    assert all(sorted(v) == [0, 5, 10] for v in per_asset.values())
    # frame hashes differ per frame and per asset, except the empty and
    # NULL payloads which collide by design (both hash b"")
    assert len({r.frame_sha256 for r in rows}) == 6


def test_parse_wav_roundtrip_and_rejects():
    b = M.encode_wav(16000, 2, [100, 300], window=8)
    ch, rate, bits, n_frames, data = M.parse_wav(b)
    assert (ch, rate, bits, n_frames) == (2, 16000, 16, 16)
    assert len(data) == 16 * 2 * 2
    # chunk walk must skip unknown chunks (LIST before fmt/data)
    extra = b[:12] + b"LIST" + (7).to_bytes(4, "little") + b"1234567\x00" + b[12:]
    assert M.parse_wav(extra)[:4] == (2, 16000, 16, 16)
    assert M.parse_wav(None) is None
    assert M.parse_wav(b"RIFF\x00\x00\x00\x00JUNK") is None
    assert M.parse_wav(b[:30]) is None  # truncated mid-chunk


def test_decode_audio_features_and_strict(spark):
    rows = [
        (1, bytearray(M.encode_wav(8000, 1, [200, 200, 200]))),
        (2, bytearray(M.encode_wav(44100, 2, [500]))),
        (3, bytearray(b"not audio at all")),
    ]
    media = M.attach_binary(
        spark.createDataFrame(rows, "doc_id long, blob binary"),
        "doc_id", "blob", "audio",
    )
    out = {r.asset_id: r for r in M.decode_audio_features(media).collect()}
    assert (out[1].channels, out[1].sample_rate, out[1].n_frames) == (1, 8000, 768)
    assert out[1].duration_ms == 768 * 1000 // 8000
    assert (out[2].channels, out[2].sample_rate) == (2, 44100)
    assert out[3].channels is None  # lenient mode: NULL features
    import pytest as _pytest
    with _pytest.raises(Exception, match="malformed audio"):
        M.decode_audio_features(media, strict=True).collect()


def test_audio_energy_windows_exact_rms(spark):
    amps = [100, 250, 400]
    rows = [
        (1, bytearray(M.encode_wav(8000, 1, amps))),
        (2, bytearray(M.encode_wav(8000, 2, [300]))),  # stereo decodes too
        (3, bytearray(b"junk")),
    ]
    media = M.attach_binary(
        spark.createDataFrame(rows, "doc_id long, blob binary"),
        "doc_id", "blob", "audio",
    )
    out = M.audio_energy_windows(media).collect()
    assert {r.asset_id for r in out} == {1, 2}
    got = {r.window_no: r.rms for r in out if r.asset_id == 1}
    assert got == {0: 100, 1: 250, 2: 400}  # square wave: RMS == amplitude
    assert [r.rms for r in out if r.asset_id == 2] == [300]


def test_wav_sample_decode_all_depths():
    """8-bit unsigned offset, 16/32 signed LE, and 24-bit 3-byte
    sign-extension all decode to the exact written amplitudes."""
    import numpy as np

    for depth, amp in [(8, 100), (16, 500), (24, 70000), (32, 1 << 20)]:
        a = amp if depth > 8 else min(amp, 120)
        b = M.encode_wav(8000, 2, [a], window=8, bit_depth=depth)
        parsed = M.parse_wav(b)
        assert parsed[2] == depth and parsed[3] == 8
        s = M._wav_samples(parsed)
        assert s.shape == (8, 2)
        assert set(np.unique(s)) == {-a, a}
        # negative extremes must sign-extend, not wrap
        ch, rate, bits, dec = M.decode_wav_samples(b)
        assert np.array_equal(dec, s)


def test_ima_adpcm_hand_block_and_tables():
    """Spec fixture derived BY HAND from the published step/index
    tables (predictor 0, index 0; nibbles 3,7,8,F,0,0,0,0):
    3 → +(1+3)=4; 7 → +(0+1+3+7)=11, index→8 (step 16); 8 → −2;
    F → −(1+3+7+14)=−25, index→15 (step 31); then four zero nibbles
    add step>>3 while the index walks back down. The expectation never
    touches the library's tables, so a transcription slip cannot hide
    behind encode/decode symmetry."""
    blk = bytes([0, 0, 0, 0, 0x73, 0xF8, 0x00, 0x00])
    got = M.decode_ima_adpcm_block(blk, 1)
    assert got[:, 0].tolist() == [0, 4, 15, 13, -12, -9, -6, -3, -1]
    assert M.decode_ima_adpcm_block(blk[:3], 1) is None  # short header
    assert M.decode_ima_adpcm_block(blk[:6], 1) is None  # ragged tail
    bad = bytes([0, 0, 89, 0]) + blk[4:]  # step index out of range
    assert M.decode_ima_adpcm_block(bad, 1) is None


def test_ima_adpcm_roundtrip_and_stereo():
    """encode_ima_adpcm → decode_wav_samples tracks a smooth signal
    within the step-ladder quantization bound, carries encoder state
    across blocks, and keeps stereo channels fully independent."""
    import numpy as np

    t = np.arange(505 * 4)
    sig = (3000 * np.sin(t / 40) + t).astype(np.int16)
    ch, rate, bits, out = M.decode_wav_samples(M.encode_ima_adpcm(sig, 8000))
    assert (ch, rate, bits) == (1, 8000, 4)
    assert out.shape[0] == 505 * 4
    assert np.abs(out[:, 0] - sig).max() < 512

    st = np.stack([sig, (-sig).astype(np.int16)], axis=1)
    ch, rate, bits, out = M.decode_wav_samples(M.encode_ima_adpcm(st, 16000))
    assert (ch, rate) == (2, 16000)
    assert np.abs(out[:, 0] - st[:, 0]).max() < 512
    assert np.abs(out[:, 1] - st[:, 1]).max() < 512

    # block-constant signal decodes bit-exactly (zero-delta nibbles at
    # step index 0 add exactly zero) — the adpcm_energy_windows gate's
    # exactness precondition
    const = np.full(257 * 3, -1234, np.int16)
    _, _, _, out = M.decode_wav_samples(
        M.encode_ima_adpcm(const, 8000, frames_per_block=257)
    )
    assert np.array_equal(out[:, 0], const.astype(np.int32))


def test_adpcm_metadata_and_energy(spark):
    """decode_audio_features reports ADPCM payloads (bit_depth 4, frame
    count honoring the fact chunk); audio_energy_windows decodes them
    to exact windowed RMS."""
    import numpy as np

    sig = np.full(257 * 2, 777, np.int16)
    rows = [(1, bytearray(M.encode_ima_adpcm(sig, 22050, frames_per_block=257)))]
    media = M.attach_binary(
        spark.createDataFrame(rows, "doc_id long, blob binary"),
        "doc_id", "blob", "audio",
    )
    meta = M.decode_audio_features(media).collect()[0]
    assert (meta.channels, meta.sample_rate, meta.bit_depth) == (1, 22050, 4)
    assert meta.n_frames == 257 * 2
    out = M.audio_energy_windows(media).collect()
    assert [(r.window_no, r.rms) for r in sorted(out, key=lambda r: r.window_no)] == [
        (0, 777), (1, 777)
    ]


def test_png_sub8_depths_roundtrip_and_bit_order():
    """1/2/4-bit PNG: gray (×255/(2^d−1) expansion) and indexed, all
    filters, plain and Adam7. The MSB-first packing itself is pinned by
    HAND-DERIVED bytes (the GIF-LZW lesson: roundtrip symmetry would
    mask an LSB-first slip in both halves)."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    # hand-pinned packing: [1,0,1,1,0,0,1,0] → 0b10110010
    row = np.array([[1, 0, 1, 1, 0, 0, 1, 0]], np.uint8)[:, :, None]
    assert M._png_sample_bytes(row, 1)[0, 0] == 0xB2
    row2 = np.array([[3, 0, 2, 1, 1]], np.uint8)[:, :, None]
    assert M._png_sample_bytes(row2, 2)[0].tolist() == [0xC9, 0x40]
    assert M._png_unpack_bits(np.array([[0xB2]], np.uint8), 1, 8)[0].tolist() \
        == [1, 0, 1, 1, 0, 0, 1, 0]

    rng = np.random.default_rng(9)
    for d in (1, 2, 4):
        scale = 255 // ((1 << d) - 1)
        for shape in [(3, 5), (7, 13)]:
            for interlace in (False, True):
                px = rng.integers(0, 1 << d, shape).astype(np.uint8)
                blob = M.encode_png_pixels(
                    px, [1, 2, 3, 4, 0], bit_depth=d, interlace=interlace
                )
                got = M.decode_png_pixels(blob)
                exp = (px * scale).astype(np.uint8)[:, :, None]
                assert got is not None and np.array_equal(got, exp), (
                    d, shape, interlace,
                )

    pal = [(10, 20, 30), (200, 100, 0), (1, 2, 3), (9, 9, 9)]
    idx = rng.integers(0, 4, (5, 9)).astype(np.uint8)
    got = M.decode_png_pixels(
        M.encode_png_pixels(idx, [3, 1], palette=pal, bit_depth=2)
    )
    assert np.array_equal(got, np.array(pal, np.uint8)[idx])

    # spec violations reject: sub-8 RGB encode, and a sub-8 truecolor
    # IHDR on the decode side
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M.encode_png_pixels(
            np.zeros((2, 2, 3), np.uint8), bit_depth=4
        )
    blob = bytearray(M.encode_png_pixels(idx, palette=pal, bit_depth=2))
    ihdr_at = blob.index(b"IHDR")
    blob[ihdr_at + 13] = 2  # color type 3 → 2 (truecolor) at depth 2
    import struct as _struct
    import zlib as _zlib

    crc = _zlib.crc32(bytes(blob[ihdr_at : ihdr_at + 17])) & 0xFFFFFFFF
    blob[ihdr_at + 17 : ihdr_at + 21] = _struct.pack(">I", crc)
    assert M.decode_png_pixels(bytes(blob)) is None


def test_png_pixel_roundtrip_all_filters():
    """encode_png_pixels → decode_png_pixels is the identity for every
    filter type and channel layout; the decoder rejects structural
    corruption and out-of-profile images."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        for filters in ([0], [1], [2], [3], [4], [3, 4, 1, 2, 0]):
            shape = (6, 4) if ch == 1 else (6, 4, ch)
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            got = M.decode_png_pixels(M.encode_png_pixels(px, filters))
            exp = px[:, :, None] if ch == 1 else px
            assert got is not None and np.array_equal(got, exp), (ch, filters)

    b = M.encode_png_pixels(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8), [4])
    assert M.decode_png_pixels(b[:24]) is None          # truncated
    flipped = bytearray(b)
    flipped[-5] ^= 0xFF                                  # IEND CRC broken
    assert M.decode_png_pixels(bytes(flipped)) is None
    assert M.decode_png_pixels(b"not a png") is None
    assert M.decode_png_pixels(None) is None
    # sub-8-bit depth is out of profile: flip IHDR depth byte and re-CRC
    # (16-bit became a SUPPORTED depth in round 5 — and this same flip
    # at depth 16 still returns None because the 8-bit IDAT stream no
    # longer matches the expected 2-byte-per-sample length)
    import struct
    import zlib

    for bad_depth in (4, 16):
        ihdr = bytearray(b[12:29])
        ihdr[8] = bad_depth
        bad = bytearray(b)
        bad[12:29] = ihdr
        bad[29:33] = struct.pack(">I", zlib.crc32(bytes(ihdr)) & 0xFFFFFFFF)
        assert M.decode_png_pixels(bytes(bad)) is None, bad_depth


def test_png_16bit_and_adam7_roundtrips():
    """Round 5: the two former PNG boundaries decode for real — 16-bit
    depth (big-endian sample pairs, unfiltering at the 2-byte-per-
    sample left offset) and Adam7 interlace (seven independently
    filtered reduced images scattered onto the pass grid), in every
    combination, including ragged dimensions where some passes are
    empty and palette + interlace."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    rng = np.random.default_rng(11)
    for ch in (1, 3, 4):
        shape = (6, 5) if ch == 1 else (6, 5, ch)
        px = rng.integers(0, 65536, shape, dtype=np.uint16)
        for filt in ([0], [4], [2, 3, 1, 0, 4]):
            d = M.decode_png_pixels(M.encode_png_pixels(px, filt, bit_depth=16))
            assert d is not None and d.dtype == np.uint16
            assert np.array_equal(d, px.reshape(6, 5, ch)), (ch, filt)

    for h, w in [(1, 1), (2, 3), (8, 8), (9, 10), (16, 17), (5, 4)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        d = M.decode_png_pixels(
            M.encode_png_pixels(px, [1, 4, 2, 0, 3], interlace=True)
        )
        assert d is not None and np.array_equal(d, px), (h, w)
        px16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
        d = M.decode_png_pixels(
            M.encode_png_pixels(px16, [4, 3], bit_depth=16, interlace=True)
        )
        assert d is not None and np.array_equal(d[:, :, 0], px16), (h, w, 16)

    pal = [(i * 17 % 256, i * 29 % 256, i * 43 % 256) for i in range(16)]
    idx = rng.integers(0, 16, (9, 7), dtype=np.uint8)
    d = M.decode_png_pixels(
        M.encode_png_pixels(idx, [2, 4], palette=pal, interlace=True)
    )
    assert d is not None and np.array_equal(d, np.array(pal, np.uint8)[idx])


def test_image_pixel_stats_kernel_and_strict(spark):
    """The Arrow pixel-stats kernel reports exact integer stats and a
    stable pixel-buffer digest; strict mode raises on a non-PNG blob."""
    import hashlib

    import numpy as np
    import pytest

    from youtube_scraper_db_spark.llm import multimodal as M

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    blob = M.encode_png_pixels(px, [1, 4])
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, blob binary"
    )
    media = M.attach_binary(df, "doc_id", "blob", "image")
    row = M.image_pixel_stats(media).collect()[0]
    assert (row.width, row.height, row.channels) == (4, 2, 3)
    assert row.px_sum == int(px.sum()) and row.mean_milli == int(px.sum()) * 1000 // 24
    assert row.px_sha256 == hashlib.sha256(px.tobytes()).hexdigest()

    junk = spark.createDataFrame(
        [(2, bytearray(b"GIF89a" + b"\x00" * 20))], "doc_id long, blob binary"
    )
    jm = M.attach_binary(junk, "doc_id", "blob", "image")
    assert M.image_pixel_stats(jm).collect()[0].px_sum is None
    with pytest.raises(Exception, match="NotImplementedError|unsupported"):
        M.image_pixel_stats(jm, strict=True).collect()


def test_lzw_codec_spec_bitstream_and_roundtrip():
    """The LZW pair is pinned against a hand-derived GIF-spec bitstream
    (encoder and decoder verified independently, not just against each
    other), plus roundtrips exercising dictionary growth, width
    changes, the KwKwK case, and the 4096 dictionary reset."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    # pixels [1,1,2,2], min_code_size=2 (re-derived round 5 against an
    # independently written spec-rule decoder — the previous pin 4c440a
    # encoded a one-early width bump symmetric with the old decoder bug):
    # table adds get 6,7,8; the add of code 8 fills width 3, so codes
    # after it widen. codes (width): clear=4(3), 1(3), 1(3), 2(3),
    # 2(4), end=5(4) → 4C 24 05
    assert M._lzw_encode(np.array([[1, 1], [2, 2]], np.uint8), 2).hex() == "4c2405"
    dec = M._lzw_decode(bytes.fromhex("4c2405"), 2, 4)
    assert dec is not None and dec.tolist() == [1, 1, 2, 2]

    rng = np.random.default_rng(0)
    for shape in [(1, 1), (3, 7), (64, 80), (120, 120)]:  # largest resets dict
        idx = rng.integers(0, 16, shape, dtype=np.uint8)
        out = M._lzw_decode(M._lzw_encode(idx, 4), 4, idx.size)
        assert out is not None and np.array_equal(out, idx.ravel()), shape
    runs = np.zeros((1, 9), np.uint8)  # all-same input → immediate KwKwK codes
    out = M._lzw_decode(M._lzw_encode(runs, 2), 2, 9)
    assert out is not None and np.array_equal(out, runs.ravel())
    assert M._lzw_decode(b"\xff\xff", 2, 4) is None  # garbage stream


#: The canonical 10×10 4-color sample GIF from the public GIF89a format
#: reference — produced by a THIRD-PARTY encoder, so interop bugs in the
#: width schedule cannot hide behind encoder/decoder roundtrip symmetry
#: (exactly how the pre-round-5 one-early bump survived every roundtrip
#: test while rejecting all real-world GIFs).
_CANONICAL_GIF = bytes.fromhex(
    "474946383961"  # GIF89a
    "0a000a00" "910000"  # 10×10 logical screen, GCT, 2 bits/pixel
    "ffffff" "ff0000" "0000ff" "000000"  # palette: white red blue black
    "21f9040000000000"  # graphic control extension
    "2c000000000a000a0000"  # image descriptor
    "02"  # LZW min code size
    "168c2d99872a1cdc33a00275ec95faa8de608c04914c01"  # 22-byte sub-block
    "00"  # block terminator
    "3b"  # trailer
)

#: The reference's documented pixel indices for that sample.
_CANONICAL_IDX = [
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
]


def test_gif_third_party_interop():
    """Decode a GIF produced OUTSIDE this repo (the GIF89a reference's
    canonical sample) to its documented pixels, and accept a stream with
    no leading CLEAR code (GIF89a permits omitting it; the pre-round-5
    decoder started with an empty table and rejected such streams)."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    arr = M.decode_gif_pixels(_CANONICAL_GIF)
    assert arr is not None and arr.shape == (10, 10, 3)
    pal = {(255, 255, 255): 0, (255, 0, 0): 1, (0, 0, 255): 2, (0, 0, 0): 3}
    idx = [[pal[tuple(arr[r, c])] for c in range(10)] for r in range(10)]
    assert idx == _CANONICAL_IDX
    frames = list(M.iter_gif_frame_pixels(_CANONICAL_GIF))
    assert len(frames) == 1 and np.array_equal(frames[0], arr)

    # no leading CLEAR: codes 1(3b), 2(3b), END=5(3b) at mcs=2 → 51 01
    no_clear = bytes([0x51, 0x01])
    dec = M._lzw_decode(no_clear, 2, 2)
    assert dec is not None and dec.tolist() == [1, 2]


def test_gif_frame_stats_all_or_nothing(spark):
    """A GIF corrupt at frame k yields NO rows from
    gif_frame_pixel_stats (the documented contract) — not rows for
    frames 0..k-1 (round-5 fix: per-asset staging buffer)."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    rng = np.random.default_rng(7)
    pal = [(i * 31 % 256, i * 59 % 256, i * 83 % 256) for i in range(8)]
    frames = [
        rng.integers(0, 8, (4, 6), dtype=np.uint8),
        rng.integers(0, 8, (3, 3), dtype=np.uint8),
    ]
    good = M.encode_animated_gif_pixels(frames, pal)
    # corrupt the SECOND frame's LZW payload: flip bytes near the end,
    # leaving frame 0 and the container walk intact
    bad = bytearray(good)
    bad[-12:-4] = b"\xff" * 8
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bad)], "doc_id long, blob binary"
    )
    media = M.attach_binary(df, "doc_id", "blob", "image")
    rows = M.gif_frame_pixel_stats(media).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r.frame_no)
    assert sorted(by_asset.get(1, [])) == [0, 1]
    assert 2 not in by_asset, f"partial frames leaked: {by_asset.get(2)}"


def test_gif_and_palette_png_pixel_roundtrips():
    """Full-image roundtrips: palette PNG (all filter types), GIF plain
    and interlaced; the sniffing decoder routes by signature; junk and
    out-of-palette payloads are rejected."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    rng = np.random.default_rng(3)
    pal = [(i * 17 % 256, i * 29 % 256, i * 43 % 256) for i in range(16)]
    pal_arr = np.array(pal, np.uint8)

    idx = rng.integers(0, 16, (6, 5), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [2, 4, 1, 3, 0]):
        arr = M.decode_png_pixels(M.encode_png_pixels(idx, filters, palette=pal))
        assert arr is not None and np.array_equal(arr, pal_arr[idx]), filters
    # out-of-palette index rejected
    assert M.decode_png_pixels(M.encode_png_pixels(idx, [0], palette=pal[:8])) is None

    for il in (False, True):
        idx = rng.integers(0, 16, (13, 9), dtype=np.uint8)
        g = M.encode_gif_pixels(idx, pal, interlace=il)
        arr = M.decode_gif_pixels(g)
        assert arr is not None and np.array_equal(arr, pal_arr[idx]), il
        # sniffing router reaches the same result
        assert np.array_equal(M.decode_image_pixels(g), pal_arr[idx])
    assert M.decode_gif_pixels(b"GIF89a" + b"\x00" * 5) is None
    assert M.decode_image_pixels(b"\xff\xd8junk") is None
    assert M.decode_image_pixels(None) is None


def test_bmp_pixel_roundtrip_and_quirks():
    """24-bit BMP roundtrip across all four row-padding residues; the
    decoder undoes bottom-up order, BGR, and padding; top-down
    (negative height) BMPs decode without the flip."""
    import struct

    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    rng = np.random.default_rng(5)
    for w in (1, 2, 3, 4, 9):
        px = rng.integers(0, 256, (4, w, 3), dtype=np.uint8)
        b = M.encode_bmp_pixels(px)
        got = M.decode_bmp_pixels(b)
        assert got is not None and np.array_equal(got, px), w
        assert np.array_equal(M.decode_image_pixels(b), px)
    # top-down variant: flip height sign and pre-flip the stored rows
    px = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    b = bytearray(M.encode_bmp_pixels(px[::-1]))  # stored bottom-up of flipped = original top-down
    b[22:26] = struct.pack("<i", -3)
    got = M.decode_bmp_pixels(bytes(b))
    assert got is not None and np.array_equal(got, px)
    assert M.decode_bmp_pixels(M.encode_bmp(4, 4, 24))[0].sum() == 0  # legacy zero fixture
    assert M.decode_bmp_pixels(b"BM\x00") is None


def test_lzw_width_schedule_boundary_and_animation():
    """Regression: the code-width schedule is driven by EMITTED/CONSUMED
    data-code count, not table size — the final flush emit adds no
    encoder entry while the decoder still adds one, so a table-driven
    schedule desynchronizes exactly when the last data code lands on a
    width boundary (measured: END read one bit wide on a 6-symbol
    all-distinct stream at min_code_size 3). Plus the animated
    multi-frame path with mixed interlacing."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    # the exact boundary stream that desynchronized the old schedule
    seq = np.arange(6, dtype=np.uint8).reshape(2, 3)
    out = M._lzw_decode(M._lzw_encode(seq, 3), 3, 6)
    assert out is not None and out.tolist() == [0, 1, 2, 3, 4, 5]
    # exhaustive short-length sweep at several code sizes
    rng = np.random.default_rng(1)
    for mcs in (2, 3, 8):
        for ln in range(1, 33):
            s = rng.integers(0, 1 << mcs, ln).astype(np.uint8)
            d = M._lzw_decode(M._lzw_encode(s.reshape(1, -1), mcs), mcs, ln)
            assert d is not None and np.array_equal(d, s), (mcs, ln)

    pal = [(i * 31 % 256, i * 59 % 256, i * 83 % 256) for i in range(8)]
    pa = np.array(pal, np.uint8)
    frames = [
        rng.integers(0, 8, (4, 6), dtype=np.uint8),
        rng.integers(0, 8, (3, 3), dtype=np.uint8),
        rng.integers(0, 8, (5, 4), dtype=np.uint8),
    ]
    g = M.encode_animated_gif_pixels(frames, pal, interlace_odd=True)
    dec = list(M.iter_gif_frame_pixels(g))
    assert len(dec) == 3
    for f, d in zip(frames, dec):
        assert np.array_equal(d, pa[f])
    assert len(M.parse_gif_frames(g)) == 3  # inventory walk agrees


def test_avi_container_walk_and_sampler(spark):
    """AVI/MJPEG: the RIFF walk recovers every frame payload byte-exact
    (odd-length frames exercise the even-alignment rule), the sampler
    emits stride-sampled frames with real JPEG header geometry and
    byte digests, and non-AVI payloads yield nothing."""
    import hashlib

    from youtube_scraper_db_spark.llm import multimodal as M

    frames = [M.encode_jpeg_header(20 + f, 10 + f) for f in range(5)]
    frames.append(b"\xff\xd8odd!")  # odd length → RIFF pad byte
    avi = M.encode_avi_mjpeg(frames)
    back = M.parse_avi_frames(avi)
    assert back is not None and back == frames
    assert M.parse_avi_frames(b"RIFF\x04\x00\x00\x00WAVE") is None

    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not avi"))],
        "doc_id long, blob binary",
    )
    media = M.attach_binary(df, "doc_id", "blob", "video")
    rows = {
        r.frame_no: r
        for r in M.sample_avi_frames(media, every_n=2, max_frames=3).collect()
    }
    assert sorted(rows) == [0, 2, 4]
    assert (rows[2].frame_w, rows[2].frame_h) == (22, 12)
    assert rows[4].frame_sha256 == hashlib.sha256(frames[4]).hexdigest()
    assert all(r.asset_id == 1 for r in rows.values())


def test_jpeg_spec_bitstream_and_exactness():
    """The baseline JPEG codec pinned against HAND-DERIVED spec
    bitstreams, not just roundtrips (the GIF LZW lesson): a flat 8×8
    block at value 130 under the fixture table (q00=8) must entropy-
    code to exactly 0x28 0x03 — DC category 2 '0010' + magnitude '10'
    + EOB '00000000' + 1-padding — and block-constant images must
    decode BIT-EXACTLY (the property the registry oracle relies on),
    including across restart markers."""
    import struct

    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    data = M.encode_jpeg_pixels(np.full((8, 8), 130, np.uint8))
    sos = data.find(b"\xff\xda")
    slen = struct.unpack(">H", data[sos + 2 : sos + 4])[0]
    assert data[sos + 2 + slen : -2].hex() == "2803"
    dec = M.decode_jpeg_pixels(data)
    assert dec is not None and dec.shape == (8, 8, 1) and (dec == 130).all()

    rng = np.random.default_rng(0)
    for w, h in [(8, 8), (16, 8), (24, 16), (32, 24)]:
        bv = rng.integers(0, 251, (h // 8, w // 8))
        img = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).astype(np.uint8)
        for dri in (0, 2, 3):
            d = M.decode_jpeg_pixels(M.encode_jpeg_pixels(img, restart_interval=dri))
            assert d is not None and (d[:, :, 0] == img).all(), (w, h, dri)


def test_jpeg_third_party_tables_interop():
    """Decode a JPEG hand-assembled with DIFFERENT Huffman tables than
    the encoder ever writes (Annex-K-layout DC lengths + a 1-bit EOB AC
    table) — the decoder must build tables from DHT, so interop bugs
    cannot hide behind the encoder's fixed-table choices. The entropy
    byte 0x73 is hand-derived: DC cat-2 code '011' (canonical for
    bits=[0,1,5,1,…]) + '10' + EOB '0' + 1-padding."""
    import struct

    from youtube_scraper_db_spark.llm import multimodal as M

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    import numpy as np

    qt = np.full(64, 16, np.uint8)
    qt[0] = 8
    dqt = seg(0xDB, b"\x00" + bytes(qt))
    dc_bits = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    dht = seg(
        0xC4,
        b"\x00" + dc_bits + bytes(range(12))
        + b"\x10" + bytes([1] + [0] * 15) + bytes([0x00]),
    )
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    jpg = b"\xff\xd8" + dqt + dht + sof0 + sos + bytes([0x73]) + b"\xff\xd9"
    arr = M.decode_jpeg_pixels(jpg)
    assert arr is not None and (arr == 130).all()

    # out-of-profile: progressive (SOF2) and truncated entropy data
    sof2 = seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    assert (
        M.decode_jpeg_pixels(
            b"\xff\xd8" + dqt + dht + sof2 + sos + bytes([0x73]) + b"\xff\xd9"
        )
        is None
    )
    assert M.decode_jpeg_pixels(b"\xff\xd8" + dqt + dht + sof0 + sos) is None
    assert M.decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None


def test_jpeg_lossy_roundtrip_and_sniffing(spark):
    """General (non-flat) images: encode→decode error stays within the
    quantization budget for gray and RGB; the format-sniffing stats
    kernel decodes JPEG payloads end-to-end like the other formats."""
    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (21, 37), dtype=np.uint8)
    dg = M.decode_jpeg_pixels(M.encode_jpeg_pixels(gray))
    assert dg is not None and dg.shape == (21, 37, 1)
    assert np.abs(dg[:, :, 0].astype(int) - gray.astype(int)).max() <= 40

    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    dc = M.decode_jpeg_pixels(M.encode_jpeg_pixels(rgb))
    assert dc is not None and dc.shape == (17, 23, 3)
    assert np.abs(dc.astype(int) - rgb.astype(int)).max() <= 64

    flat = np.full((16, 16), 99, np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_jpeg_pixels(flat)))], "doc_id long, blob binary"
    )
    media = M.attach_binary(df, "doc_id", "blob", "image")
    row = M.image_pixel_stats(media, strict=True).collect()[0]
    assert (row.width, row.height, row.channels) == (16, 16, 1)
    assert row.px_sum == 99 * 256


def test_avi_frame_pixel_stats_full_decode(spark):
    """MJPEG frames decode to PIXELS through the RIFF walk: exact stats
    for block-constant frames, stride sampling honored, all-or-nothing
    per asset (one undecodable frame ⇒ zero rows), strict raises."""
    import numpy as np
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from youtube_scraper_db_spark.llm import multimodal as M

    def flat_jpeg(v, w=16, h=8):
        return M.encode_jpeg_pixels(np.full((h, w), v, np.uint8))

    good = M.encode_avi_mjpeg([flat_jpeg(10), flat_jpeg(20), flat_jpeg(30)])
    # asset 2: middle frame is a header-only JPEG (no scan data)
    bad = M.encode_avi_mjpeg([flat_jpeg(10), M.encode_jpeg_header(16, 8)])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, bytearray(b"junk"))],
        "doc_id long, blob binary",
    )
    media = M.attach_binary(df, "doc_id", "blob", "video")
    rows = M.avi_frame_pixel_stats(media).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert sorted(r.frame_no for r in by_asset[1]) == [0, 1, 2]
    got = {r.frame_no: r.px_sum for r in by_asset[1]}
    assert got == {0: 10 * 128, 1: 20 * 128, 2: 30 * 128}
    assert 2 not in by_asset and 3 not in by_asset

    # stride sampling: every 2nd frame, cap 1
    sampled = M.avi_frame_pixel_stats(
        media.filter("asset_id = 1"), every_n=2, max_frames=1
    ).collect()
    assert [(r.frame_no, r.px_sum) for r in sampled] == [(0, 1280)]

    with pytest.raises(PythonException, match="NotImplementedError"):
        M.avi_frame_pixel_stats(media, strict=True).collect()


def test_jpeg_subsampled_mcu_decode():
    """Chroma subsampling (4:2:0, 4:2:2, 4:4:0): hand-built interleaved
    MCU streams — the repo encoder only writes 4:4:4, so these bytes
    exercise the multi-block-per-MCU walk and nearest-neighbor chroma
    upsample independently of it. Flat gray (Y=130, Cb=Cr=128) decodes
    bit-exactly to RGB 130 under the q00=8 table."""
    import struct

    import numpy as np

    from youtube_scraper_db_spark.llm import multimodal as M

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def build(h, w, y_hv, ny_blocks):
        tabs = M._jpeg_fixed_tables()
        dqt = seg(
            0xDB,
            b"\x00"
            + bytes(M._JPEG_FIXTURE_QT.reshape(-1)[M._JPEG_ZZ].astype(np.uint8)),
        )
        dht = seg(
            0xC4,
            b"\x00" + bytes(tabs["dc_bits"]) + bytes(tabs["dc_vals"])
            + b"\x10" + bytes(tabs["ac_bits"]) + bytes(tabs["ac_vals"]),
        )
        sof = seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, y_hv, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
        )
        sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
        dc = M._jpeg_huff_codes(tabs["dc_bits"], tabs["dc_vals"])
        ac = M._jpeg_huff_codes(tabs["ac_bits"], tabs["ac_vals"])
        wtr = M._JpegBitWriter()
        for i in range(ny_blocks):  # Y blocks: dc diff 2 then 0s
            t = 2 if i == 0 else 0
            c, ln = dc[t]
            wtr.put(c, ln)
            if t:
                wtr.put(2, t)
            c, ln = ac[0x00]
            wtr.put(c, ln)
        for _ in range(2):  # Cb, Cr: dc 0
            c, ln = dc[0]
            wtr.put(c, ln)
            c, ln = ac[0x00]
            wtr.put(c, ln)
        wtr.flush()
        return b"\xff\xd8" + dqt + dht + sof + sos + bytes(wtr.buf) + b"\xff\xd9"

    for h, w, hv, nb in [(16, 16, 0x22, 4), (8, 16, 0x21, 2), (16, 8, 0x12, 2)]:
        arr = M.decode_jpeg_pixels(build(h, w, hv, nb))
        assert arr is not None and arr.shape == (h, w, 3), (hv,)
        assert (arr == 130).all(), (hv,)


def test_jpeg_decode_linear_time_on_random_pixels():
    """Regression: the entropy bit reader must trim consumed bits out of
    its accumulator (multimodal.py _JpegBitReader._fill) or decode is
    O(n^2) — a 256x256 random-pixel JPEG took 6.3s before the fix and
    ~0.6s after. Gate at a loose 3s so slow CI can't flake."""
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    enc = M.encode_jpeg_pixels(img)
    t0 = time.time()
    out = M.decode_jpeg_pixels(enc)
    took = time.time() - t0
    assert out is not None and out.shape == (256, 256, 3)
    assert took < 3.0, f"random-pixel decode took {took:.1f}s — O(n^2) regressed?"


def test_msadpcm_ragged_multichannel_returns_none():
    """A 3-channel codec-2 block whose nibble count is not a multiple of
    the channel count must return None (documented contract), not raise
    IndexError inside a non-strict Spark kernel."""
    import struct

    ch = 3
    hdr = (
        bytes([0] * ch)
        + struct.pack("<3h", 16, 16, 16)
        + struct.pack("<3h", 0, 0, 0)
        + struct.pack("<3h", 0, 0, 0)
    )
    block = hdr + bytes([0x11, 0x22])  # 4 nibbles % 3 channels != 0
    assert M.decode_msadpcm_block(block, ch) is None
    # whole frames still decode
    block_ok = hdr + bytes([0x11, 0x22, 0x33])  # 6 nibbles = 2 frames
    out = M.decode_msadpcm_block(block_ok, ch)
    assert out is not None and out.shape == (4, 3)


def test_jpeg_hostile_dimensions_rejected():
    """A spec-legal SOF claiming 65535x65535 (~4.3G samples) must be
    refused up front (JPEG_MAX_PIXELS) — per-sample Python loops over a
    hostile header would pin an executor for hours."""
    import struct

    for sof_marker in (b"\xff\xc0", b"\xff\xc3"):
        payload = bytes([8]) + struct.pack(">HH", 65535, 65535) + bytes(
            [1, 1, 0x11, 0]
        )
        b = (
            b"\xff\xd8"
            + sof_marker
            + struct.pack(">H", 2 + len(payload))
            + payload
            + b"\xff\xd9"
        )
        assert M.decode_jpeg_pixels(b) is None


def test_resize_image_exact_semantics():
    """Integer-exact resize: identity is a copy; nearest matches the
    float half-pixel mapping; bilinear is the correctly-rounded float
    4-tap (|int - float| <= 0.5) with edge-replicate clamping."""
    import numpy as np

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (5, 8, 3), dtype=np.uint8)
    for m in ("nearest", "bilinear"):
        assert (M.resize_image(a, 5, 8, m) == a).all()

    def float_bilinear(a, oh, ow):
        h, w, _ = a.shape
        out = np.zeros((oh, ow, a.shape[2]))
        for i in range(oh):
            for j in range(ow):
                py = (i + 0.5) * h / oh - 0.5
                px = (j + 0.5) * w / ow - 0.5
                y0, x0 = int(np.floor(py)), int(np.floor(px))
                fy, fx = py - y0, px - x0
                if y0 < 0:
                    y0, fy = 0, 0.0
                if y0 >= h - 1:
                    y0, fy = h - 1, 0.0
                if x0 < 0:
                    x0, fx = 0, 0.0
                if x0 >= w - 1:
                    x0, fx = w - 1, 0.0
                y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                out[i, j] = (1 - fy) * (
                    (1 - fx) * a[y0, x0] + fx * a[y0, x1]
                ) + fy * ((1 - fx) * a[y1, x0] + fx * a[y1, x1])
        return out

    for oh, ow in ((9, 3), (2, 15), (1, 1), (11, 11)):
        got = M.resize_image(a, oh, ow, "bilinear").astype(float)
        ref = float_bilinear(a, oh, ow)
        assert np.abs(got - ref).max() <= 0.5 + 1e-9, (oh, ow)
        sy = np.clip(np.floor((np.arange(oh) + 0.5) * 5 / oh).astype(int), 0, 4)
        sx = np.clip(np.floor((np.arange(ow) + 0.5) * 8 / ow).astype(int), 0, 7)
        assert (M.resize_image(a, oh, ow, "nearest") == a[sy][:, sx]).all()

    # 16-bit path preserves dtype and exactness
    b = rng.integers(0, 65536, (4, 4, 1), dtype=np.uint16)
    r16 = M.resize_image(b, 7, 3, "bilinear")
    assert r16.dtype == np.uint16


# --- dHash perceptual near-dup (round 10) -------------------------------


def test_dhash_identical_and_perturbed(spark):
    import numpy as np

    from youtube_scraper_db_spark.llm.multimodal import (
        dhash_bits,
        dhash_near_dup_pairs,
        encode_png_pixels,
        image_dhash,
    )

    y, x = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")
    base = (((y * 31 + x * 7) * 3) % 251).astype(np.uint8)[..., None]
    pert = base.copy()
    pert[5, 7, 0] += 1
    other = (((y * 13 + x * 29) * 5 + y * x) % 251).astype(np.uint8)[..., None]

    h_base = dhash_bits(base)
    assert h_base == dhash_bits(base.copy())  # deterministic
    hp = dhash_bits(pert)
    d_pert = bin(h_base[0] ^ hp[0]).count("1") + bin(h_base[1] ^ hp[1]).count("1")
    assert d_pert <= 2  # one input pixel flips at most two gradient bits
    ho = dhash_bits(other)
    d_other = bin(h_base[0] ^ ho[0]).count("1") + bin(h_base[1] ^ ho[1]).count("1")
    assert d_other > 3  # different pattern family is far

    media = spark.createDataFrame(
        [
            (0, bytearray(encode_png_pixels(base))),
            (1, bytearray(encode_png_pixels(base))),
            (2, bytearray(encode_png_pixels(pert))),
            (3, bytearray(encode_png_pixels(other))),
        ],
        "asset_id long, content binary",
    )
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(image_dhash(media), 2).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] <= 2 and pairs[(1, 2)] <= 2
    assert not any(3 in p for p in pairs)


def test_dhash_banding_superset_exhaustive(spark):
    """The pigeonhole claim, checked exhaustively at the bit level: for
    EVERY placement of ≤3 flipped bits across the 64 positions, at
    least one 16-bit band survives intact — so band-equality candidate
    generation can never lose a pair at max_hamming ≤ 3."""
    import itertools

    for flips in itertools.chain(
        itertools.combinations(range(64), 1),
        itertools.combinations(range(0, 64, 5), 2),
        itertools.combinations(range(0, 64, 7), 3),
    ):
        bands_hit = {b // 16 for b in flips}
        assert len(bands_hit) < 4
