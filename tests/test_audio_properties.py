"""Property suites for the audio codecs.

Two layers, mirroring the LZW suite's lesson (symmetric encoder/decoder
bugs hide behind roundtrips):

1. The library's IMA ADPCM decode is checked against an INDEPENDENT
   reference decoder written here from the published spec tables — a
   different code path over its own copy of the tables, so a
   transcription or nibble-order slip in either implementation fails.
2. Decoders must be total over arbitrary bytes: random (and truncated
   real) payloads return None / yield nothing, never raise.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_scraper_db_spark.llm import multimodal as M

# Independent copies of the public IMA ADPCM tables (IMA ADPCM spec /
# Microsoft WAVE docs) — deliberately NOT imported from the library.
_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ref_decode_block(block: bytes, channels: int) -> list[list[int]]:
    """Spec-rule IMA block decode, structured differently from the
    library (nibble list first, then a flat replay per channel)."""
    frames: list[list[int]] = []
    state = []
    for c in range(channels):
        pred = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
        idx = block[4 * c + 2]
        state.append((pred, idx))
    frames.append([s[0] for s in state])
    # collect each channel's nibbles in stream order
    nibs: list[list[int]] = [[] for _ in range(channels)]
    pos = 4 * channels
    while pos < len(block):
        for c in range(channels):
            for b in block[pos : pos + 4]:
                nibs[c].extend([b & 0x0F, b >> 4])
            pos += 4
    per_ch: list[list[int]] = []
    for c in range(channels):
        pred, idx = state[c]
        outs = []
        for n in nibs[c]:
            step = _STEPS[idx]
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = pred - diff if n & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IDX[n & 7]))
            outs.append(pred)
        per_ch.append(outs)
    for k in range(len(per_ch[0])):
        frames.append([per_ch[c][k] for c in range(channels)])
    return frames


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=9,
        max_size=64,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_adpcm_encode_agrees_with_independent_reference(samples, channels):
    """Whatever the encoder emits, the library decode and the reference
    decode must agree sample-for-sample — any nibble packing, channel
    interleave, clamp, or table bug in either implementation diverges."""
    n = (len(samples) - 1) // 8 * 8 + 1  # 1 mod 8 frames
    sig = np.tile(
        np.asarray(samples[:n], np.int16)[:, None], (1, channels)
    )
    # de-correlate channels so interleave bugs cannot cancel out
    for c in range(1, channels):
        sig[:, c] = np.roll(sig[:, c], c)
    wav = M.encode_ima_adpcm(sig, 8000, frames_per_block=n)
    dec = M.decode_wav_samples(wav)
    assert dec is not None
    _, _, _, got = dec
    # locate the data chunk and reference-decode its single block
    i = wav.index(b"data")
    size = int.from_bytes(wav[i + 4 : i + 8], "little")
    ref = _ref_decode_block(wav[i + 8 : i + 8 + size], channels)
    assert got.tolist() == ref


#: Independent MS-ADPCM tables (Microsoft WAVE docs) — NOT imported
#: from the library.
_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _ref_ms_decode_block(block: bytes, channels: int) -> list[list[int]]:
    """Spec-rule MS-ADPCM block decode, structured differently from the
    library (nibble list per channel first, then a flat replay)."""
    import struct as _s

    preds = list(block[:channels])
    deltas = [_s.unpack_from("<h", block, channels + 2 * c)[0] for c in range(channels)]
    s1 = [_s.unpack_from("<h", block, 3 * channels + 2 * c)[0] for c in range(channels)]
    s2 = [_s.unpack_from("<h", block, 5 * channels + 2 * c)[0] for c in range(channels)]
    nibs = []
    for byte in block[7 * channels:]:
        nibs.extend([(byte >> 4) & 0x0F, byte & 0x0F])
    frames = [list(s2), list(s1)]
    row: list[int] = []
    for j, nib in enumerate(nibs):
        c = j % channels
        c1, c2 = _MS_COEFS[preds[c]]
        pred = (s1[c] * c1 + s2[c] * c2) >> 8
        signed = nib - 16 if nib >= 8 else nib
        val = max(-32768, min(32767, pred + signed * deltas[c]))
        s2[c], s1[c] = s1[c], val
        deltas[c] = max(16, (_MS_ADAPT[nib] * deltas[c]) >> 8)
        row.append(val)
        if len(row) == channels:
            frames.append(row)
            row = []
    return frames


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=2,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_msadpcm_encode_agrees_with_independent_reference(samples, channels):
    n = max(2, len(samples) // 2 * 2)  # even frame count
    sig = np.tile(np.asarray(samples[:n], np.int16)[:, None], (1, channels))
    for c in range(1, channels):
        sig[:, c] = np.roll(sig[:, c], c)
    wav = M.encode_msadpcm(sig, 8000, frames_per_block=n)
    dec = M.decode_wav_samples(wav)
    assert dec is not None
    _, _, _, got = dec
    i = wav.index(b"data")
    size = int.from_bytes(wav[i + 4 : i + 8], "little")
    ref = _ref_ms_decode_block(wav[i + 8 : i + 8 + size], channels)
    assert got.tolist() == ref


def test_msadpcm_hand_block_and_roundtrip():
    """MS-ADPCM (WAV codec 2): hand-derived single block — predictor 0
    (coefs 256,0 ⇒ pred = sample1), delta 16; nibble 0x1 → 110+16=126,
    delta stays max(16, 230·16>>8)=16; nibble 0xF (−1) → 126−16=110.
    Plus: constant signals decode bit-exactly (the gate's exactness
    precondition), smooth signals stay within the delta ladder's
    bound, and stereo channels remain independent."""
    blk = (
        bytes([0])
        + (16).to_bytes(2, "little")
        + (110).to_bytes(2, "little")
        + (100).to_bytes(2, "little")
        + bytes([0x1F])
    )
    got = M.decode_msadpcm_block(blk, 1)
    assert got[:, 0].tolist() == [100, 110, 126, 110]
    assert M.decode_msadpcm_block(blk[:5], 1) is None  # short header
    assert M.decode_msadpcm_block(bytes([9]) + blk[1:], 1) is None  # bad pred

    const = np.full(500 * 3, -777, np.int16)
    _, _, bits, out = M.decode_wav_samples(M.encode_msadpcm(const, 8000))
    assert bits == 4 and np.array_equal(out[:, 0], const.astype(np.int32))

    t = np.arange(500 * 4)
    sig = (3000 * np.sin(t / 40) + t).astype(np.int16)
    _, _, _, out = M.decode_wav_samples(M.encode_msadpcm(sig, 8000))
    assert np.abs(out[:, 0] - sig).max() < 64
    st_ = np.stack([sig, (-sig).astype(np.int16)], axis=1)
    ch, rate, _, out2 = M.decode_wav_samples(M.encode_msadpcm(st_, 16000))
    assert (ch, rate) == (2, 16000)
    assert np.abs(out2[:, 0] - st_[:, 0]).max() < 64
    assert np.abs(out2[:, 1] - st_[:, 1]).max() < 64


def test_g711_spec_anchors_and_symmetry():
    """Published G.711 anchor values (the sign conventions DIFFER
    between laws — A-law's post-XOR MSB set means POSITIVE) and the
    0x80-flip negation symmetry both laws share."""
    assert M._ULAW_DECODE[0xFF] == 0 and M._ULAW_DECODE[0x7F] == 0
    assert M._ULAW_DECODE[0x80] == 32124 and M._ULAW_DECODE[0x00] == -32124
    assert M._ALAW_DECODE[0xD5] == 8 and M._ALAW_DECODE[0x55] == -8
    assert M._ALAW_DECODE[0xAA] == 32256 and M._ALAW_DECODE[0x2A] == -32256
    for t in (M._ULAW_DECODE, M._ALAW_DECODE):
        for b in range(256):
            assert t[b] == -t[b ^ 0x80]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=200,
    ),
    st.sampled_from(["ulaw", "alaw"]),
)
def test_g711_compress_is_nearest_level(samples, law):
    """decode(compress(x)) must be the nearest representable companding
    level for every sample — the defining property of the quantizer."""
    table = M._ULAW_DECODE if law == "ulaw" else M._ALAW_DECODE
    levels = np.sort(table)
    x = np.asarray(samples, np.int32)
    dec = table[np.frombuffer(M.g711_compress(x, law), np.uint8)]
    for xi, di in zip(x, dec):
        nearest = levels[np.argmin(np.abs(levels - xi))]
        assert abs(int(di) - int(xi)) <= abs(int(nearest) - int(xi))


def test_g711_container_roundtrip():
    payload = bytes(range(256)) * 2
    for law, table in (("ulaw", M._ULAW_DECODE), ("alaw", M._ALAW_DECODE)):
        wav = M.encode_g711_wav(16000, 2, payload, law)
        ch, rate, bits, s = M.decode_wav_samples(wav)
        assert (ch, rate, bits) == (2, 16000, 8)
        exp = table[np.frombuffer(payload, np.uint8)].reshape(-1, 2)
        assert np.array_equal(s, exp)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_media_decoders_total_over_garbage(data):
    """No decoder may raise on arbitrary bytes — malformed input is a
    None/empty result, the strict-mode kernels own escalation."""
    assert M.decode_jpeg_pixels(data) is None or True
    M.parse_wav(data)
    M.decode_wav_samples(data)
    M.decode_png_pixels(data)
    M.decode_bmp_pixels(data)
    M.decode_gif_pixels(data)
    # iter_gif_frame_pixels raises ValueError by CONTRACT (its kernel
    # catches it); anything else — IndexError, struct.error — is a bug
    try:
        list(M.iter_gif_frame_pixels(data) or [])
    except ValueError:
        pass


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.data())
def test_real_payload_truncation_never_raises(cut, data_strategy):
    """Every prefix of a REAL payload decodes to None or a valid result
    — truncation mid-chunk, mid-scan, mid-block must be caught by
    bounds checks, not by IndexError."""
    kind = data_strategy.draw(st.sampled_from(["jpeg", "jpeg_prog", "wav", "adpcm"]))
    rng = np.random.default_rng(kind == "wav" and 3 or 5)
    if kind in ("jpeg", "jpeg_prog"):
        px = rng.integers(0, 256, (16, 16), np.uint8)
        blob = M.encode_jpeg_pixels(
            px, restart_interval=2, progressive=kind == "jpeg_prog"
        )
        M.decode_jpeg_pixels(blob[: cut % (len(blob) + 1)])
    elif kind == "wav":
        blob = M.encode_wav(8000, 2, [100, 200], bit_depth=24)
        M.decode_wav_samples(blob[: cut % (len(blob) + 1)])
    else:
        sig = np.arange(257, dtype=np.int16)
        blob = M.encode_ima_adpcm(sig, 8000, frames_per_block=257)
        M.decode_wav_samples(blob[: cut % (len(blob) + 1)])
