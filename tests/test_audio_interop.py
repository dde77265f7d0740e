"""Third-party audio interop: the repo's G.711/PCM WAV decode vs
javax.sound (the JDK's independent CCITT tables and WAV reader).

The G.711 µ-law and A-law expansion tables here are FORMULA-DERIVED
(llm/multimodal.py) and were previously pinned by hand-computed anchor
values; this suite closes the loop the way the GIF/JPEG interop suites
do — every one of the 256 companded codes per law is decoded by BOTH
implementations from the same WAV bytes and must match sample-exactly.
A transposed table row, a sign-convention flip (the A-law MSB means
POSITIVE), or an off-by-one segment boundary in either direction fails
loudly here even if encode/decode are symmetric.

javax.sound does not decode IMA/MS-ADPCM; those stay covered by the
hand-derived block fixtures and property suites (an honest boundary,
same policy as lossless JPEG)."""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from youtube_scraper_db_spark.llm import multimodal as M

JAVA_SRC = """
import javax.sound.sampled.*;
import java.io.*;

public class DumpWav {
    public static void main(String[] args) throws Exception {
        AudioInputStream in = AudioSystem.getAudioInputStream(new File(args[0]));
        AudioFormat src = in.getFormat();
        AudioFormat dst = new AudioFormat(
            AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate(), 16, src.getChannels(),
            src.getChannels() * 2, src.getSampleRate(), false);
        AudioInputStream pcm = AudioSystem.getAudioInputStream(dst, in);
        DataOutputStream out = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(args[1])));
        byte[] buf = new byte[4096];
        int n;
        while ((n = pcm.read(buf)) > 0) out.write(buf, 0, n);
        out.close();
    }
}
"""


@pytest.fixture(scope="module")
def javasound_pcm16(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available for the javax.sound reference decoder")
    d = tmp_path_factory.mktemp("jau")
    (d / "DumpWav.java").write_text(JAVA_SRC)
    subprocess.run(
        ["javac", "DumpWav.java"], cwd=d, check=True, capture_output=True
    )

    def decode(wav_bytes: bytes, channels: int) -> np.ndarray:
        src = d / "in.wav"
        out = d / "out.bin"
        src.write_bytes(wav_bytes)
        subprocess.run(
            ["java", "-cp", str(d), "DumpWav", str(src), str(out)],
            check=True,
            capture_output=True,
        )
        return np.frombuffer(out.read_bytes(), "<i2").reshape(-1, channels)

    return decode


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_all_256_codes_match_javasound(law, javasound_pcm16):
    payload = bytes(range(256))
    wav = M.encode_g711_wav(8000, 1, payload, law)
    _, _, _, mine = M.decode_wav_samples(wav)
    ref = javasound_pcm16(wav, 1)
    assert mine.shape == ref.shape
    diff = np.nonzero(mine[:, 0].astype(int) != ref[:, 0].astype(int))[0]
    assert diff.size == 0, (
        f"{law} codes disagree at {diff[:8].tolist()}: "
        f"{[(int(c), int(mine[c, 0]), int(ref[c, 0])) for c in diff[:4]]}"
    )


def _pcm_wav(samples: np.ndarray, rate: int, bit_depth: int) -> bytes:
    """Minimal conforming RIFF/WAVE PCM writer (test-local, independent
    of the repo's encoder so the container layout is also cross-checked)."""
    n, ch = samples.shape
    if bit_depth == 8:
        data = (samples.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        data = samples.astype("<i2").tobytes()
    block = ch * bit_depth // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block, block, bit_depth
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm16_stereo_matches_javasound(javasound_pcm16):
    rng = np.random.default_rng(0)
    sig = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    wav = _pcm_wav(sig, 16000, 16)
    ch, rate, depth, mine = M.decode_wav_samples(wav)
    assert (ch, rate, depth) == (2, 16000, 16)
    ref = javasound_pcm16(wav, 2)
    assert (mine.astype(int) == ref.astype(int)).all()
    assert (mine.astype(int) == sig.astype(int)).all()


def test_pcm8_matches_javasound(javasound_pcm16):
    """8-bit PCM is unsigned in RIFF; this decoder centers it to
    [-128, 127] while javax.sound widens with FRACTIONAL rescaling
    (observed: 127 → 32767, 1 → 258 — bit-replication style, not a pure
    <<8). Exact integer equality would test Java's resampler, not this
    container parse — so compare at 8-bit resolution (ref/256 within
    ±1.01 of the centered value), which still catches sign, offset,
    channel-interleave and byte-order bugs."""
    rng = np.random.default_rng(1)
    sig = rng.integers(-128, 128, (300, 2)).astype(np.int16)
    wav = _pcm_wav(sig, 8000, 8)
    ch, rate, depth, mine = M.decode_wav_samples(wav)
    assert (ch, rate, depth) == (2, 8000, 8)
    assert (mine.astype(int) == sig.astype(int)).all()
    ref = javasound_pcm16(wav, 2)
    assert np.abs(mine.astype(float) - ref.astype(float) / 256.0).max() <= 1.01
