"""Native Ogg Vorbis import (native/vorbis_decode.cpp).

Same three validation layers as the MP3 suite (tests/test_mp3.py):
* committed fixtures (tests/fixtures/*.ogg, encoded offline with
  libvorbisenc) decode through the product path (load_audio) with the
  right rate, length, and spectral content;
* where the system codec libraries exist, a live matrix of encoded
  streams round-trips against the independent libvorbisfile oracle at
  float-exactness (the decoder measures < 5e-7 max error — both sides
  compute the same float32 pipeline);
* corrupt input fails soft (DecodeError / skipped pages), never crashes.

Reference semantics: the reference opens Ogg via FFmpeg
(app.cpp:624-741); here the decode is native so `./melonix song.ogg`
works with zero external dependencies.
"""

import os

import numpy as np
import pytest

from melonix_tpu.io.audio import DecodeError, load_audio
from melonix_tpu.runtime import native

from ogg_tools import vorbis_libs, vorbis_encode, vorbisfile_decode

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

pytestmark = pytest.mark.skipif(
    native.try_load() is None or not hasattr(native.try_load(), "mlx_vorbis_info"),
    reason="native runtime with Vorbis support not built",
)


def _peak_freqs(x, sr, k=2):
    n = min(len(x), 32768)
    s = np.abs(np.fft.rfft(x[:n] * np.hanning(n)))
    order = []
    for _ in range(k):
        i = int(np.argmax(s))
        order.append(i * sr / n)
        s[max(i - 8, 0) : i + 8] = 0
    return sorted(order)


def test_fixture_tone_decodes():
    x, rate = load_audio(os.path.join(FIXTURES, "tone.ogg"))
    assert rate == 44100
    # Vorbis granule trimming is sample-exact.
    assert len(x) == int(1.2 * rate)
    f1, f2 = _peak_freqs(x, rate)
    assert abs(f1 - 440.0) < 4 and abs(f2 - 1313.0) < 6


def test_fixture_stereo_decodes():
    x, rate = load_audio(os.path.join(FIXTURES, "stereo.ogg"), mono=False)
    assert rate == 44100 and x.ndim == 2 and x.shape[1] == 2
    (fl,) = _peak_freqs(x[:, 0], rate, k=1)
    (fr,) = _peak_freqs(x[:, 1], rate, k=1)
    assert abs(fl - 330.0) < 4 and abs(fr - 550.0) < 5
    m, _ = load_audio(os.path.join(FIXTURES, "stereo.ogg"))
    np.testing.assert_allclose(m, x.mean(axis=1), atol=1e-6)


def test_fixture_transient_decodes():
    """Block-switching stream (short windows around clicks)."""
    x, rate = load_audio(os.path.join(FIXTURES, "transient.ogg"))
    assert rate == 44100 and len(x) == rate
    assert np.isfinite(x).all()
    assert np.abs(x).max() > 5 * np.sqrt(np.mean(x**2))


def test_garbage_ogg_fails_soft(tmp_path):
    p = str(tmp_path / "g.ogg")
    rng = np.random.default_rng(0)
    open(p, "wb").write(rng.integers(0, 255, 20000, dtype=np.uint8).tobytes())
    with pytest.raises(DecodeError):
        load_audio(p)


def test_not_an_ogg_fails_soft(tmp_path):
    p = str(tmp_path / "x.ogg")
    open(p, "wb").write(b"hello world, definitely not audio" * 100)
    with pytest.raises(DecodeError):
        load_audio(p)


def test_truncated_header_fails_soft(tmp_path):
    src = open(os.path.join(FIXTURES, "tone.ogg"), "rb").read()
    p = str(tmp_path / "t.ogg")
    open(p, "wb").write(src[: len(src) // 4])  # cuts inside the codebooks
    with pytest.raises(DecodeError):
        load_audio(p)


def test_midstream_corruption_fails_soft(tmp_path):
    """A corrupt audio page is CRC-skipped; the rest decodes."""
    src = open(os.path.join(FIXTURES, "transient.ogg"), "rb").read()
    raw = bytearray(src)
    mid = 3 * len(raw) // 4
    for i in range(mid, mid + 40):
        raw[i] ^= 0xFF
    p = str(tmp_path / "corrupt.ogg")
    open(p, "wb").write(bytes(raw))
    x, rate = load_audio(p)  # must not crash
    assert rate == 44100 and np.isfinite(x).all()
    assert np.abs(x[: rate // 8]).max() > 0.05  # leading audio intact


def test_cli_render_ogg(tmp_path):
    """`./melonix song.ogg` (main.cpp:109-110), headless."""
    from melonix_tpu.cli import main
    from melonix_tpu.io.wav import read_wav

    out = str(tmp_path / "out.wav")
    assert main(["render", os.path.join(FIXTURES, "tone.ogg"), "-o", out]) == 0
    y, rate = read_wav(out)
    assert rate == 44100 and len(y) > 44100


# ----------------------------------------------------------------------
# Oracle matrix: only where the system codec libraries exist.
# ----------------------------------------------------------------------

needs_libs = pytest.mark.skipif(
    vorbis_libs() is None, reason="libvorbis/libvorbisfile not available"
)


def _mlx_decode(path, mono=False):
    lib = native.try_load()
    return native.decode_vorbis(lib, path, mono=mono)


def _assert_matches(ref, got, tol=1e-5):
    assert ref.shape == got.shape
    assert float(np.abs(ref - got).max()) < tol


@needs_libs
@pytest.mark.parametrize("sr", [8000, 16000, 22050, 32000, 44100, 48000])
def test_oracle_stereo_rates(tmp_path, sr):
    t = np.arange(2 * sr) / sr
    f_hi = min(3000, sr // 3)
    x = np.stack(
        [0.4 * np.sin(2 * np.pi * 330 * t),
         0.3 * np.sin(2 * np.pi * 330 * t + 0.4) + 0.1 * np.sin(2 * np.pi * f_hi * t)],
        axis=1,
    ).astype(np.float32)
    p = str(tmp_path / f"s{sr}.ogg")
    vorbis_encode(p, x, sr, quality=0.4)
    ref, r1 = vorbisfile_decode(p)
    got, r2 = _mlx_decode(p)
    assert r1 == r2 == sr
    _assert_matches(ref, got)


@needs_libs
@pytest.mark.parametrize("q", [-0.1, 0.2, 0.7, 1.0])
def test_oracle_quality_levels(tmp_path, q):
    """Quality sweeps exercise different codebook/floor/residue setups."""
    sr = 44100
    rng = np.random.default_rng(11)
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(sr)).astype(np.float32)
    p = str(tmp_path / "q.ogg")
    vorbis_encode(p, x, sr, quality=q)
    ref, _ = vorbisfile_decode(p)
    got, _ = _mlx_decode(p)
    _assert_matches(ref, got)


@needs_libs
def test_oracle_block_switching(tmp_path):
    """Transients force long->short->long window sequences (all four
    window geometries of the spec, 4.3.1)."""
    sr = 44100
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(2 * sr)
         * np.where((np.arange(2 * sr) // 1800) % 2 == 0, 0.5, 0.005)).astype(np.float32)
    p = str(tmp_path / "t.ogg")
    vorbis_encode(p, x, sr, quality=0.5)
    ref, _ = vorbisfile_decode(p)
    got, _ = _mlx_decode(p)
    _assert_matches(ref, got)


@needs_libs
def test_oracle_mono_downmix(tmp_path):
    sr = 32000
    t = np.arange(sr) / sr
    x = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.2 * np.sin(2 * np.pi * 660 * t)],
        axis=1,
    ).astype(np.float32)
    p = str(tmp_path / "m.ogg")
    vorbis_encode(p, x, sr, quality=0.4)
    ref, _ = vorbisfile_decode(p)
    got, _ = _mlx_decode(p, mono=True)
    assert got.ndim == 1 and len(got) == len(ref)
    assert float(np.abs(ref.mean(axis=1) - got).max()) < 1e-5
