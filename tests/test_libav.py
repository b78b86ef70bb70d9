"""Long-tail audio import via the libav shim (native/libav_decode.cpp).

The reference's front door is "decode any FFmpeg-readable file" through
the FFmpeg *libraries* (app.cpp:12-17, 624-741).  WAV/FLAC/MP3/Vorbis are
native here; this suite covers the rest — AAC-in-MP4 and Opus fixtures
encoded by the shim itself, decoded through the product path
(`load_audio`), plus the fallback chain (.ogg holding an Opus stream must
fall from the native Vorbis decoder through to libav) and fail-soft on
garbage.  Skips cleanly where the system lacks libavformat.
"""

import os

import numpy as np
import pytest

from melonix_tpu.io import libav
from melonix_tpu.io.audio import DecodeError, load_audio

pytestmark = pytest.mark.skipif(
    libav.try_load() is None, reason="libav shim not built / libav absent"
)

SR = 48000


def _tone(seconds=2.0, f=440.0, sr=SR, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _aligned_snr_db(got, want, sr):
    """SNR over one second after cross-correlation alignment (lossy codecs
    add encoder delay/padding the container does not always declare)."""
    c = np.correlate(got[: 2 * sr].astype(np.float64), want[:sr], "full")
    lag = int(np.argmax(c)) - (sr - 1)
    a = got[max(lag, 0) : max(lag, 0) + sr]
    b = want[max(-lag, 0) : max(-lag, 0) + sr]
    m = min(len(a), len(b))
    err = np.mean((a[:m] - b[:m]) ** 2) / np.mean(b[:m] ** 2)
    return -10 * np.log10(err + 1e-30)


@pytest.mark.parametrize("ext,min_snr", [("m4a", 20.0), ("opus", 30.0)])
def test_lossy_roundtrip_through_product_path(tmp_path, ext, min_snr):
    tone = _tone()
    path = os.path.join(tmp_path, f"tone.{ext}")
    libav.encode(path, tone, SR)
    x, rate = load_audio(path)
    assert rate == SR
    assert abs(len(x) - len(tone)) < SR // 2
    assert _aligned_snr_db(x, tone, SR) > min_snr


def test_stereo_channels_and_downmix(tmp_path):
    left = _tone(f=440.0)
    right = _tone(f=660.0, amp=0.3)
    path = os.path.join(tmp_path, "st.m4a")
    libav.encode(path, np.stack([left, right], axis=1), SR)
    st, rate = load_audio(path, mono=False)
    assert rate == SR and st.ndim == 2 and st.shape[1] == 2
    mono, _ = load_audio(path, mono=True)
    # Downmix parity: mean across channels (swr 0.5/0.5, app.cpp:669-684).
    n = min(len(mono), len(st))
    assert np.allclose(mono[:n], st[:n].mean(axis=1), atol=1e-6)


def test_opus_in_ogg_falls_through_native_vorbis(tmp_path):
    """.ogg holding an Opus stream: the native Vorbis decoder must reject
    it and the import must still succeed via libav."""
    tone = _tone()
    opus = os.path.join(tmp_path, "t.opus")
    libav.encode(opus, tone, SR)
    ogg = os.path.join(tmp_path, "t.ogg")
    os.rename(opus, ogg)
    x, rate = load_audio(ogg)
    assert rate == SR
    assert _aligned_snr_db(x, tone, SR) > 30.0


def test_garbage_fails_soft(tmp_path):
    path = os.path.join(tmp_path, "junk.m4a")
    with open(path, "wb") as f:
        f.write(os.urandom(4096))
    with pytest.raises(DecodeError):
        load_audio(path)


def test_truncated_stream_fails_soft_or_partial(tmp_path):
    """A truncated but well-headed file either decodes the intact prefix
    or raises DecodeError — never crashes, never returns silence-as-success
    of the full length."""
    tone = _tone()
    path = os.path.join(tmp_path, "full.m4a")
    libav.encode(path, tone, SR)
    data = open(path, "rb").read()
    cut = os.path.join(tmp_path, "cut.m4a")
    with open(cut, "wb") as f:
        f.write(data[: len(data) // 3])
    try:
        x, rate = load_audio(cut)
        assert rate == SR and len(x) <= len(tone)
    except DecodeError:
        pass


def test_render_cli_on_m4a(tmp_path):
    """`python -m melonix_tpu render song.m4a` — the reference's canonical
    compressed-import flow (main.cpp:109-110) on the AAC path."""
    from melonix_tpu import cli

    tone = _tone(seconds=1.0)
    src = os.path.join(tmp_path, "song.m4a")
    libav.encode(src, tone, SR)
    out = os.path.join(tmp_path, "out.wav")
    cli.main(["render", src, "-o", out])
    from melonix_tpu.io.wav import read_wav

    y, rate = read_wav(out)
    assert rate == SR and len(y) > SR // 2
    assert np.max(np.abs(y)) > 0.1


def test_write_audio_dispatcher(tmp_path):
    import melonix_tpu as mlx

    tone = _tone(seconds=1.0)
    for ext in ("wav", "flac", "opus"):
        p = os.path.join(tmp_path, f"o.{ext}")
        mlx.write_audio(p, tone, SR)
        x, rate = mlx.load_audio(p)
        assert rate == SR and len(x) > 0


def test_opus_rate_adaptation(tmp_path):
    """Opus only encodes the 48k family: a 44.1 kHz export must adapt the
    encoder rate (resampling via swr) instead of failing (review finding:
    enc->sample_rate was copied through unchecked)."""
    sr_in = 44100
    t = np.arange(sr_in * 2) / sr_in
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = os.path.join(tmp_path, "t44.opus")
    libav.encode(path, tone, sr_in)
    x, rate = load_audio(path)
    assert rate != sr_in and rate >= 8000  # a supported Opus rate
    assert abs(len(x) / rate - 2.0) < 0.25  # duration preserved
    # Dominant frequency survives the resample + codec.
    n = min(len(x), rate)
    spec = np.abs(np.fft.rfft(x[:n] * np.hanning(n)))
    f_peak = np.argmax(spec) * rate / n
    assert abs(f_peak - 440.0) < 5.0
