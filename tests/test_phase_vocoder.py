"""Phase-vocoder renderer: pitch accuracy, warp length, energy sanity."""

import numpy as np
import pytest

from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.phase_vocoder import render_track_pv, rate_integral_total
from melonix_tpu.markers import Marker

SR = 8000


def _sine(freq, seconds, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _peak_freq(x, sr=SR):
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    return np.argmax(spec) * sr / len(x)


def test_identity_no_markers():
    x = _sine(440.0, 2.0)
    knots = MapKnots.from_markers([], SR, len(x))
    y = render_track_pv(x, knots)
    assert abs(len(y) - len(x)) <= SR // 1000 + 1
    mid = y[len(y) // 4 : 3 * len(y) // 4]
    assert abs(_peak_freq(mid) - 440.0) < 5.0
    # energy within 2 dB
    rms_in = np.sqrt(np.mean(x**2))
    rms_out = np.sqrt(np.mean(mid**2))
    assert abs(20 * np.log10(rms_out / rms_in)) < 2.0


def test_constant_octave_shift():
    x = _sine(440.0, 2.0)
    n = len(x)
    markers = [
        Marker(sample=n // 4, note=57.0, d_time=0.0, pitch_bend=12.0),
        Marker(sample=3 * n // 4, note=57.0, d_time=0.0, pitch_bend=12.0),
    ]
    knots = MapKnots.from_markers(markers, SR, n)
    y = render_track_pv(x, knots)
    # between the markers the bend is exactly +12 → frequency doubles
    seg = y[int(0.35 * n) : int(0.6 * n)]
    assert abs(_peak_freq(seg) - 880.0) < 10.0
    # duration unchanged (no d_time)
    assert abs(len(y) - n) <= SR // 1000 + 1


def test_time_stretch_only():
    x = _sine(330.0, 2.0)
    n = len(x)
    markers = [Marker(sample=n // 2, note=52.0, d_time=0.5, pitch_bend=0.0)]
    knots = MapKnots.from_markers(markers, SR, n)
    y = render_track_pv(x, knots)
    want = knots.duration() * SR
    assert abs(len(y) - want) <= 2
    # pitch unchanged in both halves despite the stretch
    a = y[int(0.1 * len(y)) : int(0.3 * len(y))]
    b = y[int(0.7 * len(y)) : int(0.9 * len(y))]
    assert abs(_peak_freq(a) - 330.0) < 5.0
    assert abs(_peak_freq(b) - 330.0) < 5.0


def test_rate_integral_matches_numeric():
    x_len = 2 * SR
    markers = [
        Marker(sample=SR // 2, note=57.0, d_time=0.1, pitch_bend=4.0),
        Marker(sample=SR, note=57.0, d_time=-0.05, pitch_bend=-3.0),
    ]
    knots = MapKnots.from_markers(markers, SR, x_len)
    t_end = knots.duration()
    tt = np.linspace(1e-6, t_end, 200001)
    rho = 2.0 ** (knots.time_to_pitch_bend(tt) / 12.0)
    numeric = np.trapezoid(rho, tt)
    analytic = rate_integral_total(knots, t_end)
    assert abs(analytic - numeric) / numeric < 1e-3


def test_short_input_and_empty():
    knots = MapKnots.from_markers([], SR, 100)
    y = render_track_pv(np.zeros(100, np.float32), knots)
    assert (y == 0).all()


def test_chunked_stretch_matches_single_shot(monkeypatch):
    """Hour-scale chunking (exact phase carry + linear OLA) must agree with
    the one-shot stretch."""
    import melonix_tpu.engine.phase_vocoder as pv

    x = _sine(330.0, 6.0)
    n = len(x)
    markers = [
        Marker(sample=n // 3, note=52.0, d_time=0.1, pitch_bend=5.0),
        Marker(sample=2 * n // 3, note=52.0, d_time=-0.05, pitch_bend=-3.0),
    ]
    knots = MapKnots.from_markers(markers, SR, n)
    single = render_track_pv(x, knots)
    monkeypatch.setattr(pv, "PV_CHUNK_FRAMES", 64)  # force many chunks
    chunked = render_track_pv(x, knots)
    assert len(single) == len(chunked)
    err = np.sqrt(np.mean((single - chunked) ** 2)) / (
        np.sqrt(np.mean(single**2)) + 1e-12
    )
    assert err < 2e-3, err


def test_chunked_stretch_formant(monkeypatch):
    import melonix_tpu.engine.phase_vocoder as pv

    x = _sine(220.0, 4.0)
    n = len(x)
    markers = [Marker(sample=n // 2, note=48.0, d_time=0.0, pitch_bend=7.0)]
    knots = MapKnots.from_markers(markers, SR, n)
    single = render_track_pv(x, knots, preserve_formants=True)
    monkeypatch.setattr(pv, "PV_CHUNK_FRAMES", 48)
    chunked = render_track_pv(x, knots, preserve_formants=True)
    err = np.sqrt(np.mean((single - chunked) ** 2)) / (
        np.sqrt(np.mean(single**2)) + 1e-12
    )
    assert err < 2e-3, err


def test_ola_wsum_tiled_matches_scatter():
    """The tiled+edge-corrected wsum vs a brute-force scatter build."""
    import jax.numpy as jnp

    from melonix_tpu.engine.phase_vocoder import _ola_wsum
    from melonix_tpu.engine.spectral import hann_window

    for size, hop, n_frames in [(2048, 512, 37), (2048, 512, 4), (1024, 256, 9),
                                (2048, 1024, 5), (2048, 512, 2)]:
        out_len = (n_frames - 1) * hop + size
        win = hann_window(size)
        w2 = (win * win).astype(np.float64)
        want = np.full(out_len, 1e-8)
        acc = np.zeros(out_len)
        for g in range(n_frames):
            acc[g * hop : g * hop + size] += w2
        want = np.maximum(acc, 1e-8)
        got = np.asarray(_ola_wsum(jnp.asarray(win), size, hop, n_frames, out_len))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)
