"""Stereo sessions, formant-preserving PV, band-limited resampling."""

import numpy as np
import pytest

from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.phase_vocoder import render_track_pv
from melonix_tpu.engine.session import render_session
from melonix_tpu.io.resample import resample
from melonix_tpu.markers import Marker

SR = 8000


def _peak_freq(x, sr):
    w = np.hanning(len(x))
    return np.argmax(np.abs(np.fft.rfft(x * w))) * sr / len(x)


# ----------------------------------------------------------------------
# Resampler
# ----------------------------------------------------------------------


def test_resample_preserves_tone():
    t = np.arange(SR * 2) / SR
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    for target in (12000, 44100, 4000):
        y = resample(x, SR, target)
        assert abs(len(y) - 2 * target) <= 1
        f = _peak_freq(y[target // 2 : -target // 2], target)
        assert abs(f - 440.0) < 2.0, (target, f)


def test_resample_multichannel_and_identity():
    x = np.random.default_rng(0).standard_normal((1000, 2)).astype(np.float32)
    assert resample(x, SR, SR) is x or np.array_equal(resample(x, SR, SR), x)
    y = resample(x, 8000, 4000)
    assert y.shape == (500, 2)
    assert resample(np.zeros(0, np.float32), 8000, 4000).shape == (0,)


def test_resample_removes_above_nyquist():
    t = np.arange(SR * 2) / SR
    x = (np.sin(2 * np.pi * 3500.0 * t)).astype(np.float32)
    y = resample(x, SR, 4000)  # new Nyquist = 2000 < 3500 → tone removed
    assert np.sqrt(np.mean(y**2)) < 0.02


# ----------------------------------------------------------------------
# Stereo session render
# ----------------------------------------------------------------------


def _stereo_song(seconds=1.5):
    t = np.arange(int(SR * seconds)) / SR
    left = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    right = 0.5 * np.sin(2 * np.pi * 330.0 * t)
    return np.stack([left, right], axis=1).astype(np.float32)


def test_stereo_granular_session():
    x = _stereo_song()
    # Pure time warp: bend interpolates from 0 at t=0, so a bent marker
    # would already shift the opening — keep bend 0 for the identity check.
    markers = [Marker(sample=len(x) // 2, note=57.0, d_time=0.05, pitch_bend=0.0)]
    out = render_session(x, markers, SR)
    assert out.ndim == 2 and out.shape[1] == 2
    # Channels keep their identities (left 220 Hz, right 330 Hz at the start)
    a = out[: SR // 2, 0]
    b = out[: SR // 2, 1]
    assert abs(_peak_freq(a, SR) - 220.0) < 8.0
    assert abs(_peak_freq(b, SR) - 330.0) < 8.0
    # Mono path agrees with render_track on the downmix
    mono = render_session(x.mean(axis=1).astype(np.float32), markers, SR)
    assert mono.ndim == 1 and abs(len(mono) - len(out)) <= 1


def test_stereo_routes_through_mesh_and_matches_single_device():
    """With >1 device (conftest provides 8), render_session batches the
    channels over the mesh's data axis; output must match the per-channel
    single-device path (granular: tolerance of the batched kernel; PV:
    bit-exact, the channels path preserves compile boundaries)."""
    import jax

    assert len(jax.devices()) == 8
    x = _stereo_song(seconds=2.0)
    markers = [
        Marker(sample=len(x) // 3, note=57.0, d_time=0.05, pitch_bend=2.0),
        Marker(sample=2 * len(x) // 3, note=57.0, d_time=0.0, pitch_bend=-1.0),
    ]
    for engine, atol in (("granular", 2e-6), ("pv", 0.0)):
        routed = render_session(x, markers, SR, engine=engine)  # mesh="auto"
        single = render_session(x, markers, SR, engine=engine, mesh=None)
        assert routed.shape == single.shape, engine
        if atol == 0.0:
            np.testing.assert_array_equal(routed, single, err_msg=engine)
        else:
            np.testing.assert_allclose(routed, single, atol=atol, err_msg=engine)


def test_five_channel_session_pads_to_mesh():
    """Channel counts that don't divide the data axis zero-pad cleanly."""
    rng = np.random.default_rng(7)
    x = (0.2 * rng.standard_normal((SR * 2, 5))).astype(np.float32)
    markers = [Marker(sample=SR, note=57.0, d_time=0.02, pitch_bend=1.0)]
    for engine in ("granular", "pv"):
        routed = render_session(x, markers, SR, engine=engine)
        single = render_session(x, markers, SR, engine=engine, mesh=None)
        assert routed.shape == single.shape
        np.testing.assert_allclose(routed, single, atol=2e-6, err_msg=engine)


def test_stereo_pv_session_many_markers():
    """BASELINE config #5 shape: 100+ markers through the PV engine."""
    x = _stereo_song(seconds=3.0)
    n = len(x)
    rng = np.random.default_rng(3)
    samples = np.sort(rng.choice(np.arange(1000, n - 1000), 120, replace=False))
    markers = [
        Marker(sample=int(s), note=57.0, d_time=0.0,
               pitch_bend=float(rng.uniform(-2, 2)))
        for s in samples
    ]
    out = render_session(x, markers, SR, engine="pv")
    assert out.shape[1] == 2 and len(out) > 0.9 * n
    assert np.isfinite(out).all()
    assert np.sqrt(np.mean(out**2)) > 0.1  # didn't collapse to silence


# ----------------------------------------------------------------------
# Formant preservation
# ----------------------------------------------------------------------


def _vowel(seconds=2.0, f0=110.0, formant_hz=880.0, sr=SR):
    """Pulse-train-ish harmonic stack with a strong spectral envelope peak."""
    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros_like(t)
    for k in range(1, 30):
        f = k * f0
        if f > sr / 2 - 200:
            break
        amp = np.exp(-0.5 * ((f - formant_hz) / 220.0) ** 2) + 0.05
        x += amp * np.sin(2 * np.pi * f * t + 0.7 * k)
    return (0.2 * x / np.abs(x).max()).astype(np.float32)


def _band_energy(x, sr, lo, hi):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    return spec[(freqs >= lo) & (freqs < hi)].sum()


def test_formant_preserving_shift():
    x = _vowel()
    n = len(x)
    markers = [
        Marker(sample=n // 8, note=45.0, d_time=0.0, pitch_bend=12.0),
        Marker(sample=7 * n // 8, note=45.0, d_time=0.0, pitch_bend=12.0),
    ]
    knots = MapKnots.from_markers(markers, SR, n)
    plain = render_track_pv(x, knots)
    formant = render_track_pv(x, knots, preserve_formants=True)
    mid = slice(int(0.3 * n), int(0.7 * n))
    # Plain shift moves the envelope peak an octave up (→ ~1760 Hz band);
    # formant-preserving keeps the energy concentrated around 880 Hz.
    lo_p = _band_energy(plain[mid], SR, 600, 1200)
    hi_p = _band_energy(plain[mid], SR, 1400, 2400)
    lo_f = _band_energy(formant[mid], SR, 600, 1200)
    hi_f = _band_energy(formant[mid], SR, 1400, 2400)
    assert hi_p > lo_p, "plain PV should move the envelope up"
    assert lo_f > hi_f, "formant PV should keep the envelope at 880 Hz"
    # And the pitch itself still doubled: fundamental near 220 Hz
    f0_band = _band_energy(formant[mid], SR, 190, 250)
    f0_orig = _band_energy(formant[mid], SR, 90, 130)
    assert f0_band > f0_orig


def test_mono_explicit_mesh_routes_seq_parallel():
    """A MONO track with an EXPLICIT mesh renders through the
    sequence-parallel paths (long-track scaling, SURVEY §5): granular at
    the render tolerance with the identical zero tail; PV at the PV
    comparison convention (the distributed phase carry reorders float
    sums)."""
    import jax

    from melonix_tpu.engine.session import render_session
    from melonix_tpu.parallel import make_audio_mesh

    mesh = make_audio_mesh(len(jax.devices()), data=1)
    t = np.arange(int(SR * 1.5)) / SR
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    markers = [Marker(len(x) // 2, 57.0, 0.05, 3.0)]

    got = render_session(x, markers, SR, engine="granular", mesh=mesh)
    want = render_session(x, markers, SR, engine="granular", mesh=None)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert np.array_equal(got == 0.0, want == 0.0)  # tail + step layout

    got = render_session(x, markers, SR, engine="pv", mesh=mesh)
    want = render_session(x, markers, SR, engine="pv", mesh=None)
    assert got.shape == want.shape
    err = np.sqrt(np.mean((got - want) ** 2)) / (np.sqrt(np.mean(want**2)) + 1e-12)
    assert err < 2e-3, err

    # Formant composes with the mono seq routing too.
    got = render_session(x, markers, SR, engine="pv", mesh=mesh,
                         preserve_formants=True)
    want = render_session(x, markers, SR, engine="pv", mesh=None,
                          preserve_formants=True)
    assert got.shape == want.shape
    err = np.sqrt(np.mean((got - want) ** 2)) / (np.sqrt(np.mean(want**2)) + 1e-12)
    assert err < 2e-3, err

    # Too short for the shard count -> clean fallback, same output shape.
    xs = x[: SR // 4]
    ms = [Marker(len(xs) // 2, 57.0, 0.0, 2.0)]
    got = render_session(xs, ms, SR, engine="pv", mesh=mesh)
    want = render_session(xs, ms, SR, engine="pv", mesh=None)
    assert got.shape == want.shape
