"""Pitch detection: accuracy on synthetic tones, voicing, octave robustness."""

import numpy as np
import pytest

from melonix_tpu.config import Config
from melonix_tpu.engine.pitch import pitch_curve


def tone(freq, sr=44100, seconds=1.0, harmonics=(1.0,)):
    t = np.arange(int(sr * seconds)) / sr
    x = sum(a * np.sin(2 * np.pi * freq * (i + 1) * t) for i, a in enumerate(harmonics))
    return (x / max(1.0, np.abs(x).max())).astype(np.float32)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 880.0])
def test_pure_tone_accuracy(freq):
    sr = 44100
    x = tone(freq, sr)
    c = pitch_curve(x, sr)
    mid = c.f0[4:-4]
    voiced = c.voiced[4:-4]
    assert voiced.mean() > 0.9
    err_cents = 1200 * np.abs(np.log2(mid[voiced] / freq))
    assert np.median(err_cents) < 10, (freq, np.median(err_cents))


def test_harmonic_tone_no_octave_error():
    """Strong harmonics must not pull the estimate an octave down/up."""
    sr = 44100
    x = tone(220.0, sr, harmonics=(1.0, 0.8, 0.6, 0.4))
    c = pitch_curve(x, sr)
    voiced = c.voiced[4:-4]
    f = c.f0[4:-4][voiced]
    err_oct = np.abs(np.log2(f / 220.0))
    assert (err_oct < 0.2).mean() > 0.9


def test_silence_unvoiced():
    sr = 44100
    c = pitch_curve(np.zeros(sr, np.float32), sr)
    assert not c.voiced.any()
    assert (c.f0 == 0).all()


def test_noise_mostly_unvoiced(rng):
    sr = 44100
    x = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    c = pitch_curve(x, sr)
    assert c.voiced.mean() < 0.3


def test_note_scale_matches_reference_convention():
    """55 Hz must land on note 24 (app.cpp:499: startFreq = 55·2^((n-24)/12))."""
    sr = 44100
    # fmin=50 so the 55 Hz fundamental's lag is inside the search range
    c = pitch_curve(tone(55.0, sr, seconds=1.5), sr, config=Config(pitch_fmin=50.0))
    voiced = c.voiced[4:-4]
    notes = c.note[4:-4][voiced]
    assert np.abs(np.median(notes) - 24.0) < 0.3


def test_glissando_tracks():
    sr = 44100
    t = np.arange(sr) / sr
    f_inst = 220.0 * 2 ** t  # one octave per second
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    x = np.sin(phase).astype(np.float32)
    c = pitch_curve(x, sr)
    idx = np.arange(len(c.f0))
    tt = idx * c.hop / sr
    want = 220.0 * 2**tt
    voiced = c.voiced & (tt > 0.05) & (tt < 0.9)
    err = 1200 * np.abs(np.log2(c.f0[voiced] / want[voiced]))
    # One octave/sec sweep moves ~4% within a single 46 ms frame; the
    # frame-centered estimate lags accordingly.
    assert np.median(err) < 40
