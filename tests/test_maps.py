"""Map parity: vectorized MapKnots vs the literal C++ oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from melonix_tpu.engine import maps as M
from melonix_tpu.markers import Marker

SR = 44100
N = SR * 10


def mk(markers):
    return M.MapKnots.from_markers(markers, SR, N)


def as_tuples(markers):
    return [(m.sample, m.note, m.d_time, m.pitch_bend) for m in markers]


MARKER_SETS = [
    [],
    [Marker(44100, 60.0, 0.0, 0.0)],
    [Marker(44100, 60.0, 0.5, 2.0)],
    [Marker(22050, 57.0, -0.1, -3.0), Marker(88200, 62.0, 0.7, 5.0)],
    [
        Marker(10000, 50.0, 0.2, 1.0),
        Marker(20000, 52.0, -0.05, -2.5),
        Marker(300000, 55.0, 1.5, 0.3),
        Marker(400000, 57.0, 0.0, 12.0),
    ],
    # Backward segment: d_time large negative makes the time map non-monotonic
    [Marker(44100, 60.0, -1.5, 4.0), Marker(88200, 62.0, 0.1, -4.0)],
]


@pytest.mark.parametrize("markers", MARKER_SETS)
def test_sample_to_time_parity(markers):
    knots = mk(markers)
    tup = as_tuples(markers)
    vals = list(range(-5, 20)) + [22049, 22050, 22051, 44100, 44101, 88199, 88200, N - 1, N + 5000]
    got = knots.sample_to_time(np.array(vals))
    want = [oracle.sample2time(tup, SR, v) for v in vals]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("markers", MARKER_SETS)
def test_time_to_sample_parity(markers):
    knots = mk(markers)
    tup = as_tuples(markers)
    vals = np.concatenate(
        [
            np.linspace(-0.5, 12.0, 997),
            np.array([0.0, 1e-9, 0.9999999, 1.0, 1.0000001, 2.0]),
        ]
    )
    got = knots.time_to_sample(vals)
    want = [oracle.time2sample(tup, SR, float(v)) for v in vals]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("markers", MARKER_SETS)
def test_time_to_pitch_bend_parity(markers):
    knots = mk(markers)
    tup = as_tuples(markers)
    vals = np.concatenate([np.linspace(-0.5, 12.0, 499), np.array([0.0, 10.0, 11.0])])
    got = knots.time_to_pitch_bend(vals)
    want = [oracle.time2pitchbend(tup, SR, N, float(v)) for v in vals]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.parametrize("markers", MARKER_SETS[:5])
def test_roundtrip_identity_between_markers(markers):
    """sample2Time ∘ time2Sample ≈ id wherever the map is monotonic."""
    knots = mk(markers)
    samples = np.arange(1000, N - 1, 7919)
    ts = knots.sample_to_time(samples)
    back = knots.time_to_sample(ts)
    # int truncation loses < 1 sample
    assert np.max(np.abs(back - samples)) <= 1


@pytest.mark.parametrize("markers", MARKER_SETS)
def test_jax_twins_match_host(markers):
    knots = mk(markers)
    ks, ts, bends = M.pad_knots(knots, bucket=8)
    vals_s = np.array([-10, 0, 5, 22050, 44100, 100000, N - 1, N + 100], np.float64)
    got = np.asarray(M.sample_to_time_jax(ks, ts, SR, jnp.asarray(vals_s)))
    want = knots.sample_to_time(vals_s)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    vals_t = np.linspace(-0.5, 12.0, 301)
    got = np.asarray(M.time_to_sample_jax(ks, ts, SR, jnp.asarray(vals_t)))
    want_f = [float(v) for v in knots.time_to_sample(vals_t)]
    np.testing.assert_allclose(got, want_f, rtol=1e-5, atol=1.5)

    got = np.asarray(M.time_to_pitch_bend_jax(ts, bends, knots.duration(), jnp.asarray(vals_t)))
    want = knots.time_to_pitch_bend(vals_t)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_duration_no_markers():
    knots = mk([])
    assert knots.duration() == pytest.approx((N - 1) / SR)


def test_pitch_bend_endpoints_zero():
    """Bend is 0 at t<=0 and relaxes to 0 at duration (app.cpp:1091, 1115)."""
    knots = mk([Marker(44100, 60.0, 0.0, 7.0)])
    assert knots.time_to_pitch_bend(0.0) == 0.0
    assert knots.time_to_pitch_bend(-1.0) == 0.0
    assert abs(knots.time_to_pitch_bend(knots.duration())) < 1e-5
    assert knots.time_to_pitch_bend(knots.duration() + 1.0) == 0.0
