"""Pyramid build/query parity and exactness."""

import numpy as np
import pytest

import oracle
from melonix_tpu.engine import pyramid as P
from melonix_tpu.engine.maps import MapKnots


def test_build_matches_oracle(rng):
    x = (rng.standard_normal(5000) * 0.5).astype(np.float32)
    pyr = P.build_pyramid(x, device=False)
    want = oracle.calc_picks(x)
    assert pyr.n_levels == len(want)
    for lvl in range(len(want)):
        wmin = np.array([p[0] for p in want[lvl]], np.float32)
        wmax = np.array([p[1] for p in want[lvl]], np.float32)
        np.testing.assert_array_equal(pyr.mins[lvl], wmin)
        np.testing.assert_array_equal(pyr.maxs[lvl], wmax)


def test_build_device_matches_host(rng):
    x = (rng.standard_normal(3001) * 0.5).astype(np.float32)
    a = P.build_pyramid(x, device=False)
    b = P.build_pyramid(x, device=True)
    assert a.n_levels == b.n_levels
    for lvl in range(a.n_levels):
        np.testing.assert_array_equal(a.mins[lvl], b.mins[lvl])
        np.testing.assert_array_equal(a.maxs[lvl], b.maxs[lvl])


def test_query_exact_vs_bruteforce(rng):
    x = (rng.standard_normal(4096) * 0.5).astype(np.float32)
    pyr = P.build_pyramid(x, device=False)
    starts = rng.integers(0, 4000, 200)
    ends = starts + rng.integers(1, 90, 200)
    ends = np.minimum(ends, 4095)
    mn, mx = P.query_min_max(pyr, x, starts, ends)
    for i in range(len(starts)):
        s, e = int(starts[i]), int(ends[i])
        if s >= e:
            assert mn[i] == x[s] and mx[i] == x[s]
        else:
            assert mn[i] == x[s:e].min(), (s, e)
            assert mx[i] == x[s:e].max(), (s, e)


def test_query_edge_semantics(rng):
    x = (rng.standard_normal(1000) * 0.5).astype(np.float32)
    pyr = P.build_pyramid(x, device=False)
    cases = np.array(
        [
            [5, 5],      # start == end → single sample
            [10, 8],     # start > end → single sample at start
            [5, -3],     # start >= end short-circuits before bounds check
            [-5, 10],    # negative start → (0, 0)
            [990, 1000], # end == n → (0, 0) (reference: end >= n)
            [2000, 3000],
        ]
    )
    mn, mx = P.query_min_max(pyr, x, cases[:, 0], cases[:, 1])
    assert mn[0] == x[5] and mx[0] == x[5]
    assert mn[1] == x[10] and mx[1] == x[10]
    assert mn[2] == x[5] and mx[2] == x[5]
    assert mn[3] == 0 and mx[3] == 0
    assert mn[4] == 0 and mx[4] == 0
    assert mn[5] == 0 and mx[5] == 0


def test_reference_recursion_parity(rng):
    x = (rng.standard_normal(3000) * 0.5).astype(np.float32)
    pyr = P.build_pyramid(x, device=False)
    picks = oracle.calc_picks(x)
    for s, e in [(0, 100), (7, 250), (100, 101), (513, 1800), (2500, 2999)]:
        got = P.min_max_reference(pyr, x, s, e)
        want = oracle.min_max_from_range(x, picks, s, e)
        assert got == pytest.approx(want), (s, e)


def test_waveform_strip(chirp):
    x, sr = chirp
    pyr = P.build_pyramid(x, device=False)
    knots = MapKnots.from_markers([], sr, len(x))
    mn, mx = P.waveform_strip(pyr, x, knots, width=300, start_time=0.0, range_time=1.0)
    assert mn.shape == mx.shape == (300,)
    assert np.all(mx >= mn)
    # Strip over the full signal should span its dynamic range
    assert mx.max() > 0.4 and mn.min() < -0.4
