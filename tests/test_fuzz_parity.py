"""Randomized oracle-parity fuzz: the full render path vs the literal
NumPy transcription of the reference C++ (tests/oracle.py) across
adversarial marker configurations.  Lengths and step structure must agree
exactly; sample values to within a couple of float32 ulps (XLA contracts
the lerp multiply-add into an fma; NumPy rounds twice)."""

import numpy as np
import pytest

import oracle
from melonix_tpu.engine.grains import build_grain_table
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.render import render_track
from melonix_tpu.markers import Marker, sort_markers

SR = 8000


def _signal(rng, seconds=0.8):
    t = np.arange(int(SR * seconds)) / SR
    x = 0.5 * np.sin(2 * np.pi * (150 + 80 * rng.random()) * t)
    x += 0.2 * np.sin(2 * np.pi * (300 + 200 * rng.random()) * t + rng.random())
    x += 0.02 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def _random_markers(rng, n_samples):
    configs = []
    n_m = rng.integers(0, 5)
    for _ in range(n_m):
        configs.append(
            Marker(
                sample=int(rng.integers(0, n_samples)),
                note=float(rng.uniform(30, 80)),
                d_time=float(rng.uniform(-0.08, 0.12)),
                pitch_bend=float(rng.uniform(-7, 7)),
            )
        )
    return sort_markers(configs)


@pytest.mark.parametrize("seed", range(8))
def test_render_matches_oracle_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    x = _signal(rng)
    markers = _random_markers(rng, len(x))
    table = build_grain_table(x)
    knots = MapKnots.from_markers(markers, SR, len(x))

    got = render_track(x, table, knots)
    want = oracle.export(
        x,
        list(zip(table.starts.tolist(), table.lengths.tolist())),
        [(m.sample, m.note, m.d_time, m.pitch_bend) for m in markers],
        SR,
    )
    assert len(got) == len(want), (seed, len(got), len(want))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6, err_msg=f"seed {seed}")
    assert np.mean(got == want) > 0.8  # mostly bit-identical


def test_render_matches_oracle_edge_markers():
    """Degenerate markers: at sample 0, duplicates, past the end, time
    reversal via large negative d_time."""
    rng = np.random.default_rng(77)
    x = _signal(rng)
    n = len(x)
    cases = [
        [Marker(0, 50.0, 0.05, 2.0)],
        [Marker(n // 2, 50.0, 0.0, 0.0), Marker(n // 2, 55.0, 0.02, -1.0)],
        [Marker(n - 1, 50.0, 0.1, 3.0)],
        [Marker(n // 3, 50.0, -0.2, 1.0), Marker(2 * n // 3, 50.0, 0.15, -2.0)],
    ]
    table = build_grain_table(x)
    grains = list(zip(table.starts.tolist(), table.lengths.tolist()))
    for i, ms in enumerate(cases):
        ms = sort_markers(ms)
        knots = MapKnots.from_markers(ms, SR, n)
        got = render_track(x, table, knots)
        want = oracle.export(
            x, grains, [(m.sample, m.note, m.d_time, m.pitch_bend) for m in ms], SR
        )
        assert len(got) == len(want), (i, len(got), len(want))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-6, err_msg=f"case {i}")
