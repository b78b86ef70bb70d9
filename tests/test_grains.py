"""Grain segmentation parity vs the literal oracle + structural properties."""

import numpy as np
import pytest

import oracle
from melonix_tpu.config import DEFAULT_CONFIG
from melonix_tpu.engine import grains as G


def make_signals(rng):
    sr = 8000
    sigs = {}
    t = np.arange(sr * 2) / sr
    sigs["sine"] = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    sigs["noise"] = (0.3 * rng.standard_normal(len(t))).astype(np.float32)
    # Mostly positive signal: primary search fails → fallback path
    sigs["dc_pos"] = (0.5 + 0.1 * np.sin(2 * np.pi * 3.0 * t)).astype(np.float32)
    # Sparse crossings
    sigs["slow"] = (0.7 * np.sin(2 * np.pi * 2.0 * t)).astype(np.float32)
    sigs["short"] = sigs["sine"][:1000]
    sigs["tiny"] = sigs["sine"][:100]
    return sigs


@pytest.mark.parametrize("look", [3, 7])
def test_zero_crossing_mask_matches_bruteforce(rng, look):
    x = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    m = G.zero_crossing_mask_np(x, look)
    n = len(x)
    for idx in rng.integers(0, n, 300):
        idx = int(idx)
        expect = (
            idx >= look
            and idx < n - look - 1
            and all(x[idx - j] < 0 for j in range(look))
            and all(x[idx + 1 + j] >= 0 for j in range(look))
        )
        assert m[idx] == expect, idx


@pytest.mark.parametrize("look", [3, 7])
def test_zero_crossing_mask_jax_matches_np(rng, look):
    x = (rng.standard_normal(3000) * 0.3).astype(np.float32)
    import jax.numpy as jnp

    m_np = G.zero_crossing_mask_np(x, look)
    m_jax = np.asarray(G.zero_crossing_mask_jax(jnp.asarray(x), look))
    np.testing.assert_array_equal(m_np, m_jax)


def test_grain_table_parity_all_signals(rng):
    for name, x in make_signals(rng).items():
        want = oracle.build_grains(x, DEFAULT_CONFIG.preferred_grain_size)
        table = G.build_grain_table(x, backend="numpy")
        got = list(zip(table.starts.tolist(), table.lengths.tolist()))
        assert got == want, f"signal {name}: {got[:5]} vs {want[:5]}"


def test_grain_table_jax_backend_matches(rng):
    x = make_signals(rng)["sine"]
    a = G.build_grain_table(x, backend="numpy")
    b = G.build_grain_table(x, backend="jax")
    np.testing.assert_array_equal(a.starts, b.starts)
    np.testing.assert_array_equal(a.lengths, b.lengths)


def test_grains_tile_contiguously(chirp):
    x, _sr = chirp
    t = G.build_grain_table(x, backend="numpy")
    assert len(t) > 5
    assert t.starts[0] == 0
    np.testing.assert_array_equal(t.starts[1:], t.starts[:-1] + t.lengths[:-1])
    # Every boundary is a neg→pos crossing (with either look-around)
    zc7 = G.zero_crossing_mask_np(x, 7)
    zc3 = G.zero_crossing_mask_np(x, 3)
    for b in t.starts[1:]:
        assert zc7[b] or zc3[b]
