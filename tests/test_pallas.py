"""Pallas kernel tests — interpret mode on CPU, same code path as TPU.

Every Pallas kernel must have a pure-jnp/NumPy reference twin so the suite
runs identically on CPU CI and on-TPU (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from melonix_tpu.engine.spectral import hann_window, num_frames, stft_device
from melonix_tpu.kernels.pallas_stft import stft_mag_pallas, supported


def _oracle_mags(x, win, size, hop, nf):
    spec = np.asarray(stft_device(jnp.asarray(x), jnp.asarray(win), size, hop, nf))
    return np.abs(spec[:, : size // 2]).astype(np.float32)


@pytest.mark.parametrize("size,hop", [(2048, 512), (1024, 256), (2048, 1024)])
def test_stft_mag_pallas_matches_xla(size, hop, rng):
    assert supported(size, hop)
    n = 5 * size + 137  # non-aligned length exercises the zero tail
    x = rng.standard_normal(n).astype(np.float32)
    win = hann_window(size)
    nf = num_frames(n, size, hop)
    got = np.asarray(
        stft_mag_pallas(jnp.asarray(x), jnp.asarray(win), size, hop, nf, interpret=True)
    )
    want = _oracle_mags(x, win, size, hop, nf)
    assert got.shape == (nf, size // 2)
    # float32 matmul-DFT vs XLA FFT: relative error at the spectrum scale.
    assert np.max(np.abs(got - want)) < 1e-2 * max(1.0, np.max(want))
    denom = np.maximum(np.abs(want), 1e-3 * np.max(want))
    assert np.median(np.abs(got - want) / denom) < 1e-4


def test_stft_mag_pallas_scale_and_block_boundary(rng):
    size, hop = 1024, 256
    # n_frames exactly a multiple of the 128-frame block, then one over.
    for nf_target in (128, 129):
        n = (nf_target - 1) * hop + size
        x = rng.standard_normal(n).astype(np.float32)
        win = hann_window(size)
        nf = num_frames(n, size, hop)
        assert nf == nf_target
        got = np.asarray(
            stft_mag_pallas(
                jnp.asarray(x), jnp.asarray(win), size, hop, nf,
                scale=1.0 / size, interpret=True,
            )
        )
        want = _oracle_mags(x, win, size, hop, nf) / size
        assert got.shape[0] == nf_target
        assert np.max(np.abs(got - want)) < 1e-5


def test_stft_mag_pallas_unsupported_shapes():
    assert not supported(2048, 500)   # hop not lane-aligned
    assert not supported(2000, 500)   # size not a hop multiple
