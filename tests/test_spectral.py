"""Spectral engine: reference-parity columns, matmul-FFT backend, STFT."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from melonix_tpu.config import Config
from melonix_tpu.engine import spectral as S
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.kernels.fftmm import fft_matmul

# Small DFT size keeps the oracle fast; engine semantics are size-generic.
CFG = Config(spectr_size=2048)


def snr_db(got, want):
    err = np.linalg.norm(got - want)
    ref = np.linalg.norm(want) + 1e-30
    return 20 * np.log10(err / ref + 1e-30)


@pytest.mark.parametrize(
    "start,end",
    [
        (0, 2048),  # exact window
        (1000, 3000),  # decay region inside
        (-500, 1000),  # window extends before track start
        (11000, 12500),  # window extends past track end
        (2000, 2100),  # narrow column (start close to end)
    ],
)
def test_column_parity(chirp, start, end):
    x, _sr = chirp
    want = oracle.spec_column(x, start, end, CFG.spectr_size)
    got = S.spectrogram_columns(x, [start], [end], CFG)[0]
    assert got.shape == want.shape
    # float32 engine vs float64 oracle: −60 dB is the north star; we land far below.
    assert snr_db(got, want) < -80, snr_db(got, want)


def test_columns_batched(chirp):
    x, _sr = chirp
    starts = np.array([0, 1000, 5000, 9000])
    ends = starts + 1800
    got = S.spectrogram_columns(x, starts, ends, CFG)
    for i in range(len(starts)):
        want = oracle.spec_column(x, int(starts[i]), int(ends[i]), CFG.spectr_size)
        assert snr_db(got[i], want) < -80


def test_matmul_fft_matches_numpy(rng):
    for n in (2048, 32768):
        x = rng.standard_normal((3, n)).astype(np.float32)
        want = np.fft.fft(x)
        got = np.asarray(fft_matmul(jnp.asarray(x)))
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert err < 1e-4, (n, err)


def test_matmul_backend_column_parity(chirp):
    x, _sr = chirp
    want = oracle.spec_column(x, 1000, 3000, CFG.spectr_size)
    got = S.spectrogram_columns(x, [1000], [3000], CFG, backend="matmul")[0]
    assert snr_db(got, want) < -75, snr_db(got, want)


def test_view_column_ranges(chirp):
    x, sr = chirp
    knots = MapKnots.from_markers([], sr, len(x))
    starts, ends = S.view_column_ranges(knots, width=100, start_time=0.0, range_time=1.0)
    assert starts.shape == ends.shape == (100,)
    # Identity map: column x covers [x, x+1) * sr / width samples
    np.testing.assert_array_equal(starts, (np.arange(100) * sr / 100).astype(np.int64))
    assert np.all(ends >= starts)


def test_stft_roundtrip(chirp):
    x, _sr = chirp
    cfg = Config(stft_size=512, stft_hop=128)
    frames, hop = S.stft(x, cfg)
    assert frames.shape[1] == 257
    win = jnp.asarray(S.hann_window(512))
    out = np.asarray(S.istft_device(jnp.asarray(frames), win, 512, hop, len(x)))
    # Interior reconstruction error tiny (edges lack full overlap)
    lo, hi = 512, len(x) - 512
    np.testing.assert_allclose(out[lo:hi], x[lo:hi], atol=1e-4)


def test_stft_matches_scipy(chirp):
    x, _sr = chirp
    try:
        from scipy.signal import stft as sp_stft
    except ImportError:
        pytest.skip("scipy missing")
    cfg = Config(stft_size=512, stft_hop=128)
    frames, hop = S.stft(x, cfg)
    _f, _t, Z = sp_stft(
        x, nperseg=512, noverlap=384, window="hann", boundary=None, padded=False
    )
    # scipy scales by 1/win.sum(); ours is unscaled
    scale = S.hann_window(512).sum()
    np.testing.assert_allclose(
        frames[: Z.shape[1]].T, Z * scale, atol=1e-3 * np.abs(Z).max() * scale
    )
