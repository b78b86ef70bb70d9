"""Pallas kernel tests — interpret mode on CPU, same code path as TPU.

Every Pallas kernel must have a pure-jnp/NumPy reference twin so the suite
runs identically on CPU CI and on-TPU (SURVEY.md §4).
"""

from functools import partial

import numpy as np
import pytest

import jax
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


# ----------------------------------------------------------------------
# Fused reference-parity column kernel (kernels/pallas_columns.py)
# ----------------------------------------------------------------------

from melonix_tpu.kernels.pallas_columns import (
    spectrogram_columns_fused,
    supported as cols_supported,
    unpack_rgb,
)
from melonix_tpu.ui.colormap import colormap_np
from oracle import spec_column


def _fused(wav, starts, ends, k, size, colormap):
    return np.asarray(
        spectrogram_columns_fused(
            jnp.asarray(np.asarray(wav, np.float32)),
            jnp.asarray(starts, jnp.int32),
            jnp.asarray(ends, jnp.int32),
            k,
            size=size,
            colormap=colormap,
            interpret=True,
        )
    )


def test_columns_fused_matches_oracle_small(rng):
    size = 4096
    assert cols_supported(size)
    n = 3 * size
    wav = rng.standard_normal(n).astype(np.float32)
    # Ends at awkward offsets: unaligned rem, short window (end < size),
    # window past the track end, and a fully out-of-range column.
    ends = np.asarray([size + 37, size // 2, n + size // 4, 0], np.int32)
    starts = ends - np.asarray([300, 100, size // 2, 10], np.int32)
    got = _fused(wav, starts, ends, 1.0, size, colormap=False)
    for i in range(len(ends)):
        want = spec_column(wav, int(starts[i]), int(ends[i]), spectr_size=size)
        scale = max(np.max(want), 1e-6)
        err = np.max(np.abs(got[i] - want)) / scale
        assert err < 1e-3, (i, err)  # < -60 dB vs float64 oracle


def test_columns_fused_reference_size(rng):
    """Full 32768-pt reference geometry, < -60 dB vs the float64 oracle."""
    size = 32768
    n = size + 5000
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * np.arange(n) / 44100.0)).astype(np.float32)
    ends = np.asarray([size + 1111], np.int32)
    starts = ends - 2000
    got = _fused(wav, starts, ends, 1.0, size, colormap=False)
    want = spec_column(wav, int(starts[0]), int(ends[0]), spectr_size=size)
    num = np.sqrt(np.mean((got[0] - want) ** 2))
    den = np.sqrt(np.mean(want**2))
    snr_db = 20 * np.log10(num / den)
    assert snr_db < -60.0, snr_db
    assert int(np.argmax(got[0])) == int(np.argmax(want))


def test_columns_fused_colormap_packing(rng):
    size = 4096
    n = 2 * size
    wav = (10.0 * rng.standard_normal(n)).astype(np.float32)
    ends = np.asarray([size + 259, size + 1000], np.int32)
    starts = ends - 500
    k = 16384.0
    mags = _fused(wav, starts, ends, k, size, colormap=False)
    rgb_packed = _fused(wav, starts, ends, k, size, colormap=True)
    got = unpack_rgb(rgb_packed)
    want = colormap_np(mags, k)
    # Truncation boundaries may flip by one count under f32 vs f64 trig.
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert np.mean(diff == 0) > 0.999
    assert diff.max() <= 1


# ----------------------------------------------------------------------
# Arbitrary-offset frame extraction (kernels/pallas_frames.py)
# ----------------------------------------------------------------------

from melonix_tpu.kernels.pallas_frames import extract_frames_pallas


def test_extract_frames_pallas(rng):
    size = 1024
    n = 5000
    wav = rng.standard_normal(n).astype(np.float32)
    starts = np.asarray([0, 37, 1111, n - 1, n - size // 2], np.int32)
    got = np.asarray(
        extract_frames_pallas(jnp.asarray(wav), jnp.asarray(starts), size, interpret=True)
    )
    for i, s in enumerate(starts):
        want = np.zeros(size, np.float32)
        avail = min(size, n - s)
        want[:avail] = wav[s : s + avail]
        np.testing.assert_array_equal(got[i], want, err_msg=f"frame {i} start {s}")


# ----------------------------------------------------------------------
# Gather-free granular render (kernels/pallas_render.py)
# ----------------------------------------------------------------------


def test_granular_render_pallas_matches_xla():
    import jax

    from melonix_tpu.engine.grains import build_grain_table
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.render import (
        build_render_plan,
        render_device,
        render_device_args,
    )
    from melonix_tpu.kernels.pallas_render import (
        granular_render_pallas,
        plan_supported,
    )
    from melonix_tpu.markers import Marker

    sr = 8000
    t = np.arange(int(sr * 0.6)) / sr
    x = (0.6 * np.sin(2 * np.pi * 190.0 * t) + 0.02 * np.sin(2 * np.pi * 41.0 * t)).astype(
        np.float32
    )
    table = build_grain_table(x)
    markers = [Marker(sample=len(x) // 2, note=57.0, d_time=0.03, pitch_bend=4.0)]
    knots = MapKnots.from_markers(markers, sr, len(x))
    plan = build_render_plan(table, knots)
    assert plan_supported(plan)
    out_len = 1024 * -(-plan.total_out // 1024)
    offs, gs, rb, n_valid, _, fi, fv = render_device_args(plan, x, out_len)

    want = np.asarray(
        render_device(
            jnp.asarray(x), jnp.asarray(offs), jnp.asarray(gs), jnp.asarray(rb),
            n_valid, out_len, jnp.asarray(fi), jnp.asarray(fv),
        )
    )
    got = np.asarray(
        granular_render_pallas(
            jnp.asarray(x), jnp.asarray(gs), jnp.asarray(plan.rate),
            jnp.asarray(plan.sz, jnp.int32), jnp.asarray(offs),
            out_len, jnp.asarray(fi), jnp.asarray(fv), interpret=True,
        )
    )
    # 1-ulp differences allowed: the two backends may contract the lerp's
    # multiply-add differently (fma); indices/masking must agree exactly.
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert np.mean(got == want) > 0.8


def test_granular_render_pallas_extreme_bends():
    """Rates at the kernel's span limits (+-24 semitones) stay correct."""
    from melonix_tpu.engine.grains import build_grain_table
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.render import (
        build_render_plan,
        render_device,
        render_device_args,
    )
    from melonix_tpu.kernels.pallas_render import (
        _buckets,
        granular_render_pallas,
        plan_supported,
    )
    from melonix_tpu.markers import Marker

    sr = 8000
    t = np.arange(int(sr * 0.5)) / sr
    x = (0.5 * np.sin(2 * np.pi * 210.0 * t)).astype(np.float32)
    n = len(x)
    for bend in (24.0, -24.0):
        markers = [
            Marker(sample=n // 8, note=57.0, d_time=0.0, pitch_bend=bend),
            Marker(sample=7 * n // 8, note=57.0, d_time=0.0, pitch_bend=bend),
        ]
        knots = MapKnots.from_markers(markers, sr, n)
        plan = build_render_plan(knots=knots, grains=build_grain_table(x))
        assert plan_supported(plan), (bend, int(plan.sz.max()))
        gmax, szmax = _buckets(plan)
        out_len = 1024 * -(-plan.total_out // 1024)
        offs, gs, rb, n_valid, _, fi, fv = render_device_args(plan, x, out_len)
        want = np.asarray(
            render_device(
                jnp.asarray(x), jnp.asarray(offs), jnp.asarray(gs), jnp.asarray(rb),
                n_valid, out_len, jnp.asarray(fi), jnp.asarray(fv),
            )
        )
        got = np.asarray(
            granular_render_pallas(
                jnp.asarray(x), jnp.asarray(gs), jnp.asarray(plan.rate),
                jnp.asarray(plan.sz, jnp.int32), jnp.asarray(offs),
                out_len, jnp.asarray(fi), jnp.asarray(fv),
                gmax=gmax, szmax=szmax, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=f"bend {bend}")


def test_resample_lerp_pallas_matches_xla(rng):
    from melonix_tpu.kernels.pallas_resample import (
        BLK,
        block_bases,
        resample_lerp_pallas,
        rows_for,
    )

    n_src = 9000
    y = rng.standard_normal(n_src).astype(np.float32)
    n_out = 2 * BLK
    # Monotone positions with rate wandering in [0.6, 1.9]
    rates = (1.25 + 0.65 * np.sin(np.linspace(0, 9, n_out))).astype(np.float64)
    pos64 = np.cumsum(rates) - rates
    base = block_bases(pos64[::BLK], n_src)
    # Block-relative contract: residual vs the block's slab base, float64
    # subtraction BEFORE the f32 cast (this is what keeps hour-scale exact).
    rel = (pos64 - np.repeat(base.astype(np.float64), BLK)).astype(np.float32)
    rows = rows_for(1.9)
    got = np.asarray(
        resample_lerp_pallas(jnp.asarray(y), jnp.asarray(rel), jnp.asarray(base), rows, interpret=True)
    )
    pos_rec = np.repeat(base.astype(np.float64), BLK) + rel.astype(np.float64)
    i0 = np.clip(np.floor(pos_rec).astype(np.int64), 0, n_src - 1)
    frac = (pos_rec - np.floor(pos_rec)).astype(np.float32)
    yp = np.concatenate([y, np.zeros(8192, np.float32)])
    want = (1 - frac) * yp[i0] + frac * yp[i0 + 1]
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_resample_relative_positions_exact_at_hour_scale(rng):
    """Block-relative positions keep sub-sample precision where absolute
    f32 positions quantize to 16-sample steps (ADVICE r1 high finding):
    source offsets ~1.5e8 (an hour at 44.1 kHz)."""
    from melonix_tpu.kernels.pallas_resample import (
        BLK,
        resample_lerp_pallas,
        rows_for,
    )

    n_src = 4096
    big = 150_000_000  # pretend the slab sits this deep into the stretch
    y = rng.standard_normal(n_src).astype(np.float32)
    n_out = BLK
    rates = (1.1 + 0.4 * np.sin(np.linspace(0, 7, n_out))).astype(np.float64)
    pos64 = big + 200.0 + np.cumsum(rates) - rates
    # Absolute f32 demonstrably broken at this magnitude:
    assert np.unique(pos64.astype(np.float32)).size < n_out // 4
    base_local = np.full(1, 200 - 128 + 0, np.int32)  # slab base within y
    rel = (pos64 - big - base_local[0].astype(np.float64)).astype(np.float32)
    rows = rows_for(1.5)
    got = np.asarray(
        resample_lerp_pallas(
            jnp.asarray(y), jnp.asarray(rel), jnp.asarray(base_local), rows,
            interpret=True,
        )
    )
    local64 = pos64 - big  # float64 ground truth within the slab
    # Position error is f32-ulp-of-the-RESIDUAL (~2e-4 samples), not the
    # 16-sample ulp of absolute f32 at 1.5e8.
    pos_err = np.abs(rel.astype(np.float64) + base_local[0] - local64)
    assert pos_err.max() < 1e-3, pos_err.max()
    i0 = np.floor(local64).astype(np.int64)
    frac = (local64 - i0).astype(np.float32)
    yp = np.concatenate([y, np.zeros(8192, np.float32)])
    want = (1 - frac) * yp[i0] + frac * yp[i0 + 1]
    # Amplitude tolerance = position ulp x O(1) signal slope.
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pv_positions_rel_device_matches_float64():
    """Device block-relative position math vs float64 ground truth on a
    synthetic multi-segment bend curve (expm1 formulation, int32 dt)."""
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import (
        _anchor_table,
        _positions_rel_device,
        _segment_table,
        _src_eval64,
    )

    def _bits(x):  # f32 bit patterns, as PVPlan.anc_args ships them
        return np.asarray(x, np.float32).view(np.int32).copy()
    from melonix_tpu.kernels.pallas_resample import BLK
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 6 * sr
    markers = [
        Marker(sample=n // 4, note=57.0, d_time=0.1, pitch_bend=5.0),
        Marker(sample=n // 2, note=57.0, d_time=0.0, pitch_bend=-2.0),
        Marker(sample=3 * n // 4, note=57.0, d_time=-0.03, pitch_bend=0.002),
    ]
    knots = MapKnots.from_markers(markers, sr, n)
    n_out = int(knots.duration() * sr)
    n_out_pad = 8192 * -(-n_out // 8192)
    table = _segment_table(knots, n_out / sr)
    stretch_len = n_out_pad * 2
    anc_j, src_rel64, rho_a, s_a, base = _anchor_table(
        table, sr, n_out_pad, stretch_len
    )
    got_rel = np.asarray(
        _positions_rel_device(
            jnp.asarray(anc_j), jnp.asarray(_bits(src_rel64)),
            jnp.asarray(_bits(rho_a)), jnp.asarray(_bits(s_a)),
            n_out_pad, sr,
        )
    )
    got_abs = got_rel.astype(np.float64) + np.repeat(
        base.astype(np.float64), BLK
    )
    j = np.arange(n_out_pad, dtype=np.float64)
    want_abs, _, _ = _src_eval64(table, (j + 1.0) / sr, sr)
    # base includes SLACK so got_abs == want only where want > 0 (the clamp
    # at 0 applies to the relative value for block 0 only).  Tolerance is
    # sub-millisample: the expm1_precise series keeps f32 evaluation at
    # ~1-ulp (XLA's own f32 expm1 carries 1.2e-4 relative error, which
    # amplified to ~0.1-sample position errors before the fix).
    mask = want_abs > 1.0
    np.testing.assert_allclose(got_abs[mask], want_abs[mask], atol=2e-3)


def test_irfft_packed_matches_numpy(rng):
    """Half-size packed c2r inverse vs the float64 NumPy transform."""
    from melonix_tpu.kernels.packfft import irfft_packed

    for n in [2048, 256]:
        spec = (
            rng.standard_normal((5, n // 2 + 1))
            + 1j * rng.standard_normal((5, n // 2 + 1))
        ).astype(np.complex64)
        want = np.fft.irfft(spec.astype(np.complex128), n=n)
        got = np.asarray(
            jax.jit(partial(irfft_packed, n=n))(jnp.asarray(spec))
        )
        np.testing.assert_allclose(got, want, atol=3e-6 * np.abs(want).max())


def test_istft_device_packed_matches_native():
    """istft_device's TPU packed-inverse path vs the native c2r path, on
    CPU (the packed path is the one the real chip runs).  Local seed: the
    session rng makes the data depend on suite order, and this comparison
    sits near its tolerance."""
    from melonix_tpu.engine.spectral import hann_window, istft_device

    rng = np.random.default_rng(77)
    size, hop = 2048, 512
    F = 37
    nb = size // 2 + 1
    spec = (
        rng.standard_normal((F, nb)) + 1j * rng.standard_normal((F, nb))
    ).astype(np.complex64)
    win = jnp.asarray(hann_window(size))
    out_len = (F - 1) * hop + size
    base = np.asarray(
        istft_device(jnp.asarray(spec), win, size, hop, out_len, packed=False)
    )
    packed = np.asarray(
        istft_device(jnp.asarray(spec), win, size, hop, out_len, packed=True)
    )
    np.testing.assert_allclose(packed, base, atol=1e-5, rtol=1e-5)


def test_resample_pv_fused_matches_unfused(rng):
    """The fused positions+lerp kernel (scalar-prefetched per-anchor
    constants, positions never materialized in HBM) vs the unfused XLA
    twin (_positions_rel_device + _lerp_resample_rel_xla), interpret mode."""
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import (
        _lerp_resample_rel_xla,
        _positions_rel_device,
        _resample_pv_fused,
        build_pv_plan,
    )
    from melonix_tpu.kernels.pallas_resample import BLK, rows_for
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 3 * sr
    samples = np.sort(rng.choice(np.arange(500, n - 500), 9, replace=False))
    markers = [
        Marker(int(s), 57.0, float(rng.uniform(-0.02, 0.02)),
               float(rng.uniform(-4, 4)))
        for s in samples
    ]
    knots = MapKnots.from_markers(markers, sr, n)
    plan = build_pv_plan(knots, n)
    y = jnp.asarray(rng.standard_normal(plan.stretch_len).astype(np.float32))
    rows = rows_for(max(plan.rho_max, float(plan.rho_m.max()), 1.0))
    got = np.asarray(_resample_pv_fused(plan, y, rows, interpret=True))
    src_rel = _positions_rel_device(*plan.anc_args, plan.n_out_pad, plan.sr)
    want = np.asarray(
        _lerp_resample_rel_xla(
            y, src_rel, jnp.asarray(plan.base), plan.stretch_len, BLK
        )
    )
    # Both evaluate the same anchors with expm1_precise; residual diffs are
    # f32 fusion-order ulps through the lerp (unit-variance source).
    np.testing.assert_allclose(got[: plan.n_out], want[: plan.n_out], atol=5e-3)
    snr = 10 * np.log10(
        np.mean((got[: plan.n_out] - want[: plan.n_out]) ** 2)
        / np.mean(want[: plan.n_out] ** 2)
    )
    assert snr < -60.0, snr


def test_pv_fused_kernels_match_natural_core(rng):
    """Fused scrambled-order analysis/synthesis (interpret) vs the natural
    XLA stretch core — the TPU fast path's CPU twin.  bf16x3 matmul DFTs
    bound the divergence (~-96 dB; tolerance leaves margin)."""
    from unittest import mock

    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import (
        _chunk_arrays,
        _stretch_chunk_core,
        build_pv_plan,
    )
    from melonix_tpu.engine.spectral import hann_window
    from melonix_tpu.kernels import pallas_pv
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 3 * sr
    t = np.arange(n) / sr
    w = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 445 * t)).astype(np.float32)
    knots = MapKnots.from_markers([Marker(n // 2, 57.0, 0.03, 3.0)], sr, n)
    plan = build_pv_plan(knots, n)
    assert pallas_pv.supported(plan.size, plan.n_frames)
    win = jnp.asarray(hann_window(plan.size))
    starts, da, rho, fr = _chunk_arrays(plan, 0, plan.n_frames)
    zs = jnp.zeros(plan.size // 2 + 1, jnp.float32)
    zf = jnp.zeros(plan.size, jnp.float32)
    kw = dict(size=plan.size, hop=plan.hop, n_frames_c=plan.n_frames)
    args = (jnp.asarray(w), jnp.asarray(starts), jnp.asarray(da),
            jnp.asarray(rho), win, jnp.int32(0), jnp.int32(fr))
    base = np.asarray(_stretch_chunk_core(*args, zs, zs, zs, **kw)[0])
    # interpret threads through the core since the sharded-fused work
    # (round 4) — no mock needed.
    fused = np.asarray(
        _stretch_chunk_core(*args, zf, zf, zf, **kw, fused=True,
                            interpret=True)[0]
    )
    # PV phase propagation is chaotic (a cumsum of atan2 noise): the f32
    # natural path itself moves by ~2e-2 max / 9e-4 rms under a ONE-ULP
    # input perturbation (measured), so waveforms can only be compared in
    # rms, and the real invariant is the spectral magnitude envelope.
    scale = float(np.abs(base).max())
    rms = float(np.sqrt(np.mean((fused - base) ** 2)))
    assert rms < 5e-3 * scale, rms
    size = plan.size
    nseg = base.shape[0] // size
    f_b = np.abs(np.fft.rfft(base[: nseg * size].reshape(nseg, size), axis=1))
    f_f = np.abs(np.fft.rfft(fused[: nseg * size].reshape(nseg, size), axis=1))
    env_err = np.abs(f_f - f_b).max() / f_b.max()
    assert env_err < 2e-2, env_err


def test_pv_synth_ola_matches_istft(rng):
    """Fused synthesis+OLA kernel (interpret) vs irfft + ola_device on the
    same scrambled spectrum."""
    from melonix_tpu.engine.spectral import hann_window, ola_device
    from melonix_tpu.kernels import pallas_pv

    size, hop = 2048, 512
    F = 128
    rng2 = np.random.default_rng(7)
    mag_n = rng2.random((F, size // 2 + 1)).astype(np.float32)
    psi_n = (rng2.random((F, size // 2 + 1)) * 6.28 - 3.14).astype(np.float32)
    # natural reference
    spec = mag_n * np.exp(1j * psi_n)
    t = np.fft.irfft(spec, n=size).astype(np.float32)
    win = hann_window(size)
    out_len = (F - 1) * hop + size
    want = np.asarray(ola_device(
        jnp.asarray(t * win), jnp.asarray(win), size, hop, out_len,
        normalize=False, pre_windowed=True,
    ))
    # scrambled full-spectrum input (Hermitian mirror)
    bins = pallas_pv.scrambled_bins(size)
    full_mag = np.concatenate([mag_n, mag_n[:, -2:0:-1]], axis=1)
    full_psi = np.concatenate([psi_n, -psi_n[:, -2:0:-1]], axis=1)
    got = np.asarray(pallas_pv.synth_ola(
        jnp.asarray(full_mag[:, bins]), jnp.asarray(full_psi[:, bins]),
        jnp.asarray(win), size, hop, interpret=True,
    ))
    assert got.shape[0] >= out_len
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[:out_len], want, atol=3e-4 * scale)
    assert np.all(got[out_len:] == 0.0)


def test_resample_pv_fused_segmented_matches_one_shot(rng, monkeypatch):
    """Hour-scale tracks exceed the kernel's 1 MB SMEM anchor budget and
    render in output segments (anchor j shifted segment-relative) — force
    tiny segments and compare against the single-segment call."""
    import melonix_tpu.engine.phase_vocoder as pv
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import _resample_pv_fused, build_pv_plan
    from melonix_tpu.kernels.pallas_resample import rows_for
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 4 * sr
    markers = [
        Marker(n // 4, 57.0, 0.01, 3.0),
        Marker(n // 2, 57.0, -0.01, -2.0),
        Marker(3 * n // 4, 57.0, 0.02, 5.0),
    ]
    knots = MapKnots.from_markers(markers, sr, n)
    plan = build_pv_plan(knots, n)
    y = jnp.asarray(rng.standard_normal(plan.stretch_len).astype(np.float32))
    rows = rows_for(max(plan.rho_max, float(plan.rho_m.max()), 1.0))
    want = np.asarray(_resample_pv_fused(plan, y, rows, interpret=True))
    monkeypatch.setattr(pv, "RESAMPLE_SEG_BLOCKS", 4)  # 8192-sample segments
    got = np.asarray(_resample_pv_fused(plan, y, rows, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pv_fused_formant_matches_natural(rng):
    """Formant-preserving stretch through the fused scrambled path vs the
    natural path: same rms/envelope bounds as the plain-mode test (the
    scrambled full-spectrum cepstral projection reproduces the natural
    {1,2,...,2,1}/N weights exactly)."""
    from unittest import mock

    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import (
        _chunk_arrays,
        _stretch_chunk_core,
        build_pv_plan,
    )
    from melonix_tpu.engine.spectral import hann_window
    from melonix_tpu.kernels import pallas_pv
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 2 * sr
    t = np.arange(n) / sr
    w = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.25 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    knots = MapKnots.from_markers([Marker(n // 2, 57.0, 0.0, 4.0)], sr, n)
    plan = build_pv_plan(knots, n)
    win = jnp.asarray(hann_window(plan.size))
    starts, da, rho, fr = _chunk_arrays(plan, 0, plan.n_frames)
    zs = jnp.zeros(plan.size // 2 + 1, jnp.float32)
    zf = jnp.zeros(plan.size, jnp.float32)
    kw = dict(size=plan.size, hop=plan.hop, n_frames_c=plan.n_frames,
              formant=True)
    args = (jnp.asarray(w), jnp.asarray(starts), jnp.asarray(da),
            jnp.asarray(rho), win, jnp.int32(0), jnp.int32(fr))
    base = np.asarray(_stretch_chunk_core(*args, zs, zs, zs, **kw)[0])
    # interpret threads through the core since the sharded-fused work
    # (round 4) — no mock needed.
    fused = np.asarray(
        _stretch_chunk_core(*args, zf, zf, zf, **kw, fused=True,
                            interpret=True)[0]
    )
    scale = float(np.abs(base).max())
    rms = float(np.sqrt(np.mean((fused - base) ** 2)))
    assert rms < 5e-3 * scale, rms


def test_pv_fused_chunked_carry(rng, monkeypatch):
    """Chunked fused stretch (scrambled phase carry across chunk
    boundaries) vs the one-shot fused stretch, interpret mode."""
    from unittest import mock

    import melonix_tpu.engine.phase_vocoder as pv
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import render_track_pv
    from melonix_tpu.kernels import pallas_pv
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 3 * sr
    t = np.arange(n) / sr
    w = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    knots = MapKnots.from_markers(
        [Marker(n // 2, 57.0, 0.02, 2.0)], sr, n
    )
    # Forcing _pv_fused_ok on a CPU backend makes _render_with_plan route
    # the fused kernels through interpret mode automatically (round 4).
    with mock.patch.object(pv, "_pv_fused_ok", lambda *a: True):
        single = render_track_pv(w, knots)
        monkeypatch.setattr(pv, "PV_CHUNK_FRAMES", 64)
        chunked = render_track_pv(w, knots)
    assert len(single) == len(chunked)
    err = np.sqrt(np.mean((single - chunked) ** 2)) / (
        np.sqrt(np.mean(single**2)) + 1e-12
    )
    assert err < 2e-3, err


def test_compact_pallas_matches_fori(rng):
    """Block-compact kernel (interpret) vs the fori-loop reference —
    bit-exact, including overlap overwrite order and zero-tail healing."""
    from melonix_tpu.kernels.pallas_render import (
        _compact,
        compact_blocks,
        compact_pallas,
    )

    szmax = 512
    S = 37
    # Irregular ascending offsets incl. duplicates and sub-block steps.
    sizes = rng.integers(1, szmax, S)
    sizes[5] = 0  # zero-length step: next step overwrites at same offset
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    out_len = int(offsets[-1]) + szmax
    vals = rng.standard_normal((S, szmax)).astype(np.float32)
    want = np.asarray(
        _compact(jnp.asarray(vals), jnp.asarray(offsets, jnp.int32),
                 out_len, szmax)
    )
    nb = -(-out_len // 2048)
    a0, cnt, kmax = compact_blocks(offsets, nb)
    kmax = max(1, 1 << (kmax - 1).bit_length())
    got = np.asarray(compact_pallas(
        jnp.asarray(vals), jnp.asarray(offsets, jnp.int32),
        jnp.asarray(a0), jnp.asarray(cnt), out_len, szmax, kmax,
        interpret=True,
    ))
    np.testing.assert_array_equal(got, want)


def test_pitch_ac_pallas_matches_xla():
    """Fused autocorrelation kernel (interpret) vs the Wiener-Khinchin
    XLA formulation, and end-to-end note agreement on a real tone."""
    from melonix_tpu.kernels.pallas_pitch import pitch_ac_pallas

    rng = np.random.default_rng(5)
    sr = 44100
    frame, hop = 2048, 512
    F = 70
    n = (F - 1) * hop + frame
    t = np.arange(n) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    ac, w = pitch_ac_pallas(jnp.asarray(x), frame, hop, F, interpret=True)
    ac, w = np.asarray(ac), np.asarray(w)
    # XLA twin
    fr = np.lib.stride_tricks.sliding_window_view(x, frame)[::hop][:F]
    w_ref = fr - fr.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(w, w_ref, atol=1e-5)
    spec = np.fft.rfft(w_ref.astype(np.float64), n=2 * frame)
    ac_ref = np.fft.irfft(np.abs(spec) ** 2, n=2 * frame)[:, :frame]
    scale = np.abs(ac_ref).max()
    np.testing.assert_allclose(ac, ac_ref, atol=3e-4 * scale)


@pytest.mark.parametrize("hop", [512, 256, 1024])
def test_stft_mag_fourstep_matches_xla(hop):
    """The default TPU |STFT| kernel (four-step bf16x3, scrambled-half
    output unscrambled by one transpose) vs the XLA twin, interpret mode.
    Exercises the slab framing, the k1<64 natural-bin selection, and the
    non-multiple-of-G frame tail."""
    from melonix_tpu.kernels.pallas_pv import stft_mag_fourstep, stft_supported

    rng2 = np.random.default_rng(11)
    size = 2048
    assert stft_supported(size, hop)
    F = 70  # not a multiple of G=64
    n = (F - 1) * hop + size + 37
    x = (rng2.standard_normal(n) * 0.4).astype(np.float32)
    win = hann_window(size)
    nf = num_frames(n, size, hop)
    got = np.asarray(
        stft_mag_fourstep(jnp.asarray(x), jnp.asarray(win), size, hop, nf,
                          scale=0.5, interpret=True)
    )
    frames = np.lib.stride_tricks.sliding_window_view(
        np.pad(x.astype(np.float64), (0, size)), size
    )[::hop][:nf]
    want = 0.5 * np.abs(np.fft.rfft(frames * win.astype(np.float64)))[:, : size // 2]
    assert got.shape == (nf, size // 2)
    snr = 10 * np.log10(np.sum((got - want) ** 2) / np.sum(want**2))
    assert snr < -80.0, snr


def test_pv_synth_ola_phase_matches_xla_pipeline():
    """The in-kernel phase prologue (synth_ola_phase, interpret) against
    the XLA pipeline formulas of _stretch_chunk_core on the same scrambled
    spectrum: same princarg residual, same blocked-triangle cumsum class,
    same int32 mod-2pi ramp, same carries.

    princarg inputs within ~1 ulp of the +-pi wrap are genuinely ambiguous
    (the unwrap decision flips under any FMA/op-order difference — the
    natural path has the same cliff), so bins whose dphi grazes the
    boundary are excluded from the tight comparison and counted instead.
    """
    from melonix_tpu.engine import phase_vocoder as pv
    from melonix_tpu.kernels import pallas_pv

    size, hop = 2048, 512
    F, Gk = 192, pallas_pv.G
    rng = np.random.default_rng(0)
    mag = np.abs(rng.normal(size=(F, size))).astype(np.float32)
    phi = rng.uniform(-np.pi, np.pi, size=(F, size)).astype(np.float32)
    da = (hop * rng.uniform(0.5, 2.0, F)).astype(np.float32)
    win = np.hanning(size).astype(np.float32)
    phi0 = rng.uniform(-1, 1, size).astype(np.float32)
    resid_in = rng.uniform(-1, 1, size).astype(np.float32)
    phi_prev = rng.uniform(-np.pi, np.pi, size).astype(np.float32)

    for m0, f_real in [(0, F), (3 * F, F - 17)]:
        omega = jnp.asarray(pallas_pv.scrambled_omega(size))
        k_idx = jnp.asarray(pallas_pv.scrambled_bins(size))
        da_c = jnp.maximum(jnp.asarray(da), 1e-3)[:, None]
        phij = jnp.asarray(phi)
        prev = jnp.concatenate([jnp.asarray(phi_prev)[None], phij[:-1]], 0)
        dphi = pv._princarg(phij - prev - omega[None] * da_c)
        incr = hop * dphi / da_c
        incr = incr.at[0].set(
            jnp.where(m0 == 0, jnp.zeros_like(incr[0]), incr[0])
        )
        # blocked f32 cumsum in the kernel's carry structure
        xb = incr.reshape(F // Gk, Gk, size)
        tri = jnp.asarray(np.tril(np.ones((Gk, Gk), np.float32)))
        within = jnp.einsum(
            "ij,bjk->bik", tri, xb, preferred_element_type=jnp.float32
        )
        tots = within[:, -1]
        offs = jnp.cumsum(tots, axis=0) - tots
        cum = (within + offs[:, None]).reshape(F, size)
        resid = jnp.asarray(resid_in)[None] + cum
        m_g = m0 + jnp.arange(F, dtype=jnp.int32)
        hm = jnp.mod(m_g * hop, size)
        ramp = (2 * jnp.pi / size) * jnp.mod(
            hm[:, None] * k_idx[None], size
        ).astype(jnp.float32)
        phi0_eff_t = jnp.where(m0 == 0, phij[0], jnp.asarray(phi0))
        psis = (phi0_eff_t[None] + ramp + resid).astype(jnp.float32)
        live = (jnp.arange(F) < f_real)[:, None]
        mag_live = jnp.where(live, jnp.asarray(mag), 0.0)
        y_t = np.asarray(pallas_pv.synth_ola(
            mag_live, psis, jnp.asarray(win), size, hop, interpret=True
        ))
        last = int(np.clip(f_real - 1, 0, F - 1))

        y_k, r_k, pl_k, p0_k = pallas_pv.synth_ola_phase(
            jnp.asarray(mag), phij, jnp.asarray(da), jnp.asarray(win),
            m0, f_real, jnp.asarray(phi0), jnp.asarray(resid_in),
            jnp.asarray(phi_prev), size, hop, interpret=True,
        )
        y_k, r_k, pl_k, p0_k = map(np.asarray, (y_k, r_k, pl_k, p0_k))

        assert np.array_equal(p0_k, np.asarray(phi0_eff_t))
        assert np.array_equal(pl_k, phi[last])
        # Exclude the boundary-ambiguous bins from the tight check.
        near = np.abs(np.abs(np.asarray(dphi)) - np.pi) < 1e-3
        safe = ~near.any(axis=0)
        assert safe.mean() > 0.8, safe.mean()  # ~12% graze with uniform phases
        r_t = np.asarray(resid[last])
        assert np.abs((r_k - r_t)[safe]).max() < 1e-2
        # With uniform-random phases ~12% of bins flip at the ambiguous
        # boundary, so the waveform bound is looser than the
        # coherent-signal tests (which cover the real-audio case).
        rms = float(np.sqrt(np.mean((y_k - y_t) ** 2)))
        assert rms < 2e-2 * float(np.abs(y_t).max()), rms


def test_pv_synth_ola_phase_cartesian_mode():
    """cart=True (raw re/im in, polynomial atan2 in-kernel) against the
    mag/phi mode on the same spectrum.  The poly atan2 is ~1-2 ulp from
    libm, which the chaotic pipeline amplifies at princarg boundaries —
    compare per the rms convention, and check the phase carries directly
    (phi_last comes straight from the in-kernel atan2)."""
    from melonix_tpu.kernels import pallas_pv

    size, hop = 2048, 512
    F = 128
    rng = np.random.default_rng(3)
    re = rng.normal(size=(F, size)).astype(np.float32)
    im = rng.normal(size=(F, size)).astype(np.float32)
    re[:, 100] = 0.0
    im[:, 100] = 0.0  # silent bin: atan2(0, 0) must not NaN
    da = (hop * rng.uniform(0.8, 1.25, F)).astype(np.float32)
    win = np.hanning(size).astype(np.float32)
    zs = np.zeros(size, np.float32)
    mag = np.sqrt(re * re + im * im)
    phi = np.arctan2(im, re).astype(np.float32)

    y_m, r_m, pl_m, p0_m = map(np.asarray, pallas_pv.synth_ola_phase(
        jnp.asarray(mag), jnp.asarray(phi), jnp.asarray(da),
        jnp.asarray(win), 0, F, jnp.asarray(zs), jnp.asarray(zs),
        jnp.asarray(zs), size, hop, interpret=True))
    y_c, r_c, pl_c, p0_c = map(np.asarray, pallas_pv.synth_ola_phase(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(da),
        jnp.asarray(win), 0, F, jnp.asarray(zs), jnp.asarray(zs),
        jnp.asarray(zs), size, hop, cart=True, interpret=True))
    assert np.isfinite(y_c).all() and np.isfinite(r_c).all()
    assert np.abs(pl_c - np.arctan2(im, re)[F - 1]).max() < 1e-5
    assert np.abs(p0_c - np.arctan2(im, re)[0]).max() < 1e-5
    rms = float(np.sqrt(np.mean((y_c - y_m) ** 2)))
    assert rms < 5e-3 * float(np.abs(y_m).max()), rms


def test_pv_fused_locked_matches_natural_locked(rng):
    """Identity phase locking through the FUSED scrambled-order kernel
    (in-kernel _lock_psis, interpret) vs the natural XLA locked core —
    same fixture and tolerances as the unlocked fused-vs-natural test
    (phase chaos bounds the comparison; the envelope is the invariant)."""
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import (
        _chunk_arrays,
        _stretch_chunk_core,
        build_pv_plan,
    )
    from melonix_tpu.engine.spectral import hann_window
    from melonix_tpu.kernels import pallas_pv
    from melonix_tpu.markers import Marker

    sr = 8000
    n = 3 * sr
    t = np.arange(n) / sr
    w = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 445 * t)).astype(np.float32)
    knots = MapKnots.from_markers([Marker(n // 2, 57.0, 0.03, 3.0)], sr, n)
    plan = build_pv_plan(knots, n)
    assert pallas_pv.supported(plan.size, plan.n_frames)
    win = jnp.asarray(hann_window(plan.size))
    starts, da, rho, fr = _chunk_arrays(plan, 0, plan.n_frames)
    zs = jnp.zeros(plan.size // 2 + 1, jnp.float32)
    zf = jnp.zeros(plan.size, jnp.float32)
    kw = dict(size=plan.size, hop=plan.hop, n_frames_c=plan.n_frames)
    args = (jnp.asarray(w), jnp.asarray(starts), jnp.asarray(da),
            jnp.asarray(rho), win, jnp.int32(0), jnp.int32(fr))
    base = np.asarray(
        _stretch_chunk_core(*args, zs, zs, zs, **kw, lock=True)[0]
    )
    fused = np.asarray(
        _stretch_chunk_core(*args, zf, zf, zf, **kw, fused=True, lock=True,
                            interpret=True)[0]
    )
    scale = float(np.abs(base).max())
    rms = float(np.sqrt(np.mean((fused - base) ** 2)))
    assert rms < 5e-3 * scale, rms
    size = plan.size
    nseg = base.shape[0] // size
    f_b = np.abs(np.fft.rfft(base[: nseg * size].reshape(nseg, size), axis=1))
    f_f = np.abs(np.fft.rfft(fused[: nseg * size].reshape(nseg, size), axis=1))
    env_err = np.abs(f_f - f_b).max() / f_b.max()
    assert env_err < 2e-2, env_err
    # Locking must actually change the result (the lock flag is live).
    un = np.asarray(
        _stretch_chunk_core(*args, zf, zf, zf, **kw, fused=True,
                            interpret=True)[0]
    )
    assert float(np.sqrt(np.mean((fused - un) ** 2))) > 1e-5 * scale


def test_pv_synth_ola_phase_lock_transform():
    """The in-kernel scrambled-order lock (_lock_psis via synth_ola_phase,
    interpret) against engine.identity_lock applied to the UNSCRAMBLED
    full-spectrum psis of the same XLA twin pipeline as
    test_pv_synth_ola_phase_matches_xla_pipeline.  Same peak rule, same
    tie-to-lower-peak region split, same edge fills — the only
    differences are the twin's cumsum path (rms-bounded) and princarg
    boundary flips (excluded)."""
    from melonix_tpu.engine import phase_vocoder as pv
    from melonix_tpu.kernels import pallas_pv

    size, hop = 2048, 512
    F = 128
    rng = np.random.default_rng(7)
    # Peaky spectra: random comb lines + noise floor, Hermitian-mirrored
    # into the scrambled full-spectrum layout.
    sb = pallas_pv.scrambled_bins(size)
    mag_h = (0.01 * np.abs(rng.normal(size=(F, size // 2 + 1)))).astype(
        np.float32
    )
    for k in rng.integers(5, size // 2 - 5, 24):
        mag_h[:, k] += rng.uniform(0.5, 2.0)
        mag_h[:, k - 1] += 0.4
        mag_h[:, k + 1] += 0.4
    phi_h = rng.uniform(-np.pi, np.pi, (F, size // 2 + 1)).astype(np.float32)
    mag_n = np.concatenate([mag_h, mag_h[:, -2:0:-1]], axis=1)
    phi_n = np.concatenate([phi_h, -phi_h[:, -2:0:-1]], axis=1)
    mag, phi = mag_n[:, sb], phi_n[:, sb]  # natural -> scrambled
    da = (hop * rng.uniform(0.8, 1.25, F)).astype(np.float32)
    win = np.hanning(size).astype(np.float32)
    zf = np.zeros(size, np.float32)

    # XLA twin psis (same blocked-cumsum structure as the kernel).
    omega = jnp.asarray(pallas_pv.scrambled_omega(size))
    da_c = jnp.maximum(jnp.asarray(da), 1e-3)[:, None]
    phij = jnp.asarray(phi)
    prev = jnp.concatenate([jnp.asarray(zf)[None], phij[:-1]], 0)
    dphi = pv._princarg(phij - prev - omega[None] * da_c)
    incr = hop * dphi / da_c
    incr = incr.at[0].set(0.0)
    Gk = pallas_pv.G
    xb = incr.reshape(F // Gk, Gk, size)
    tri = jnp.asarray(np.tril(np.ones((Gk, Gk), np.float32)))
    within = jnp.einsum("ij,bjk->bik", tri, xb,
                        preferred_element_type=jnp.float32)
    tots = within[:, -1]
    offs = jnp.cumsum(tots, axis=0) - tots
    cum = (within + offs[:, None]).reshape(F, size)
    k_idx = jnp.asarray(sb)
    m_g = jnp.arange(F, dtype=jnp.int32)
    hm = jnp.mod(m_g * hop, size)
    ramp = (2 * jnp.pi / size) * jnp.mod(
        hm[:, None] * k_idx[None], size
    ).astype(jnp.float32)
    psis = (phij[0][None] + ramp + cum).astype(jnp.float32)

    # Lock in NATURAL order on the full spectrum, then rescramble.
    inv = np.empty(size, np.int64)
    inv[sb] = np.arange(size)
    psis_nat = np.asarray(psis)[:, inv]
    locked_nat = np.asarray(pv.identity_lock(
        jnp.asarray(psis_nat), jnp.asarray(phi_n), jnp.asarray(mag_n)
    ))
    locked_scr = jnp.asarray(locked_nat[:, sb])
    y_t = np.asarray(pallas_pv.synth_ola(
        jnp.asarray(mag), locked_scr, jnp.asarray(win), size, hop,
        interpret=True,
    ))

    y_k = np.asarray(pallas_pv.synth_ola_phase(
        jnp.asarray(mag), phij, jnp.asarray(da), jnp.asarray(win),
        0, F, jnp.asarray(zf), jnp.asarray(zf), jnp.asarray(zf),
        size, hop, lock=True, interpret=True,
    )[0])
    rms = float(np.sqrt(np.mean((y_k - y_t) ** 2)))
    assert rms < 2e-2 * float(np.abs(y_t).max()), rms
