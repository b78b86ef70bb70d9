"""Multi-chip sharding on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melonix_tpu.engine import spectral as S
from melonix_tpu.engine.grains import build_grain_table
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.render import build_render_plan, render
from melonix_tpu.markers import Marker
from melonix_tpu.parallel import (
    data_parallel_render,
    make_audio_mesh,
    sharded_spectrogram_columns,
    sharded_stft_mags,
    session_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_audio_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["data"] * mesh.shape["seq"] == 8


def test_sharded_stft_matches_single_device(chirp, mesh):
    x, _sr = chirp
    size, hop = 256, 64
    n_seq = mesh.shape["seq"]
    n = len(x) // (n_seq * hop) * (n_seq * hop)
    x = x[:n]
    win = jnp.asarray(S.hann_window(size))

    got = np.asarray(sharded_stft_mags(jnp.asarray(x), win, mesh, size=size, hop=hop))
    # Single-device reference: same frame convention, zero-padded tail
    nf = n // hop
    ref_spec = S.stft_device(jnp.asarray(x), win, size, hop, nf)
    want = np.abs(np.asarray(ref_spec))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_spectrogram_columns(chirp, mesh):
    x, _sr = chirp
    size = 1024
    n_seq = mesh.shape["seq"]
    starts = np.arange(0, 8 * n_seq, dtype=np.int32) * 100
    ends = starts + 900
    got = np.asarray(
        sharded_spectrogram_columns(
            jnp.asarray(x), jnp.asarray(starts), jnp.asarray(ends), mesh, size=size
        )
    )
    want = S.spectrogram_columns(x, starts, ends, S.DEFAULT_CONFIG.__class__(spectr_size=size))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _padded_plans(x, sr, marker_sets):
    plans = []
    table = build_grain_table(x, backend="numpy")
    for ms in marker_sets:
        knots = MapKnots.from_markers(ms, sr, len(x))
        plans.append(build_render_plan(table, knots))
    S_max = max(p.n_steps for p in plans)
    out_max = max(int(p.out_offset[-1]) for p in plans)
    B = len(plans)
    gs = np.zeros((B, S_max), np.int32)
    gl = np.ones((B, S_max), np.int32)
    rt = np.ones((B, S_max), np.float32)
    oo = np.full((B, S_max + 1), 2**30, np.int32)
    ss = np.full((B, S_max), -1, np.int32)
    nv = np.zeros((B,), np.int32)
    for b, p in enumerate(plans):
        s = p.n_steps
        gs[b, :s] = p.grain_start
        gl[b, :s] = p.grain_len
        rt[b, :s] = p.rate
        oo[b, : s + 1] = p.out_offset
        oo[b, s + 1 :] = p.out_offset[-1] + 1 + np.arange(S_max - s)
        ss[b, :s] = p.seam_src
        nv[b] = p.out_offset[-1]
    return plans, gs, gl, rt, oo, ss, nv, out_max


def test_data_parallel_render_matches_serial(chirp, mesh):
    x, sr = chirp
    d = mesh.shape["data"]
    marker_sets = [
        [],
        [Marker(4000, 60.0, 0.0, 2.0)],
        [Marker(2000, 60.0, 0.1, -1.0)],
        [Marker(6000, 60.0, -0.05, 5.0)],
    ][: max(d, 2)]
    while len(marker_sets) % d:
        marker_sets.append([])
    plans, gs, gl, rt, oo, ss, nv, out_max = _padded_plans(x, sr, marker_sets)
    out_len = 1024 * -(-out_max // 1024)
    B = len(plans)
    wav_b = jnp.asarray(np.tile(x, (B, 1)))
    got = np.asarray(
        data_parallel_render(
            wav_b,
            jnp.asarray(gs), jnp.asarray(gl), jnp.asarray(rt),
            jnp.asarray(oo), jnp.asarray(ss), jnp.asarray(nv),
            mesh, out_len,
        )
    )
    for b, p in enumerate(plans):
        want = render(x, p, include_tail=False)
        n = int(p.out_offset[-1])
        np.testing.assert_allclose(got[b, :n], want, atol=2e-6, err_msg=f"track {b}")
        assert np.all(got[b, n:] == 0)


def test_session_step_end_to_end(chirp, mesh):
    """The full multi-chip pipeline step compiles and runs (dryrun shape)."""
    x, sr = chirp
    size, hop = 256, 64
    d = mesh.shape["data"]
    n_seq = mesh.shape["seq"]
    n = len(x) // (n_seq * hop) * (n_seq * hop)
    x = x[:n]
    marker_sets = [[] for _ in range(d)]
    plans, gs, gl, rt, oo, ss, nv, out_max = _padded_plans(x, sr, marker_sets)
    out_len = 1024 * -(-out_max // 1024)
    B = len(plans)
    wav_b = jnp.asarray(np.tile(x, (B, 1)))
    win = jnp.asarray(S.hann_window(size))
    step = session_step(mesh, stft_size=size, stft_hop=hop)
    mags, rendered = step(
        wav_b, win,
        jnp.asarray(gs), jnp.asarray(gl), jnp.asarray(rt),
        jnp.asarray(oo), jnp.asarray(ss), jnp.asarray(nv),
        out_len,
    )
    assert mags.shape == (B, n // hop, size // 2 + 1)
    assert rendered.shape == (B, out_len)
    assert np.isfinite(np.asarray(mags)).all()


def test_sharded_pitch_matches_single_device(chirp, mesh):
    from melonix_tpu.engine.pitch import _pitch_device
    from melonix_tpu.parallel import sharded_pitch

    x, sr = chirp
    frame, hop = 1024, 256
    n_seq = mesh.shape["seq"]
    quant = n_seq * hop
    n = quant * (len(x) // quant)
    x = x[:n]
    lag_min = max(2, int(sr / 1760.0))
    lag_max = min(frame - 2, int(sr / 55.0))

    lag_s, cl_s, en_s = sharded_pitch(
        jnp.asarray(x), mesh, frame=frame, hop=hop, lag_min=lag_min, lag_max=lag_max
    )
    nf = 1 + (n - frame) // hop
    lag_1, cl_1, en_1 = _pitch_device(jnp.asarray(x), frame, hop, nf, lag_min, lag_max)
    k = min(len(np.asarray(lag_s)), nf)
    np.testing.assert_allclose(np.asarray(lag_s)[:k], np.asarray(lag_1)[:k], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cl_s)[:k], np.asarray(cl_1)[:k], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(en_s)[:k], np.asarray(en_1)[:k], rtol=1e-5)
