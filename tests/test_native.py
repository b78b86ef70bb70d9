"""Native C++ runtime parity vs the NumPy implementations."""

import numpy as np
import pytest

from melonix_tpu.config import DEFAULT_CONFIG
from melonix_tpu.engine.grains import build_grain_table
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.render import build_render_plan
from melonix_tpu.markers import Marker
from melonix_tpu.runtime import native


@pytest.fixture(scope="module")
def lib():
    lib = native.try_load()
    if lib is None:
        pytest.skip("native runtime not built (make -C native)")
    return lib


def test_grains_native_parity(chirp, lib):
    x, _sr = chirp
    a = build_grain_table(x, backend="numpy")
    b = build_grain_table(x, backend="native")
    np.testing.assert_array_equal(a.starts, b.starts)
    np.testing.assert_array_equal(a.lengths, b.lengths)


@pytest.mark.parametrize(
    "markers",
    [
        [],
        [Marker(4000, 60.0, 0.0, 2.0)],
        [Marker(4000, 60.0, 0.3, -3.0)],
        [Marker(2000, 60.0, 0.1, 1.0), Marker(8000, 62.0, -0.05, -1.0)],
        [Marker(3000, 60.0, 0.0, 12.0)],
    ],
)
def test_plan_native_parity(chirp, markers, lib):
    x, sr = chirp
    table = build_grain_table(x, backend="numpy")
    knots = MapKnots.from_markers(markers, sr, len(x))
    a = build_render_plan(table, knots, backend="numpy")
    b = build_render_plan(table, knots, backend="native")
    assert a.n_steps == b.n_steps
    np.testing.assert_array_equal(a.grain_start, b.grain_start)
    np.testing.assert_array_equal(a.grain_len, b.grain_len)
    np.testing.assert_array_equal(a.sz, b.sz)
    np.testing.assert_array_equal(a.seam_src, b.seam_src)
    np.testing.assert_array_equal(a.rate, b.rate)  # powf vs np float32 pow
    assert a.tail_zeros == b.tail_zeros


def test_plan_native_streaming(chirp, lib):
    x, sr = chirp
    table = build_grain_table(x)
    knots = MapKnots.from_markers([Marker(4000, 60.0, 0.0, 2.0)], sr, len(x))
    a = build_render_plan(table, knots, start_cursor=0.4, min_out=3000, backend="numpy")
    b = build_render_plan(table, knots, start_cursor=0.4, min_out=3000, backend="native")
    assert a.n_steps == b.n_steps
    np.testing.assert_array_equal(a.out_offset, b.out_offset)


def test_native_pyramid_minmax(chirp, lib, rng):
    import ctypes

    x, _sr = chirp
    n = len(x)
    cap = n  # total pyramid floats < n
    mins = np.zeros(cap, np.float32)
    maxs = np.zeros(cap, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    levels = lib.mlx_calc_picks(x.ctypes.data_as(f32p), n, mins.ctypes.data_as(f32p), maxs.ctypes.data_as(f32p), cap)
    assert levels > 5
    # Parity with NumPy pyramid
    from melonix_tpu.engine.pyramid import build_pyramid

    pyr = build_pyramid(x, device=False)
    assert levels == pyr.n_levels
    off = 0
    for l in range(levels):
        sz = n >> (l + 1)
        np.testing.assert_array_equal(mins[off : off + len(pyr.mins[l])], pyr.mins[l])
        np.testing.assert_array_equal(maxs[off : off + len(pyr.maxs[l])], pyr.maxs[l])
        off += sz

    # Range queries vs brute force
    qs = rng.integers(0, n - 100, 50)
    qe = qs + rng.integers(1, 90, 50)
    queries = np.stack([qs, qe], axis=1).astype(np.int64).ravel()
    omn = np.zeros(50, np.float32)
    omx = np.zeros(50, np.float32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mlx_minmax_range(
        x.ctypes.data_as(f32p), n,
        mins.ctypes.data_as(f32p), maxs.ctypes.data_as(f32p), levels,
        queries.ctypes.data_as(i64p), 50,
        omn.ctypes.data_as(f32p), omx.ctypes.data_as(f32p),
    )
    for i in range(50):
        s, e = int(qs[i]), int(qe[i])
        assert omn[i] == x[s:e].min(), (s, e)
        assert omx[i] == x[s:e].max(), (s, e)


def test_native_lru():
    lib = native.try_load()
    if lib is None:
        pytest.skip("native runtime not built")
    h = lib.mlx_lru_new(3)
    import ctypes

    ev = ctypes.c_int64(-1)
    try:
        assert lib.mlx_lru_get(h, 1) == -1
        for k in range(3):
            lib.mlx_lru_put(h, k, k * 10, ctypes.byref(ev))
        assert lib.mlx_lru_size(h) == 3
        assert lib.mlx_lru_get(h, 0) == 0  # touch
        assert lib.mlx_lru_put(h, 3, 30, ctypes.byref(ev)) == 1
        assert ev.value == 10  # key 1 (oldest) evicted; its value returned
        assert lib.mlx_lru_get(h, 1) == -1
        assert lib.mlx_lru_get(h, 0) == 0
    finally:
        lib.mlx_lru_free(h)


def test_native_ring():
    lib = native.try_load()
    if lib is None:
        pytest.skip("native runtime not built")
    import ctypes

    f32p = ctypes.POINTER(ctypes.c_float)
    h = lib.mlx_ring_new(1024)
    try:
        data = np.arange(600, dtype=np.float32)
        assert lib.mlx_ring_write(h, data.ctypes.data_as(f32p), 600) == 600
        assert lib.mlx_ring_avail(h) == 600
        out = np.zeros(300, np.float32)
        assert lib.mlx_ring_read(h, out.ctypes.data_as(f32p), 300) == 300
        np.testing.assert_array_equal(out, data[:300])
        # Wrap-around
        data2 = np.arange(700, dtype=np.float32) + 1000
        assert lib.mlx_ring_write(h, data2.ctypes.data_as(f32p), 700) == 700
        out2 = np.zeros(1000, np.float32)
        assert lib.mlx_ring_read(h, out2.ctypes.data_as(f32p), 1000) == 1000
        np.testing.assert_array_equal(out2[:300], data[300:600])
        np.testing.assert_array_equal(out2[300:], data2)
        lib.mlx_ring_clear(h)
        assert lib.mlx_ring_avail(h) == 0
    finally:
        lib.mlx_ring_free(h)


def test_native_ring_concurrent_clear():
    """clear() from a control thread must never corrupt the consumer, and a
    flush must actually take effect at the consumer's next read/avail (the
    ADVICE r1 race: a consumer tail store overwriting a control-thread
    clear silently kept stale pre-edit audio playing)."""
    lib = native.try_load()
    if lib is None:
        pytest.skip("native runtime not built")
    import ctypes
    import threading

    f32p = ctypes.POINTER(ctypes.c_float)
    h = lib.mlx_ring_new(4096)
    stop = threading.Event()

    def control():  # the edit thread: hammer clear
        while not stop.is_set():
            lib.mlx_ring_clear(h)

    t = threading.Thread(target=control)
    t.start()
    try:
        data = np.arange(512, dtype=np.float32)
        out = np.zeros(512, np.float32)
        for _ in range(3000):
            lib.mlx_ring_write(h, data.ctypes.data_as(f32p), 512)
            got = lib.mlx_ring_read(h, out.ctypes.data_as(f32p), 512)
            assert 0 <= got <= 512
            if got:  # whatever survives the flush must be prefix-intact
                np.testing.assert_array_equal(out[:got], data[:got])
    finally:
        stop.set()
        t.join()
    # With the control thread quiet, a clear is applied by the next avail.
    lib.mlx_ring_write(h, data.ctypes.data_as(f32p), 512)
    lib.mlx_ring_clear(h)
    assert lib.mlx_ring_avail(h) == 0
    lib.mlx_ring_free(h)


def test_native_wav_decoder(chirp, tmp_path):
    from melonix_tpu.io.wav import write_wav, read_wav
    from melonix_tpu.io.audio import downmix_mono
    from melonix_tpu.runtime import native

    lib = native.try_load()
    if lib is None or not hasattr(lib, "mlx_wav_info"):
        pytest.skip("native runtime not built")
    x, sr = chirp
    stereo = np.stack([x, -0.5 * x], axis=1).astype(np.float32)
    for dtype in ("float32", "int16"):
        p = str(tmp_path / f"st_{dtype}.wav")
        write_wav(p, stereo, sr, dtype=dtype)
        want, wrate = read_wav(p)
        got_m, rate = native.decode_wav(lib, p, mono=True)
        got_s, rate2 = native.decode_wav(lib, p, mono=False)
        assert rate == wrate == rate2 == sr
        np.testing.assert_allclose(got_s, want, atol=1e-6)
        np.testing.assert_allclose(got_m, downmix_mono(want), atol=1e-6)
    # corrupt file → error, not crash
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"garbage garbage garbage")
    with pytest.raises(ValueError):
        native.decode_wav(lib, bad)
