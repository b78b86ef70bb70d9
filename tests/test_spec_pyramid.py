"""HBM-resident multi-resolution spectrogram pyramid (BASELINE config #2)."""

import numpy as np

import jax.numpy as jnp

from melonix_tpu.config import Config
from melonix_tpu.engine.spectral import hann_window, num_frames, stft_device
from melonix_tpu.runtime.spec_pyramid import SpecPyramid
from melonix_tpu.runtime.tiles import TileServer


def _cfg():
    return Config(stft_size=512, stft_hop=128, tile_source="pyramid")


def test_levels_geometry(chirp):
    x, _sr = chirp
    cfg = _cfg()
    p = SpecPyramid(x, config=cfg)
    assert p.hops[0] == cfg.stft_hop
    for a, b in zip(p.hops, p.hops[1:]):
        assert b == 2 * a
    # levels shrink geometrically; last level is small
    assert p.levels[-1].shape[0] <= 64
    assert p.nbytes() > 0
    # level 0 matches a direct |STFT|
    nf = num_frames(len(x), cfg.stft_size, cfg.stft_hop)
    win = jnp.asarray(hann_window(cfg.stft_size))
    want = np.abs(
        np.asarray(stft_device(jnp.asarray(x), win, cfg.stft_size, cfg.stft_hop, nf))
    )[:, : cfg.stft_size // 2]
    got = np.asarray(p.levels[0])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_level_selection(chirp):
    x, _sr = chirp
    p = SpecPyramid(x, config=_cfg())
    assert p.level_for(1) == 0
    assert p.level_for(p.hops[0]) == 0
    assert p.level_for(p.hops[1]) == 1
    assert p.level_for(10**9) == len(p.hops) - 1


def test_compute_columns_gathers_right_frames(chirp):
    x, _sr = chirp
    cfg = _cfg()
    p = SpecPyramid(x, config=cfg)
    # Columns one hop wide at level 0: frame index (end - size) // hop
    ends = np.asarray([cfg.stft_size + 5 * cfg.stft_hop, cfg.stft_size + 9 * cfg.stft_hop])
    starts = ends - cfg.stft_hop
    got = p.compute_columns(starts, ends)
    want = np.asarray(p.levels[0])[[5, 9]] * np.float32(2.0 / cfg.stft_size)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # A very wide column selects a coarse level but still returns n_bins
    wide = p.compute_columns([0], [len(x)])
    assert wide.shape == (1, cfg.stft_size // 2)
    assert np.isfinite(wide).all()


def test_pyramid_through_tile_server_and_state(chirp):
    x, sr = chirp
    cfg = _cfg()
    p = SpecPyramid(x, config=cfg)
    server = TileServer(
        x, k=cfg.brightness_to_k(), config=cfg, compute=p.compute_columns,
        synchronous=True,
    )
    tile = server.get_tile(0, 0, cfg.stft_hop * 4)
    server.close()
    assert tile is not None and tile.shape == (cfg.tile_texels, 3)

    # EditorState wires the pyramid automatically when configured
    from melonix_tpu.io.wav import write_wav
    import tempfile, os

    from melonix_tpu.ui.state import EditorState
    from melonix_tpu.ui.view import render_scene

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    try:
        write_wav(path, x, sr, dtype="float32")
        ed = EditorState(config=cfg)
        ed.open_file(path)
        assert ed.spec_pyramid is not None
        img = render_scene(ed, synchronous_tiles=True)
        assert img.shape[2] == 3 and img.any()
        if ed._tile_server:
            ed._tile_server.close()
    finally:
        os.unlink(path)
