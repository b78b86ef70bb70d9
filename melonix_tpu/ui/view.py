"""Headless scene renderer — the glDraw equivalent (app.cpp:428-622).

Renders the full editor scene to a uint8 RGB raster: waveform lane (bottom
10%, magenta min/max), spectrogram lane (log-frequency semitone rows shifted
by the local pitch bend so the drawn spectrogram previews the edit,
app.cpp:497-513), piano-roll key stripes (alpha 0.096, A-based black-key
mask, app.cpp:519-556), beat grid (app.cpp:561-574), marker glyphs
(app.cpp:591-622), and the scrubber (app.cpp:578-588).

Being a plain array renderer makes the UI testable headless and displayable
by any shell (SDL, notebook, PNG snapshot).  Columns whose spectra are still
pending draw black and repoll — the async contract (spec-cache.cpp:67-71).
"""

from __future__ import annotations

import numpy as np

from .state import MENU_BAR_PX, EditorState

MAGENTA = np.array([255, 0, 255], np.uint8)
PINK = np.array([255, 0, 128], np.float32)
GREY = np.array([128, 128, 128], np.uint8)
CYAN = np.array([0, 255, 255], np.uint8)
BLUE = np.array([0, 128, 255], np.uint8)

# A-based black-key mask (app.cpp:531-532): note%12 == 0 is an A.
BLACK_KEYS = np.array([0, 1, 0, 0, 1, 0, 1, 0, 0, 1, 0, 1], bool)


def _lane_geometry(state: EditorState):
    W = state.viewport.width
    H = state.viewport.height
    lane_h = int(state.viewport.lane_height)
    spec_top = MENU_BAR_PX
    wave_top = spec_top + lane_h
    wave_h = H - wave_top
    return W, H, lane_h, spec_top, wave_top, wave_h


def render_scene(state: EditorState, *, synchronous_tiles: bool = False) -> np.ndarray:
    W, H, lane_h, spec_top, wave_top, wave_h = _lane_geometry(state)
    img = np.zeros((H, W, 3), np.uint8)
    if not state.loaded:
        return img

    col_maps = _draw_spectrogram(state, img, spec_top, lane_h, synchronous_tiles)
    _draw_piano(state, img, spec_top, lane_h)
    _draw_beat_grid(state, img, spec_top, lane_h)
    _draw_markers(state, img, spec_top, lane_h)
    _draw_pitch_curve(state, img, spec_top, lane_h, col_maps)
    _draw_waveform(state, img, wave_top, wave_h)
    _draw_scrubber(state, img)
    return img


def _draw_waveform(state: EditorState, img, wave_top: int, wave_h: int) -> None:
    """Bottom lane: per-pixel min/max from the pyramid (app.cpp:451-476)."""
    W = state.viewport.width
    mn, mx = _waveform_cache(state, W)
    # y: value +1 → lane top, -1 → lane bottom (glOrtho(0,W, 1,-1))
    y0 = ((1.0 - mx) * 0.5 * (wave_h - 1)).astype(int) + wave_top
    y1 = ((1.0 - mn) * 0.5 * (wave_h - 1)).astype(int) + wave_top
    for x in range(W):
        img[y0[x] : y1[x] + 1, x] = MAGENTA


def _waveform_cache(state: EditorState, width: int):
    from ..engine.pyramid import waveform_strip

    return waveform_strip(
        state.pyramid, state.wav, state.knots, width, state.start_time, state.range_time
    )


def _draw_spectrogram(state, img, spec_top: int, lane_h: int, synchronous: bool):
    """Draws the lane and returns the per-column (ts, src_samples, bends)
    map evaluations so overlays reuse them instead of re-walking the
    piecewise maps for the same frame."""
    W = state.viewport.width
    sr = state.sample_rate
    texels = state.config.tile_texels

    server = state.tile_server
    if synchronous and server is not None and not server._synchronous:
        # Swap in a synchronous server for deterministic rendering
        from ..runtime.tiles import TileServer

        server.close()
        server = state._tile_server = TileServer(
            state.wav,
            k=state.config.brightness_to_k(state.brightness),
            config=state.config,
            compute=(
                state.spec_pyramid.compute_columns
                if state.spec_pyramid is not None
                else None
            ),
            synchronous=True,
        )

    # Per-column warped-time, sample range, and pitch bend (vectorized maps),
    # computed once over the viewport plus a quarter-viewport margin each
    # side so panning hits warm tiles (key = absolute pixel-column index,
    # spec-cache.cpp:12 — identical formula for margin and visible columns).
    margin = W // 4
    ts_m = state.start_time + np.arange(-margin, W + margin + 1) * state.range_time / W
    samples_m = state.knots.time_to_sample(ts_m)
    keys_m = (ts_m[:-1] * W / state.range_time).astype(np.int64)
    ts = ts_m[margin : margin + W + 1]
    samples = samples_m[margin : margin + W + 1]
    keys = keys_m[margin : margin + W]
    bends = state.knots.time_to_pitch_bend(ts[:-1])
    server.prefetch(
        [
            (int(keys_m[i]), int(samples_m[i]), int(samples_m[i + 1]))
            for i in range(len(keys_m))
        ]
    )
    tiles = np.zeros((W, texels, 3), np.uint8)
    for x in range(W):
        tile = server.get_tile(keys[x], int(samples[x]), int(samples[x + 1]))
        if tile is not None and tile.shape[0] == texels:
            tiles[x] = tile

    # Visual note offset per pixel row (row 0 = lane top)
    rows = np.arange(lane_h)
    v = (1.0 - rows / max(lane_h - 1, 1)) * state.range_note  # (laneH,)
    # Source note per (row, col): the drawn rows are shifted up by the bend.
    n = state.start_note + v[:, None] - bends[None, :]
    freq = 55.0 * 2.0 ** ((n - 24.0) / 12.0)
    frac = freq / (sr / 2.0)
    # Tiles are log-frequency texel strips (runtime/tiles.py)
    from ..runtime.tiles import texel_of_frac

    tex_idx = texel_of_frac(frac, texels, state.config.tile_frac_min)
    # Visible quads span source notes [startNote, startNote + int(rangeNote))
    valid = (
        (n >= state.start_note)
        & (n < state.start_note + int(state.range_note))
        & (frac > 0)
        & (frac <= 1.0)
    )
    cols = np.broadcast_to(np.arange(W)[None, :], tex_idx.shape)
    rgb = tiles[cols, tex_idx]  # (laneH, W, 3)
    rgb[~valid] = 0
    img[spec_top : spec_top + lane_h] = rgb
    return ts[:-1], samples[:-1], bends


def _draw_piano(state, img, spec_top: int, lane_h: int) -> None:
    """Key stripes overlay, alpha 0.096 (app.cpp:519-556)."""
    i = np.arange(lane_h)  # texture index, 0 = lane bottom
    tmp = i * state.range_note + lane_h / 2.0
    note = (tmp / lane_h + state.start_note).astype(int)
    is_black = BLACK_KEYS[note % 12]
    c = np.where(is_black, 128, 255).astype(np.float32)
    boundary = np.zeros(lane_h, bool)
    boundary[1:] = note[1:] != note[:-1]
    c[boundary] = 0.0  # key-boundary rows go black (note != lastNote)
    # Flip: row index 0 is lane *top* in the raster
    c = c[::-1]
    lane = img[spec_top : spec_top + lane_h].astype(np.float32)
    lane += 0.096 * c[:, None, None]
    img[spec_top : spec_top + lane_h] = np.clip(lane, 0, 255).astype(np.uint8)


def _draw_beat_grid(state, img, spec_top: int, lane_h: int) -> None:
    W = state.viewport.width
    beat = 60.0 / state.tempo
    b0 = int(state.start_time / beat)
    b = b0
    lane = img[spec_top : spec_top + lane_h].astype(np.float32)
    while b * beat < state.start_time + state.range_time:
        px = int((b * beat - state.start_time) * W / state.range_time)
        if 0 <= px < W:
            alpha = 0.096 if b % 4 == 0 else 0.04
            lane[:, px] += alpha * 255.0
        b += 1
    img[spec_top : spec_top + lane_h] = np.clip(lane, 0, 255).astype(np.uint8)


def _draw_x(img, x: int, y: int, color, size: int = 3) -> None:
    H, W, _ = img.shape
    for d in range(-size, size + 1):
        for (yy, xx) in ((y + d, x + d), (y - d, x + d)):
            if 0 <= yy < H and 0 <= xx < W:
                img[yy, xx] = color


def _draw_markers(state, img, spec_top: int, lane_h: int) -> None:
    """Grey anchor X at the unwarped position, cyan/blue X at warped+bent
    position, connecting line (app.cpp:591-622)."""
    W = state.viewport.width
    for i, m in enumerate(state.markers):
        t_warp = state.knots.sample_to_time(m.sample)
        x0 = (t_warp - state.start_time - m.d_time) * W / state.range_time
        y0v = (m.note - state.start_note) / state.range_note  # 0..1 bottom-up
        x1 = (t_warp - state.start_time) * W / state.range_time
        y1v = (m.note - state.start_note + m.pitch_bend) / state.range_note

        def to_px(xf, yf):
            return int(xf), spec_top + int((1.0 - yf) * (lane_h - 1))

        p0 = to_px(x0, y0v)
        p1 = to_px(x1, y1v)
        _line(img, p0, p1, GREY)
        _draw_x(img, *p0, GREY)
        color = CYAN if state.selected == i else BLUE
        _draw_x(img, *p1, color)


def _line(img, p0, p1, color) -> None:
    x0, y0 = p0
    x1, y1 = p1
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.linspace(x0, x1, n + 1).astype(int)
    ys = np.linspace(y0, y1, n + 1).astype(int)
    H, W, _ = img.shape
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    img[ys[ok], xs[ok]] = color


def _draw_pitch_curve(state, img, spec_top: int, lane_h: int,
                      col_maps=None) -> None:
    """Detected-pitch overlay (added capability): the NSDF curve
    (engine/pitch.py) drawn in orange over the spectrogram, shifted by
    the local bend exactly like the spectrogram rows so the overlay
    previews the edit too.  Unvoiced frames draw nothing."""
    if not getattr(state, "show_pitch", False) or state.pitch is None:
        return
    curve = state.pitch
    W = state.viewport.width
    if col_maps is not None:
        # Reuse the spectrogram pass's per-column map evaluations (pixel
        # left edges — within half a pixel of the old center convention).
        _ts, src, bends = col_maps
        src = np.asarray(src, np.float64)
        bends = np.asarray(bends, np.float64)
    else:
        ts = state.start_time + (np.arange(W) + 0.5) * state.range_time / W
        # The curve indexes SOURCE samples; map warped view time -> source.
        src = np.asarray(state.knots.time_to_sample(ts), np.float64)
        bends = np.asarray(state.knots.time_to_pitch_bend(ts), np.float64)
    idx = np.clip((src / curve.hop).astype(np.int64), 0, len(curve.note) - 1)
    voiced = np.asarray(curve.voiced)[idx]
    note = np.asarray(curve.note, np.float64)[idx]
    # Drawn position = source note + bend (the preview convention,
    # app.cpp:497: rows shift by the local pitch bend).
    yf = (note + bends - state.start_note) / state.range_note
    rows = spec_top + ((1.0 - yf) * (lane_h - 1)).round().astype(np.int64)
    ok = voiced & (rows >= spec_top) & (rows < spec_top + lane_h)
    cols = np.arange(W)[ok]
    rr = rows[ok]
    for d in (-1, 0, 1):  # 3-px line for visibility
        r2 = np.clip(rr + d, spec_top, spec_top + lane_h - 1)
        img[r2, cols] = (255, 160, 40)


def _draw_scrubber(state, img) -> None:
    """Translucent pink cursor line over both lanes (app.cpp:578-588)."""
    W = state.viewport.width
    H = state.viewport.height
    x = int((state.cursor_sec - state.start_time) / state.range_time * W)
    if 0 <= x < W:
        col = img[MENU_BAR_PX:H, x].astype(np.float32)
        img[MENU_BAR_PX:H, x] = np.clip(col * 0.75 + 0.25 * PINK, 0, 255).astype(np.uint8)
