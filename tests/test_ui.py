"""Editor state machine + scene renderer (headless UI)."""

import os

import numpy as np
import pytest

from melonix_tpu.config import Config
from melonix_tpu.io.wav import write_wav
from melonix_tpu.markers import Marker
from melonix_tpu.ui.state import (
    BUTTON_LEFT,
    BUTTON_MIDDLE,
    BUTTON_RIGHT,
    MENU_BAR_PX,
    MOD_ALT,
    MOD_CTRL,
    EditorState,
    Viewport,
)
from melonix_tpu.ui.view import render_scene
from melonix_tpu.ui.png import write_png

CFG = Config(spectr_size=1024, max_ranges=64)


@pytest.fixture()
def editor(chirp, tmp_path):
    x, sr = chirp
    path = str(tmp_path / "song.wav")
    write_wav(path, x, sr, dtype="float32")
    ed = EditorState(config=CFG, viewport=Viewport(200, 150))
    ed.open_file(path)
    yield ed
    if ed._tile_server:
        ed._tile_server.close()


def test_import_builds_derived_state(editor):
    assert editor.loaded
    assert len(editor.grains) > 0
    assert editor.pyramid.n_levels > 0
    assert editor.knots is not None
    assert editor.save_name == ""


def test_pan_and_clamp(editor):
    editor.range_time = 0.5  # view smaller than the 1.5 s track
    editor.start_time = 0.0
    t0 = editor.start_time
    editor.mouse_motion(100, 50, -30, 0, buttons=1 << (BUTTON_MIDDLE - 1))
    assert editor.start_time > t0  # dragging left pans right
    # Pan far beyond the right limit → clamped
    for _ in range(100):
        editor.mouse_motion(100, 50, -200, 0, buttons=1 << (BUTTON_MIDDLE - 1))
    dur = len(editor.wav) / editor.sample_rate
    right_limit = min(dur + editor.range_time * 0.5, 1.5 * dur)
    assert editor.start_time + editor.range_time <= right_limit + 1e-9


def test_zoom_about_cursor(editor):
    editor.range_time = 2.0
    editor.start_time = 0.0
    r0 = editor.range_time
    editor.mouse_motion(100, 50, 0, -10, buttons=1 << (BUTTON_MIDDLE - 1), mods=MOD_CTRL)
    assert editor.range_time < r0  # dy < 0 zooms in
    assert not editor.follow_mode


def test_note_axis_pan_clamped(editor):
    editor.mouse_motion(100, 50, 0, 500, buttons=1 << (BUTTON_MIDDLE - 1), mods=MOD_ALT)
    assert 0.0 <= editor.start_note <= 127.0 - editor.range_note + 1e-9


def test_add_select_drag_delete_marker(editor):
    W, H = editor.viewport.width, editor.viewport.height
    lane_h = editor.viewport.lane_height
    x, y = 100, MENU_BAR_PX + int(lane_h * 0.4)
    editor.mouse_button(x, y, True, BUTTON_LEFT)
    assert len(editor.markers) == 1
    assert editor.selected == 0
    m = editor.markers[0]
    # Marker sample corresponds to the clicked time through the warp map
    t = x * editor.range_time / W + editor.start_time
    assert m.sample == editor.knots.time_to_sample(t)
    assert m.d_time == 0.0

    # Drag: dTime += dx·scale, pitchBend -= dy·scale (app.cpp:829-836)
    editor.mouse_motion(x + 5, y - 4, 5, -4, buttons=1 << (BUTTON_LEFT - 1))
    assert m.d_time > 0
    assert m.pitch_bend > 0

    # Click near the marker's *bent* position selects, not re-adds
    bent_y = MENU_BAR_PX + int(
        (1.0 - (m.note - editor.start_note + m.pitch_bend) / editor.range_note) * lane_h
    )
    bent_x = int(
        (editor.knots.sample_to_time(m.sample) - editor.start_time) / editor.range_time * W
    )
    editor.mouse_button(bent_x, bent_y, True, BUTTON_LEFT)
    assert len(editor.markers) == 1

    # Right-click deletes
    editor.mouse_button(bent_x, bent_y, True, BUTTON_RIGHT)
    assert len(editor.markers) == 0
    assert editor.selected is None


def test_scrub_and_cursor_keys(editor):
    lane_h = editor.viewport.lane_height
    editor.mouse_button(50, MENU_BAR_PX + int(lane_h) + 5, True, BUTTON_LEFT)
    want = 50 * editor.range_time / editor.viewport.width + editor.start_time
    assert editor.cursor_sec == pytest.approx(min(want, editor.duration()))
    c = editor.cursor_sec
    editor.cursor_right()
    assert editor.cursor_sec > c or editor.cursor_sec == editor.duration()
    editor.cursor_left()
    editor.cursor_left()
    assert editor.cursor_sec < c + 1e-9


def test_follow_mode(editor):
    editor.is_playing = True
    editor.cursor_sec = editor.start_time + editor.range_time + 1.0
    editor.tick_follow()
    assert editor.follow_mode
    # Repeated ticks converge the view to cursor - range/5
    for _ in range(200):
        editor.tick_follow()
    assert editor.start_time == pytest.approx(
        editor.cursor_sec - editor.range_time / 5, abs=1e-6
    )


def test_save_load_project_roundtrip(editor, tmp_path):
    editor.markers = [Marker(2000, 60.0, 0.1, 2.0)]
    editor.invalidate()
    p = str(tmp_path / "proj")
    out = editor.save_project_file(p)
    assert out.endswith(".mlx")
    ed2 = EditorState(config=CFG, viewport=Viewport(200, 150))
    ed2.open_file(out)
    assert ed2.loaded
    assert len(ed2.markers) == 1 and ed2.markers[0].sample == 2000
    assert ed2.save_name == os.path.abspath(out)
    np.testing.assert_array_equal(ed2.wav, editor.wav)
    if ed2._tile_server:
        ed2._tile_server.close()


def test_save_load_melonix_roundtrip(editor, tmp_path):
    """Reference `.melonix` interop (app.cpp:1124-1190): our writer emits
    the ser layout, open_file dispatches on the extension, load rebuilds
    derived state via preproc."""
    editor.markers = [Marker(2000, 60.0, 0.1, 2.0), Marker(5000, 62.0, -0.05, -1.5)]
    editor.brightness = 70.0
    editor.tempo = 95.0
    editor.invalidate()
    out = editor.save_project_file(str(tmp_path / "session.melonix"))
    assert out.endswith(".melonix")
    ed2 = EditorState(config=CFG, viewport=Viewport(200, 150))
    ed2.open_file(out)
    assert ed2.loaded and len(ed2.grains) > 0  # preproc ran
    assert [m.sample for m in ed2.markers] == [2000, 5000]
    assert ed2.markers[1].pitch_bend == -1.5
    assert ed2.brightness == 70.0 and ed2.tempo == 95.0
    np.testing.assert_array_equal(ed2.wav, editor.wav)
    if ed2._tile_server:
        ed2._tile_server.close()


def test_melonix_layout_bytes(editor, tmp_path):
    """Byte-level check of the documented ser layout (marker.hpp:11-15,
    app.hpp:71-76): i32 version, i32-counted f32 vector, i32 rate, f32
    brightness, i32-counted markers of (i32, f64, f64, f64), f32 tempo."""
    import struct

    from melonix_tpu.io.melonix import save_melonix
    from melonix_tpu.io.project import Project, ProjectError

    wav = np.array([0.5, -0.25, 0.125], np.float32)
    p = Project(wav=wav, sample_rate=8000, markers=[Marker(7, 60.5, 0.25, -2.0)],
                brightness=33.0, tempo=120.0)
    path = save_melonix(str(tmp_path / "x"), p)
    data = open(path, "rb").read()
    want = (
        struct.pack("<i", 1)
        + struct.pack("<i", 3) + wav.tobytes()
        + struct.pack("<i", 8000) + struct.pack("<f", 33.0)
        + struct.pack("<i", 1) + struct.pack("<iddd", 7, 60.5, 0.25, -2.0)
        + struct.pack("<f", 120.0)
    )
    assert data == want
    # version mismatch = refuse load (app.cpp:1145-1149)
    bad = struct.pack("<i", 2) + data[4:]
    badp = str(tmp_path / "bad.melonix")
    open(badp, "wb").write(bad)
    from melonix_tpu.io.melonix import load_melonix

    with pytest.raises(ProjectError):
        load_melonix(badp)


def test_import_error_leaves_session_fully_usable(editor, tmp_path):
    """Fail-soft import (app.cpp:628-694): a bad file must not clobber the
    loaded session — markers, cursor, view, and rendering all survive."""
    editor.markers = [Marker(2000, 60.0, 0.1, 2.0)]
    editor.invalidate()
    editor.seek(0.5)
    editor.start_time = 0.25
    wav_before = editor.wav
    bad = str(tmp_path / "corrupt.wav")
    open(bad, "wb").write(b"not a riff at all" * 3)
    with pytest.raises(Exception):
        editor.open_file(bad)
    with pytest.raises(Exception):
        editor.open_file(str(tmp_path / "missing.melonix"))
    assert editor.loaded and editor.wav is wav_before
    assert len(editor.markers) == 1 and editor.cursor_sec == 0.5
    assert editor.start_time == 0.25
    out = str(tmp_path / "still_works.wav")
    editor.export_wav(out)  # a further render still works
    assert os.path.getsize(out) > 1000


def test_export_wav(editor, tmp_path):
    out = str(tmp_path / "out.wav")
    editor.markers = [Marker(2000, 60.0, 0.0, 3.0)]
    editor.invalidate()
    editor.export_wav(out)
    from melonix_tpu.io.wav import read_wav

    x, rate = read_wav(out)
    assert rate == editor.sample_rate
    assert len(x) > 1000


def test_render_scene_smoke(editor, tmp_path):
    editor.markers = [Marker(2000, 50.0, 0.05, 3.0)]
    editor.invalidate()
    editor.selected = 0
    editor.cursor_sec = 0.4
    editor.range_time = 1.5
    img = render_scene(editor, synchronous_tiles=True)
    H, W = editor.viewport.height, editor.viewport.width
    assert img.shape == (H, W, 3)
    # Waveform lane has magenta pixels
    wave = img[int(H * 0.9) :]
    assert (wave == np.array([255, 0, 255])).all(axis=-1).any()
    # Spectrogram lane is not all black (tiles computed synchronously)
    lane = img[MENU_BAR_PX : int(H * 0.9)]
    assert lane.sum() > 0
    # PNG snapshot encodes
    p = str(tmp_path / "scene.png")
    write_png(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_render_async_black_until_ready(editor):
    img1 = render_scene(editor, synchronous_tiles=False)
    # First frame: spectrogram mostly black (pending), but renders fine
    assert img1.shape[0] == editor.viewport.height


def test_pitch_overlay_draws_on_curve(tmp_path):
    """The detected-pitch overlay (added capability) paints orange pixels
    at the tone's note row, shifted by the local bend like the
    spectrogram preview; off by default."""
    import numpy as np

    from melonix_tpu.ui.state import EditorState, Viewport
    from melonix_tpu.ui.view import render_scene
    from melonix_tpu.io.wav import write_wav

    sr = 8000
    t = np.arange(4 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    write_wav(p, x, sr, dtype="float32")
    st = EditorState(viewport=Viewport(320, 240))
    st.open_file(p)
    base = render_scene(st, synchronous_tiles=True)
    st.set_show_pitch(True)
    assert st.pitch is not None
    over = render_scene(st, synchronous_tiles=True)
    orange = ((over[:, :, 0] == 255) & (over[:, :, 1] == 160) &
              (over[:, :, 2] == 40))
    assert orange.sum() > 100  # the curve line is visible
    assert not ((base[:, :, 0] == 255) & (base[:, :, 1] == 160) &
                (base[:, :, 2] == 40)).any()
    # Rows should sit near note 48 (220 Hz = 55*2^2 on the 55 Hz = 24
    # scale), using the scene's real lane geometry.
    from melonix_tpu.ui.view import _lane_geometry

    _, _, lane_h, spec_top, _, _ = _lane_geometry(st)
    rows, _ = np.where(orange)
    yf = 1.0 - (rows.mean() - spec_top) / (lane_h - 1)
    note = st.start_note + yf * st.range_note
    assert abs(note - 48.0) < 2.0, note
    st.set_show_pitch(False)
    off = render_scene(st, synchronous_tiles=True)
    assert not ((off[:, :, 0] == 255) & (off[:, :, 1] == 160) &
                (off[:, :, 2] == 40)).any()


def test_pitch_overlay_survives_reopen(tmp_path):
    """Opening another file while the overlay is enabled recomputes the
    curve for the new samples (the checkbox stays checked; a cleared
    cache must not silently blank the overlay forever)."""
    import numpy as np

    from melonix_tpu.io.wav import write_wav
    from melonix_tpu.ui.state import EditorState, Viewport
    from melonix_tpu.ui.view import render_scene

    sr = 8000
    t = np.arange(2 * sr) / sr
    a = str(tmp_path / "a.wav")
    b = str(tmp_path / "b.wav")
    write_wav(a, (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32),
              sr, dtype="float32")
    write_wav(b, (0.5 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32),
              sr, dtype="float32")
    st = EditorState(viewport=Viewport(320, 240))
    st.open_file(a)
    st.set_show_pitch(True)
    first = st.pitch
    assert first is not None
    st.open_file(b)
    assert st.show_pitch and st.pitch is not None and st.pitch is not first
    over = render_scene(st, synchronous_tiles=True)
    orange = ((over[:, :, 0] == 255) & (over[:, :, 1] == 160) &
              (over[:, :, 2] == 40))
    assert orange.sum() > 100  # overlay visible on the NEW file


def test_undo_redo_gestures(editor):
    """Undo/redo (added capability): add, drag, delete are each one
    gesture; undo walks back through them and redo replays, with the redo
    branch cleared by a fresh edit."""
    W = editor.viewport.width
    lane_h = editor.viewport.lane_height
    x, y = 100, MENU_BAR_PX + int(lane_h * 0.4)

    assert not editor.undo()  # empty history is a no-op
    editor.mouse_button(x, y, True, BUTTON_LEFT)  # gesture 1: add
    assert len(editor.markers) == 1
    m = editor.markers[0]

    # gesture 2: select + drag (history captured at the selection click)
    bent_y = MENU_BAR_PX + int(
        (1.0 - (m.note - editor.start_note + m.pitch_bend) / editor.range_note) * lane_h
    )
    bent_x = int(
        (editor.knots.sample_to_time(m.sample) - editor.start_time)
        / editor.range_time * W
    )
    editor.mouse_button(bent_x, bent_y, True, BUTTON_LEFT)
    editor.mouse_motion(bent_x + 8, bent_y - 6, 8, -6,
                        buttons=1 << (BUTTON_LEFT - 1))
    dragged = (editor.markers[0].d_time, editor.markers[0].pitch_bend)
    assert dragged[0] > 0 and dragged[1] > 0

    # undo the drag -> pre-drag values; undo the add -> empty
    assert editor.undo()
    assert len(editor.markers) == 1
    assert editor.markers[0].d_time == 0.0 and editor.markers[0].pitch_bend == 0.0
    assert editor.undo()
    assert editor.markers == []
    assert not editor.undo()

    # redo replays both gestures in order
    assert editor.redo()
    assert len(editor.markers) == 1 and editor.markers[0].d_time == 0.0
    assert editor.redo()
    assert (editor.markers[0].d_time, editor.markers[0].pitch_bend) == dragged
    assert not editor.redo()

    # gesture 3: delete, then undo restores the dragged marker
    m = editor.markers[0]
    bent_y = MENU_BAR_PX + int(
        (1.0 - (m.note - editor.start_note + m.pitch_bend) / editor.range_note) * lane_h
    )
    bent_x = int(
        (editor.knots.sample_to_time(m.sample) - editor.start_time)
        / editor.range_time * W
    )
    editor.mouse_button(bent_x, bent_y, True, BUTTON_RIGHT)
    assert editor.markers == []
    assert editor.undo()
    assert (editor.markers[0].d_time, editor.markers[0].pitch_bend) == dragged

    # a fresh edit clears the redo branch
    editor.mouse_button(30, MENU_BAR_PX + int(lane_h * 0.7), True, BUTTON_LEFT)
    assert not editor.redo()

    # opening a file clears history
    editor._cleanup()
    assert editor._undo == [] and editor._redo == []


def test_select_click_preserves_redo(editor):
    """A select-only click must not destroy the redo branch (review
    finding: push_history cleared it even for no-op gestures); only a
    real edit orphans redo."""
    lane_h = editor.viewport.lane_height
    editor.mouse_button(60, MENU_BAR_PX + int(lane_h * 0.3), True, BUTTON_LEFT)
    editor.mouse_button(140, MENU_BAR_PX + int(lane_h * 0.6), True, BUTTON_LEFT)
    assert len(editor.markers) == 2
    assert editor.undo()  # removes the second marker
    assert len(editor.markers) == 1
    m = editor.markers[0]
    bent_y = MENU_BAR_PX + int(
        (1.0 - (m.note - editor.start_note + m.pitch_bend) / editor.range_note) * lane_h
    )
    bent_x = int(
        (editor.knots.sample_to_time(m.sample) - editor.start_time)
        / editor.range_time * editor.viewport.width
    )
    editor.mouse_button(bent_x, bent_y, True, BUTTON_LEFT)  # select only
    assert len(editor.markers) == 1 and editor.selected == 0
    assert editor.redo()  # the undone add survives the selection click
    assert len(editor.markers) == 2


def test_undo_redo_random_gesture_fuzz(editor):
    """Property: after any gesture sequence, undoing everything restores
    the initial (empty) marker state, and redoing everything restores the
    final state; stacks never exceed the cap."""
    import random

    rng = random.Random(7)
    lane_h = editor.viewport.lane_height
    W = editor.viewport.width

    def snap():
        return [(m.sample, m.note, m.d_time, m.pitch_bend)
                for m in editor.markers]

    for _ in range(300):
        op = rng.random()
        x = rng.randrange(10, W - 10)
        y = MENU_BAR_PX + int(lane_h * rng.uniform(0.1, 0.9))
        if op < 0.4:
            editor.mouse_button(x, y, True, BUTTON_LEFT)  # add or select
        elif op < 0.55 and editor.selected is not None:
            editor.mouse_motion(x, y, rng.randrange(-9, 10),
                                rng.randrange(-9, 10),
                                buttons=1 << (BUTTON_LEFT - 1))  # drag
        elif op < 0.7:
            editor.mouse_button(x, y, True, BUTTON_RIGHT)  # delete (maybe)
        elif op < 0.8 and editor._undo:
            # Interleaved undo/redo must keep the stack capped: redo()
            # re-appends through the capped helper (regression).
            editor.undo()
        elif op < 0.9 and editor._redo:
            editor.redo()
        else:
            editor.push_history()  # spurious no-op pushes are harmless
        assert len(editor._undo) <= editor._HISTORY_CAP
    final = snap()

    while editor.undo():
        pass
    assert editor.markers == []  # every gesture rolls back

    while editor.redo():
        pass
    assert snap() == final  # and rolls forward to the same place


def test_incremental_pan_matches_full_render(chirp, tmp_path):
    """A horizontal pan must produce the same lane via the roll+partial
    gather path (_lane_rgb memo) as a cold full recomposition.

    Uses a cache that holds the viewport + margins (the production 4000-tile
    regime): with max_ranges below the working set every drain evicts, which
    is unnameable damage — keys_landed_since reports None and the memo is
    bypassed (see test_eviction_invalidates_damage_log in test_tiles)."""
    from melonix_tpu.ui import view as V

    x, sr = chirp
    path = str(tmp_path / "song.wav")
    write_wav(path, x, sr, dtype="float32")
    ed = EditorState(
        config=Config(spectr_size=1024, max_ranges=1024),
        viewport=Viewport(200, 150),
    )
    ed.open_file(path)
    try:
        ed.markers = [Marker(2000, 50.0, 0.0, 2.0)]
        ed.invalidate()
        render_scene(ed, synchronous_tiles=True)  # warm tiles + memo
        W = ed.viewport.width
        full_path_calls = 0
        orig = V._tile_block

        def counting_tile_block(*a, **kw):
            nonlocal full_path_calls
            full_path_calls += 1
            return orig(*a, **kw)

        V._tile_block = counting_tile_block
        try:
            # pan right by an integer number of key columns
            for _ in range(5):
                ed.start_time += 3 * ed.range_time / W
                inc = render_scene(ed, synchronous_tiles=True)
                assert full_path_calls == 0, "incremental path did not engage"
                ed._lane_memo = None  # force the full path (lane + waveform)
                ed._wave_memo = None
                full = render_scene(ed, synchronous_tiles=True)
                assert np.array_equal(inc, full)
                full_path_calls = 0
            # and back left
            for _ in range(5):
                ed.start_time -= 4 * ed.range_time / W
                inc = render_scene(ed, synchronous_tiles=True)
                assert full_path_calls == 0, "incremental path did not engage"
                ed._lane_memo = None
                ed._wave_memo = None
                full = render_scene(ed, synchronous_tiles=True)
                assert np.array_equal(inc, full)
                full_path_calls = 0
        finally:
            V._tile_block = orig
    finally:
        if ed._tile_server:
            ed._tile_server.close()


def test_waveform_pan_memo_exact_under_drift(chirp, tmp_path):
    """Hundreds of uneven pan steps accumulate ~1-ulp float drift in
    start_time; the waveform strip's rolled columns must still equal a
    full recomputation bit-exactly.  This holds because column times are
    a pure function of the absolute pixel column ((k0 + x)·Δt, one
    truncation per frame) in BOTH paths — computing new columns from
    ``start_time + i·Δt`` diverged at int sample boundaries in
    time_to_sample (the drift class the spectrogram lane was already
    hardened against)."""
    from melonix_tpu.ui.view import _waveform_cache

    x, sr = chirp
    path = str(tmp_path / "song.wav")
    write_wav(path, x, sr, dtype="float32")
    ed = EditorState(config=Config(spectr_size=1024), viewport=Viewport(200, 150))
    ed.open_file(path)
    try:
        ed.markers = [Marker(2000, 50.0, 0.03, 2.0)]
        ed.invalidate()
        W = ed.viewport.width
        rng = np.random.default_rng(7)
        _waveform_cache(ed, W)  # prime the memo
        for step in rng.integers(-9, 10, size=300):
            if step == 0:
                continue
            ed.start_time += float(step) * ed.range_time / W
            inc = _waveform_cache(ed, W)
            memo = ed._wave_memo
            ed._wave_memo = None
            full = _waveform_cache(ed, W)
            assert np.array_equal(inc[0], full[0]) and np.array_equal(
                inc[1], full[1]
            ), f"waveform pan memo diverged at start_time={ed.start_time!r}"
            ed._wave_memo = memo  # keep rolling the incremental strip
    finally:
        if ed._tile_server:
            ed._tile_server.close()


def test_reopen_invalidates_lane_memo(tmp_path):
    """Opening a DIFFERENT file must not serve the previous file's
    spectrogram lane: the new TileServer's epoch counter restarts near the
    memoized value, so an epoch-only memo signature collides and
    keys_landed_since reports 'no damage' against the wrong server —
    _lane_rgb/_tile_block carry open_count + server identity to break the
    collision (regression: the reopen rendered file A's lane for file B)."""
    sr = 8000
    t = np.arange(2 * sr) / sr
    a = str(tmp_path / "a.wav")
    b = str(tmp_path / "b.wav")
    write_wav(a, (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32),
              sr, dtype="float32")
    write_wav(b, (0.5 * np.sin(2 * np.pi * 2000.0 * t)).astype(np.float32),
              sr, dtype="float32")
    st = EditorState(config=CFG, viewport=Viewport(200, 150))
    try:
        st.open_file(a)
        render_scene(st, synchronous_tiles=True)
        render_scene(st, synchronous_tiles=True)  # memo stored, epoch == 1
        st.open_file(b)  # new server: epoch restarts and collides
        got = render_scene(st, synchronous_tiles=True)
    finally:
        if st._tile_server:
            st._tile_server.close()
    st2 = EditorState(config=CFG, viewport=Viewport(200, 150))
    try:
        st2.open_file(b)
        want = render_scene(st2, synchronous_tiles=True)
    finally:
        if st2._tile_server:
            st2._tile_server.close()
    assert np.array_equal(got, want), "reopen served the previous file's lane"


def test_lane_overlays_match_float_reference(editor):
    """The LUT/saturated-integer overlay pass must reproduce the float
    add->clip->truncate semantics of the reference (app.cpp:519-574)."""
    from melonix_tpu.ui import view as V

    rng = np.random.default_rng(7)
    H, W = editor.viewport.height, editor.viewport.width
    lane_h = int(editor.viewport.lane_height)
    spec_top = MENU_BAR_PX
    img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    ref = img.copy()

    # float reference: piano stripes then beat grid, each with its own
    # clip + truncating cast (the original implementation)
    i = np.arange(lane_h)
    tmp = i * editor.range_note + lane_h / 2.0
    note = (tmp / lane_h + editor.start_note).astype(int)
    c = np.where(V.BLACK_KEYS[note % 12], 128, 255).astype(np.float32)
    boundary = np.zeros(lane_h, bool)
    boundary[1:] = note[1:] != note[:-1]
    c[boundary] = 0.0
    c = c[::-1]
    lane = ref[spec_top : spec_top + lane_h].astype(np.float32)
    lane += 0.096 * c[:, None, None]
    ref[spec_top : spec_top + lane_h] = np.clip(lane, 0, 255).astype(np.uint8)
    beat = 60.0 / editor.tempo
    b = int(editor.start_time / beat)
    lane = ref[spec_top : spec_top + lane_h].astype(np.float32)
    while b * beat < editor.start_time + editor.range_time:
        px = int((b * beat - editor.start_time) * W / editor.range_time)
        if 0 <= px < W:
            alpha = 0.096 if b % 4 == 0 else 0.04
            lane[:, px] += alpha * 255.0
        b += 1
    ref[spec_top : spec_top + lane_h] = np.clip(lane, 0, 255).astype(np.uint8)

    # Production order: piano is baked into the lane block by _lane_rgb,
    # the beat grid is added per frame by _draw_lane_overlays.
    V._apply_piano(editor, img[spec_top : spec_top + lane_h], lane_h)
    V._draw_lane_overlays(editor, img, spec_top, lane_h)
    assert np.array_equal(img, ref)
