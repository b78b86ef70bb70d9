"""Playback engine: backlog semantics, export consistency, stop behavior."""

import numpy as np

from melonix_tpu.engine.grains import build_grain_table
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.player import Player
from melonix_tpu.engine.render import render_track
from melonix_tpu.markers import Marker


def make_player(chirp, markers):
    x, sr = chirp
    table = build_grain_table(x, backend="numpy")
    knots = MapKnots.from_markers(markers, sr, len(x))
    return Player(x, table, knots), x, table, knots


def test_playback_matches_export(chirp):
    """Streaming from t=0 produces exactly the offline export stream
    (same engine — SURVEY.md §3.4 ground truth)."""
    markers = [Marker(4000, 60.0, 0.02, 2.0)]
    player, x, table, knots = make_player(chirp, markers)
    want = render_track(x, table, knots)

    player.toggle()
    got = []
    for _ in range(1000):
        buf = player.callback(1024)
        got.append(buf)
        if not player.is_playing:
            break
    got = np.concatenate(got)
    # Full delivery: auto-stop happens only after the backlog — remaining
    # real audio plus the reference's 1500-zero tail (app.cpp:303-309) —
    # has been streamed, so playback covers the complete export (the
    # reference's stop-at-fill truncated the track end; we implement the
    # intended behavior, SURVEY.md §2 quirks note).
    assert len(got) >= len(want)
    np.testing.assert_allclose(got[: len(want)], want, atol=2e-6)
    assert np.abs(got[len(want) :]).max(initial=0.0) == 0.0  # only padding


def test_stops_at_end(chirp):
    player, *_ = make_player(chirp, [])
    player.toggle()
    for _ in range(2000):
        player.callback(1024)
        if not player.is_playing:
            break
    assert not player.is_playing
    # After stop: silence
    assert np.abs(player.callback(1024)[100:]).max() == 0.0


def test_cursor_advances_by_emitted(chirp):
    player, *_ = make_player(chirp, [])
    player.toggle()
    c0 = player.cursor_sec
    player.callback(1024)
    assert player.cursor_sec == c0 + 1024 / player.sample_rate


def test_seek_and_edit_drop_backlog(chirp):
    markers = [Marker(4000, 60.0, 0.0, 2.0)]
    player, x, table, knots = make_player(chirp, markers)
    player.toggle()
    player.callback(1024)
    assert len(player._backlog) > 0
    player.seek(0.5)
    assert len(player._backlog) == 0
    assert player.cursor_sec == 0.5
    player.callback(1024)
    new_knots = MapKnots.from_markers([Marker(4000, 60.0, 0.0, -3.0)], player.sample_rate, len(x))
    player.set_knots(new_knots)
    assert len(player._backlog) == 0
    buf = player.callback(1024)
    assert np.isfinite(buf).all()


def test_pv_engine_matches_offline_pv(chirp):
    """engine="pv": playback from t=0 streams the phase-vocoder render
    (VERDICT round 2, next #2 — the quality engine must be hearable)."""
    from melonix_tpu.engine.phase_vocoder import render_track_pv

    x, sr = chirp
    markers = [Marker(4000, 60.0, 0.02, 2.0)]
    table = build_grain_table(x, backend="numpy")
    knots = MapKnots.from_markers(markers, sr, len(x))
    player = Player(x, table, knots, engine="pv")
    want = render_track_pv(x, knots)

    player.toggle()
    got = []
    for _ in range(1000):
        got.append(player.callback(1024))
        if not player.is_playing:
            break
    assert not player.is_playing  # auto-stop after full delivery
    got = np.concatenate(got)
    assert len(got) >= len(want)
    err = np.sqrt(np.mean((got[: len(want)] - want) ** 2)) / (
        np.sqrt(np.mean(want**2)) + 1e-12
    )
    assert err < 2e-3, err
    assert np.abs(got[len(want) :]).max(initial=0.0) == 0.0


def test_pv_engine_edit_and_switch_freshness(chirp):
    """A marker edit mid-play must change the PV stream's next buffers, and
    a live engine switch must change the source without breaking playback."""
    x, sr = chirp
    table = build_grain_table(x, backend="numpy")
    knots = MapKnots.from_markers([], sr, len(x))
    player = Player(x, table, knots, engine="pv")
    player.toggle()
    before = player.callback(1024)
    assert np.any(before != 0.0)

    bent = MapKnots.from_markers(
        [Marker(2000, 60.0, 0.0, 7.0)], sr, len(x)
    )
    player.set_knots(bent)
    assert len(player._backlog) == 0  # lookahead dropped
    after = np.concatenate([player.callback(1024) for _ in range(4)])
    # +7 semitones over the whole mid-track: dominant frequency moves.
    fa = np.argmax(np.abs(np.fft.rfft(before * np.hanning(1024))))
    win = np.hanning(len(after))
    fb = np.argmax(np.abs(np.fft.rfft(after * win))) * 1024 / len(after)
    assert fb > fa * 1.2, (fa, fb)

    player.set_engine("granular")
    buf = player.callback(1024)
    assert np.isfinite(buf).all() and player.engine == "granular"
    player.set_engine("pv")
    assert np.isfinite(player.callback(1024)).all()


def test_declick_ramp(chirp):
    player, *_ = make_player(chirp, [])
    player.toggle()
    player.callback(1024)
    player.is_playing = False  # user hits stop
    buf = player.callback(1024)
    # First samples ramp from the last delivered value toward zero, rest silent
    assert np.abs(buf[100:]).max() == 0.0


def test_formant_toggle_noop_on_granular(chirp):
    """Formant preservation only affects the PV engine: toggling it while
    the granular engine plays must not flush the backlog or replan (the
    audio is byte-identical either way); on PV it restarts the stream."""
    markers = [Marker(4000, 60.0, 0.02, 2.0)]
    player, x, table, knots = make_player(chirp, markers)
    player.toggle()
    player.callback(1024)
    backlog_before = player._backlog.avail()
    player.set_formant(True)
    assert player._backlog.avail() == backlog_before  # untouched
    a = player.callback(1024)
    player.set_formant(False)
    b = player.callback(1024)
    assert np.isfinite(a).all() and np.isfinite(b).all()

    player.set_engine("pv")
    player.callback(1024)
    player.set_formant(True)
    assert player._backlog.avail() == 0  # PV: restart at the cursor
    assert np.isfinite(player.callback(1024)).all()


def test_pv_live_refill_watermarks(chirp):
    """Live PV refill policy: the FIRST stream read after a (re)start
    covers the deadline + a small lead bank (PV_FIRST_READ — lowest
    edit->audio latency), and the NEXT refill bursts to the PV_LIVE_AHEAD
    high watermark, landing behind the lead the first read banked; in
    between, pulls above the low watermark (buffer + preferred grain
    size, app.cpp:274-276) issue no reads at all."""
    from melonix_tpu.engine import player as P

    markers = [Marker(4000, 60.0, 0.02, 2.0)]
    player, x, table, knots = make_player(chirp, markers)
    player.set_engine("pv")
    player.is_playing = True

    reads: list[int] = []
    player.callback(1024)  # builds the stream lazily
    orig_read = player._pv_stream.__class__.read

    def spy_read(self, n):
        reads.append(n)
        return orig_read(self, n)

    player._pv_stream.__class__.read = spy_read
    try:
        player.set_knots(knots)  # edit: drops backlog + stream
        player.callback(1024)  # first fresh buffer
        pgs = player.config.preferred_grain_size
        assert reads, "edit restart issued no stream read"
        assert reads[0] == max(1024 + pgs, P.PV_FIRST_READ)  # deadline+bank
        # Later refills top up to the full high watermark, with
        # deadline-free pulls (no reads) in between.
        for rung in (P.PV_LIVE_AHEAD,):
            n_before = len(reads)
            for _ in range(40):
                avail_before = player._backlog.avail()
                player.callback(1024)
                if len(reads) > n_before:
                    break
            assert len(reads) > n_before, f"no refill reached rung {rung}"
            assert reads[n_before] + avail_before == rung  # topped to rung
    finally:
        player._pv_stream.__class__.read = orig_read
