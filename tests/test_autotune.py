"""Auto pitch correction: snapping, segmentation, end-to-end correction."""

import numpy as np

from melonix_tpu.engine.autotune import autotune, snap_note, suggest_markers
from melonix_tpu.engine.pitch import pitch_curve

SR = 16000


def test_snap_note_scales():
    # chromatic: nearest integer
    assert snap_note(57.3) == 57.0
    assert snap_note(57.6) == 58.0
    # A major: degrees {A B C# D E F# G#} → semitone classes {0,2,4,5,7,9,11}
    assert snap_note(57.0, "major", "a") == 57.0  # A4 stays (class 0 ✓)
    assert snap_note(58.0, "major", "a") in (57.0, 59.0)  # A# not in A major
    # C major: note 27 = C2 (24=A1 → +3) in scale
    assert snap_note(27.2, "major", "c") == 27.0
    assert snap_note(28.0, "major", "c") in (27.0, 29.0)  # C# not in C major


def _detuned_melody(cents, notes_hz, seconds_each=0.5):
    t = np.arange(int(SR * seconds_each)) / SR
    segs = []
    for hz, c in zip(notes_hz, cents):
        f = hz * 2.0 ** (c / 1200.0)
        segs.append(0.5 * np.sin(2 * np.pi * f * t))
    return np.concatenate(segs).astype(np.float32)


def test_suggest_markers_detects_detuning():
    x = _detuned_melody([40, -35], [220.0, 330.0])
    markers = suggest_markers(x, SR)
    assert len(markers) >= 4  # two segments, two markers each
    bends = [m.pitch_bend for m in markers]
    # First segment is +40 cents sharp → bend ≈ -0.4; second -35 → +0.35
    assert any(abs(b + 0.40) < 0.15 for b in bends)
    assert any(abs(b - 0.35) < 0.15 for b in bends)
    # In-tune audio suggests nothing
    clean = _detuned_melody([0, 0], [220.0, 330.0])
    assert suggest_markers(clean, SR) == []


def test_autotune_end_to_end():
    x = _detuned_melody([45], [220.0], seconds_each=1.5)
    out, markers = autotune(x, SR, engine="pv", preserve_formants=False)
    assert len(markers) >= 2
    curve = pitch_curve(out, SR)
    mid = curve.note[len(curve.note) // 4 : 3 * len(curve.note) // 4]
    voiced = curve.voiced[len(curve.note) // 4 : 3 * len(curve.note) // 4]
    med = float(np.median(mid[voiced]))
    # 220 Hz +45 cents ≈ note 48.45 → corrected to 48.0 (A3) within 10 cents
    assert abs(med - 48.0) < 0.1, med


def test_autotune_strength_half():
    x = _detuned_melody([44], [220.0], seconds_each=1.5)
    out, _ = autotune(x, SR, strength=0.5, engine="granular")
    curve = pitch_curve(out, SR)
    sel = curve.voiced & (np.arange(len(curve.note)) > len(curve.note) // 4)
    med = float(np.median(curve.note[sel]))
    # Half-strength correction leaves ~+22 cents
    assert 0.1 < (med - 48.0) < 0.35, med


def test_vibrato_flattening_reduces_modulation():
    """vibrato=1 cancels intra-note pitch modulation: a tone with ±70-cent
    2 Hz vibrato renders to a much flatter measured curve at the same
    median pitch (added capability — Melodyne-class modulation control).
    A finer analysis frame than the default is needed for the detector to
    resolve the modulation at all (the 0.5 s default averages it out)."""
    import numpy as np

    from melonix_tpu.config import Config
    from melonix_tpu.engine.autotune import autotune, suggest_markers
    from melonix_tpu.engine.pitch import pitch_curve

    sr = 8000
    cfg = Config(pitch_frame=1024, pitch_hop=256)
    t = np.arange(3 * sr) / sr
    f_inst = 220.0 * 2.0 ** (0.7 * np.sin(2 * np.pi * 2.0 * t) / 12.0)
    x = (0.5 * np.sin(2 * np.pi * np.cumsum(f_inst) / sr)).astype(np.float32)

    flat_markers = suggest_markers(x, sr, vibrato=1.0, config=cfg)
    assert len(flat_markers) > 8  # dense intra-segment markers
    out, markers = autotune(x, sr, vibrato=1.0, engine="pv",
                            preserve_formants=False, config=cfg)
    c_in = pitch_curve(x, sr, config=cfg)
    c_out = pitch_curve(np.asarray(out, np.float32), sr, config=cfg)
    v_in, v_out = c_in.voiced, c_out.voiced
    std_in = float(np.std(c_in.note[v_in]))
    std_out = float(np.std(c_out.note[v_out]))
    assert std_in > 0.2, std_in  # the input really wobbles
    assert std_out < 0.5 * std_in, (std_in, std_out)
    med_out = float(np.median(c_out.note[v_out]))
    assert abs(med_out - 48.0) < 0.3, med_out  # chromatic snap keeps A
