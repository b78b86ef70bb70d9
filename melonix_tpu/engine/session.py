"""Multichannel session rendering (BASELINE config #5).

The reference is strictly mono: libswresample downmixes on import
(app.cpp:669-684) and every engine stage assumes one channel.  Sessions here
keep their channels: the *edit model* (grain boundaries, time-warp map) is
derived from the mono downmix so every channel splices at the same sample
positions — a coherent stereo image — while the *samples* rendered come from
each channel.  One plan, C channel renders (the device kernel is reused per
channel; plans are channel-independent by construction).
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_CONFIG, Config
from ..io.audio import downmix_mono
from .grains import build_grain_table
from .maps import MapKnots
from .phase_vocoder import render_track_pv
from .render import build_render_plan, render


def render_session(
    wav,
    markers,
    sample_rate: int,
    *,
    engine: str = "granular",
    preserve_formants: bool = False,
    config: Config = DEFAULT_CONFIG,
) -> np.ndarray:
    """Render a (possibly multichannel) session through the marker edit.

    ``wav``: float32 (n,) mono or (n, C) multichannel.
    Returns the rendered audio with the same channel layout.
    """
    wav = np.asarray(wav, np.float32)
    multi = wav.ndim == 2
    mono = downmix_mono(wav) if multi else wav
    knots = MapKnots.from_markers(markers, sample_rate, len(mono))

    if engine == "pv":
        if not multi:
            return render_track_pv(
                mono, knots, config=config, preserve_formants=preserve_formants
            )
        chans = [
            render_track_pv(
                wav[:, c], knots, config=config, preserve_formants=preserve_formants
            )
            for c in range(wav.shape[1])
        ]
        return np.stack(chans, axis=1)

    table = build_grain_table(mono, config)
    plan = build_render_plan(table, knots, config=config)
    if not multi:
        return render(mono, plan)
    chans = [render(wav[:, c], plan) for c in range(wav.shape[1])]
    return np.stack(chans, axis=1)
