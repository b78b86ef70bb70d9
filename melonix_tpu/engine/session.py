"""Multichannel session rendering (BASELINE config #5).

The reference is strictly mono: libswresample downmixes on import
(app.cpp:669-684) and every engine stage assumes one channel.  Sessions here
keep their channels: the *edit model* (grain boundaries, time-warp map) is
derived from the mono downmix so every channel splices at the same sample
positions — a coherent stereo image — while the *samples* rendered come from
each channel.

Routing: one plan always; with more than one device the channels render as
ONE batched device program sharded over the mesh's ``data`` axis
(``parallel.sharded.data_parallel_render`` for the granular engine,
``render_channels_pv`` for the phase vocoder) — the batched-session path of
BASELINE config #5.  On a single chip the per-channel kernels (Pallas
granular / lane-gather PV resample) are the fast path and are kept.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_CONFIG, Config
from ..io.audio import downmix_mono
from .grains import build_grain_table
from .maps import MapKnots
from .phase_vocoder import render_channels_pv, render_track_pv
from .render import build_render_plan, render


def _session_mesh(mesh):
    """Resolve the ``mesh`` argument: "auto" → a (data, seq) mesh over all
    devices when more than one is visible, else None (single-chip path)."""
    if mesh != "auto":
        return mesh
    import jax

    if len(jax.devices()) <= 1:
        return None
    from ..parallel import make_audio_mesh

    return make_audio_mesh()


def _render_channels_granular(wav_ch: np.ndarray, plan, mesh) -> np.ndarray:
    """(C, n) channels through one shared granular plan, tracks batched over
    the mesh ``data`` axis (zero-pad channels to the shard count)."""
    import jax.numpy as jnp

    from ..parallel import data_parallel_render

    C, _n = wav_ch.shape
    d = mesh.shape["data"]
    B = d * -(-C // d)
    wav_b = wav_ch if B == C else np.pad(wav_ch, ((0, B - C), (0, 0)))
    total = plan.total_out
    out_len = 1024 * -(-total // 1024)
    gs = np.tile(plan.grain_start, (B, 1))
    gl = np.tile(plan.grain_len, (B, 1))
    rt = np.tile(plan.rate, (B, 1))
    oo = np.tile(plan.out_offset.astype(np.int32), (B, 1))
    ss = np.tile(plan.seam_src, (B, 1))
    nv = np.full((B,), int(plan.out_offset[-1]), np.int32)
    out = data_parallel_render(
        jnp.asarray(wav_b),
        jnp.asarray(gs), jnp.asarray(gl), jnp.asarray(rt),
        jnp.asarray(oo), jnp.asarray(ss), jnp.asarray(nv),
        mesh, out_len,
    )
    return np.asarray(out)[:C, :total]


def render_session(
    wav,
    markers,
    sample_rate: int,
    *,
    engine: str = "granular",
    preserve_formants: bool = False,
    config: Config = DEFAULT_CONFIG,
    mesh="auto",
) -> np.ndarray:
    """Render a (possibly multichannel) session through the marker edit.

    ``wav``: float32 (n,) mono or (n, C) multichannel.
    ``mesh``: "auto" (batch channels over all devices when >1), an explicit
    ``jax.sharding.Mesh``, or None (force the single-chip per-channel path).
    Returns the rendered audio with the same channel layout.
    """
    wav = np.asarray(wav, np.float32)
    multi = wav.ndim == 2
    mono = downmix_mono(wav) if multi else wav
    knots = MapKnots.from_markers(markers, sample_rate, len(mono))
    use_mesh = _session_mesh(mesh) if multi else None

    if engine == "pv":
        if not multi:
            return render_track_pv(
                mono, knots, config=config, preserve_formants=preserve_formants
            )
        out = render_channels_pv(
            wav.T, knots, config=config,
            preserve_formants=preserve_formants, mesh=use_mesh,
        )
        return np.ascontiguousarray(out.T)

    table = build_grain_table(mono, config)
    plan = build_render_plan(table, knots, config=config)
    if not multi:
        return render(mono, plan)
    if use_mesh is not None:
        return np.ascontiguousarray(
            _render_channels_granular(np.ascontiguousarray(wav.T), plan, use_mesh).T
        )
    chans = [render(wav[:, c], plan) for c in range(wav.shape[1])]
    return np.stack(chans, axis=1)
