"""Multi-chip sharding of the analysis/render pipeline.

The reference's only concurrency is three host threads (SURVEY.md §1); this
module is the TPU-native replacement: SPMD over a ``jax.sharding.Mesh`` with
two axes —

* ``data``  — batch of tracks / sessions (batched session render,
  BASELINE.json config #5): pure data parallelism, no communication.
* ``seq``   — the sample/frame axis *within* a track (the "long-track"
  dimension, SURVEY.md §5 long-context analogue): frames are sharded
  contiguously and the STFT window overlap crossing shard boundaries is
  satisfied by a one-hop ``ppermute`` halo exchange over ICI — the same
  neighbor-block-passing primitive as ring attention, applied to
  overlap-save spectral analysis.

Everything is expressed with ``jax.shard_map`` so XLA sees static local
shapes and inserts exactly the collectives we ask for.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import AxisType, Mesh, PartitionSpec as P


def make_audio_mesh(n_devices: int | None = None, data: int | None = None) -> Mesh:
    """Mesh over (data, seq).  ``data`` defaults to the largest power-of-two
    divisor ≤ sqrt(n); the rest goes to ``seq`` (frame/sample sharding)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None:
        data = 1
        while n % (data * 2) == 0 and data * 2 * data * 2 <= n:
            data *= 2
    assert n % data == 0, (n, data)
    # Auto axis types: we annotate shardings at shard_map boundaries rather
    # than carrying explicit sharding-in-types through every intermediate.
    return jax.make_mesh(
        (data, n // data),
        ("data", "seq"),
        axis_types=(AxisType.Auto, AxisType.Auto),
        devices=devs[:n],
    )


# ----------------------------------------------------------------------
# Halo-exchange STFT: sample axis sharded over `seq`.
# ----------------------------------------------------------------------


from ..engine.spectral import extract_hop_frames as _extract_hop_frames


def _stft_local(chunk, halo_from_right, window, size, hop):
    """Frames whose start lies in this shard; right-halo provides overlap."""
    local = jnp.concatenate([chunk, halo_from_right], axis=-1)
    n_frames = chunk.shape[-1] // hop
    frames = _extract_hop_frames(local, size, hop, n_frames) * window[None, :]
    spec = jnp.fft.rfft(frames)
    return jnp.sqrt(spec.real * spec.real + spec.imag * spec.imag)


def sharded_stft_mags(
    wav: jnp.ndarray,
    window: jnp.ndarray,
    mesh: Mesh,
    *,
    size: int,
    hop: int,
) -> jnp.ndarray:
    """STFT magnitudes of one track, sample axis sharded over ``seq``.

    ``len(wav)`` must divide evenly into seq-shards of a multiple of ``hop``,
    with ``size - hop <= chunk`` (one-hop halo).  Returns (n_frames, bins)
    sharded over ``seq`` on the frame axis.
    """
    n_seq = mesh.shape["seq"]
    n = wav.shape[-1]
    chunk = n // n_seq
    halo = size - hop
    assert chunk % hop == 0 and halo <= chunk, (chunk, hop, size)

    def body(w_local):
        # Send my leading `halo` samples to my LEFT neighbor (their right halo).
        idx = jax.lax.axis_index("seq")
        n_shards = jax.lax.axis_size("seq")
        head = w_local[0, :halo]
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        recv = jax.lax.ppermute(head, "seq", perm)
        # Last shard's "right halo" wraps from shard 0 — mask it to zero
        # (windows past the track end read zeros, spec semantics).
        recv = jnp.where(idx == n_shards - 1, jnp.zeros_like(recv), recv)
        mags = _stft_local(w_local[0], recv, window, size, hop)
        return mags[None]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, "seq"),),
        out_specs=P(None, "seq", None),
    )
    return f(wav[None])[0]


# ----------------------------------------------------------------------
# Pitch curve, frame axis sharded over `seq` (same halo pattern as the
# STFT: a frame starting near a shard's right edge reads into the next
# shard, satisfied by a one-hop ppermute).
# ----------------------------------------------------------------------


def sharded_pitch(
    wav: jnp.ndarray,
    mesh: Mesh,
    *,
    frame: int,
    hop: int,
    lag_min: int,
    lag_max: int,
):
    """(lag, clarity, energy) per frame, frame axis sharded over ``seq``.

    Same shard-quantization contract as sharded_stft_mags: the per-shard
    chunk must be a multiple of ``hop`` with ``frame - hop <= chunk``.
    """
    from ..engine.pitch import pitch_core

    n_seq = mesh.shape["seq"]
    n = wav.shape[-1]
    chunk = n // n_seq
    halo = frame - hop
    assert chunk % hop == 0 and halo <= chunk, (chunk, hop, frame)

    def body(w_local):
        idx = jax.lax.axis_index("seq")
        n_shards = jax.lax.axis_size("seq")
        head = w_local[0, :halo]
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        recv = jax.lax.ppermute(head, "seq", perm)
        recv = jnp.where(idx == n_shards - 1, jnp.zeros_like(recv), recv)
        local = jnp.concatenate([w_local[0], recv], axis=-1)
        n_frames = chunk // hop
        frames = _extract_hop_frames(local, frame, hop, n_frames)
        w = frames - jnp.mean(frames, axis=1, keepdims=True)
        lag, clarity, energy = pitch_core(w, frame, lag_min, lag_max)
        return lag[None], clarity[None], energy[None]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, "seq"),),
        out_specs=(P(None, "seq"),) * 3,
    )
    lag, clarity, energy = f(wav[None])
    return lag[0], clarity[0], energy[0]


# ----------------------------------------------------------------------
# Reference-semantics spectrogram columns, column axis sharded over `seq`.
# Columns are independent (each gathers its own end-anchored window from a
# replicated track), so this is embarrassingly parallel over chips; it is
# the scale-out path for "compute the whole multi-resolution pyramid at
# file-open" (SURVEY.md §7 design stance).
# ----------------------------------------------------------------------


def sharded_spectrogram_columns(
    wav: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    mesh: Mesh,
    *,
    size: int,
) -> jnp.ndarray:
    from ..engine.spectral import _extract_frames

    def body(w, s, e):
        frames = _extract_frames(w, s[0], e[0], size)
        spec = jnp.fft.fft(frames)
        return (jnp.abs(spec[:, : size // 2]) / size).astype(jnp.float32)[None]

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq", None),
    )
    return f(wav, starts[None], ends[None])[0]


# ----------------------------------------------------------------------
# Data-parallel batched session render: batch axis over `data`.
# ----------------------------------------------------------------------


def _render_one(wav, grain_start, grain_len, rate, out_offset, seam_src, n_valid, out_len):
    """One track's granular render, same segmented-broadcast formulation as
    engine/render.render_device (two wav gathers; per-step constants reach
    samples via scatter-diff + int32 cumsum).  The batched plans are padded,
    so the in-grain/seam masking stays in-kernel here instead of the host
    seam-fix scatter the single-track path uses."""
    n = wav.shape[0]
    j = jnp.arange(out_len, dtype=jnp.int32)
    offsets = out_offset[:-1].astype(jnp.int32)

    def seg_i32(vals):
        d = jnp.zeros(out_len, jnp.int32).at[offsets[1:]].add(
            jnp.diff(vals), mode="drop"
        )
        return vals[0] + jnp.cumsum(d)

    off = seg_i32(offsets)
    gs = seg_i32(grain_start.astype(jnp.int32))
    gl = seg_i32(grain_len.astype(jnp.int32))
    seam = seg_i32(seam_src.astype(jnp.int32))
    r = jax.lax.bitcast_convert_type(
        seg_i32(jax.lax.bitcast_convert_type(rate, jnp.int32)), jnp.float32
    )
    i = (j - off).astype(jnp.float32)
    x = i * r
    idx_f = jnp.floor(x)
    frac = x - idx_f
    idx = idx_f.astype(jnp.int32)
    src = gs + idx
    in_grain = idx + 1 < gl
    lo = wav[jnp.clip(src, 0, n - 1)]
    hi = jnp.where(
        in_grain,
        wav[jnp.clip(src + 1, 0, n - 1)],
        jnp.where(seam >= 0, wav[jnp.clip(seam, 0, n - 1)], 0.0),
    )
    out = (1.0 - frac) * lo + frac * hi
    return jnp.where(j < n_valid, out, 0.0)


def data_parallel_render(
    wav_b: jnp.ndarray,  # (B, n) track batch
    grain_start_b: jnp.ndarray,  # (B, S) padded plan arrays
    grain_len_b: jnp.ndarray,
    rate_b: jnp.ndarray,
    out_offset_b: jnp.ndarray,  # (B, S+1)
    seam_src_b: jnp.ndarray,
    n_valid_b: jnp.ndarray,  # (B,)
    mesh: Mesh,
    out_len: int,
) -> jnp.ndarray:
    """Batched granular render, tracks sharded over ``data`` (BASELINE
    config #5: 100+ marker stereo sessions in one shot)."""

    def body(w, gs, gl, r, oo, ss, nv):
        return jax.vmap(
            lambda *a: _render_one(*a, out_len)
        )(w, gs, gl, r, oo, ss, nv)

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"),) * 7,
        out_specs=P("data"),
    )
    return f(wav_b, grain_start_b, grain_len_b, rate_b, out_offset_b, seam_src_b, n_valid_b)


# ----------------------------------------------------------------------
# Data-parallel phase-vocoder render: tracks/channels over `data`.
# ----------------------------------------------------------------------


def data_parallel_pv(
    mesh: Mesh,
    *,
    size: int,
    hop: int,
    n_frames: int,
    stretch_len: int,
    n_out_pad: int,
    sr: int,
):
    """Jitted full PV render (stretch → normalize → resample) of a batch of
    tracks sharded over ``data`` — the quality engine's multi-chip path
    (VERDICT weak #6).

    Single-chunk formulation: every track's frame plan fits one stretch
    chunk (session-scale; hour-scale single tracks use the chunked
    ``render_track_pv``).  Per-track host plans (engine/phase_vocoder.
    build_pv_plan) bucket to shared static (n_frames, n_out_pad) shapes
    with edge padding; ``f_real_b`` masks each track's live frames.

    Returns f(wav_b, starts_b, da_b, rho_b, f_real_b, window,
    anc_j_b, src_b, r_b, s_b, base_b) -> (B, n_out_pad) rendered audio.
    """
    from ..engine.phase_vocoder import (
        _lerp_resample_rel_xla,
        _positions_rel_device,
        _stretch_chunk_core,
    )
    from ..kernels.pallas_resample import BLK

    n_bins = size // 2 + 1

    def _wsum_traced(window, fr):
        """Per-track window-square OLA normalizer: same stride-stacked
        construction as _ola_wsum but masking by the track's TRACED live
        frame count — bit-identical normalization to the track's own
        single-device render despite the shared padded n_frames."""
        k = size // hop
        pad_f = (-n_frames) % k
        total = (n_frames + pad_f) * hop + (k - 1) * hop + size
        w2 = window * window
        wsum = jnp.zeros(total, jnp.float32)
        for g in range(k):
            segw = jnp.tile(w2, (n_frames + pad_f) // k)
            segw = jnp.where(
                jnp.arange(segw.shape[0]) // size * k + g < fr, segw, 0.0
            )
            wsum = wsum.at[g * hop : g * hop + segw.shape[0]].add(segw)
        out = (
            wsum[:stretch_len]
            if total >= stretch_len
            else jnp.pad(wsum, (0, stretch_len - total))
        )
        return jnp.maximum(out, 1e-8)

    def step(wav_b, starts_b, da_b, rho_b, f_real_b, window,
             anc_j_b, src_b, r_b, s_b, base_b):
        def body(w, st, da, rho, fr, win, aj, sb, rb, ssb, bb):
            def one(w1, st1, da1, rho1, fr1, aj1, sb1, rb1, ss1, bb1):
                z = jnp.zeros(n_bins, jnp.float32)
                y, _, _, _ = _stretch_chunk_core(
                    w1, st1, da1, rho1, win, jnp.int32(0), fr1, z, z, z,
                    size=size, hop=hop, n_frames_c=n_frames, use_pallas=False,
                )
                y = y[:stretch_len] / _wsum_traced(win, fr1)
                src_rel = _positions_rel_device(aj1, sb1, rb1, ss1, n_out_pad, sr)
                return _lerp_resample_rel_xla(y, src_rel, bb1, stretch_len, BLK)

            return jax.vmap(one)(w, st, da, rho, fr, aj, sb, rb, ssb, bb)

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data"),) * 5 + (P(),) + (P("data"),) * 5,
            out_specs=P("data"),
        )(wav_b, starts_b, da_b, rho_b, f_real_b, window,
          anc_j_b, src_b, r_b, s_b, base_b)

    return jax.jit(step)


def pv_batch_args(plans, mesh=None):
    """Bucket per-track PVPlans to the shared static shapes data_parallel_pv
    needs; returns (kwargs-for-builder, operand arrays).  ``plans`` must
    share (size, hop, sr); tracks pad with edge frames masked by f_real."""
    size, hop, sr = plans[0].size, plans[0].hop, plans[0].sr
    assert all((p.size, p.hop, p.sr) == (size, hop, sr) for p in plans)
    n_frames = max(p.n_frames for p in plans)
    stretch_len = (n_frames - 1) * hop + size
    n_out_pad = max(p.n_out_pad for p in plans)
    n_anc = max(p.anc_args[0].shape[0] for p in plans)
    n_base = max(len(p.base) for p in plans)
    B = len(plans)

    def pad1(a, n, mode="edge", const=None):
        a = np.asarray(a)
        if const is not None:
            return np.pad(a, (0, n - len(a)), constant_values=const)
        return np.pad(a, (0, n - len(a)), mode=mode)

    starts_b = np.stack([pad1(p.starts_m, n_frames) for p in plans])
    da_b = np.stack([pad1(p.da_m, n_frames, const=float(hop)) for p in plans])
    rho_b = np.stack(
        [pad1(p.rho_m.astype(np.float32), n_frames) for p in plans]
    )
    f_real_b = np.asarray([p.n_frames for p in plans], np.int32)
    anc_j_b = np.stack(
        [pad1(np.asarray(p.anc_args[0]), n_anc, const=n_out_pad) for p in plans]
    )
    src_b = np.stack([pad1(np.asarray(p.anc_args[1]), n_anc) for p in plans])
    r_b = np.stack([pad1(np.asarray(p.anc_args[2]), n_anc) for p in plans])
    s_b = np.stack([pad1(np.asarray(p.anc_args[3]), n_anc) for p in plans])
    base_b = np.stack([pad1(p.base, n_base) for p in plans])
    builder_kw = dict(
        size=size, hop=hop, n_frames=n_frames,
        stretch_len=stretch_len, n_out_pad=n_out_pad, sr=sr,
    )
    ops = (starts_b, da_b, rho_b, f_real_b, anc_j_b, src_b, r_b, s_b, base_b)
    return builder_kw, ops


# ----------------------------------------------------------------------
# Full session step: the "training step" equivalent for this framework —
# one device program that analyses (sharded STFT) and renders (data-parallel
# gather) a batch of sessions.
# ----------------------------------------------------------------------


def _halo_stft_mags(mesh, wav_b, window, size, hop):
    """(B, F, bins) magnitudes: tracks over ``data``, frames over ``seq``,
    window overlap via one-hop ppermute halo over ICI."""
    n_seq = mesh.shape["seq"]
    chunk = wav_b.shape[-1] // n_seq
    halo = size - hop

    def analysis(w_local):
        idx = jax.lax.axis_index("seq")
        n_shards = jax.lax.axis_size("seq")
        head = w_local[:, :halo]
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        recv = jax.lax.ppermute(head, "seq", perm)
        recv = jnp.where(idx == n_shards - 1, jnp.zeros_like(recv), recv)
        local = jnp.concatenate([w_local, recv], axis=-1)
        n_frames = chunk // hop
        frames = jax.vmap(
            lambda l: _extract_hop_frames(l, size, hop, n_frames)
        )(local) * window[None, None, :]
        spec = jnp.fft.rfft(frames)
        return jnp.sqrt(spec.real**2 + spec.imag**2)

    return jax.shard_map(
        analysis,
        mesh=mesh,
        in_specs=(P("data", "seq"),),
        out_specs=P("data", "seq", None),
    )(wav_b)


def session_step(
    mesh: Mesh,
    *,
    stft_size: int,
    stft_hop: int,
):
    """Build a jitted full-pipeline step over ``mesh``.

    Returns f(wav_b, window, plan...) -> (stft_mags, rendered) with
    shardings: tracks over ``data``, frames over ``seq``.
    """

    def step(wav_b, window, gs, gl, rate, oo, ss, nv, out_len):
        mags = _halo_stft_mags(mesh, wav_b, window, stft_size, stft_hop)
        rendered = data_parallel_render(wav_b, gs, gl, rate, oo, ss, nv, mesh, out_len)
        return mags, rendered

    return partial(jax.jit, static_argnames=("out_len",))(step)


def session_step_full(
    mesh: Mesh,
    *,
    stft_size: int,
    stft_hop: int,
    pv_size: int,
    pv_hop: int,
    pv_frames: int,
    pv_stretch_len: int,
    pv_out_pad: int,
    sr: int,
):
    """Both engines in one step: sharded-STFT analysis + data-parallel
    granular render + data-parallel phase-vocoder render (VERDICT #6's
    "session_step covering both engines").  Returns
    f(wav_b, window, granular plan..., out_len, pv_window, pv ops...) ->
    (stft_mags, granular, pv)."""
    pv = data_parallel_pv(
        mesh, size=pv_size, hop=pv_hop, n_frames=pv_frames,
        stretch_len=pv_stretch_len, n_out_pad=pv_out_pad, sr=sr,
    )

    def step(wav_b, window, gs, gl, rate, oo, ss, nv, out_len,
             pv_window, starts_b, da_b, rho_b, f_real_b,
             anc_j_b, src_b, r_b, s_b, base_b):
        mags = _halo_stft_mags(mesh, wav_b, window, stft_size, stft_hop)
        rendered = data_parallel_render(
            wav_b, gs, gl, rate, oo, ss, nv, mesh, out_len
        )
        pv_out = pv(
            wav_b, starts_b, da_b, rho_b, f_real_b, pv_window,
            anc_j_b, src_b, r_b, s_b, base_b,
        )
        return mags, rendered, pv_out

    return partial(jax.jit, static_argnames=("out_len",))(step)
