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
# Full session step: the "training step" equivalent for this framework —
# one device program that analyses (sharded STFT) and renders (data-parallel
# gather) a batch of sessions.
# ----------------------------------------------------------------------


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
        n_seq = mesh.shape["seq"]
        chunk = wav_b.shape[-1] // n_seq
        halo = stft_size - stft_hop

        def analysis(w_local):
            idx = jax.lax.axis_index("seq")
            n_shards = jax.lax.axis_size("seq")
            head = w_local[:, :halo]
            perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
            recv = jax.lax.ppermute(head, "seq", perm)
            recv = jnp.where(idx == n_shards - 1, jnp.zeros_like(recv), recv)
            local = jnp.concatenate([w_local, recv], axis=-1)
            n_frames = chunk // stft_hop
            frames = jax.vmap(
                lambda l: _extract_hop_frames(l, stft_size, stft_hop, n_frames)
            )(local) * window[None, None, :]
            spec = jnp.fft.rfft(frames)
            return jnp.sqrt(spec.real**2 + spec.imag**2)

        mags = jax.shard_map(
            analysis,
            mesh=mesh,
            in_specs=(P("data", "seq"),),
            out_specs=P("data", "seq", None),
        )(wav_b)

        rendered = data_parallel_render(wav_b, gs, gl, rate, oo, ss, nv, mesh, out_len)
        return mags, rendered

    return partial(jax.jit, static_argnames=("out_len",))(step)
