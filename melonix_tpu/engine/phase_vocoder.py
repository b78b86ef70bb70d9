"""Phase-vocoder pitch/time renderer — the quality engine.

The granular renderer (engine/render.py) reproduces the reference's
zero-crossing-spliced resampler exactly (app.cpp:294-345).  This module is
the *added-capability* renderer (BASELINE.md configs): an STFT
phase-vocoder that honors the same edit model — the piecewise-linear
time-warp and pitch-bend maps (engine/maps.py) — with transform-domain
quality (no grain-seam amplitude modulation).

Formulation for time-VARYING pitch rate ``rho(t) = 2^(bend(t)/12)``:

1.  **Rate integral.**  ``p(t) = integral_0^t rho(tau) dtau`` maps output
    time onto a "stretched" timeline.  Per output sample this is one prefix
    sum of the per-sample rates (device, one pass).

2.  **PV time-stretch.**  Synthesis frames sit at ``m * hop`` on the
    stretched timeline; frame m analyses the *source* at sample position
    ``A_m = time2Sample(p^-1(m * hop / sr))`` — the user's time warp and
    the pitch-rate integral compose into one variable analysis hop.  The
    classic phase propagation (Flanagan/Laroche)

        dphi   = princarg(phi_m - phi_{m-1} - omega_k * dA_m)
        psi_m  = psi_{m-1} + hop * (omega_k + dphi_m / dA_m)

    looks sequential but its increments depend only on *consecutive
    analysis phases*, so it is a prefix sum: one ``cumsum`` over frames
    instead of a 15k-step scan (which would be per-step-overhead-bound on
    TPU).  Windowed overlap-add (engine/spectral.istft_device) follows.

3.  **Variable-rate resample.**  ``out[n] = lerp(y_stretch, p(t_n) * sr)``
    — one fused gather, the same kernel family as the granular renderer.

Everything after the host-side sizing (static frame count from the analytic
rate integral over knot segments) is a single jitted device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, Config
from .maps import (
    MapKnots,
    pad_knots,
    time_to_pitch_bend_interp_jax,
    time_to_sample_jax,
)
from .spectral import hann_window, istft_device


def rate_integral_total(knots: MapKnots, t_end: float) -> float:
    """Exact ``integral_0^t_end 2^(bend(t)/12) dt`` over the knot segments.

    Bend is piecewise linear in t, so each segment integrates analytically:
    ``int 2^(b/12) = (t1-t0) * 12/ln2 * (r1-r0)/(b1-b0)`` (or ``r*(t1-t0)``
    when the bend is constant).  Used host-side to size the static frame
    count; the device recomputes the same integral numerically per sample.
    """
    ts = list(knots.times) + [knots.duration(), t_end]
    bs = list(knots.bends) + [0.0, 0.0]
    total = 0.0
    ln2_12 = np.log(2.0) / 12.0
    for i in range(len(ts) - 1):
        t0, t1 = ts[i], min(ts[i + 1], t_end)
        if t1 <= t0:
            continue
        b0, b1 = bs[i], bs[i + 1]
        # Clip the segment to t_end, interpolating the bend.
        if ts[i + 1] > t_end and ts[i + 1] > ts[i]:
            b1 = b0 + (b1 - b0) * (t_end - ts[i]) / (ts[i + 1] - ts[i])
        r0, r1 = 2.0 ** (b0 / 12.0), 2.0 ** (b1 / 12.0)
        if abs(b1 - b0) < 1e-12:
            total += r0 * (t1 - t0)
        else:
            total += (t1 - t0) * (r1 - r0) / ((b1 - b0) * ln2_12)
        if ts[i + 1] >= t_end:
            break
    return total


def _princarg(x):
    return jnp.mod(x + jnp.pi, 2.0 * jnp.pi) - jnp.pi


@partial(
    jax.jit, static_argnames=("size", "hop", "n_out", "n_frames", "sr", "formant", "n_ceps")
)
def _pv_device(
    wav, ks, ts, bs, duration, window, size, hop, n_out, n_frames, sr,
    formant=False, n_ceps=40,
):
    n = wav.shape[0]
    n_bins = size // 2 + 1

    # 1. Per-output-sample rates and their prefix sum (stretched position).
    t_out = (jnp.arange(n_out, dtype=jnp.float32) + 1.0) / sr
    bend = time_to_pitch_bend_interp_jax(ts, bs, duration, t_out)
    rates = jnp.exp2(bend.astype(jnp.float32) / 12.0)
    pos = jnp.cumsum(rates)  # pos[n] = p(t_{n+1}) * sr  (stretched samples)

    # 2. Analysis positions: frame m at stretched sample m*hop maps back to
    # output time t_m, then through the warp map to source sample A_m.
    m_pos = jnp.arange(n_frames, dtype=jnp.float32) * hop
    n_idx = jnp.searchsorted(pos, m_pos, side="left")
    t_m = (n_idx.astype(jnp.float32) + 1.0) / sr
    a_m = time_to_sample_jax(ks, ts, sr, t_m).astype(jnp.float32)
    a_m = jnp.clip(a_m, 0.0, n - 1.0)

    # Analysis frames at floor(A_m), Hann-windowed, rfft.
    starts = jnp.floor(a_m).astype(jnp.int32)
    idx = starts[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
    frames = jnp.where(idx < n, wav[jnp.clip(idx, 0, n - 1)], 0.0)
    spec = jnp.fft.rfft(frames * window[None, :])
    mag = jnp.abs(spec)
    phi = jnp.angle(spec)

    if formant:
        # Formant preservation: the final variable-rate resample scales all
        # frequencies by rho, envelope included.  Pre-warp each frame's
        # magnitudes by E(k*rho)/E(k) — E the cepstral spectral envelope —
        # so the resample restores the original envelope (vocal timbre)
        # while the harmonics still move.
        rho_m = jnp.exp2(
            time_to_pitch_bend_interp_jax(ts, bs, duration, t_m).astype(jnp.float32)
            / 12.0
        )
        log_mag = jnp.log(mag + 1e-8)
        cep = jnp.fft.irfft(log_mag, n=size, axis=-1)
        q = jnp.arange(size)
        lifter = ((q < n_ceps) | (q > size - n_ceps)).astype(jnp.float32)
        env_log = jnp.fft.rfft(cep * lifter[None, :], axis=-1).real[:, :n_bins]
        bins = jnp.arange(n_bins, dtype=jnp.float32)
        warped = jax.vmap(
            lambda e, r: jnp.interp(bins * r, bins, e)
        )(env_log, rho_m)
        gain = jnp.exp(jnp.clip(warped - env_log, -6.9, 6.9))  # +-60 dB
        mag = mag * gain

    # 3. Phase propagation as a prefix sum: psi_0 = phi_0 and
    # psi_m = phi_0 + sum_{j<=m} hop*(omega + dphi_j/dA_j).
    omega = (2.0 * jnp.pi / size) * jnp.arange(n_bins, dtype=jnp.float32)
    da = jnp.maximum(a_m[1:] - a_m[:-1], 1e-3)[:, None]  # (F-1, 1)
    dphi = _princarg(phi[1:] - phi[:-1] - omega[None, :] * da)
    incr = hop * (omega[None, :] + dphi / da)
    psis = jnp.concatenate(
        [phi[:1], phi[:1] + jnp.cumsum(incr, axis=0)], axis=0
    )

    synth = mag * jnp.exp(1j * psis.astype(jnp.float32))
    stretch_len = (n_frames - 1) * hop + size
    y = istft_device(synth, window, size, hop, stretch_len)

    # 4. Variable-rate resample back to the output timeline.
    src = (pos - rates).astype(jnp.float32)  # exclusive prefix: p(t_n) * sr
    i0 = jnp.floor(src).astype(jnp.int32)
    frac = src - i0.astype(jnp.float32)
    lo = y[jnp.clip(i0, 0, stretch_len - 1)]
    hi = y[jnp.clip(i0 + 1, 0, stretch_len - 1)]
    return (1.0 - frac) * lo + frac * hi


def render_track_pv(
    wav,
    knots: MapKnots,
    *,
    config: Config = DEFAULT_CONFIG,
    size: int | None = None,
    hop: int | None = None,
    preserve_formants: bool = False,
) -> np.ndarray:
    """Full-track phase-vocoder render honoring the marker edit model.

    Output spans the warped duration (``knots.duration()``); unlike the
    granular engine there is no 1500-zero reference tail.  With
    ``preserve_formants`` the spectral envelope (vocal timbre) stays put
    while the pitch moves (cepstral envelope warp, BASELINE config #5).
    """
    size = size or config.stft_size
    hop = hop or config.stft_hop
    wav = np.asarray(wav, np.float32)
    sr = knots.sample_rate
    n_out = int(knots.duration() * sr)
    if n_out <= 0 or len(wav) < size:
        return np.zeros(max(n_out, 0), np.float32)
    # Static sizing from the analytic rate integral (+1 frame slack), then
    # bucket to limit recompiles across edits.
    p_total = rate_integral_total(knots, n_out / sr)
    n_frames = int(np.ceil(p_total * sr / hop)) + 2
    n_frames = 64 * -(-n_frames // 64)
    n_out_pad = 8192 * -(-n_out // 8192)

    ks, ts, bs = pad_knots(knots)
    out = _pv_device(
        jnp.asarray(wav),
        ks, ts, bs,
        jnp.float32(knots.duration()),
        jnp.asarray(hann_window(size)),
        size, hop, n_out_pad, n_frames, sr,
        formant=preserve_formants,
    )
    return np.asarray(out[:n_out])
