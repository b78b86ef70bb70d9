"""Official benchmark: audio-sec/sec/chip for whole-track STFT + granular render.

Workload (BASELINE.json configs): a 180 s mono 44.1 kHz song; one pipeline
pass = full-track 2048-pt Hann STFT at 75% overlap (magnitudes) + full-track
granular pitch/time render with a 12-marker edit (plan on host, one fused
gather on device).  The north star is >= 100x realtime per chip
(BASELINE.md); ``vs_baseline`` is the ratio against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_song(sr: int, seconds: float) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    f = 220.0 * 2.0 ** (np.sin(2 * np.pi * 0.25 * t) * 0.5)
    x = 0.5 * np.sin(2 * np.pi * np.cumsum(f) / sr)
    x += 0.2 * np.sin(2 * np.pi * 2.0 * np.cumsum(f) / sr)
    x += 0.01 * np.random.default_rng(0).standard_normal(len(t))
    return x.astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from melonix_tpu.config import DEFAULT_CONFIG
    from melonix_tpu.engine.grains import build_grain_table
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.render import build_render_plan, render_from_plan_device
    from melonix_tpu.engine.spectral import hann_window, num_frames, stft_mags_device
    from melonix_tpu.markers import Marker

    sr = 44100
    seconds = 180.0
    cfg = DEFAULT_CONFIG
    x = make_song(sr, seconds)

    # --- Host preprocessing (one-time per file, like App::preproc) ---
    t0 = time.perf_counter()
    table = build_grain_table(x)
    t_preproc = time.perf_counter() - t0

    markers = [
        Marker(sample=int((i + 1) * len(x) / 14), note=57.0,
               d_time=0.01 * (1 if i % 2 == 0 else -1), pitch_bend=float((-1) ** i) * (1 + i % 4))
        for i in range(12)
    ]
    knots = MapKnots.from_markers(markers, sr, len(x))

    wav_dev = jnp.asarray(x)
    win = jnp.asarray(hann_window(cfg.stft_size))
    nf = num_frames(len(x), cfg.stft_size, cfg.stft_hop)

    def pipeline_results(plan):
        mags = stft_mags_device(wav_dev, win, cfg.stft_size, cfg.stft_hop, nf)
        n_grain_out = int(plan.out_offset[-1])
        out_len = 65536 * -(-n_grain_out // 65536)
        out = render_from_plan_device(
            wav_dev,
            jnp.asarray(plan.grain_start),
            jnp.asarray(plan.grain_len),
            jnp.asarray(plan.rate),
            jnp.asarray(plan.out_offset, jnp.int32),
            jnp.asarray(plan.seam_src),
            jnp.int32(n_grain_out),
            out_len,
        )
        return mags, out

    def pipeline():
        t_plan0 = time.perf_counter()
        plan = build_render_plan(table, knots)
        t_plan = time.perf_counter() - t_plan0
        jax.block_until_ready(pipeline_results(plan))
        return t_plan

    pipeline()  # warm-up / compile
    times = []
    plan_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        plan_times.append(pipeline())
        times.append(time.perf_counter() - t0)
    best = min(times)
    value = seconds / best

    # Anchored correctness + honesty probe: force a result download (tiny
    # scalars).  On a locally attached TPU this matches the block timing;
    # over a remote tunnel it is dominated by link round-trips, so it is
    # reported as a diagnostic, not the metric.
    t0 = time.perf_counter()
    mags, out = pipeline_results(build_render_plan(table, knots))
    anchor = float(jnp.sum(mags[::97, ::61])) + float(out[12345])
    t_anchored = time.perf_counter() - t0
    assert np.isfinite(anchor), "non-finite pipeline output"
    result = {
        "metric": "stft+granular-render audio-sec/sec/chip (180s song, 2048/75% Hann + 12-marker edit)",
        "value": round(value, 1),
        "unit": "x realtime",
        "vs_baseline": round(value / 100.0, 3),
    }
    print(json.dumps(result))
    # Diagnostic breakdown on stderr-ish (second line is ignored by driver):
    import sys
    print(
        f"# breakdown: best={best:.3f}s (plan={min(plan_times):.3f}s host) "
        f"anchored={t_anchored:.3f}s preproc={t_preproc:.2f}s "
        f"grains={len(table)} platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
