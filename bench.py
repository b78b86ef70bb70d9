"""Official benchmark: audio-sec/sec/chip for whole-track STFT + granular render.

Workload (BASELINE.json configs): a 180 s mono 44.1 kHz song; one pipeline
pass = full-track 2048-pt Hann STFT at 75% overlap (magnitudes, fused Pallas
kernel) + full-track granular pitch/time render with a 12-marker edit (plan
on the host, minimal-gather kernel on the device).  The north star is
>= 100x realtime per chip (BASELINE.md); ``vs_baseline`` is the ratio
against that.

Timing methodology: the metric is **measured device time from a
jax.profiler trace** (sum of on-device program durations per iteration).
Wall-clock dispatch timing is reported as a diagnostic only — on tunneled /
remote-dispatch platforms ``block_until_ready`` can return before execution,
and result-download anchoring measures the link instead of the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import glob
import gzip
import json
import tempfile
import time

import numpy as np


def make_song(sr: int, seconds: float) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    f = 220.0 * 2.0 ** (np.sin(2 * np.pi * 0.25 * t) * 0.5)
    x = 0.5 * np.sin(2 * np.pi * np.cumsum(f) / sr)
    x += 0.2 * np.sin(2 * np.pi * 2.0 * np.cumsum(f) / sr)
    x += 0.01 * np.random.default_rng(0).standard_normal(len(t))
    return x.astype(np.float32)


def _device_ms_per_iter(trace_dir: str, iters: int) -> float | None:
    """Sum per-iteration device time of jit_* programs from a profiler trace."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    events = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    total = 0.0
    for e in events:
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and name.startswith("jit_"):
            total += e["dur"]
    if total <= 0:
        return None
    return total / iters / 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from melonix_tpu.config import DEFAULT_CONFIG
    from melonix_tpu.engine.grains import build_grain_table
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.render import (
        build_render_plan,
        render_device,
        render_device_args,
    )
    from melonix_tpu.kernels import pallas_render
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

    # --- Per-edit host planning (the control plane) ---
    t0 = time.perf_counter()
    plan = build_render_plan(table, knots)
    out_len = 65536 * -(-int(plan.out_offset[-1]) // 65536)
    offs, gs, rb, n_valid, _, fix_idx, fix_val = render_device_args(plan, x, out_len)
    dev_args = (
        jnp.asarray(offs),
        jnp.asarray(gs),
        jnp.asarray(rb),
        n_valid,
        out_len,
        jnp.asarray(fix_idx),
        jnp.asarray(fix_val),
    )
    t_plan = time.perf_counter() - t0

    use_pallas = (
        jax.default_backend() == "tpu" and pallas_render.plan_supported(plan)
    )
    if use_pallas:
        pallas_args, gmax, szmax = pallas_render.args_for(plan, x, out_len)

    def pipeline():
        mags = stft_mags_device(wav_dev, win, cfg.stft_size, cfg.stft_hop, nf)
        if use_pallas:
            out = pallas_render.granular_render_pallas(
                wav_dev, *pallas_args, gmax=gmax, szmax=szmax
            )
        else:
            out = render_device(wav_dev, *dev_args)
        return mags, out

    # Warm-up / compile, then correctness anchor (forces real execution).
    mags, out = pipeline()
    anchor = float(jnp.sum(mags[::97, ::61])) + float(out[12345])
    assert np.isfinite(anchor), "non-finite pipeline output"

    # --- Metric: device time from a profiler trace ---
    iters = 3
    trace_dir = tempfile.mkdtemp(prefix="melonix_bench_")
    t_wall0 = time.perf_counter()
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(iters):
                mags, out = pipeline()
            _ = float(out[123]) + float(mags[1, 1])  # drain the pipe
        dev_ms = _device_ms_per_iter(trace_dir, iters)
    except Exception:
        dev_ms = None
    t_wall = (time.perf_counter() - t_wall0) / iters

    if dev_ms is None:  # no usable trace (e.g. bare CPU CI): wall clock
        dev_ms = t_wall * 1000.0
        source = "wall"
    else:
        source = "trace"

    value = seconds / (dev_ms / 1000.0)
    result = {
        "metric": "stft+granular-render audio-sec/sec/chip (180s song, 2048/75% Hann + 12-marker edit)",
        "value": round(value, 1),
        "unit": "x realtime",
        "vs_baseline": round(value / 100.0, 3),
    }
    print(json.dumps(result))
    # Diagnostic breakdown (ignored by the driver):
    import sys
    print(
        f"# breakdown: device={dev_ms:.1f}ms/iter ({source}) wall={t_wall:.3f}s/iter "
        f"plan={t_plan:.3f}s preproc={t_preproc:.2f}s grains={len(table)} "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
