"""Command-line interface.

The minimum end-to-end slice (SURVEY.md §7): decode → analysis → marker
edits → render → WAV out, plus spectrogram/scene snapshots and project
round-trips — everything the reference app does, headless.

    python -m melonix_tpu render in.wav --markers m.json -o out.wav
    python -m melonix_tpu spectrogram in.mlx -o scene.png --width 1280
    python -m melonix_tpu pitch in.wav -o curve.json
    python -m melonix_tpu info in.wav
    python -m melonix_tpu project in.wav --markers m.json -o session.mlx
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_any(path: str):
    """(wav, rate, markers, brightness, tempo) from audio, .mlx, or a
    reference-format .melonix project (app.cpp:130-138 extension dispatch)."""
    from .io.project import load_project
    from .io.audio import load_audio
    from .config import DEFAULT_CONFIG as C

    if path.endswith(".mlx"):
        p = load_project(path)
        return p.wav, p.sample_rate, p.markers, p.brightness, p.tempo
    if path.endswith(".melonix"):
        from .io.melonix import load_melonix

        p = load_melonix(path)
        return p.wav, p.sample_rate, p.markers, p.brightness, p.tempo
    wav, rate = load_audio(path)
    return wav, rate, [], C.brightness, C.tempo


def _markers_from_arg(path: str | None, existing):
    from .markers import markers_from_json

    if path is None:
        return existing
    with open(path) as f:
        return markers_from_json(f.read())


def cmd_render(args) -> int:
    import contextlib

    from .engine.session import render_session
    from .io.audio import load_audio
    from .io.resample import resample
    from .io.wav import write_wav
    from .utils import trace

    is_project = args.input.endswith((".mlx", ".melonix"))
    if args.stereo and not is_project:
        wav, rate = load_audio(args.input, mono=False)
        markers = []
    else:
        if args.stereo:
            # Both project formats store mono audio (app.hpp:71-76), so a
            # .melonix must take this branch too, not the WAV parser.
            print("warning: projects store mono audio; --stereo ignored",
                  file=sys.stderr)
        wav, rate, markers, _b, _t = _load_any(args.input)
    markers = _markers_from_arg(args.markers, markers)
    t0 = time.perf_counter()
    ctx = trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        out = render_session(
            wav, markers, rate,
            engine=args.engine, preserve_formants=args.formant,
            phase_locking=args.lock,
        )
        out_rate = rate
        if args.rate and args.rate != rate:
            out = resample(out, rate, args.rate)
            out_rate = args.rate
    dt = time.perf_counter() - t0
    write_wav(args.output, out, out_rate, dtype=args.dtype)
    ch = out.shape[1] if out.ndim == 2 else 1
    detail = ("phase-vocoder"
              + (" formant-preserving" if args.formant else "")
              + (" phase-locked" if args.lock else "")
              if args.engine == "pv" else "granular")
    print(
        f"rendered {len(out)/out_rate:.2f}s x{ch}ch @{out_rate}Hz "
        f"({len(markers)} markers, {detail}) in {dt:.2f}s -> {args.output}"
    )
    return 0


def cmd_spectrogram(args) -> int:
    from .config import Config
    from .markers import sort_markers
    from .ui.png import write_png
    from .ui.state import EditorState, Viewport
    from .ui.view import render_scene

    cfg = Config(tile_source="pyramid") if args.pyramid else Config()
    ed = EditorState(config=cfg, viewport=Viewport(args.width, args.height))
    ed.open_file(args.input)
    ed.markers = sort_markers(_markers_from_arg(args.markers, ed.markers))
    ed.invalidate()
    if args.start is not None:
        ed.start_time = args.start
    if args.range is not None:
        ed.range_time = args.range
    else:
        ed.range_time = max(len(ed.wav) / ed.sample_rate, 0.001)
    if args.note_start is not None:
        ed.start_note = args.note_start
    if args.note_range is not None:
        ed.range_note = args.note_range
    ed.set_brightness(args.brightness)
    t0 = time.perf_counter()
    img = render_scene(ed, synchronous_tiles=True)
    dt = time.perf_counter() - t0
    write_png(args.output, img)
    if ed._tile_server:
        ed._tile_server.close()
    print(f"scene {img.shape[1]}x{img.shape[0]} rendered in {dt:.2f}s -> {args.output}")
    return 0


def cmd_pitch(args) -> int:
    from .engine.pitch import pitch_curve

    wav, rate, _m, _b, _t = _load_any(args.input)
    t0 = time.perf_counter()
    curve = pitch_curve(wav, rate, method=args.method)
    dt = time.perf_counter() - t0
    payload = {
        "sample_rate": int(rate),
        "hop": int(curve.hop),
        "f0_hz": [round(float(v), 3) for v in curve.f0],
        "voiced": [bool(v) for v in curve.voiced],
        "note": [round(float(v), 3) for v in curve.note],
    }
    with open(args.output, "w") as f:
        json.dump(payload, f)
    voiced_pct = 100.0 * np.mean(curve.voiced) if len(curve.voiced) else 0.0
    print(
        f"pitch: {len(curve.f0)} frames ({voiced_pct:.0f}% voiced) in {dt:.2f}s -> {args.output}"
    )
    return 0


def cmd_batch(args) -> int:
    """Serving path: render a fleet of files in mesh-width batches."""
    import glob as _glob

    from .engine.autotune import suggest_markers
    from .engine.batch import render_batch
    from .io.audio import write_audio

    files = sorted({f for pat in args.inputs for f in _glob.glob(pat)})
    if not files:
        print(f"batch: no files match {args.inputs}", file=sys.stderr)
        return 2
    os.makedirs(args.outdir, exist_ok=True)
    shared = _markers_from_arg(args.markers, None) if args.markers else None

    t0 = time.perf_counter()
    by_rate: dict[int, list] = {}
    for f in files:
        # Audio files render with the shared/derived markers; project
        # files (.mlx/.melonix) carry their own edit with them.
        wav, rate, own_markers, _b, _t = _load_any(f)
        by_rate.setdefault(rate, []).append((f, wav, own_markers))

    from .markers import sort_markers

    written = []
    used_names: set[str] = set()
    for rate, group in sorted(by_rate.items()):
        # Mesh-width slices: bounded host/device memory per dispatch, and
        # shorter groups don't pad to an unrelated long track's length.
        import jax

        slice_n = max(4 * len(jax.devices()), 8)
        for g0 in range(0, len(group), slice_n):
            chunk = group[g0 : g0 + slice_n]
            tracks = [w for _, w, _m in chunk]
            base_l = [own if own else (shared or []) for _f, _w, own in chunk]
            if args.autotune:
                # Suggestions layer ON TOP of the base edit (the shell's
                # Autotune button does the same) — projects keep their
                # own markers, --markers keeps the shared set.
                markers_l = [
                    sort_markers(base + suggest_markers(
                        w, rate, scale=args.scale, key=args.key,
                        strength=args.strength, vibrato=args.vibrato,
                    ))
                    for w, base in zip(tracks, base_l)
                ]
            else:
                markers_l = base_l
            outs = render_batch(
                tracks, markers_l, rate, engine=args.engine,
                preserve_formants=args.engine == "pv" and not args.no_formant,
                phase_locking=args.engine == "pv" and args.lock,
            )
            for (f, _w, _m), out in zip(chunk, outs):
                stem = os.path.splitext(os.path.basename(f))[0]
                name, k = f"{stem}.{args.format}", 2
                while name in used_names:  # same stem from another dir
                    name = f"{stem}-{k}.{args.format}"
                    k += 1
                used_names.add(name)
                outp = os.path.join(args.outdir, name)
                write_audio(outp, out, rate)
                written.append(outp)
    dt = time.perf_counter() - t0
    print(
        f"batch: {len(written)} files ({len(by_rate)} rate group(s), "
        f"engine {args.engine}) in {dt:.2f}s -> {args.outdir}"
    )
    return 0


def cmd_info(args) -> int:
    from .engine.grains import build_grain_table
    from .engine.maps import MapKnots

    wav, rate, markers, brightness, tempo = _load_any(args.input)
    table = build_grain_table(wav)
    knots = MapKnots.from_markers(markers, rate, len(wav))
    print(
        json.dumps(
            {
                "samples": len(wav),
                "sample_rate": rate,
                "duration_sec": round(len(wav) / rate, 3),
                "warped_duration_sec": round(knots.duration(), 3),
                "grains": len(table),
                "markers": len(markers),
                "brightness": brightness,
                "tempo": tempo,
                "peak": round(float(np.abs(wav).max()) if len(wav) else 0.0, 4),
            },
            indent=2,
        )
    )
    return 0


def cmd_autotune(args) -> int:
    from .engine.autotune import autotune
    from .io.wav import write_wav
    from .markers import markers_to_json

    wav, rate, _m, _b, _t = _load_any(args.input)
    t0 = time.perf_counter()
    out, markers = autotune(
        wav, rate,
        scale=args.scale, key=args.key, strength=args.strength,
        vibrato=args.vibrato,
        engine=args.engine, preserve_formants=not args.no_formant,
    )
    dt = time.perf_counter() - t0
    write_wav(args.output, out, rate, dtype=args.dtype)
    if args.markers_out:
        with open(args.markers_out, "w") as f:
            f.write(markers_to_json(markers))
    print(
        f"autotuned {len(out)/rate:.2f}s: {len(markers)} markers "
        f"({args.scale}/{args.key}, strength {args.strength}) in {dt:.2f}s "
        f"-> {args.output}"
    )
    return 0


def cmd_ui(args) -> int:
    from .config import Config
    from .ui.web import serve

    cfg = Config(tile_source="pyramid") if args.pyramid else Config()
    serve(args.input, host=args.host, port=args.port, config=cfg)
    return 0


def cmd_project(args) -> int:
    from .io.project import Project, save_project

    wav, rate, markers, brightness, tempo = _load_any(args.input)
    markers = _markers_from_arg(args.markers, markers)
    proj = Project(wav=wav, sample_rate=rate, markers=markers, brightness=brightness, tempo=tempo)
    if args.output.endswith(".melonix"):  # reference-format interop
        from .io.melonix import save_melonix

        out = save_melonix(args.output, proj)
    else:
        out = save_project(args.output, proj)
    print(f"saved project ({len(markers)} markers) -> {out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="melonix_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="offline render to WAV")
    r.add_argument("input")
    r.add_argument("--markers", help="markers JSON file")
    r.add_argument("-o", "--output", required=True)
    r.add_argument("--dtype", choices=["int16", "float32"], default="int16")
    r.add_argument(
        "--engine",
        choices=["granular", "pv"],
        default="granular",
        help="granular = reference-parity splicer; pv = phase vocoder",
    )
    r.add_argument("--trace", help="write a jax.profiler trace to this directory")
    r.add_argument("--stereo", action="store_true", help="keep source channels")
    r.add_argument("--formant", action="store_true",
                   help="preserve the spectral envelope (pv engine only)")
    r.add_argument("--lock", action="store_true",
                   help="identity phase locking (pv engine only)")
    r.add_argument("--rate", type=int, help="resample the output to this rate")
    r.set_defaults(fn=cmd_render)

    s = sub.add_parser("spectrogram", help="render the editor scene to PNG")
    s.add_argument("input")
    s.add_argument("--markers")
    s.add_argument("-o", "--output", required=True)
    s.add_argument("--width", type=int, default=1280)
    s.add_argument("--height", type=int, default=720)
    s.add_argument("--start", type=float)
    s.add_argument("--range", type=float, dest="range")
    s.add_argument("--note-start", type=float)
    s.add_argument("--note-range", type=float)
    s.add_argument("--brightness", type=float, default=50.0)
    s.add_argument("--pyramid", action="store_true",
                   help="HBM-resident multi-res STFT pyramid instead of "
                        "reference-parity on-demand columns")
    s.set_defaults(fn=cmd_spectrogram)

    t = sub.add_parser("pitch", help="batched pitch-curve extraction")
    t.add_argument("--method", choices=("nsdf", "hps", "hybrid"),
                   default="nsdf",
                   help="autocorrelation (nsdf), harmonic product spectrum, "
                        "or hybrid octave-vote")
    t.add_argument("input")
    t.add_argument("-o", "--output", required=True)
    t.set_defaults(fn=cmd_pitch)

    i = sub.add_parser("info", help="track / project summary")
    i.add_argument("input")
    i.set_defaults(fn=cmd_info)

    j = sub.add_parser("project", help="bundle audio + markers into a .mlx project")
    j.add_argument("input")
    j.add_argument("--markers")
    j.add_argument("-o", "--output", required=True)
    j.set_defaults(fn=cmd_project)

    b = sub.add_parser(
        "batch", help="render many files (mesh data-parallel when >1 device)"
    )
    b.add_argument("inputs", nargs="+", help="file globs")
    b.add_argument("-o", "--outdir", required=True)
    b.add_argument("--engine", choices=["granular", "pv"], default="pv")
    b.add_argument("--markers", help="shared markers JSON applied to every file")
    b.add_argument("--autotune", action="store_true",
                   help="derive per-file markers from pitch correction")
    b.add_argument("--scale", choices=["chromatic", "major", "minor"], default="chromatic")
    b.add_argument("--key", default="a")
    b.add_argument("--strength", type=float, default=1.0)
    b.add_argument("--vibrato", type=float, default=0.0)
    b.add_argument("--no-formant", action="store_true")
    b.add_argument("--lock", action="store_true",
                   help="identity phase locking (pv jobs)")
    b.add_argument("--format", default="wav",
                   help="output extension for write_audio (wav/flac/m4a/...)")
    b.set_defaults(fn=cmd_batch)

    a = sub.add_parser("autotune", help="detect pitch, snap to scale, render")
    a.add_argument("input")
    a.add_argument("-o", "--output", required=True)
    a.add_argument("--scale", choices=["chromatic", "major", "minor"], default="chromatic")
    a.add_argument("--key", default="a", help="key root (a, c#, bb, ...)")
    a.add_argument("--strength", type=float, default=1.0)
    a.add_argument("--vibrato", type=float, default=0.0,
                   help="0..1: flatten intra-note pitch modulation")
    a.add_argument("--engine", choices=["granular", "pv"], default="pv")
    a.add_argument("--no-formant", action="store_true")
    a.add_argument("--markers-out", help="also write the suggested markers JSON")
    a.add_argument("--dtype", choices=["int16", "float32"], default="int16")
    a.set_defaults(fn=cmd_autotune)

    u = sub.add_parser("ui", help="interactive browser editor")
    u.add_argument("input", nargs="?", help="audio file or .mlx project to open")
    u.add_argument("--host", default="127.0.0.1")
    u.add_argument("--port", type=int, default=8666)
    u.add_argument("--pyramid", action="store_true",
                   help="HBM-resident multi-res tile pyramid (fast pan/zoom)")
    u.set_defaults(fn=cmd_ui)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
