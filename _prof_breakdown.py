import os, tempfile, time, glob, gzip, json, collections
import numpy as np, jax, jax.numpy as jnp
from melonix_tpu.config import DEFAULT_CONFIG
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.phase_vocoder import render_track_pv
from melonix_tpu.engine.spectral import hann_window, num_frames, stft_mags_device
from melonix_tpu.markers import Marker
from bench import make_song, _device_ms_per_iter

sr = 44100; seconds = 180.0
cfg = DEFAULT_CONFIG
x = make_song(sr, seconds)
markers = [Marker(sample=int((i+1)*len(x)/14), note=57.0,
                  d_time=0.01*(1 if i%2==0 else -1), pitch_bend=float((-1)**i)*(1+i%4))
           for i in range(12)]
knots = MapKnots.from_markers(markers, sr, len(x))
wav_dev = jnp.asarray(x)
win = jnp.asarray(hann_window(cfg.stft_size))
nf = num_frames(len(x), cfg.stft_size, cfg.stft_hop)

def pipeline():
    mags = stft_mags_device(wav_dev, win, cfg.stft_size, cfg.stft_hop, nf)
    out = render_track_pv(wav_dev, knots)
    return mags, out

mags, out = pipeline()
_ = float(jnp.sum(mags[::97,::61])) + float(out[12345])

trace_dir = tempfile.mkdtemp(prefix="mlx_prof_")
iters = 3
with jax.profiler.trace(trace_dir):
    for _ in range(iters):
        mags, out = pipeline()
    _ = float(out[123]) + float(mags[1,1])

# per-program totals from the trace
per = collections.Counter()
for p in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True):
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        name = ev.get("name", "")
        if ev.get("ph") == "X" and name.startswith("jit_"):
            args = ev.get("args") or {}
            if "run_id" in args or True:
                per[name] += ev.get("dur", 0)
total = sum(per.values())
print("total device us per iter:", total/iters)
for name, us in per.most_common(20):
    print(f"{us/iters/1000.0:8.2f} ms  {name}")
