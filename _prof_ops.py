import os, tempfile, glob, gzip, json, collections
import numpy as np, jax, jax.numpy as jnp
from melonix_tpu.config import DEFAULT_CONFIG
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.phase_vocoder import render_track_pv
from melonix_tpu.markers import Marker
from bench import make_song

sr = 44100
x = make_song(sr, 180.0)
markers = [Marker(sample=int((i+1)*len(x)/14), note=57.0,
                  d_time=0.01*(1 if i%2==0 else -1), pitch_bend=float((-1)**i)*(1+i%4))
           for i in range(12)]
knots = MapKnots.from_markers(markers, sr, len(x))
wav_dev = jnp.asarray(x)
out = render_track_pv(wav_dev, knots)
_ = float(np.asarray(out[123]))

trace_dir = tempfile.mkdtemp(prefix="mlx_ops_")
with jax.profiler.trace(trace_dir):
    out = render_track_pv(wav_dev, knots)
    _ = float(np.asarray(out[123]))

per = collections.Counter()
pids = {}
for p in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True):
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X":
            track = pids.get(ev.get("pid"), "")
            if "TPU" in track or "xla" in track.lower():
                per[(track, ev.get("name", ""))] += ev.get("dur", 0)
tot = sum(per.values())
print("tracks:", set(pids.values()))
for (track, name), us in per.most_common(30):
    print(f"{us/1000.0:8.2f} ms  {name[:90]}  [{track[:30]}]")
