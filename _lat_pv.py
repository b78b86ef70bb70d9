import time
import numpy as np
import melonix_tpu as mlx
from melonix_tpu.engine.grains import build_grain_table
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.player import Player
from melonix_tpu.markers import Marker
from melonix_tpu.runtime.compile_cache import warmup_session

sr = 44100
t = np.arange(20 * sr) / sr
x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
warmup_session(len(x), sr)
table = build_grain_table(x)
knots = MapKnots.from_markers([], sr, len(x))
bent = MapKnots.from_markers(
    [Marker(sr, 57.0, 0.0, 4.0), Marker(10 * sr, 57.0, 0.0, 4.0)], sr, len(x))

# patch timing into PvStream internals
from melonix_tpu.engine import pv_stream as ps
orig_init = ps.PvStream.__init__
def timed_init(self, *a, **k):
    t0 = time.perf_counter()
    orig_init(self, *a, **k)
    print(f"  PvStream.__init__: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
ps.PvStream.__init__ = timed_init
orig_adv = ps.PvStream._advance_to
def timed_adv(self, s_hi):
    t0 = time.perf_counter(); orig_adv(self, s_hi)
    dt = (time.perf_counter()-t0)*1000
    if dt > 1: print(f"  _advance_to: {dt:.1f} ms", flush=True)
ps.PvStream._advance_to = timed_adv
orig_read = ps.PvStream.read
def timed_read(self, n):
    t0 = time.perf_counter(); r = orig_read(self, n)
    print(f"  read({n}): {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
    return r
ps.PvStream.read = timed_read

for trial in range(3):
    player = Player(x, table, knots, engine="pv")
    player.toggle()
    player.callback(1024)
    t0 = time.perf_counter()
    player.set_knots(bent)
    t1 = time.perf_counter()
    buf = player.callback(1024)
    t2 = time.perf_counter()
    print(f"trial {trial}: set_knots {1000*(t1-t0):.1f} ms, callback {1000*(t2-t1):.1f} ms, total {1000*(t2-t0):.1f} ms", flush=True)
