#!/bin/bash
# Probe the axon service; when it answers, run the on-chip revalidation:
# Player edit path + official bench. Output to /tmp/recover.log.
cd /root/repo
for i in $(seq 1 40); do
  if timeout 120 python -c "
import melonix_tpu, jax, jax.numpy as jnp
x = jax.jit(lambda a: a@a)(jnp.ones((128,128)))
assert float(x[0,0]) == 128.0
" >/dev/null 2>&1; then
    echo "service recovered after $i probes $(date)" > /tmp/recover.log
    timeout 550 python - >> /tmp/recover.log 2>&1 <<'PYEOF'
import numpy as np, time
import melonix_tpu as mlx
from melonix_tpu.engine.grains import build_grain_table
from melonix_tpu.engine.maps import MapKnots
from melonix_tpu.engine.player import Player
from melonix_tpu.markers import Marker
from melonix_tpu.runtime.compile_cache import warmup_session
sr = 44100
t = np.arange(20*sr)/sr
x = (0.5*np.sin(2*np.pi*220*t)).astype(np.float32)
warmup_session(len(x), sr)
table = build_grain_table(x)
knots = MapKnots.from_markers([], sr, len(x))
bent = MapKnots.from_markers([Marker(sr,57.0,0.0,4.0),Marker(10*sr,57.0,0.0,4.0)], sr, len(x))
for engine in ("granular","pv"):
    p = Player(x, table, knots, engine=engine); p.toggle(); p.callback(1024)
    t0=time.perf_counter(); p.set_knots(bent); buf=p.callback(1024)
    print(engine, "edit->audio %.1f ms" % (1000*(time.perf_counter()-t0)), "finite", np.isfinite(buf).all(), "nonzero", float(np.abs(buf).max()))
PYEOF
    timeout 890 python bench.py >> /tmp/recover.log 2>&1
    echo "done $(date)" >> /tmp/recover.log
    exit 0
  fi
  sleep 240
done
echo "never recovered $(date)" > /tmp/recover.log
