"""Spectrogram tile server — the SpecCache/Spec replacement.

Reference architecture (spec.cpp:18-42, spec-cache.cpp:10-50): per-column
LRU caches keyed by pixel-column index; a miss enqueues a job for a worker
thread and returns a placeholder (black, stays dirty, repolled every frame)
until the spectrum arrives.  That *black-until-ready contract is
load-bearing for UI responsiveness* (SURVEY.md §5) and is preserved here.

TPU inversion: instead of one FFTW call per column on a CPU thread, the
worker drains the whole request queue each cycle and computes every pending
column in ONE batched device program (engine/spectral), optionally
colormapping on device too.  The host keeps an LRU of downloaded RGB tiles
(capacity ``max_ranges`` = 4000, range.hpp:4).
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict
from typing import Callable

import numpy as np

from ..config import DEFAULT_CONFIG, Config
from ..ui.colormap import colormap_np


class LruCache:
    """Recency cache with the reference's capacity/eviction behavior
    (insert-then-evict-oldest above capacity, spec.cpp:33-40)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._d: OrderedDict = OrderedDict()

    def get(self, key):
        if key not in self._d:
            return None
        self._d.move_to_end(key, last=False)  # front = most recent
        return self._d[key]

    def put(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key, last=False)
        while len(self._d) > self.capacity:
            self._d.popitem(last=True)

    def __contains__(self, key):
        return key in self._d

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()


class TileServer:
    """Async batched spectrogram tiles with the black-until-ready contract.

    ``get_tile(key, start_sample, end_sample)`` returns an (n_bins, 3) uint8
    RGB tile, or None while pending (caller draws black and re-requests next
    frame, spec-cache.cpp:67-71).  All requests accumulated between worker
    cycles are computed in one batched device call.
    """

    PLACEHOLDER_BINS = 16  # black placeholder texel count (spec-cache.cpp:70)

    def __init__(
        self,
        wav: np.ndarray,
        *,
        k: float,
        config: Config = DEFAULT_CONFIG,
        compute: Callable | None = None,
        poll_interval: float = 0.002,
        synchronous: bool = False,
    ):
        import jax.numpy as jnp

        from ..engine.spectral import spectrogram_columns_device

        self._cfg = config
        self._k = float(k)
        self._wav_dev = jnp.asarray(np.asarray(wav, np.float32))
        self._compute = compute or (
            lambda starts, ends: np.asarray(
                spectrogram_columns_device(
                    self._wav_dev,
                    jnp.asarray(starts, jnp.int32),
                    jnp.asarray(ends, jnp.int32),
                    size=config.spectr_size,
                )
            )
        )
        self._cache = LruCache(config.max_ranges)
        self._pending: dict = {}
        self._lock = threading.Lock()
        self._poll = poll_interval
        self._synchronous = synchronous
        self._running = not synchronous
        self._thread = None
        if not synchronous:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    # -- public API ----------------------------------------------------

    def get_tile(self, key: int, start_sample: int, end_sample: int):
        """LRU lookup; miss → enqueue + None (black until ready)."""
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None:
                return hit
            self._pending[key] = (int(start_sample), int(end_sample))
        if self._synchronous:
            self._drain_once()
            with self._lock:
                return self._cache.get(key)
        return None

    def prefetch(self, requests) -> None:
        """Enqueue many (key, start, end) at once so the worker computes the
        whole viewport in ONE batched device call (one frame = one dispatch,
        not one per column)."""
        with self._lock:
            missing = [r for r in requests if r[0] not in self._cache]
            for key, s, e in missing:
                self._pending[key] = (int(s), int(e))
        if self._synchronous and missing:
            self._drain_once()

    def set_brightness_k(self, k: float) -> None:
        """Brightness changes rebuild tiles (app.cpp:76-80 drops SpecCache);
        magnitudes aren't cached host-side, so recolor = recompute."""
        with self._lock:
            self._k = float(k)
            self._cache.clear()

    def clear(self) -> None:
        with self._lock:
            self._cache.clear()
            self._pending.clear()

    def stats(self) -> dict:
        with self._lock:
            return {"cached": len(self._cache), "pending": len(self._pending)}

    def close(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    # -- worker --------------------------------------------------------

    def _drain_once(self) -> bool:
        with self._lock:
            if not self._pending:
                return False
            batch = list(self._pending.items())
            self._pending.clear()
            k = self._k
        keys = [b[0] for b in batch]
        starts = np.asarray([b[1][0] for b in batch], np.int64)
        ends = np.asarray([b[1][1] for b in batch], np.int64)
        # One STATIC batch shape: pad to a multiple of CHUNK and loop — the
        # device program compiles once ever, whatever the viewport does.
        CHUNK = 256
        n_req = len(keys)
        outs = []
        for off in range(0, n_req, CHUNK):
            s = starts[off : off + CHUNK]
            e = ends[off : off + CHUNK]
            if len(s) < CHUNK:
                pad = CHUNK - len(s)
                s = np.concatenate([s, np.repeat(s[-1:], pad)])
                e = np.concatenate([e, np.repeat(e[-1:], pad)])
            outs.append(self._compute(s, e))
        mags = np.concatenate(outs)[:n_req]
        rgb = colormap_np(mags, k)
        with self._lock:
            for i, key in enumerate(keys):
                self._cache.put(key, rgb[i])
        return True

    def _run(self) -> None:
        while self._running:
            if not self._drain_once():
                time.sleep(self._poll)
