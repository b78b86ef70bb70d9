"""Metrics registry, timers, rate meters, logging, profiler wrappers."""

import threading
import time

import numpy as np

from melonix_tpu.utils import Counter, RateMeter, Timer, get_logger, registry, snapshot


def test_counter_thread_safety():
    c = Counter()

    def work():
        for _ in range(1000):
            c.inc()

    ts = [threading.Thread(target=work) for _ in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert c.value == 8000


def test_rate_meter_window():
    r = RateMeter(window=10.0)
    now = 100.0
    for i in range(10):
        r.tick(5, now=now + i * 0.1)
    rate = r.rate(now=now + 1.0)
    assert 40.0 < rate < 60.0  # 50 events over ~1s
    # events age out of the window
    assert r.rate(now=now + 100.0) == 0.0


def test_timer_accumulates():
    t = Timer()
    for _ in range(3):
        with t:
            time.sleep(0.002)
    assert t.count == 3
    assert t.total >= 0.006
    assert abs(t.mean - t.total / 3) < 1e-12


def test_registry_and_snapshot():
    registry("test.counter").inc(7)
    registry("test.rate", RateMeter).tick(3)
    with registry("test.timer", Timer):
        pass
    snap = snapshot()
    assert snap["test.counter"] >= 7
    assert "test.rate" in snap
    assert snap["test.timer"]["count"] >= 1
    # get-or-create returns the same object
    assert registry("test.counter").value >= 7


def test_tile_server_feeds_metrics(chirp):
    from melonix_tpu.config import Config
    from melonix_tpu.runtime.tiles import TileServer

    x, _sr = chirp
    cfg = Config(spectr_size=512, max_ranges=8)
    before = registry("tiles.computed").value
    server = TileServer(x, k=cfg.brightness_to_k(), config=cfg, synchronous=True)
    server.get_tile(0, 0, 400)
    server.close()
    assert registry("tiles.computed").value > before
    assert snapshot()["tiles.drain"]["count"] >= 1


def test_logger_single_handler():
    a = get_logger("melonix.a")
    b = get_logger("melonix.b")
    import logging

    assert len(logging.getLogger("melonix").handlers) == 1
    a.info("structured %s", "ok")
