"""Profiling + structured logging.

Replaces the reference's LOG(...) macro (mika314/log, used at app.cpp:144,
740, 950 etc.) with stdlib structured logging, and its nothing-at-all
profiling story with ``jax.profiler`` traces (SURVEY.md §5): ``trace()``
wraps a region and writes an xprof/perfetto trace directory; ``annotate()``
names a host-side region inside a trace.
"""

from __future__ import annotations

import contextlib
import logging

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "melonix") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("melonix").handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("melonix")
        root.addHandler(h)
        root.setLevel(logging.INFO)
    return logger


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region.

    View with xprof / tensorboard-plugin-profile, or load the contained
    ``*.trace.json.gz`` in perfetto.  Falls back to a no-op if the profiler
    can't start (e.g. already tracing).
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - depends on runtime state
        get_logger("melonix.trace").warning("profiler unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a profiler trace (host-side annotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
