"""Multi-process DCN smoke test (SURVEY §5; VERDICT r3 next #8, rank-count
parameterization r5 #8).

Spawns ``distributed_worker.py`` N times (N = 2 and 4): one JAX
distributed job, N ranks x 8/N virtual CPU devices = one 8-device global
mesh with gloo cross-process collectives standing in for DCN.  The workers
assert the seq-sharded PV (whose phase prefix sum and OLA seam spill cross
every process boundary) and an N-row batch serving step (one batch row per
rank) both match the single-device render; this parent only checks that
EVERY rank reaches ``DIST_OK``.

Skips when the platform cannot form the job (no gloo build, no free port,
sandboxed sockets) — detected from the worker's early failure signature.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("nprocs", [2, 4])
def test_multiprocess_batch(nprocs):
    try:
        port = _free_port()
    except OSError as exc:  # pragma: no cover - sandboxed sockets
        pytest.skip(f"cannot bind a local port: {exc!r}")

    env = dict(os.environ)
    # The workers configure their own platform/devices; scrub anything the
    # surrounding test session forced.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), str(port), str(nprocs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:  # pragma: no cover
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")

    joined = "\n".join(outs)
    if "DIST_OK" not in joined and (
        "gloo" in joined.lower() and "unavailable" in joined.lower()
        or "UNIMPLEMENTED" in joined
    ):  # pragma: no cover - platform without gloo collectives
        pytest.skip("CPU cross-process collectives unavailable on this platform")

    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (rank, out[-3000:])
        assert "DIST_OK" in out, (rank, out[-3000:])
