"""Band-limited sample-rate conversion (added capability; BASELINE config #5).

The reference never resamples: libswresample converts to mono float at the
file's own rate (app.cpp:669-684) and playback/export stay there.  Session
workflows need real SRC (48 kHz sessions to 44.1 kHz masters, etc.), so this
module provides a windowed-sinc (Kaiser) interpolator evaluated as one
device program: per output sample, a ``taps``-wide gather of the input and a
weighted sum against the shifted anti-aliasing kernel.  ~80 dB stopband at
the default 64 taps / beta 8.6; the kernel stretches by the decimation ratio
when downsampling so aliasing stays suppressed.

Deliberately NOT an FFT-domain resampler: track lengths are arbitrary, and
XLA lowers non-smooth-length FFTs on TPU to a dense O(n^2) DFT matmul — a
3-minute track would try to materialize a (n, n) matrix in HBM.  The gather
formulation is O(n * taps), shape-friendly, and memory-bound like the rest
of the render path.
"""

from __future__ import annotations

from functools import partial
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np

TAPS = 64  # half-width 32 zero-crossings at the output Nyquist
BETA = 8.6  # Kaiser beta: ~80 dB stopband


@partial(jax.jit, static_argnames=("taps", "fc"))
def _sinc_resample_device(x: jnp.ndarray, base: jnp.ndarray, frac: jnp.ndarray, taps: int, fc: float):
    """x: (C, n) float32 → (C, n_out); output n reads input at base[n]+frac[n].

    base/frac come from the host in exact int64/f64 rational arithmetic
    (devices run 32-bit here; n*down would overflow int32 on long tracks).
    """
    n = x.shape[-1]
    j = jnp.arange(taps, dtype=jnp.int32) - taps // 2 + 1
    idx = base[:, None] + j[None, :]  # (n_out, taps)
    t = j[None, :].astype(jnp.float32) - frac[:, None]  # kernel argument
    half = taps // 2
    window = jnp.i0(BETA * jnp.sqrt(jnp.clip(1.0 - (t / half) ** 2, 0.0, 1.0))) / jnp.i0(BETA)
    w = 2.0 * fc * jnp.sinc(2.0 * fc * t) * window
    w = w / jnp.sum(w, axis=1, keepdims=True)  # exact DC
    valid = (idx >= 0) & (idx < n)
    g = jnp.where(valid[None, :, :], x[:, jnp.clip(idx, 0, n - 1)], 0.0)
    return jnp.einsum("ot,cot->co", w, g, preferred_element_type=jnp.float32)


def resample(x, sr_in: int, sr_out: int, *, taps: int = TAPS) -> np.ndarray:
    """Resample float32 audio (n,) or (n, channels) from sr_in to sr_out."""
    x = np.asarray(x, np.float32)
    if sr_in == sr_out:
        return x
    g = gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g
    n_in = len(x)
    n_out = int(n_in * up / down)
    if n_in == 0 or n_out == 0:
        return np.zeros((0,) + x.shape[1:], np.float32)
    ratio = sr_in / sr_out
    # Anti-aliasing cutoff at the lower Nyquist; stretch taps when decimating.
    fc = 0.5 * min(1.0, 1.0 / ratio) * 0.97
    eff_taps = int(8 * -(-int(taps * max(1.0, ratio)) // 8))
    # Exact rational positions: output n reads input at n*down/up.
    num = np.arange(n_out, dtype=np.int64) * down
    base = (num // up).astype(np.int32)
    frac = ((num % up) / up).astype(np.float32)
    moved = x.T if x.ndim == 2 else x[None]
    y = np.asarray(
        _sinc_resample_device(
            jnp.asarray(moved), jnp.asarray(base), jnp.asarray(frac),
            eff_taps, float(fc),
        )
    )
    return y.T if x.ndim == 2 else y[0]
