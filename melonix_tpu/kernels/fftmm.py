"""Four-step (Bailey) DFT as MXU matmuls.

The reference leans on FFTW for its 32768-point DFTs (spec.cpp:15).  On TPU
the FLOPs live in the MXU (128x128 systolic array), so instead of translating
an FFT butterfly we *factor the DFT into matmuls*: with N = N1 * N2 and
n = n1 + N1 * n2, k = k2 + N2 * k1,

    X[k2 + N2*k1] = sum_n1 W_N^(n1*k2) W_N1^(n1*k1) sum_n2 x[n1 + N1*n2] W_N2^(n2*k2)

i.e.  reshape → (F_N2 @ X) ⊙ twiddle @ F_N1 → transpose-reshape: two dense
matmuls of MXU-friendly sizes (128/256/512) plus an elementwise twiddle, all
batched over frames.  Complex arithmetic is carried as explicit (re, im)
pairs of float32 matmuls — XLA fuses the adds and keeps everything on the
MXU.  Einsums pin ``Precision.HIGHEST``: the TPU default is bf16 passes,
which costs ~1e-2 relative DFT error — far outside the −60 dB parity bar.
For batched spectrogram workloads this beats the generic XLA FFT; both
backends are exposed and benchmarked (bench.py).

Supported sizes: any N = N1 * N2 with N1, N2 <= 512 (covers the reference's
32768 = 256 * 128 and the modern 2048 = 64 * 32 modes).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _factor(n: int) -> tuple[int, int]:
    """Split n = n1 * n2 with both factors <= 512, n2 preferring 128."""
    best = None
    for n2 in (128, 256, 512, 64, 32, 16, 8, 4, 2):
        if n % n2 == 0 and n // n2 <= 512:
            n1 = n // n2
            if n2 == 128:
                return n1, n2
            if best is None:
                best = (n1, n2)
    if best is None:
        raise ValueError(f"unsupported DFT size {n} (need n1*n2 with both <= 512)")
    return best


@lru_cache(maxsize=8)
def _mats(n: int):
    n1, n2 = _factor(n)
    # F_N2[k2, m2] = W_N2^(m2*k2); F_N1[m1, k1] = W_N1^(m1*k1)
    k2, m2 = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    ang2 = -2.0 * np.pi * (k2 * m2 % n2) / n2
    m1, k1 = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    ang1 = -2.0 * np.pi * (m1 * k1 % n1) / n1
    # Twiddle T[k2, n1] = W_N^(n1*k2)
    tk2, tn1 = np.meshgrid(np.arange(n2), np.arange(n1), indexing="ij")
    angt = -2.0 * np.pi * (tk2 * tn1 % n) / n
    return (
        n1,
        n2,
        np.cos(ang2).astype(np.float32),
        np.sin(ang2).astype(np.float32),
        np.cos(ang1).astype(np.float32),
        np.sin(ang1).astype(np.float32),
        np.cos(angt).astype(np.float32),
        np.sin(angt).astype(np.float32),
    )


def fft_matmul_real(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DFT of real float32 input x (..., N) → (re, im) float32 (..., N)."""
    n = x.shape[-1]
    n1, n2, c2, s2, c1, s1, ct, st = _mats(n)
    c2, s2, c1, s1, ct, st = map(jnp.asarray, (c2, s2, c1, s1, ct, st))
    batch = x.shape[:-1]
    xm = x.reshape(batch + (n2, n1))  # [n2_index, n1_index]
    # Stage 1: Y[k2, n1] = sum_n2 F_N2[k2, n2] * x[n2, n1]  (real input)
    yr = jnp.einsum("km,...mn->...kn", c2, xm, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    yi = jnp.einsum("km,...mn->...kn", s2, xm, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    # Stage 2: twiddle (elementwise complex multiply)
    tr = yr * ct - yi * st
    ti = yr * st + yi * ct
    # Stage 3: Z[k2, k1] = sum_n1 T[k2, n1] * F_N1[n1, k1]
    zr = jnp.einsum("...kn,nm->...km", tr, c1, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) - jnp.einsum(
        "...kn,nm->...km", ti, s1, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    zi = jnp.einsum("...kn,nm->...km", tr, s1, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) + jnp.einsum(
        "...kn,nm->...km", ti, c1, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Output order: X[k2 + N2*k1] = Z[k2, k1] → transpose → (k1, k2) raster.
    zr = jnp.swapaxes(zr, -1, -2).reshape(batch + (n,))
    zi = jnp.swapaxes(zi, -1, -2).reshape(batch + (n,))
    return zr, zi


def fft_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """Complex-output DFT via MXU matmuls; accepts real or complex input."""
    if jnp.iscomplexobj(x):
        rr, ri = fft_matmul_real(jnp.real(x).astype(jnp.float32))
        ir, ii = fft_matmul_real(jnp.imag(x).astype(jnp.float32))
        return jax.lax.complex(rr - ii, ri + ir)
    re, im = fft_matmul_real(x.astype(jnp.float32))
    return jax.lax.complex(re, im)

