"""bf16x3 ("3-pass") matmuls for Pallas/Mosaic kernels.

Mosaic's ``jnp.dot`` supports only ``Precision.DEFAULT`` (one bf16 pass,
~8 mantissa bits — measured -51 dB for matmul DFTs, below the -60 dB
parity bar) and ``Precision.HIGHEST`` (six passes, -120 dB, but all six
run on the MXU).  XLA's middle tier ``Precision.HIGH`` (three passes) is
NotImplemented in the Mosaic lowering, so this module emulates it: split
each f32 operand into a bf16 high part and a bf16 low part (the rounding
residual), and accumulate the three significant cross products

    x @ y  ~=  xh @ yh + xh @ yl + xl @ yh        (xl @ yl ~ 2^-32, dropped)

giving ~16 effective mantissa bits at 3 MXU passes — measured -96 dB for
the 2048-pt DFT on v5e, 2x the HIGHEST throughput.  Use for kernels whose
accuracy bar is -60 dB; keep HIGHEST where bit-level parity is claimed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side :func:`split` for precomputed constant matrices."""
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def split(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot(xs, ys, exact: bool = False) -> jnp.ndarray:
    """3-pass f32-accurate-ish dot of pre-split operands.

    ``xs``/``ys`` are (hi, lo) bf16 pairs from :func:`split`; returns f32.

    ``exact=True`` upcasts the operands to f32 first — bit-equivalent to
    the MXU's bf16-multiply/f32-accumulate (bf16 x bf16 products are
    exactly representable in f32).  REQUIRED in interpret mode: the
    Pallas interpreter drops ``preferred_element_type`` and rounds each
    dot's output to bf16 (measured -53 dB instead of -96).
    Used by kernels/pallas_pv.py's ``_d3``/``_e3`` wrappers.
    """
    xh, xl = xs
    yh, yl = ys
    if exact:
        xh, xl = xh.astype(jnp.float32), xl.astype(jnp.float32)
        yh, yl = yh.astype(jnp.float32), yl.astype(jnp.float32)
    acc = jnp.dot(xh, yh, preferred_element_type=jnp.float32)
    acc += jnp.dot(xh, yl, preferred_element_type=jnp.float32)
    acc += jnp.dot(xl, yh, preferred_element_type=jnp.float32)
    return acc
