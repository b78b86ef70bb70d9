"""Fused Pallas STFT-magnitude kernel (frame extract + window + DFT + |.|).

The XLA path (engine/spectral.stft_device) materializes the full strided
frame matrix ``(n_frames, size)`` and the complex spectrum in HBM before the
magnitude is taken.  For the hot whole-track spectrogram pass that is ~3x
the HBM traffic actually needed.  This kernel keeps everything on-chip:

* each grid step DMAs one tile-aligned waveform slab HBM->VMEM, viewed as
  ``(rows, hop)`` with frame f starting at row f (started once per
  frame-block, reused across bin tiles — scratch persists across the
  sequential TPU grid),
* frame f's hop-chunk d is slab row ``f + d``: the ``k = size // hop``
  row-shifted views of the slab ARE the overlapped frame matrix split along
  the contraction axis, produced in-register with ``pltpu.roll`` (Mosaic
  rejects sublane-offset slices/concats, but roll is a native relayout),
* applies the analysis window on the VPU chunk by chunk, and
* contracts each chunk against its cos/sin DFT row band on the MXU
  (``(BF, hop) @ (hop, BT)`` accumulated over k, 128-aligned on all sides),
* writes only the float32 magnitudes back to HBM — no frame matrix or
  complex spectrum ever touches HBM.

Per (frames, bins) output tile the HBM traffic is one waveform slab read
(amortized over all bin tiles), one cos/sin tile read, and one mags write.

Reference scope: this replaces the spectral *analysis* compute of
spec.cpp:44-66 for the modern Hann mode (BASELINE.json 2048-pt/75% config);
the 32768-pt end-anchored reference-parity columns live in
kernels/pallas_columns.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BF = 128  # frames per block (MXU sublane-friendly)
BT = 256  # DFT bins per tile (lane-friendly; keeps cos+sin tiles at 4 MB)


@lru_cache(maxsize=8)
def _dft_mats(size: int, n_bins: int) -> tuple[np.ndarray, np.ndarray]:
    """Dense real DFT matrices: cos/sin of shape (size, n_bins)."""
    n = np.arange(size, dtype=np.int64)[:, None]
    k = np.arange(n_bins, dtype=np.int64)[None, :]
    ang = -2.0 * np.pi * ((n * k) % size) / size
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


SLAB_PAD = 8  # extra slab rows so the k-1 row lookahead stays tile-aligned


def _kernel(rows_hbm, win_ref, cos_ref, sin_ref, out_ref, slab, sem, *, k,
            hop, scale):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(i * BF, BF + SLAB_PAD)], slab, sem
    )

    # The slab depends only on the frame block; bins iterate innermost, so
    # start the DMA once and let the scratch persist across bin tiles.
    @pl.when(j == 0)
    def _():
        copy.start()
        copy.wait()

    # frames[r, d*hop + c] = slab[r + d, c]: the k row-shifted slab views
    # split the (BF, size) @ (size, BT) contraction into k accumulated
    # matmuls.  roll(-d) brings row d to row 0 with aligned layout.
    n_rows = BF + SLAB_PAD
    re = jnp.zeros(out_ref.shape, jnp.float32)
    im = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(k):
        shifted = pltpu.roll(slab[:], (n_rows - d) % n_rows, 0) if d else slab[:]
        xd = shifted[:BF] * win_ref[:, pl.ds(d * hop, hop)]
        sl = pl.ds(d * hop, hop)
        # Dense 2048-long contractions need the full 6-pass f32 precision
        # (bf16x3 holds only ~-59 dB at this contraction length; the
        # four-step kernel in pallas_pv.py is the cheap-precision path).
        re += jnp.dot(xd, cos_ref[sl, :], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        im += jnp.dot(xd, sin_ref[sl, :], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.sqrt(re * re + im * im) * scale


def supported(size: int, hop: int) -> bool:
    """Kernel constraints: whole-hop overlap and lane-aligned hops/bins."""
    return (
        size % hop == 0
        and size // hop <= SLAB_PAD
        and hop % 128 == 0
        and (size // 2) % BT == 0
    )


@partial(
    jax.jit,
    static_argnames=("size", "hop", "n_frames", "scale", "interpret"),
)
def stft_mag_pallas(
    wav: jnp.ndarray,
    window: jnp.ndarray,
    size: int,
    hop: int,
    n_frames: int,
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Magnitudes ``|DFT(frame * window)| * scale`` of the first size//2 bins.

    Frame f covers ``wav[f*hop : f*hop + size)`` (out-of-range samples are
    zero), matching engine/spectral.stft_device's convention.  Returns
    float32 ``(n_frames, size // 2)``.
    """
    assert supported(size, hop), (size, hop)
    k = size // hop
    n_bins = size // 2
    nf_pad = BF * -(-n_frames // BF)
    n_rows = nf_pad + SLAB_PAD
    rows = jnp.zeros((n_rows, hop), jnp.float32)
    n_keep = min(wav.shape[0], n_rows * hop)
    rows = jax.lax.dynamic_update_slice(
        rows.reshape(-1), wav[:n_keep].astype(jnp.float32), (0,)
    ).reshape(n_rows, hop)
    cos, sin = _dft_mats(size, n_bins)

    out = pl.pallas_call(
        partial(_kernel, k=k, hop=hop, scale=float(scale)),
        grid=(nf_pad // BF, n_bins // BT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # waveform slab, DMA'd manually
            pl.BlockSpec((1, size), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((size, BT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((size, BT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BF, BT), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf_pad, n_bins), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BF + SLAB_PAD, hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * nf_pad * size * n_bins,
            bytes_accessed=4 * (n_rows * hop + 2 * size * n_bins + nf_pad * n_bins),
            transcendentals=nf_pad * n_bins,
        ),
        interpret=interpret,
    )(rows, jnp.asarray(window, jnp.float32).reshape(1, size), cos, sin)
    return out[:n_frames]
