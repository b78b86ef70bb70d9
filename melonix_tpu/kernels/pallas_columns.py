"""Fused reference-parity spectrogram-column kernel (the interactive hot path).

Reference semantics (spec.cpp:44-66): each screen column is a 32768-point
complex DFT over the window ``[end - 32768, end)`` anchored at the column's
end sample; samples before ``start`` are attenuated by ``exp(-2.5e-4 *
(start - i))``; out-of-bounds samples are zero; the result is the magnitude
of the first 16384 bins normalized by 32768, then color-mapped
(spec-cache.cpp:79-96) and uploaded as a texture.

One Pallas program per column, everything fused on-chip:

* **frame fetch** — a double-buffered DMA brings the column's slab from HBM
  at an *arbitrary* sample offset (the padded waveform is viewed as
  ``(rows, 128)``; the sub-128 remainder is fixed up in-register with two
  dynamic lane rolls + a carry select, since VMEM slices must stay
  tile-aligned).  Column c+1's DMA is in flight while column c computes.
* **decay pre-window** on the VPU (exact int32 distance arithmetic, so
  3-hour tracks don't lose precision to float32 sample indices).
* **DFT as MXU matmuls** — the four-step (Bailey) factorization
  ``N = N1 * N2`` with ``N1 = 128`` lanes: stage 1 contracts the
  ``(N2, N2)`` DFT against the ``(N2, 128)`` frame, a ``(N2, 128)``
  twiddle multiplies elementwise, stage 2 contracts against the
  ``(128, 128)`` DFT.  With ``n = n1 + 128 * n2`` the frame matrix IS the
  natural row-major ``(N2, 128)`` view of the window — no in-kernel
  reshape or gather at all.
* **magnitude + colormap** — ``sqrt(re^2+im^2)/N``, then the reference's
  three-segment colormap packed as ``0x00RRGGBB`` uint32, so the host
  downloads 4-byte texels instead of 4-byte float magnitudes it would still
  have to colormap.

Versus the XLA path (gather frames -> HBM, complex FFT -> HBM, magnitude ->
HBM, colormap -> HBM) this writes ONLY the final texels: ~6x less HBM
traffic for a viewport drain, and brightness changes are a cheap re-run
with a new gain scalar (no recompile — the gain is a prefetched scalar).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1 = 128  # lane-dimension DFT factor; fixed by the VREG lane width
_PI_REF = 3.141592  # the reference's pi literal (spec-cache.cpp:86)


def supported(size: int) -> bool:
    n2 = size // N1
    return size % N1 == 0 and 8 <= n2 <= 512 and n2 % 8 == 0


@lru_cache(maxsize=4)
def _mats(size: int):
    """Four-step DFT matrices for N = N1 * N2, n = n1 + N1*n2, k = k2 + N2*k1.

    X[k2 + N2*k1] = sum_n1 W_N1^(n1*k1) W_N^(n1*k2) sum_n2 W_N2^(n2*k2) x[n1 + N1*n2]
    """
    n2 = size // N1
    k2, m2 = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    ang2 = -2.0 * np.pi * (k2 * m2 % n2) / n2  # F_N2[k2, n2']
    tk2, tn1 = np.meshgrid(np.arange(n2), np.arange(N1), indexing="ij")
    angt = -2.0 * np.pi * (tk2 * tn1 % size) / size  # twiddle [k2, n1]
    m1, k1 = np.meshgrid(np.arange(N1), np.arange(N1), indexing="ij")
    ang1 = -2.0 * np.pi * (m1 * k1 % N1) / N1  # F_N1[n1, k1]
    f32 = np.float32
    return (
        np.cos(ang2).astype(f32), np.sin(ang2).astype(f32),
        np.cos(angt).astype(f32), np.sin(angt).astype(f32),
        np.cos(ang1).astype(f32), np.sin(ang1).astype(f32),
    )


def _kernel(
    starts_ref, ends_ref, kgain_ref,  # scalar prefetch
    wav_hbm, c2, s2, ct, st, c1, s1,  # tensor inputs
    o_ref,                            # output block (1, 64, N2)
    slab, sems,                       # scratch: (2, N2+8, 128), DMA sems (2,)
    *, size, n2, decay, colormap,
):
    c = pl.program_id(0)
    n_cols = pl.num_programs(0)
    n_rows = n2 + 8

    def _copy(col, slot):
        # Window [end - size, end) in the padded waveform starts at element
        # offset end (front pad == size); DMA from its 128-aligned row.
        row0 = jax.lax.div(ends_ref[col], 128)
        return pltpu.make_async_copy(
            wav_hbm.at[pl.ds(row0, n_rows)], slab.at[slot], sems.at[slot]
        )

    @pl.when(c == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(c + 1 < n_cols)
    def _():
        _copy(c + 1, (c + 1) % 2).start()

    _copy(c, c % 2).wait()

    end = ends_ref[c]
    rem = jax.lax.rem(end, 128)  # sub-row offset of the window start

    # x2d[a, b] = slab[a + (b + rem) // 128, (b + rem) % 128] — realign the
    # window to element 0 with two lane rolls and a carry select.
    cur = slab[c % 2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    sh = jax.lax.rem(128 - rem, 128)
    a_same = pltpu.roll(cur, sh, 1)
    a_next = pltpu.roll(pltpu.roll(cur, n_rows - 1, 0), sh, 1)
    x2d = jnp.where(lane + rem < 128, a_same, a_next)[:n2]

    # Decay pre-window: sample index of element p is end - size + p; decay
    # exp(-decay * (start - i)) where i < start (spec.cpp:56-58).  All index
    # math in int32 — exact up to 2^31 samples.
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (n2, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (n2, 128), 1)
    )
    dist = (starts_ref[c] - end + size) - pos
    dec = jnp.where(dist > 0, jnp.exp(-decay * dist.astype(jnp.float32)), 1.0)
    xw = x2d * dec

    # Four-step DFT: real input -> stage1 (N2,N2)@(N2,128) -> twiddle ->
    # stage2 (N2,128)@(128,128); all on the MXU in float32.
    yr = jnp.dot(c2[:], xw, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    yi = jnp.dot(s2[:], xw, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    tr = yr * ct[:] - yi * st[:]
    ti = yr * st[:] + yi * ct[:]
    zr = jnp.dot(tr, c1[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) - jnp.dot(
        ti, s1[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    zi = jnp.dot(tr, s1[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) + jnp.dot(
        ti, c1[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mag = jnp.sqrt(zr * zr + zi * zi) * (1.0 / size)  # [k2, k1]

    # Bin k = k2 + N2*k1; the first size/2 bins are k1 < 64.  Transposed,
    # rows become k1 so the (64, N2) block flattens to bins 0..size/2.
    mag_t = mag.T[:64]
    if colormap:
        v = jnp.clip(mag_t * kgain_ref[0], 0.0, 255.0)
        a = (v - 85.0) * (1.0 / 85.0) * (_PI_REF / 2.0)
        r = jnp.where(v < 85.0, v, jnp.where(v < 170.0, v * jnp.cos(a), (v - 170.0) * 3.0))
        g = jnp.where(v < 85.0, 0.0, jnp.where(v < 170.0, v * jnp.sin(a), v))
        b = jnp.where(v < 170.0, 0.0, (v - 170.0) * 3.0)
        # int32 packing (values < 2^24; Mosaic has no f32->u32 cast).
        packed = (
            r.astype(jnp.int32) * 65536 + g.astype(jnp.int32) * 256 + b.astype(jnp.int32)
        )
        o_ref[0] = packed
    else:
        o_ref[0] = mag_t


@partial(jax.jit, static_argnames=("size", "decay", "colormap", "interpret"))
def spectrogram_columns_fused(
    wav: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    kgain,
    size: int = 32768,
    decay: float = 2.5e-4,
    colormap: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused reference-parity columns.

    Returns ``(B, size // 2)`` — int32 packed 0x00RRGGBB texels when
    ``colormap`` (with gain ``kgain``), else float32 magnitudes.
    ``starts``/``ends`` are int32 sample ranges per column (out-of-range
    windows read zeros, matching spec.cpp:50-54).
    """
    assert supported(size), size
    n2 = size // N1
    n = wav.shape[0]
    b = starts.shape[0]
    n_rows_slab = n2 + 8
    # Padded layout: [size zeros | wav | zero slack covering the widest DMA].
    total = size + n + size + n_rows_slab * 128
    total = 1024 * -(-total // 1024)
    wavp = jnp.zeros((total,), jnp.float32)
    wavp = jax.lax.dynamic_update_slice(wavp, wav.astype(jnp.float32), (size,))
    wav2d = wavp.reshape(total // 128, 128)

    ends_c = jnp.clip(ends.astype(jnp.int32), 0, n + size)
    starts_c = starts.astype(jnp.int32)
    kg = jnp.asarray(kgain, jnp.float32).reshape(1)

    c2, s2, ct, st, c1, s1 = _mats(size)
    out_dtype = jnp.int32 if colormap else jnp.float32

    out = pl.pallas_call(
        partial(_kernel, size=size, n2=n2, decay=float(decay), colormap=colormap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(
                (1, 64, n2), lambda c, s, e, k: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, n_rows_slab, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 64, n2), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (4 * n2 * n2 * 128 + 8 * n2 * 128 * 128),
            bytes_accessed=b * (4 * n_rows_slab * 128 + 4 * 64 * n2),
            transcendentals=b * n2 * 128,
        ),
        interpret=interpret,
    )(starts_c, ends_c, kg, wav2d, c2, s2, ct, st, c1, s1)
    return out.reshape(b, size // 2)


def unpack_rgb(packed: np.ndarray) -> np.ndarray:
    """0x00RRGGBB int32 (..., bins) → uint8 (..., bins, 3)."""
    p = np.asarray(packed)
    return np.stack(
        [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF], axis=-1
    ).astype(np.uint8)
