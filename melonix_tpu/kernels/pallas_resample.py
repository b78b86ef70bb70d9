"""Pallas variable-position lerp resampler.

``out[j] = lerp(y, base[j // BLK] + pos_rel[j])`` with monotone positions
is the tail of the phase vocoder (and any variable-rate playback path).
As XLA gathers the two taps cost ~7.5 ns/element (~135 ms for a 3-minute
track); here each 2048-sample output block DMAs the contiguous source span
it covers and lane-gathers within it (the kernels/pallas_render.py
machinery, but with aligned non-overlapping output blocks — no compaction
pass needed).

Positions are **block-relative**: an int32 slab base per block plus small
float32 residuals.  Absolute float32 positions lose sub-sample precision
past 2^23 source samples (~3 min at 44.1 kHz) — at hour scale the ulp is
16 samples and lerp degrades to sample-and-hold.  The per-block bases come
from the HOST (analytic float64 evaluation of the position curve at block
starts, padded with slack so float32 rounding on the device can never
escape the slab).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_gather import lerp_rows, realign, shift_one

BLK = 2048  # output samples per block (4096 measured slower: the lane-gather row-select loop scales with slab rows)
BLK_ROWS = BLK // 128
SLACK = 128  # guard below the host base for device f32 rounding
LN2_12 = np.log(2.0) / 12.0  # d(bend)/dt → d(ln rho)/dt


def expm1_precise(x):
    """f32 expm1 with ~1-ulp relative error for |x| <= 0.7.

    XLA's f32 ``expm1`` carries ~1.2e-4 relative error (measured; numpy's
    is correctly rounded).  The PV position formulas multiply that error by
    the span length in samples, turning it into ~0.1-sample position error
    — audible aliasing at hour scale.  A 9-term Horner Taylor series is
    ~1-ulp accurate over the |x| <= 0.7 range the per-block anchors
    guarantee for ordinary bends; the rare larger sweep falls back to
    exp(x) - 1 (bounded cancellation there since |expm1| > 0.5)."""
    p = 1.0 + x / 9.0
    for k in (8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0):
        p = 1.0 + x * p / k
    return jnp.where(jnp.abs(x) <= 0.7, x * p, jnp.exp(x) - 1.0)


def _kernel(base_ref, y_hbm, pos_ref, o_ref, slab, sems, *, rows):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def _copy(blk, slot):
        row0 = jax.lax.div(base_ref[blk], 128)
        return pltpu.make_async_copy(
            y_hbm.at[pl.ds(row0, rows)], slab.at[slot], sems.at[slot]
        )

    @pl.when(b == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(b + 1 < nb)
    def _():
        _copy(b + 1, (b + 1) % 2).start()

    _copy(b, b % 2).wait()

    base = base_ref[b]
    g = realign(slab[b % 2], jax.lax.rem(base, 128), rows)
    hsh = shift_one(g, rows)

    pos = pos_ref[0]  # block-relative: source index minus base
    idx_f = jnp.floor(pos)
    frac = pos - idx_f
    rel = jnp.clip(idx_f.astype(jnp.int32), 0, rows * 128 - 2)
    o_ref[0] = lerp_rows(g, hsh, rel, frac, BLK_ROWS, rows - 1)


def block_bases(pos_block_starts: np.ndarray, n_src: int) -> np.ndarray:
    """Host: slab base per block from float64 start positions (with slack)."""
    base = np.floor(pos_block_starts).astype(np.int64) - SLACK
    return np.clip(base, 0, max(n_src - 1, 0)).astype(np.int32)


def rows_for(max_rate: float) -> int:
    """Slab rows covering one block's span at ``max_rate`` plus guards."""
    span = int(BLK * max(max_rate, 0.01)) + 2 * SLACK + 256
    return 8 * -(-(span // 128 + 2) // 8)


# ----------------------------------------------------------------------
# Fused positions + resample: the PV tail in ONE kernel.
#
# The unfused pipeline materializes 8M float32 positions in HBM through
# four segmented-broadcast int32 cumsums (_positions_rel_device, ~9.4 ms
# for a 3-minute track) before the resampler reads them back.  But the
# position curve is piecewise-analytic over a handful of anchors (block
# starts ∪ rate-segment starts): each output block touches at most a few
# anchors, so the per-sample positions can be evaluated IN-REGISTER from
# scalar-prefetched per-anchor constants — zero HBM traffic for positions.
# Same math as _positions_rel_device: dt from exact int32 j − j0, expm1
# for the small per-span exponent.
# ----------------------------------------------------------------------


def pv_anchor_blocks(anc_j: np.ndarray, nb: int):
    """Host: per-block first-anchor index + live-anchor count.

    ``anc_j`` must be the UNPADDED ascending anchor list (block starts are
    always anchors, so a0[b] indexes the b*BLK anchor exactly).  kmax is
    the static per-block slot count for the kernel's selection loop."""
    anc_j = np.asarray(anc_j, np.int64)
    starts = np.arange(nb, dtype=np.int64) * BLK
    a0 = (np.searchsorted(anc_j, starts, side="right") - 1).astype(np.int32)
    nxt = np.append(a0[1:], len(anc_j)).astype(np.int32)
    cnt = (nxt - a0).astype(np.int32)
    kmax = int(cnt.max()) if nb else 1
    return a0, cnt, kmax


def _pv_kernel(
    base_ref, a0_ref, cnt_ref, j0_ref, src_ref, r_ref, s_ref,
    y_hbm, o_ref, slab, sems, *, rows, kmax, sr, n_anc,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def _copy(blk, slot):
        row0 = jax.lax.div(base_ref[blk], 128)
        return pltpu.make_async_copy(
            y_hbm.at[pl.ds(row0, rows)], slab.at[slot], sems.at[slot]
        )

    @pl.when(b == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(b + 1 < nb)
    def _():
        _copy(b + 1, (b + 1) % 2).start()

    _copy(b, b % 2).wait()

    base = base_ref[b]
    g = realign(slab[b % 2], jax.lax.rem(base, 128), rows)
    hsh = shift_one(g, rows)

    # Per-sample positions from the block's anchors (ascending overwrite:
    # the LAST anchor with j0 <= j wins, = _positions_rel_device's
    # segmented broadcast).
    j_local = (
        jax.lax.broadcasted_iota(jnp.int32, (BLK_ROWS, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (BLK_ROWS, 128), 1)
    )
    jg = b * BLK + j_local
    a0 = a0_ref[b]
    cnt = cnt_ref[b]
    ln = np.float32(LN2_12)
    srf = np.float32(sr)
    pos = jnp.zeros((BLK_ROWS, 128), jnp.float32)
    for k in range(kmax):
        idx = jnp.minimum(a0 + k, n_anc - 1)
        j0 = j0_ref[idx]
        s_k = s_ref[idx]
        r_k = r_ref[idx]
        src0 = src_ref[idx]
        dt = (jg - j0).astype(jnp.float32) / srf
        x = s_k * dt * ln
        em1 = expm1_precise(x)
        flat = jnp.abs(s_k) < 1e-9
        denom = jnp.where(flat, np.float32(1.0), s_k) * ln
        delta_p = jnp.where(flat, dt, em1 / denom)
        cand = src0 + r_k * (delta_p * srf - em1)
        mask = jnp.logical_and(k < cnt, jg >= j0)
        pos = jnp.where(mask, cand, pos)
    pos = jnp.maximum(pos, 0.0)

    idx_f = jnp.floor(pos)
    frac = pos - idx_f
    rel = jnp.clip(idx_f.astype(jnp.int32), 0, rows * 128 - 2)
    o_ref[0] = lerp_rows(g, hsh, rel, frac, BLK_ROWS, rows - 1)


@partial(jax.jit, static_argnames=("rows",))
def pad_src(y: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Zero-pad + (rows, 128)-view of the stretched source, shared across
    the hour-scale render's resample segments (repadding the full track
    per segment costs a full-HBM copy pass each)."""
    total = 128 * -(-(y.shape[0] + (rows + 2) * 128) // 128)
    yp = jnp.zeros((total,), jnp.float32)
    yp = jax.lax.dynamic_update_slice(yp, y.astype(jnp.float32), (0,))
    return yp.reshape(total // 128, 128)


@partial(jax.jit, static_argnames=("rows", "kmax", "sr", "n_out", "interpret"))
def resample_pv_pallas(
    y: jnp.ndarray,  # (n_src,) f32 source, or its pad_src (rows, 128) view
    base: jnp.ndarray,  # int32 (n_out // BLK,) host slab bases
    a0: jnp.ndarray,  # int32 (nb,) first anchor index per block
    cnt: jnp.ndarray,  # int32 (nb,) live anchors per block
    anc_j: jnp.ndarray,  # int32 (n_anc,) anchor output positions
    anc_src: jnp.ndarray,  # f32 (n_anc,) block-relative anchor positions
    anc_r: jnp.ndarray,  # f32 (n_anc,) anchor rates rho
    anc_s: jnp.ndarray,  # f32 (n_anc,) anchor bend slopes
    rows: int,
    kmax: int,
    sr: int,
    n_out: int,
    interpret: bool = False,
) -> jnp.ndarray:
    nb = n_out // BLK
    n_anc = anc_j.shape[0]
    y2d = y if y.ndim == 2 else pad_src(y, rows)

    out = pl.pallas_call(
        partial(_pv_kernel, rows=rows, kmax=kmax, sr=sr, n_anc=n_anc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, BLK_ROWS, 128), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, BLK_ROWS, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_out * (8 + 12 * kmax),
            bytes_accessed=4 * (nb * rows * 128 + n_out),
            transcendentals=n_out * kmax,
        ),
        interpret=interpret,
    )(base, a0, cnt, anc_j, anc_src, anc_r, anc_s, y2d)
    return out.reshape(n_out)


@partial(jax.jit, static_argnames=("rows", "interpret"))
def resample_lerp_pallas(
    y: jnp.ndarray,  # (n_src,) float32 source
    pos: jnp.ndarray,  # (n_out,) f32 BLOCK-RELATIVE positions, n_out % BLK == 0
    base: jnp.ndarray,  # int32 (n_out // BLK,) host slab bases
    rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    n_src = y.shape[0]
    n_out = pos.shape[0]
    nb = n_out // BLK
    total = 128 * -(-(n_src + (rows + 2) * 128) // 128)
    yp = jnp.zeros((total,), jnp.float32)
    yp = jax.lax.dynamic_update_slice(yp, y.astype(jnp.float32), (0,))
    y2d = yp.reshape(total // 128, 128)

    out = pl.pallas_call(
        partial(_kernel, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, BLK_ROWS, 128), lambda b, s: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BLK_ROWS, 128), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, BLK_ROWS, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_out * 8,
            bytes_accessed=4 * (nb * rows * 128 + 2 * n_out),
            transcendentals=0,
        ),
        interpret=interpret,
    )(base, y2d, pos.reshape(nb, BLK_ROWS, 128))
    return out.reshape(n_out)
