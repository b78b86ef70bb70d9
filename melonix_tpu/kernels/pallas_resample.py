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

BLK = 2048  # output samples per block
BLK_ROWS = BLK // 128
SLACK = 128  # guard below the host base for device f32 rounding


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
